"""Block-streaming session tests: exactness vs the batch path when nothing
finalizes early, finalized-prefix monotonicity, hop gating, and the HTTP
streaming endpoints."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.serving import (
    InferenceEngine,
    ServingConfig,
    StreamingConfig,
    StreamingSession,
    make_server,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _engine(**scfg_kw):
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    scfg = ServingConfig(batch_size=2, time_multiple=3200, max_seconds=2.0,
                         compute_dtype="float32", **scfg_kw)
    return InferenceEngine(cfg, params, TOK, scfg)


def _wave(n, seed=0):
    return np.random.default_rng(seed).normal(0, 0.3, size=n).astype(np.float32)


def test_streaming_finish_matches_batch_when_nothing_finalizes_early():
    """right_context >= utterance length => no early finalization, so
    finish() is ONE full-context pass — bit-identical to the batch path."""
    eng = _engine()
    audio = _wave(3 * 3200)
    batch = eng.infer_batch([audio])[0]

    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=10.0,
                                                 min_hop_seconds=0.0))
    for i in range(3):
        r = sess.feed(audio[i * 3200 : (i + 1) * 3200])
        assert r.final_frames == 0  # nothing may finalize inside the margin
    final = sess.finish()
    assert final.is_final
    assert final.transcript == batch.transcript
    assert final.ad_pred == batch.ad_pred
    assert final.total_frames == batch.frames
    assert abs(final.ad_prob - batch.ad_prob) < 1e-6
    # result() view is idempotent and equals the batch result type
    res = sess.result()
    assert res.transcript == batch.transcript and res.samples == batch.samples


def test_streaming_finalized_prefix_monotonic():
    eng = _engine()
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=0.1,
                                                 min_hop_seconds=0.0))
    audio = _wave(4 * 3200, seed=1)
    prev_final = 0
    prev_prefix = []
    for i in range(4):
        r = sess.feed(audio[i * 3200 : (i + 1) * 3200])
        assert r.final_frames >= prev_final
        assert sess._final_ids[:prev_final] == prev_prefix  # never rewritten
        prev_final = r.final_frames
        prev_prefix = list(sess._final_ids)
    r = sess.finish()
    assert r.final_frames == r.total_frames
    assert sess._final_ids[:prev_final] == prev_prefix


def test_streaming_hop_gating_skips_device_passes():
    eng = _engine()
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=0.1,
                                                 min_hop_seconds=1.0))
    first = sess.feed(_wave(1600))           # first chunk always runs
    again = sess.feed(_wave(1600, seed=2))   # < 1 s of new audio: no pass
    assert again is first
    ran = sess.feed(_wave(16000, seed=3))    # over the hop: runs
    assert ran is not first


def test_streaming_feed_after_finish_raises():
    eng = _engine()
    sess = StreamingSession(eng)
    sess.feed(_wave(3200))
    sess.finish()
    with pytest.raises(RuntimeError, match="finished"):
        sess.feed(_wave(3200))
    assert sess.finish().is_final  # idempotent


def test_streaming_truncates_at_max_seconds_like_batch():
    eng = _engine()  # max 2 s
    audio = _wave(5 * 16000, seed=4)
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=10.0,
                                                 min_hop_seconds=0.0))
    sess.feed(audio)
    final = sess.finish()
    batch = eng.infer_batch([audio])[0]
    assert final.transcript == batch.transcript
    assert final.total_frames == batch.frames


def test_http_streaming_roundtrip():
    eng = _engine()
    srv = make_server(eng, port=0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        def post(path, payload=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload or {}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read())

        sid = post("/stream/start")["session"]
        audio = _wave(2 * 3200, seed=5)
        r1 = post(f"/stream/{sid}", {"audio": audio[:3200].tolist()})
        assert "transcript" in r1 and not r1["is_final"]
        r2 = post(f"/stream/{sid}/finish")
        assert r2["is_final"] and r2["final_frames"] == r2["total_frames"]
        # session is gone after finish
        try:
            post(f"/stream/{sid}", {"audio": audio[:3200].tolist()})
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_streaming_idle_sessions_reaped():
    """Abandoned sessions (no /finish) must be reaped after the idle TTL so
    the session table never pins at the cap."""
    import time

    eng = _engine()
    srv = make_server(eng, port=0, session_idle_ttl_s=0.05)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        def post(path, payload=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload or {}).encode(),
                headers={"Content-Type": "application/json"}, method="POST")
            with urllib.request.urlopen(req, timeout=30) as resp:
                return json.loads(resp.read())

        sid = post("/stream/start")["session"]
        time.sleep(0.1)
        post("/stream/start")  # reap runs on session creation
        try:
            post(f"/stream/{sid}", {"audio": _wave(3200).tolist()})
            raise AssertionError("expected 404 for the reaped session")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
