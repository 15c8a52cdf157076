"""Serving path tests: engine bucketing/batching invariants, the
micro-batching dispatcher, and the HTTP front-end round trip."""

import io
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
    make_server,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _engine(stage=0, **scfg_kw):
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=stage, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    scfg = ServingConfig(batch_size=4, time_multiple=3200, max_seconds=2.0,
                         batch_window_ms=5.0, compute_dtype="float32",
                         **scfg_kw)
    return InferenceEngine(cfg, params, TOK, scfg)


def _wave(n, seed=0):
    return np.random.default_rng(seed).normal(0, 0.3, size=n).astype(np.float32)


def test_single_vs_batched_identical():
    """Padding rows and batch position must not change a result (static-
    shape batching correctness)."""
    eng = _engine()
    a, b, c = _wave(3200, 1), _wave(4000, 2), _wave(6000, 3)
    solo = eng.infer_batch([a])[0]
    batched = eng.infer_batch([b, a, c])[1]
    assert solo.transcript == batched.transcript
    assert solo.ad_pred == batched.ad_pred
    # bucket sizes differ between the two runs (3200 vs 6400 samples);
    # masked attention is padding-invariant only to float tolerance
    np.testing.assert_allclose(solo.ad_prob, batched.ad_prob, rtol=2e-3)
    assert solo.frames == batched.frames


def test_truncation_and_bucketing():
    eng = _engine()
    long = _wave(100_000, 4)  # > max_seconds (2 s = 32 000 samples)
    r = eng.infer_batch([long])[0]
    assert r.samples == 32_000
    assert eng._bucket(1) == 3200
    assert eng._bucket(3201) == 6400
    assert eng._bucket(10**9) == 32_000
    assert len(eng._buckets()) == 10  # 3200..32000


def test_more_than_batch_size_inputs():
    eng = _engine()
    waves = [_wave(3200 + 320 * i, seed=i) for i in range(7)]  # > batch_size 4
    rs = eng.infer_batch(waves)
    assert len(rs) == 7
    solo = eng.infer_batch([waves[5]])[0]
    assert rs[5].transcript == solo.transcript


def test_microbatch_dispatcher_matches_sync():
    eng = _engine()
    waves = [_wave(4800, seed=10 + i) for i in range(6)]
    sync = eng.infer_batch(waves)
    eng.start()
    try:
        futs = [eng.submit(w) for w in waves]
        async_rs = [f.result(timeout=60) for f in futs]
    finally:
        eng.stop()
    for s, a in zip(sync, async_rs):
        assert s.transcript == a.transcript
        assert s.ad_pred == a.ad_pred
        np.testing.assert_allclose(s.ad_prob, a.ad_prob, rtol=1e-5)


def test_http_server_roundtrip():
    from scipy.io import wavfile

    eng = _engine()
    eng.start()
    srv = make_server(eng, host="127.0.0.1", port=0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.load(r)["ok"] is True

        wave = _wave(4800, seed=20)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr",
            data=json.dumps({"audio": wave.tolist()}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.load(r)
        assert set(out) >= {"transcript", "ad_pred", "ad_prob", "frames"}
        assert out["transcript"] == eng.infer_batch([wave])[0].transcript

        # WAV body (PCM16) hits the same pipeline after int -> float scaling
        buf = io.BytesIO()
        wavfile.write(buf, 16000, (wave * 32767).astype(np.int16))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr", data=buf.getvalue(),
            headers={"Content-Type": "audio/wav"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.load(r)
        assert set(out) >= {"transcript", "ad_pred", "ad_prob"}

        # malformed body -> 400, not a crash
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/asr", data=b"not json",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()


def test_capped_bucket_precompiled():
    """A max_seconds off the bucket grid still yields a warmup-covered
    capped bucket (no request may pay a compile after warmup)."""
    eng = _engine()
    eng.scfg = ServingConfig(batch_size=4, time_multiple=3200,
                             max_seconds=2.1, compute_dtype="float32")
    assert eng.max_samples == 33600
    assert eng._buckets()[-1] == 33600
    assert eng._bucket(10**9) == 33600
    assert eng._bucket(33000) == 33600


def test_stop_fails_pending_futures():
    eng = _engine()
    futs = [eng.submit(_wave(3200, seed=i)) for i in range(3)]  # never started
    eng.stop()
    for f in futs:
        with pytest.raises(RuntimeError, match="stopped"):
            f.result(timeout=1)


def test_int16_transport_matches_float32():
    """int16 transport (abs-max int16 payload + device-side dequant +
    masked normalization) must reproduce the float32 path: the per-row
    scale cancels exactly in zero-mean/unit-variance normalization, so
    only ~3e-5 relative int16 rounding separates the two."""
    f32 = _engine()
    i16 = _engine(transport="int16")
    waves = [
        _wave(3200, 1),
        _wave(5000, 2) * 1e-3,              # tiny amplitude row
        np.zeros(4000, np.float32),         # silent row (scale guard)
        (np.clip(_wave(6000, 3), -1, 1) * 32767).astype(np.int16)
        .astype(np.float32) / 32768.0,      # PCM-sourced floats
    ]
    a = f32.infer_batch(waves)
    b = i16.infer_batch(waves)
    for ra, rb in zip(a, b):
        assert ra.transcript == rb.transcript
        assert ra.ad_pred == rb.ad_pred
        assert ra.frames == rb.frames
        assert ra.samples == rb.samples
        np.testing.assert_allclose(ra.ad_prob, rb.ad_prob, atol=2e-3)


def test_int16_transport_device_normalization_matches_host():
    """The device-side masked zero-mean/unit-var normalization inside the
    int16 program is the host normalize_input_values twin: run both
    engines with normalize on/off and check the normalized path changes
    results identically (i.e. the device normalization is real)."""
    eng = _engine(transport="int16")
    w = _wave(4000, 7) * 0.05 + 0.4  # nonzero mean, small var
    n = len(w)
    t = eng._bucket(n)
    from privacy_preserve_federated_asr_tpu.data.audio import (
        normalize_input_values)

    # reproduce the payload the engine ships
    amax = float(np.max(np.abs(w)))
    sc = amax / 32767.0
    q = np.clip(np.rint(w / sc), -32767, 32767).astype(np.int16)
    iv = np.zeros((eng.scfg.batch_size, t), np.int16)
    iv[0, :n] = q
    scales = np.ones((eng.scfg.batch_size,), np.float32)
    scales[0] = sc
    il = np.zeros((eng.scfg.batch_size,), np.int32)
    il[0] = n

    # device dequant+normalize (first stage of the i16 program)
    x = iv.astype(np.float32) * scales[:, None]
    mask = (np.arange(t)[None, :] < il[:, None]).astype(np.float32)
    nn = np.maximum(il.astype(np.float32), 1.0)
    mean = (x * mask).sum(-1) / nn
    var = (np.square(x - mean[:, None]) * mask).sum(-1) / nn
    dev = ((x - mean[:, None]) / np.sqrt(var + 1e-7)[:, None] * mask)[0, :n]
    host = normalize_input_values(w)
    np.testing.assert_allclose(dev, host, atol=2e-3, rtol=1e-3)


def test_int16_transport_warmup_and_dispatcher():
    """warmup precompiles the int16 programs and the micro-batching
    dispatcher runs through the int16 path unchanged."""
    eng = _engine(transport="int16")
    assert eng.warmup([3200]) == 1
    eng.start()
    try:
        w = _wave(3200, 11)
        got = eng.infer(w, timeout=120.0)
        ref = eng.infer_batch([w])[0]
        assert got.transcript == ref.transcript
        assert got.ad_pred == ref.ad_pred
    finally:
        eng.stop()


def test_unknown_transport_rejected():
    with pytest.raises(ValueError, match="transport"):
        _engine(transport="fp8")
