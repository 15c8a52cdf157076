"""HTTP-level streaming concurrency under load (VERDICT r4 item #5).

The hub's 3.0x fleet win was only ever measured driving StreamingHub
directly from one thread; these tests drive the real HTTP front-end with
genuinely concurrent clients — hub members, standalone fallback when the
hub is full, the session cap, and the idle reaper racing live requests —
and check the decoded results against single-threaded references.
(serving/server.py: hub members share one hub lock by design — a hub
step advances every member — so correctness under interleaving is the
thing to prove.)
"""

import json
import threading
import urllib.error
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
CHUNK = 3200  # 0.2 s


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _engine(batch_size=4):
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    scfg = ServingConfig(batch_size=batch_size, time_multiple=CHUNK,
                         max_seconds=2.0, batch_window_ms=5.0,
                         compute_dtype="float32")
    return InferenceEngine(cfg, params, TOK, scfg)


def _wave(n, seed):
    return np.random.default_rng(seed).normal(0, 0.3, size=n).astype(np.float32)


def _serve(eng, scfg=None, **kw):
    srv = make_server(eng, host="127.0.0.1", port=0, stream_cfg=scfg, **kw)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, srv.server_address[1]


def _post(port, path, payload=None, timeout=60):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload or {}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def test_concurrent_http_streams_match_single_threaded():
    """6 concurrent HTTP clients (4 hub rows + 2 standalone fallback)
    stream different audio; every final transcript must equal the
    single-threaded StreamingSession reference for the same audio."""
    eng = _engine(batch_size=4)
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.2,
                           min_hop_seconds=CHUNK / 16000)
    srv, port = _serve(eng, scfg)
    n_clients, n_chunks = 6, 4
    audios = [_wave(n_chunks * CHUNK, seed=100 + k) for k in range(n_clients)]
    results: list[dict | None] = [None] * n_clients
    errors: list[BaseException] = []

    def client(k):
        try:
            sid = _post(port, "/stream/start")["session"]
            for i in range(0, len(audios[k]), CHUNK):
                _post(port, f"/stream/{sid}",
                      {"audio": audios[k][i : i + CHUNK].tolist()})
            results[k] = _post(port, f"/stream/{sid}/finish")
        except BaseException as e:  # noqa: BLE001 - surfaced below
            errors.append(e)

    try:
        threads = [threading.Thread(target=client, args=(k,))
                   for k in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert all(r is not None and r["is_final"] for r in results)

        # single-threaded oracle per audio (own session, same engine);
        # hub passes can run at different time buckets than solo passes,
        # legitimately flipping isolated boundary frames (float-ulp bucket
        # variance — same bound discipline as the hub fuzz test in
        # tests/test_streaming.py), so the bound is a small edit distance
        # with frame counts exact
        for k in range(n_clients):
            ref = StreamingSession(eng, scfg)
            for i in range(0, len(audios[k]), CHUNK):
                ref.feed(audios[k][i : i + CHUNK])
            want = ref.finish()
            assert results[k]["total_frames"] == want.total_frames, k
            got_text = results[k]["final_transcript"]
            dist = _edit_distance(got_text, want.final_transcript)
            assert dist <= max(2, len(want.final_transcript) // 50), (
                k, got_text, want.final_transcript)
            np.testing.assert_allclose(results[k]["ad_prob"], want.ad_prob,
                                       atol=0.05)
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()


def test_session_cap_and_hub_full_fallback(monkeypatch):
    """Burst past the hub (rows=2) and the session cap: extra streams
    fall back to standalone sessions, the cap returns 429, and finishing
    frees capacity for new sessions."""
    from privacy_preserve_federated_asr_tpu.serving import server as srv_mod

    monkeypatch.setattr(srv_mod, "_MAX_SESSIONS", 3)
    eng = _engine(batch_size=2)   # hub has 2 rows
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.2,
                           min_hop_seconds=CHUNK / 16000)
    srv, port = _serve(eng, scfg)
    try:
        sids = [_post(port, "/stream/start")["session"] for _ in range(3)]
        # 4th session: over the cap -> 429, not a crash or a hang
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/stream/start")
        assert ei.value.code == 429

        # all three (2 hub members + 1 standalone fallback) stream fine
        wave = _wave(2 * CHUNK, seed=7)
        for sid in sids:
            r = _post(port, f"/stream/{sid}", {"audio": wave[:CHUNK].tolist()})
            assert "transcript" in r and not r["is_final"]
        fin = _post(port, f"/stream/{sids[0]}/finish")
        assert fin["is_final"]

        # capacity freed: a new session starts (and may claim a hub row)
        sid_new = _post(port, "/stream/start")["session"]
        r = _post(port, f"/stream/{sid_new}", {"audio": wave[:CHUNK].tolist()})
        assert "transcript" in r
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()


def test_no_hub_server_streams_standalone():
    """`cli serve --no_hub` (make_server(use_hub=False)): every stream is
    a standalone resident session; results match the hub server's."""
    eng = _engine(batch_size=2)
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.2,
                           min_hop_seconds=CHUNK / 16000)
    srv, port = _serve(eng, scfg, use_hub=False)
    wave = _wave(2 * CHUNK, seed=17)
    try:
        sid = _post(port, "/stream/start")["session"]
        for i in range(0, len(wave), CHUNK):
            _post(port, f"/stream/{sid}", {"audio": wave[i : i + CHUNK].tolist()})
        got = _post(port, f"/stream/{sid}/finish")
        ref = StreamingSession(eng, scfg)
        for i in range(0, len(wave), CHUNK):
            ref.feed(wave[i : i + CHUNK])
        want = ref.finish()
        assert got["final_transcript"] == want.final_transcript
        assert got["total_frames"] == want.total_frames
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()


def test_binary_audio_transport_matches_json():
    """`application/octet-stream` bodies (raw f32 / s16 PCM) must decode
    to the same results as the JSON float-list path — the binary path is
    the fix for JSON parse cost dominating concurrent streaming on a
    small front-end host (PERF.md §6 httpload)."""
    eng = _engine()
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.2,
                           min_hop_seconds=CHUNK / 16000)
    srv, port = _serve(eng, scfg)

    def post_raw2(p, path, body, headers):
        req = urllib.request.Request(
            f"http://127.0.0.1:{p}{path}", data=body,
            headers=headers, method="POST")
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    def post_raw(path, body, headers):
        return post_raw2(port, path, body, headers)

    wave = _wave(2 * CHUNK, seed=31)
    try:
        want = _post(port, "/asr", {"audio": wave.tolist()})
        got_f32 = post_raw("/asr", wave.astype("<f4").tobytes(),
                           {"Content-Type": "application/octet-stream"})
        assert got_f32["transcript"] == want["transcript"]
        np.testing.assert_allclose(got_f32["ad_prob"], want["ad_prob"],
                                   rtol=1e-6)

        # s16: quantized input, same pipeline (engine normalization makes
        # the 1/32768 scale nearly invisible; transcripts agree)
        s16 = (np.clip(wave, -1, 1) * 32767).astype("<i2")
        got_s16 = post_raw("/asr", s16.tobytes(),
                           {"Content-Type": "application/octet-stream",
                            "X-Audio-Format": "s16"})
        assert got_s16["transcript"] == want["transcript"]

        # streaming feeds ride the same decoder. Use a NO-HUB server for
        # the per-chunk comparison: hub members' hops coalesce, so two
        # members fed sequentially see phase-shifted partials by design —
        # only standalone sessions advance deterministically per feed.
        srv2, port2 = _serve(eng, scfg, use_hub=False)
        try:
            sid = _post(port2, "/stream/start")["session"]
            sid2 = _post(port2, "/stream/start")["session"]
            for i in range(0, len(wave), CHUNK):
                rb = post_raw2(port2, f"/stream/{sid}",
                               wave[i : i + CHUNK].astype("<f4").tobytes(),
                               {"Content-Type": "application/octet-stream"})
                rj = _post(port2, f"/stream/{sid2}",
                           {"audio": wave[i : i + CHUNK].tolist()})
                # partials match chunk-by-chunk, not just the final decode
                assert rb["transcript"] == rj["transcript"], i
                assert rb["total_frames"] == rj["total_frames"], i
            fb = _post(port2, f"/stream/{sid}/finish")
            fj = _post(port2, f"/stream/{sid2}/finish")
            assert fb["final_transcript"] == fj["final_transcript"]
            assert fb["total_frames"] == fj["total_frames"]
        finally:
            srv2.shutdown()
            srv2.server_close()

        # raw PCM that happens to start with the bytes "RIFF" (samples
        # 18770, 17990) must NOT be sniffed as WAV when the Content-Type
        # explicitly says octet-stream (code-review finding)
        tricky = np.concatenate([np.asarray([18770, 17990], "<i2"),
                                 (np.clip(wave[:CHUNK], -1, 1)
                                  * 32767).astype("<i2")])
        assert tricky.tobytes()[:4] == b"RIFF"
        r = post_raw("/asr", tricky.tobytes(),
                     {"Content-Type": "application/octet-stream",
                      "X-Audio-Format": "s16"})
        assert "transcript" in r and r["samples"] == len(tricky)

        # unknown format -> 400, not a crash
        with pytest.raises(urllib.error.HTTPError) as ei:
            post_raw("/asr", wave.astype("<f4").tobytes(),
                     {"Content-Type": "application/octet-stream",
                      "X-Audio-Format": "f64"})
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()


def test_cli_stream_client_roundtrip(capsys):
    """`cli stream-client` against a live server: binary-transport partials
    plus a final result, matching a direct session."""
    from privacy_preserve_federated_asr_tpu.cli import main

    eng = _engine()
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.2,
                           min_hop_seconds=CHUNK / 16000)
    srv, port = _serve(eng, scfg)
    try:
        main(["stream-client", "--port", str(port),
              "--chunk_seconds", str(CHUNK / 16000),
              "--synthetic_seconds", str(3 * CHUNK / 16000), "--seed", "3"])
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        assert len(lines) == 4           # 3 partials + final
        assert all("partial" in l for l in lines[:-1])
        fin = lines[-1]
        assert fin["is_final"]

        wave = np.random.default_rng(3).normal(
            0, 0.3, size=3 * CHUNK).astype(np.float32)
        ref = StreamingSession(eng, scfg)
        for i in range(0, len(wave), CHUNK):
            ref.feed(wave[i : i + CHUNK])
        want = ref.finish()
        assert fin["final_transcript"] == want.final_transcript
        assert fin["total_frames"] == want.total_frames
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()


def test_reaper_races_live_feeds():
    """A near-zero idle TTL with concurrent feeders: sessions actively
    feeding must never be reaped mid-request (the table-lock touch/
    lock.locked() discipline, server.py _reap_idle_locked); abandoned
    ones disappear. No 500s, no hangs."""
    eng = _engine(batch_size=2)
    eng.start()
    scfg = StreamingConfig(right_context_seconds=0.2,
                           min_hop_seconds=CHUNK / 16000)
    srv, port = _serve(eng, scfg, session_idle_ttl_s=0.2)
    wave = _wave(4 * CHUNK, seed=9)
    errors: list[BaseException] = []
    import time as _time

    def busy_client():
        try:
            sid = _post(port, "/stream/start")["session"]
            for i in range(0, len(wave), CHUNK):
                _post(port, f"/stream/{sid}", {"audio": wave[i : i + CHUNK].tolist()})
            out = _post(port, f"/stream/{sid}/finish")
            assert out["is_final"]
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    try:
        abandoned = _post(port, "/stream/start")["session"]
        _post(port, f"/stream/{abandoned}", {"audio": wave[:CHUNK].tolist()})
        threads = [threading.Thread(target=busy_client) for _ in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        _time.sleep(0.3)
        _post(port, "/stream/start")   # reap runs on session creation
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, f"/stream/{abandoned}", {"audio": wave[:CHUNK].tolist()})
        assert ei.value.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
        eng.stop()
