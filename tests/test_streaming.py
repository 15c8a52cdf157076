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
    scfg_kw.setdefault("compute_dtype", "float32")
    scfg = ServingConfig(batch_size=2, time_multiple=3200, max_seconds=2.0,
                         **scfg_kw)
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


def test_streaming_beam_matches_batch_beam_when_nothing_finalizes_early():
    """VERDICT r3 #2: streaming + beam must equal the batch beam decode on
    no-early-finalize audio — the finish pass advances ONE beam state over
    the whole utterance's log-posteriors, the exact batch recursion."""
    eng = _engine(beam_size=8)
    audio = _wave(3 * 3200, seed=6)
    batch = eng.infer_batch([audio])[0]
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=10.0,
                                                 min_hop_seconds=0.0))
    for i in range(3):
        sess.feed(audio[i * 3200 : (i + 1) * 3200])
    final = sess.finish()
    assert final.transcript == batch.transcript
    assert final.final_transcript == batch.transcript


def test_streaming_beam_with_lm_fusion():
    """Beam + shallow LM fusion in a streaming session: the carried state
    must thread the LM scores identically to the batch path."""
    from privacy_preserve_federated_asr_tpu.ops.beam import CharBigramLM

    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    lm = CharBigramLM(cfg.backbone.vocab_size).fit(
        [TOK.encode("HELLO WORLD"), TOK.encode("OK GO")])
    scfg = ServingConfig(batch_size=2, time_multiple=3200, max_seconds=2.0,
                         compute_dtype="float32", beam_size=8, lm_alpha=0.4)
    eng = InferenceEngine(cfg, params, TOK, scfg, lm_fn=lm)
    audio = _wave(2 * 3200, seed=7)
    batch = eng.infer_batch([audio])[0]
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=10.0,
                                                 min_hop_seconds=0.0))
    sess.feed(audio)
    assert sess.finish().transcript == batch.transcript


def test_streaming_beam_finalized_prefix_stable():
    """With early finalization, the finalized beam transcript must come
    from the carried state (monotone state advance, never re-decoded)."""
    eng = _engine(beam_size=4)
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=0.1,
                                                 min_hop_seconds=0.0))
    audio = _wave(4 * 3200, seed=8)
    prev_final_frames = 0
    for i in range(4):
        r = sess.feed(audio[i * 3200 : (i + 1) * 3200])
        assert r.final_frames >= prev_final_frames
        prev_final_frames = r.final_frames
    r = sess.finish()
    assert r.final_frames == r.total_frames
    assert r.transcript == r.final_transcript


def test_streaming_int16_transport_matches_float():
    """int16 chunk transport (device-side dequant + normalization) must
    reproduce the float-transport streaming session's outputs — the only
    numeric effect is the ~3e-5 int16 rounding, which the collapse and
    vote almost never see at these shapes."""
    eng_f = _engine()
    eng_i = _engine(transport="int16")
    audio = _wave(3 * 3200, seed=9)
    cfgs = dict(right_context_seconds=0.4, min_hop_seconds=0.0)
    sf = StreamingSession(eng_f, StreamingConfig(**cfgs))
    si = StreamingSession(eng_i, StreamingConfig(**cfgs))
    for i in range(3):
        chunk = audio[i * 3200 : (i + 1) * 3200]
        rf, ri = sf.feed(chunk), si.feed(chunk)
    rf, ri = sf.finish(), si.finish()
    assert ri.transcript == rf.transcript
    assert ri.ad_pred == rf.ad_pred
    assert abs(ri.ad_prob - rf.ad_prob) < 1e-3
    assert ri.total_frames == rf.total_frames


def test_streaming_int8_compute_runs():
    """int8 compute (dynamic-W8A8 Dense matmuls) streaming session: the
    quantized engine program serves sessions end-to-end; outputs carry the
    same shape/semantics (exact ids may differ from fp by design)."""
    eng = _engine(compute_dtype="int8")
    audio = _wave(2 * 3200, seed=10)
    sess = StreamingSession(eng, StreamingConfig(right_context_seconds=0.2,
                                                 min_hop_seconds=0.0))
    sess.feed(audio)
    r = sess.finish()
    assert r.is_final and r.total_frames > 0
    batch = eng.infer_batch([audio])[0]
    assert r.transcript == batch.transcript


def test_measure_finalization_flips_calibration():
    """r2 verdict #7: the right_context knob must have DATA behind it.
    Pins the measurement's calibration properties on synthetic audio:
    more right context finalizes fewer frames early and can only reduce
    the flip COUNT; a right context >= the utterance finalizes nothing
    early (flip rate exactly 0); and the tiny right context actually
    finalizes a nonzero number of frames (the measurement measures
    something)."""
    from privacy_preserve_federated_asr_tpu.serving import (
        measure_finalization_flips,
    )

    eng = _engine()
    audios = [_wave(6 * 3200, seed=s) for s in (3, 4)]
    rows = measure_finalization_flips(
        eng, audios, right_context_grid=(0.2, 0.6, 1.2, 10.0),
        hop_seconds=0.2, chunk_seconds=0.2)

    assert [r["right_context_seconds"] for r in rows] == [0.2, 0.6, 1.2, 10.0]
    # the tightest setting finalizes most of the utterance early
    assert rows[0]["finalized_frames"] > 0
    assert rows[0]["finalized_fraction"] > 0.3
    # monotone: growing right context can only shrink early-finalized
    # frames and flip counts
    fr = [r["finalized_frames"] for r in rows]
    fl = [r["flips"] for r in rows]
    assert fr == sorted(fr, reverse=True)
    assert fl == sorted(fl, reverse=True)
    # nothing finalizes early past the utterance end: rate is exactly 0
    assert rows[-1]["finalized_frames"] == 0
    assert rows[-1]["flip_rate"] == 0.0
    # rates are rates
    for r in rows:
        assert 0.0 <= r["flip_rate"] <= 1.0


def test_streaming_resident_matches_legacy_every_pass():
    """The device-resident window (default) must produce the same frame ids
    as the legacy re-upload-everything path on EVERY incremental pass —
    the only difference is where the audio lives and where normalization
    runs (masked on-device twin of normalize_input_values, ~1-ulp fp32
    reduction-order delta that the frame argmax never sees at these
    shapes)."""
    eng = _engine()
    audio = _wave(4 * 3200, seed=10)
    cfgs = dict(right_context_seconds=0.1, min_hop_seconds=0.0)
    res = StreamingSession(eng, StreamingConfig(resident=True, **cfgs))
    leg = StreamingSession(eng, StreamingConfig(resident=False, **cfgs))
    for i in range(4):
        chunk = audio[i * 3200 : (i + 1) * 3200]
        rr, rl = res.feed(chunk), leg.feed(chunk)
        assert res._final_ids == leg._final_ids
        assert res._tail_ids == leg._tail_ids
        assert rr.transcript == rl.transcript
    rr, rl = res.finish(), leg.finish()
    assert rr.transcript == rl.transcript
    assert rr.final_transcript == rl.final_transcript
    assert rr.ad_pred == rl.ad_pred
    assert abs(rr.ad_prob - rl.ad_prob) < 1e-5


def test_streaming_resident_int16_chunks_match_batch():
    """Resident sessions under --transport int16 upload each chunk as
    abs-max-scaled int16 (per-piece scales); the finished transcript must
    equal the batch int16 path's."""
    eng = _engine(transport="int16")
    audio = _wave(3 * 3200, seed=11)
    batch = eng.infer_batch([audio])[0]
    sess = StreamingSession(eng, StreamingConfig(
        right_context_seconds=10.0, min_hop_seconds=0.0, resident=True))
    for i in range(3):
        sess.feed(audio[i * 3200 : (i + 1) * 3200])
    final = sess.finish()
    assert final.transcript == batch.transcript
    assert final.total_frames == batch.frames


def test_streaming_resident_large_feed_splits_chunks():
    """A single feed larger than STREAM_CHUNK_MAX is split host-side so no
    bucketed append can clamp against the buffer end; the result must match
    the batch decode of the same audio."""
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    scfg = ServingConfig(batch_size=2, time_multiple=40000, max_seconds=6.0,
                         compute_dtype="float32")
    eng = InferenceEngine(cfg, params, TOK, scfg)
    assert eng.STREAM_CHUNK_MAX < 5 * 16000  # the feed really splits
    audio = _wave(5 * 16000, seed=12)
    batch = eng.infer_batch([audio])[0]
    sess = StreamingSession(eng, StreamingConfig(
        right_context_seconds=100.0, min_hop_seconds=0.0, resident=True))
    sess.feed(audio)
    final = sess.finish()
    assert final.transcript == batch.transcript
    assert final.total_frames == batch.frames


def test_streaming_warmup_compiles_resident_programs():
    eng = _engine()
    n = eng.warmup_streaming(chunk_samples=3200)
    assert n == len(eng._buckets())


def test_hub_sessions_match_standalone():
    """Hub members (one batched pass for the whole fleet) must produce the
    SAME finalized/tail ids and transcripts as standalone resident sessions
    fed identically — the hub is a dispatch optimization, not a semantics
    change."""
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine()
    scfg = StreamingConfig(right_context_seconds=0.1, min_hop_seconds=0.0)
    hub = StreamingHub(eng, scfg)
    audios = [_wave(4 * 3200, seed=20), _wave(3 * 3200, seed=21)]
    hub_sessions = [hub.open() for _ in audios]
    solo_sessions = [StreamingSession(eng, scfg) for _ in audios]

    # interleave feeds with different chunk counts per session
    for i in range(4):
        for k, audio in enumerate(audios):
            chunk = audio[i * 3200 : (i + 1) * 3200]
            if len(chunk):
                hub_sessions[k].feed(chunk)
                solo_sessions[k].feed(chunk)
    for k in range(len(audios)):
        rh = hub_sessions[k].finish()
        rs = solo_sessions[k].finish()
        assert rh.transcript == rs.transcript
        assert rh.final_transcript == rs.final_transcript
        assert rh.total_frames == rs.total_frames
        assert rh.ad_pred == rs.ad_pred
        assert abs(rh.ad_prob - rs.ad_prob) < 1e-5


def test_hub_row_reuse_and_capacity():
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine()  # batch_size=2 -> 2 rows
    hub = StreamingHub(eng)
    a = hub.open()
    b = hub.open()
    with pytest.raises(RuntimeError, match="hub full"):
        hub.open()
    a.feed(_wave(3200, seed=22))
    a.finish()  # frees the row (and zeroes it)
    c = hub.open()  # reuses a's row
    audio = _wave(2 * 3200, seed=23)
    c.feed(audio)
    got = c.finish()
    ref = eng.infer_batch([audio])[0]
    # the zeroed row must not leak a's audio into c's decode
    assert got.transcript == ref.transcript
    assert got.total_frames == ref.frames
    b.feed(_wave(3200, seed=24))
    b.finish()
    assert hub.active_sessions() == 0


def test_hub_beam_sessions_match_batch_beam():
    """Hub + beam: with no early finalization each member's finish equals
    the batch beam decode of its own audio. Equal-length members, so every
    hub pass (including the finishes, after which rows free one by one)
    runs at the SAME time bucket as the reference batch — valid-frame
    outputs are bucket-invariant only up to float ulps, and beam search
    amplifies near-ties on random weights."""
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine(beam_size=4)
    hub = StreamingHub(eng, StreamingConfig(right_context_seconds=10.0,
                                            min_hop_seconds=0.0))
    audios = [_wave(3 * 3200, seed=25), _wave(3 * 3200, seed=26)]
    sessions = [hub.open() for _ in audios]
    for i in range(3):
        for k, audio in enumerate(audios):
            sessions[k].feed(audio[i * 3200 : (i + 1) * 3200])
    refs = eng.infer_batch(audios)
    for k, s in enumerate(sessions):
        assert s.finish().transcript == refs[k].transcript


def test_hub_int16_transport_matches_standalone():
    """Hub int16 must equal a standalone resident int16 session fed the
    same chunks: identical piece boundaries -> identical per-piece
    quantization -> identical buffer bits. (The BATCH path quantizes each
    row with ONE whole-utterance scale, so exact equality against it is
    not guaranteed — only the ~3e-5 rounding class.)"""
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine(transport="int16")
    scfg = StreamingConfig(right_context_seconds=10.0, min_hop_seconds=0.0)
    hub = StreamingHub(eng, scfg)
    audio = _wave(3 * 3200, seed=27)
    s = hub.open()
    solo = StreamingSession(eng, scfg)
    for i in range(3):
        chunk = audio[i * 3200 : (i + 1) * 3200]
        s.feed(chunk)
        solo.feed(chunk)
    got, ref = s.finish(), solo.finish()
    assert got.transcript == ref.transcript
    assert got.total_frames == ref.total_frames


def test_http_streaming_hub_with_fallback():
    """The server packs streaming sessions into the shared hub while rows
    last (engine batch_size) and falls back to standalone sessions beyond
    that — all concurrently correct."""
    eng = _engine()  # batch_size=2 -> 2 hub rows
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

        audios = [_wave(2 * 3200, seed=30 + k) for k in range(3)]
        sids = [post("/stream/start")["session"] for _ in range(3)]
        for i in range(2):
            for k, sid in enumerate(sids):
                chunk = audios[k][i * 3200 : (i + 1) * 3200]
                r = post(f"/stream/{sid}", {"audio": chunk.tolist()})
                assert not r["is_final"]
        refs = eng.infer_batch(audios)
        for k, sid in enumerate(sids):
            r = post(f"/stream/{sid}/finish")
            assert r["is_final"]
            assert r["transcript"] == refs[k].transcript
    finally:
        srv.shutdown()
        srv.server_close()


def test_hub_coalesces_lockstep_feeds():
    """With a nonzero hop, lockstep feeds must run ONE batched pass per
    fleet hop (the last due member's feed triggers it), and a member whose
    peers stall is force-stepped once it falls 2 hops behind."""
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine()
    passes = []
    orig = eng._forward_res_b

    def counting(p, bufs, ils, t):
        passes.append(tuple(int(x) for x in np.asarray(ils)))
        return orig(p, bufs, ils, t)

    eng._forward_res_b = counting
    hub = StreamingHub(eng, StreamingConfig(right_context_seconds=0.1,
                                            min_hop_seconds=0.2))
    a, b = hub.open(), hub.open()
    hop = 3200  # 0.2 s
    for i in range(3):
        for k, s in enumerate((a, b)):
            s.feed(_wave(hop, seed=40 + 10 * k + i))
    # 3 lockstep hops -> exactly 3 batched passes: a's first feed runs
    # alone (b hadn't joined yet), then every pass carries both rows
    assert len(passes) == 3
    assert passes[0][0] > 0 and passes[0][1] == 0
    assert all(il[0] > 0 and il[1] > 0 for il in passes[1:])

    # flush b's trailing pending chunk so both rows are fully consumed,
    # then b stalls while a keeps feeding: 1 hop behind defers, 2 forces
    hub._step()
    n0 = len(passes)
    a.feed(_wave(hop, seed=50))
    assert len(passes) == n0          # deferred (b not fresh)
    a.feed(_wave(hop, seed=51))
    assert len(passes) == n0 + 1      # >= 2 hops pending: forced pass
    a.finish()
    b.finish()


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_hub_fuzz_random_interleavings_match_standalone():
    """Property test: under random chunk sizes, staggered session opens,
    random feed interleavings, coalescing hops and finish orders, every hub
    member's FINAL transcript matches a standalone resident session fed
    identically. A cross-row state bug (leaked buffer rows, wrong offsets,
    misrouted consume) garbles transcripts wholesale; hub passes running at
    different time buckets than solo passes can legitimately flip isolated
    boundary frames (float-ulp bucket variance, random weights), so the
    bound is a small edit distance, with frame counts exact."""
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine()
    rng = np.random.default_rng(123)
    for trial in range(3):
        scfg = StreamingConfig(
            right_context_seconds=float(rng.choice([0.1, 0.5, 10.0])),
            min_hop_seconds=float(rng.choice([0.0, 0.2])))
        hub = StreamingHub(eng, scfg)
        n_sess = 2  # engine batch_size
        audios = [_wave(int(rng.integers(2000, 2 * 16000)),
                        seed=100 * trial + k) for k in range(n_sess)]
        cursors = [0] * n_sess
        hub_s = [None] * n_sess
        solo_s = [None] * n_sess
        finished = [False] * n_sess
        while not all(finished):
            k = int(rng.integers(n_sess))
            if finished[k]:
                continue
            if hub_s[k] is None:  # staggered open
                hub_s[k] = hub.open()
                solo_s[k] = StreamingSession(eng, scfg)
            if cursors[k] >= len(audios[k]) and rng.random() < 0.7:
                rh, rs = hub_s[k].finish(), solo_s[k].finish()
                assert rh.total_frames == rs.total_frames, (trial, k)
                dist = _edit_distance(rh.transcript, rs.transcript)
                assert dist <= max(2, len(rs.transcript) // 50), (
                    trial, k, rh.transcript, rs.transcript)
                finished[k] = True
                continue
            step = int(rng.integers(500, 9000))
            chunk = audios[k][cursors[k] : cursors[k] + step]
            cursors[k] += step
            if len(chunk):
                hub_s[k].feed(chunk)
                solo_s[k].feed(chunk)


def test_streaming_warmup_hub_compiles_batched_programs():
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine()
    n = eng.warmup_streaming(chunk_samples=3200, hub=True)
    assert n == 2 * len(eng._buckets())
    # warmed: a hub pass reuses the compiled batched forward
    hub = StreamingHub(eng)
    s = hub.open()
    s.feed(_wave(3200, seed=60))
    assert s.finish().is_final


def test_close_then_finish_is_graceful():
    """close() abandons a session; finish()/result() afterwards must return
    a result (empty-final if no pass ever ran), never crash — the HTTP
    reaper closes sessions that a late client may still try to finish."""
    from privacy_preserve_federated_asr_tpu.serving import StreamingHub

    eng = _engine()
    s = StreamingSession(eng)
    s.close()
    r = s.finish()
    assert r.is_final and r.transcript == ""
    assert s.result().transcript == ""

    hub = StreamingHub(eng)
    h = hub.open()
    h.close()
    assert h.finish().is_final
    assert hub.active_sessions() == 0  # row freed by close

    # close after real feeds keeps the last observed state
    s2 = StreamingSession(eng)
    s2.feed(_wave(3200, seed=70))
    s2.close()
    assert s2.finish().total_frames > 0
