"""Whisper teacher parity vs HF torch (random-init tiny config) + the JAX
log-mel frontend vs transformers' WhisperFeatureExtractor.

The reference's teacher is ``whisper.load_model('large-v2')``
(federated/src/federated_main.py:29-68); weights cannot be fetched here, so
correctness is locked the same way as the CTC backbones: port a seeded HF
module and require numerical parity on every stage (mel -> encoder ->
decoder logits -> greedy ids)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from privacy_preserve_federated_asr_tpu.models.whisper import (
    WhisperConfigT,
    WhisperModel,
    chunk_samples,
    compression_ratio,
    config_from_hf,
    decode_with_stats,
    greedy_decode,
    log_mel_spectrogram,
    pad_or_trim,
    port_hf_whisper,
    slaney_mel_filters,
)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    hf_cfg = WhisperConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=8,
        max_source_positions=64, max_target_positions=24,
        decoder_start_token_id=1, eos_token_id=0, pad_token_id=0,
        bos_token_id=0)
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    import dataclasses

    cfg = dataclasses.replace(config_from_hf(hf_cfg),
                              language_token=2, task_token=3,
                              no_timestamps_token=4, prev_token=5)
    params = port_hf_whisper(hf.state_dict(), cfg)
    return hf, cfg, params


def test_mel_frontend_matches_hf_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = rng.normal(0, 0.1, size=24000).astype(np.float32)
    ref = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    # HF returns [num_mel, 3000]; ours [B, 3000, num_mel]
    ours = np.asarray(
        log_mel_spectrogram(jnp.asarray(pad_or_trim(audio)[None]), 80))[0].T
    assert ref.shape == ours.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mel_filterbank_matches_hf():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney")
    np.testing.assert_allclose(slaney_mel_filters(80), ref, atol=1e-6)


def test_encoder_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(1)
    # 2*max_source_positions mel frames -> encoder length max_source_positions
    mel = rng.normal(0, 1, size=(2, 2 * cfg.max_source_positions,
                                 cfg.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.encoder(
            torch.tensor(mel).transpose(1, 2)).last_hidden_state.numpy()
    model = WhisperModel(cfg)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(mel),
                                  method=WhisperModel.encode))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_decoder_logits_parity(tiny_pair):
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(2)
    mel = rng.normal(0, 1, size=(2, 2 * cfg.max_source_positions,
                                 cfg.num_mel_bins)).astype(np.float32)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 7))
    with torch.no_grad():
        ref = hf(input_features=torch.tensor(mel).transpose(1, 2),
                 decoder_input_ids=torch.tensor(tokens)).logits.numpy()
    model = WhisperModel(cfg)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(mel),
                                  jnp.asarray(tokens, jnp.int32)))
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_greedy_decode_matches_hf_stepwise(tiny_pair):
    """KV-cached scan decode == HF full-context stepwise greedy."""
    hf, cfg, params = tiny_pair
    rng = np.random.default_rng(3)
    mel = rng.normal(0, 1, size=(2, 2 * cfg.max_source_positions,
                                 cfg.num_mel_bins)).astype(np.float32)
    max_new = 8

    prompt = cfg.forced_tokens()
    seqs = [list(prompt) for _ in range(2)]
    done = [False, False]
    with torch.no_grad():
        feats = torch.tensor(mel).transpose(1, 2)
        for _ in range(max_new):
            ids = torch.tensor(seqs)
            logits = hf(input_features=feats, decoder_input_ids=ids).logits
            nxt = logits[:, -1, :].argmax(-1).tolist()
            for b in range(2):
                tok = cfg.eot_token if done[b] else int(nxt[b])
                seqs[b].append(tok)
                done[b] = done[b] or tok == cfg.eot_token
    ref = np.asarray([s[len(prompt):] for s in seqs])

    ours = np.asarray(greedy_decode(cfg, params, jnp.asarray(mel),
                                    max_new_tokens=max_new))[:, :max_new]
    np.testing.assert_array_equal(ours, ref)


def test_whisper_teacher_end_to_end(tiny_pair):
    """WhisperTeacher transcribes AsrExamples through the full mel->decode
    path with a stub detokenizer (reference TeacherStudentLearning flow).
    The decode window is cfg-derived (chunk_samples), so the tiny config
    needs no monkeypatching — 8000-sample clips fit one 20480-sample
    window."""
    _, cfg, params = tiny_pair
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.data.teacher import WhisperTeacher

    assert chunk_samples(cfg) == 2 * cfg.max_source_positions * 160
    teacher = WhisperTeacher(cfg, params,
                             detokenize=lambda ids: " ".join(map(str, ids)))

    rng = np.random.default_rng(4)
    exs = [AsrExample(path=f"S00{i}_PAR_0_0.wav",
                      array=rng.normal(0, 0.1, 8000).astype(np.float32),
                      text="", dementia_label=0)
           for i in range(3)]
    out = teacher.transcribe(exs, batch_size=2)
    assert set(out) == {e.path for e in exs}
    assert all(isinstance(v, str) for v in out.values())


def test_decode_with_stats_temp0_matches_greedy(tiny_pair):
    """temperature=0 decode_with_stats is exactly greedy_decode, and the
    avg_logprob is a genuine mean log-probability (finite, <= 0)."""
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(5)
    mel = rng.normal(0, 1, size=(2, 2 * cfg.max_source_positions,
                                 cfg.num_mel_bins)).astype(np.float32)
    toks, lp = decode_with_stats(cfg, params, jnp.asarray(mel))
    ref = greedy_decode(cfg, params, jnp.asarray(mel))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref))
    lp = np.asarray(lp)
    assert np.all(np.isfinite(lp)) and np.all(lp <= 0.0)


def test_decode_with_stats_sampling_deterministic_in_seed(tiny_pair):
    """temperature>0 sampling is reproducible per rng and (generically)
    differs from greedy at high temperature."""
    import jax

    _, cfg, params = tiny_pair
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.normal(0, 1, size=(
        2, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32))
    a, _ = decode_with_stats(cfg, params, mel, temperature=1.0,
                             rng=jax.random.PRNGKey(7))
    b, _ = decode_with_stats(cfg, params, mel, temperature=1.0,
                             rng=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    g = greedy_decode(cfg, params, mel)
    assert not np.array_equal(np.asarray(a), np.asarray(g))


def test_teacher_longform_transcribes_the_tail(tiny_pair):
    """Audio longer than one decode window must be split into consecutive
    windows and the transcripts stitched — the reference relies on
    whisper.transcribe's sliding window (federated_main.py:29-68); r2
    verdict: the old port silently trimmed everything past one window."""
    _, cfg, params = tiny_pair
    from privacy_preserve_federated_asr_tpu.data.teacher import WhisperTeacher

    teacher = WhisperTeacher(
        cfg, params, detokenize=lambda ids: "-".join(map(str, ids)),
        # disable the quality gates: windows of random audio on a random
        # model legitimately fail them, and this test pins the chunking.
        # conditioning off: window-w-of-one-clip == clip-of-its-own only
        # without cross-window context (the conditioned path is pinned by
        # test_teacher_conditioning_* below)
        compression_ratio_threshold=None, logprob_threshold=None,
        condition_on_previous_text=False)
    chunk = teacher.chunk
    rng = np.random.default_rng(8)
    audio = rng.normal(0, 0.5, size=int(2.5 * chunk)).astype(np.float32)

    [stitched] = teacher.transcribe_batch([audio])
    per_window = [t for t in teacher.transcribe_batch(
        [audio[:chunk], audio[chunk:2 * chunk], audio[2 * chunk:]]) if t]
    assert stitched == " ".join(per_window)
    assert len(per_window) >= 2  # the tail was actually decoded


def test_decode_with_stats_prompt_conditioning_exact(tiny_pair):
    """The batched left-padded prompt path must be EXACT: decoding a batch
    whose rows carry different-length prompts equals decoding each row
    alone with a tightly-sized prompt buffer (padding slots are attention-
    masked and positions are assigned per row), and a zero-length prompt
    row equals the unconditioned decode."""
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(11)
    mel = jnp.asarray(rng.normal(0, 1, size=(
        2, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32))

    p = 6
    prompts = np.full((2, p), cfg.eot_token, np.int32)
    row0 = [cfg.prev_token, 7, 8, 9]          # 4-token prompt
    prompts[0, p - len(row0):] = row0
    plens = np.asarray([len(row0), 0], np.int32)
    toks, _ = decode_with_stats(cfg, params, mel,
                                prompt_ids=jnp.asarray(prompts),
                                prompt_lens=jnp.asarray(plens))
    toks = np.asarray(toks)

    # row 0 alone, prompt buffer exactly its length (no padding at all);
    # token budgets differ with the buffer size, so compare the shared
    # prefix (the stepwise selections must be identical)
    solo0, _ = decode_with_stats(
        cfg, params, mel[:1],
        prompt_ids=jnp.asarray([row0], jnp.int32),
        prompt_lens=jnp.asarray([len(row0)], jnp.int32))
    n0 = min(toks.shape[1], np.asarray(solo0).shape[1])
    np.testing.assert_array_equal(toks[0, :n0], np.asarray(solo0)[0, :n0])

    # row 1 (empty prompt) == the unconditioned program, token for token
    plain, _ = decode_with_stats(cfg, params, mel[1:])
    n = min(toks.shape[1], np.asarray(plain).shape[1])
    np.testing.assert_array_equal(toks[1, :n], np.asarray(plain)[0, :n])


def test_decode_with_stats_prompt_changes_decode(tiny_pair):
    """Conditioning must actually reach the decoder: some prompt changes
    the decoded tokens for the same audio."""
    _, cfg, params = tiny_pair
    rng = np.random.default_rng(12)
    mel = jnp.asarray(rng.normal(0, 1, size=(
        1, 2 * cfg.max_source_positions, cfg.num_mel_bins)).astype(np.float32))
    plain, _ = decode_with_stats(cfg, params, mel)
    diffs = 0
    for fill in ((7, 8, 9, 10), (13, 17, 23, 29), (40, 41, 42, 43)):
        prompt = np.asarray([[cfg.prev_token, *fill]], np.int32)
        cond, _ = decode_with_stats(
            cfg, params, mel, prompt_ids=jnp.asarray(prompt),
            prompt_lens=jnp.asarray([prompt.shape[1]], np.int32))
        n = min(np.asarray(plain).shape[1], np.asarray(cond).shape[1])
        if not np.array_equal(np.asarray(cond)[0, :n],
                              np.asarray(plain)[0, :n]):
            diffs += 1
    assert diffs > 0, "no prompt changed the decode — conditioning inert"


def test_teacher_conditioning_changes_boundary_case(tiny_pair):
    """VERDICT r3 #5 done-criterion: on multi-window audio the conditioned
    teacher (whisper.transcribe's condition_on_previous_text default) must
    demonstrably produce a different stitched transcript than the
    unconditioned round-3 behavior, while single-window (< 30 s) clips are
    bit-identical either way."""
    _, cfg, params = tiny_pair
    from privacy_preserve_federated_asr_tpu.data.teacher import WhisperTeacher

    kw = dict(detokenize=lambda ids: "-".join(map(str, ids)),
              compression_ratio_threshold=None, logprob_threshold=None)
    cond = WhisperTeacher(cfg, params, condition_on_previous_text=True,
                          max_prompt_tokens=6, **kw)
    plain = WhisperTeacher(cfg, params, condition_on_previous_text=False, **kw)
    chunk = cond.chunk

    # short clip: one window -> the conditioned path IS the plain path
    rng = np.random.default_rng(13)
    short = rng.normal(0, 0.5, size=chunk // 2).astype(np.float32)
    assert cond.transcribe_batch([short]) == plain.transcribe_batch([short])

    # multi-window: some seed's boundary decode must change under
    # conditioning (random tiny model — check a few)
    changed = False
    for seed in range(14, 20):
        audio = np.random.default_rng(seed).normal(
            0, 0.5, size=int(2.5 * chunk)).astype(np.float32)
        if cond.transcribe_batch([audio]) != plain.transcribe_batch([audio]):
            changed = True
            break
    assert changed, "conditioning never affected a window boundary"


def test_fallback_transcribe_full_tracks_ids_and_temps():
    """The conditioning path needs each window's final ids and producing
    temperature (whisper resets context after temperature > 0.5)."""
    from privacy_preserve_federated_asr_tpu.data.teacher import (
        fallback_transcribe_full,
    )

    def decode(idx, temp, seed):
        if temp == 0.0:
            return (["OK FINE HERE", "BAD"], [-0.2, -3.0],
                    [np.asarray([10, 11]), np.asarray([12])])
        return (["RECOVERED AT LAST"], [-0.5], [np.asarray([13, 14])])

    texts, ids, temps = fallback_transcribe_full(
        decode, 2, temperatures=(0.0, 0.2),
        compression_ratio_threshold=2.4, logprob_threshold=-1.0)
    assert texts == ["OK FINE HERE", "RECOVERED AT LAST"]
    assert temps == [0.0, 0.2]
    np.testing.assert_array_equal(ids[0], [10, 11])
    np.testing.assert_array_equal(ids[1], [13, 14])


def test_fallback_transcribe_escalates_temperature():
    """Windows failing the logprob/compression gates re-decode at the next
    temperature; passing windows keep their first result."""
    from privacy_preserve_federated_asr_tpu.data.teacher import (
        fallback_transcribe,
    )

    calls = []

    def decode(idx, temp, seed):
        calls.append((tuple(idx), temp))
        if temp == 0.0:
            # window 0 fine; window 1 low logprob; window 2 degenerate text
            return (["GOOD ONE", "BAD", "GO GO GO GO GO GO GO GO GO GO GO "
                     "GO GO GO GO GO GO GO GO GO GO GO GO GO GO GO GO GO"],
                    [-0.2, -3.0, -0.2])
        if temp == 0.2:
            # window 1 recovers; window 2 still repeats
            out = {1: ("RECOVERED", -0.5),
                   2: ("STILL GO GO GO GO GO GO GO GO GO GO GO GO GO GO GO "
                       "GO GO GO GO GO GO GO GO GO GO GO GO", -0.5)}
        else:
            out = {2: ("FINALLY VARIED TEXT WITH REAL WORDS", -0.6)}
        return ([out[i][0] for i in idx], [out[i][1] for i in idx])

    texts = fallback_transcribe(decode, 3,
                                temperatures=(0.0, 0.2, 0.4),
                                compression_ratio_threshold=2.4,
                                logprob_threshold=-1.0)
    assert texts == ["GOOD ONE", "RECOVERED",
                     "FINALLY VARIED TEXT WITH REAL WORDS"]
    assert calls[0] == ((0, 1, 2), 0.0)
    assert calls[1] == ((1, 2), 0.2)
    assert calls[2] == ((2,), 0.4)


def test_fallback_transcribe_accepts_last_temperature():
    """When every temperature fails the gates, the LAST decode is kept
    (whisper semantics: no infinite loop, accept the highest temperature)."""
    from privacy_preserve_federated_asr_tpu.data.teacher import (
        fallback_transcribe,
    )

    def decode(idx, temp, seed):
        return ([f"T{temp}" for _ in idx], [-9.0 for _ in idx])

    texts = fallback_transcribe(decode, 1, temperatures=(0.0, 0.5, 1.0),
                                logprob_threshold=-1.0)
    assert texts == ["T1.0"]


def test_compression_ratio_flags_repetition():
    assert compression_ratio("GO " * 60) > 2.4
    assert compression_ratio(
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AND RUNS AWAY") < 2.4


def test_from_hf_config_maps_large_v2_and_tiny():
    """WhisperConfigT.from_hf_config: shape fields from the HF config,
    prompt tokens by whisper's multilingual vocab layout — large-v2 ids
    must come out exactly as the canonical defaults."""
    from privacy_preserve_federated_asr_tpu.models.whisper import WhisperConfigT

    hf_large = {"vocab_size": 51865, "num_mel_bins": 80, "d_model": 1280,
                "encoder_layers": 32, "decoder_layers": 32,
                "encoder_attention_heads": 20, "encoder_ffn_dim": 5120,
                "max_source_positions": 1500, "max_target_positions": 448,
                "eos_token_id": 50257, "decoder_start_token_id": 50258}
    assert WhisperConfigT.from_hf_config(hf_large) == WhisperConfigT.large_v2()

    hf_tiny = {"vocab_size": 51865, "num_mel_bins": 80, "d_model": 384,
               "encoder_layers": 4, "decoder_layers": 4,
               "encoder_attention_heads": 6, "encoder_ffn_dim": 1536,
               "max_source_positions": 1500, "max_target_positions": 448,
               "eos_token_id": 50257, "decoder_start_token_id": 50258}
    c = WhisperConfigT.from_hf_config(hf_tiny)
    assert (c.d_model, c.num_heads, c.encoder_layers) == (384, 6, 4)
    assert (c.sot_token, c.language_token, c.task_token,
            c.no_timestamps_token) == (50258, 50259, 50359, 50363)


# ---------------------------------------------------------------------------
# timestamp decoding + seek (upstream whisper.transcribe's default
# without_timestamps=False long-form semantics)

def _ts_cfg(cfg):
    """Tiny config with a timestamp-token range: ids [48, 64) are
    <|0.00|>.. — text tokens stay below 48."""
    import dataclasses

    return dataclasses.replace(cfg, timestamp_begin_token=48)


def _check_ts_grammar(cfg, row, cap=None):
    """Assert one decoded row obeys upstream ApplyTimestampRules: starts
    with a timestamp (<= cap); a segment-START timestamp (penultimate
    counts as timestamp while < 2 tokens sampled) is followed by text; a
    segment-END timestamp (one that follows text) is followed only by a
    timestamp/EOT; timestamps are monotone."""
    tb = cfg.timestamp_begin
    toks = []
    for t in row:
        t = int(t)
        if t == cfg.eot_token:
            break
        toks.append(t)
    assert toks, "no tokens sampled"
    assert toks[0] >= tb, "first sampled token must be a timestamp"
    if cap is not None:
        assert toks[0] <= cap, "max_initial_timestamp violated"
    for k in range(1, len(toks)):
        t = toks[k]
        is_ts = t >= tb
        last_was = toks[k - 1] >= tb
        penult_was = k < 2 or toks[k - 2] >= tb
        if last_was and penult_was:
            assert not is_ts, "timestamp where text is required"
        if last_was and not penult_was:
            # upstream masks ids below EOT here (text); specials in
            # (eot, tb) stay legal, exactly like HF's processor
            assert t >= cfg.eot_token, \
                "text token after a segment-end timestamp"
        if is_ts:
            seen = [x for x in toks[:k] if x >= tb]
            if seen:
                floor = seen[-1] if (last_was and not penult_was) \
                    else seen[-1] + 1
                assert t >= floor, "timestamps must be monotone"
        assert t != cfg.no_timestamps_token


def test_decode_timestamps_obeys_rules(tiny_pair):
    """Greedy + sampled decodes with timestamps=True must satisfy whisper's
    timestamp grammar on every batch row."""
    import jax

    _, cfg, params = tiny_pair
    cfg = _ts_cfg(cfg)
    rng = np.random.default_rng(21)
    audio = rng.normal(0, 0.5, size=(3, chunk_samples(cfg))).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio), cfg.num_mel_bins)
    cap = cfg.timestamp_begin + int(round(
        0.1 * 16000 / cfg.timestamp_stride_samples))
    for temp in (0.0, 0.8):
        ids, lps = decode_with_stats(
            cfg, params, mel, temperature=temp,
            rng=jax.random.PRNGKey(3), timestamps=True,
            max_initial_timestamp=0.1)
        ids = np.asarray(ids)
        assert np.all(np.isfinite(np.asarray(lps)))
        for row in ids:
            _check_ts_grammar(cfg, row, cap=cap)


def test_timestamp_seek_helper(tiny_pair):
    """timestamp_seek reproduces upstream's seek rule: advance to the last
    consecutive-pair boundary (consuming only the text before it); no pair
    or a zero boundary advances the whole window."""
    from privacy_preserve_federated_asr_tpu.models.whisper import timestamp_seek

    _, cfg, params = tiny_pair
    cfg = _ts_cfg(cfg)
    tb, stride = cfg.timestamp_begin, cfg.timestamp_stride_samples
    window = cfg.max_source_positions * stride
    assert window == chunk_samples(cfg)

    # one unterminated segment: full-window advance, all text kept
    adv, text = timestamp_seek(cfg, [tb, 10, 11, cfg.eot_token])
    assert adv == window and text == [10, 11]

    # <|0|> A B <|5|> <|5|> C <|9|> : boundary at the consecutive pair;
    # text past it belongs to the next window
    row = [tb, 10, 11, tb + 5, tb + 5, 12, tb + 9, cfg.eot_token]
    adv, text = timestamp_seek(cfg, row)
    assert adv == 5 * stride
    assert text == [10, 11]

    # degenerate zero boundary: guarded to a full-window advance
    adv, text = timestamp_seek(cfg, [tb, tb, 13, cfg.eot_token])
    assert adv == window and text == [13]

    # eot-padding beyond the first EOT is ignored
    adv2, text2 = timestamp_seek(cfg, row + [cfg.eot_token] * 4)
    assert (adv2, text2) == (5 * stride, [10, 11])


def test_teacher_seek_loop(tiny_pair):
    """The seek-driven long-form loop: a clip whose first window predicts a
    mid-window segment boundary re-decodes from that boundary instead of a
    fixed hop; transcripts stitch only the consumed text."""
    from privacy_preserve_federated_asr_tpu.data.teacher import WhisperTeacher

    _, cfg, params = tiny_pair
    cfg = _ts_cfg(cfg)
    tb = cfg.timestamp_begin
    teacher = WhisperTeacher(
        cfg, params, detokenize=lambda ids: "-".join(map(str, ids)),
        compression_ratio_threshold=None, logprob_threshold=None,
        condition_on_previous_text=False, timestamps=True)
    chunk = teacher.chunk
    audio = np.zeros(int(1.5 * chunk), np.float32)

    starts = []

    def fake_decode(stack, idx, temperature, seed,
                    prompts=None, prompt_lens=None):
        starts.append(stack.shape)
        n = len(np.asarray(idx))
        if len(starts) == 1:
            # window 0: segment [0, 10] with text 7 8, then an unfinished
            # segment (text 9) past the boundary -> seek to frame 10
            row = [tb, 7, 8, tb + 10, tb + 10, 9, cfg.eot_token]
        else:
            row = [tb, 6, tb + 4, cfg.eot_token]
        ids = np.full((n, 12), cfg.eot_token, np.int64)
        ids[:, : len(row)] = row
        texts = [teacher._ids_to_text(r) for r in ids]
        return texts, np.zeros((n,), np.float32), ids

    teacher._decode_windows = fake_decode
    [out] = teacher.transcribe_batch([audio])
    stride = cfg.timestamp_stride_samples
    # window 0 advanced by its predicted 10-frame boundary (not a fixed
    # chunk hop), so 1.5 windows of audio took THREE decodes: seek goes
    # 0 -> 10*stride -> 10*stride + chunk -> past the end
    assert len(starts) == 3
    assert 10 * stride + 2 * chunk > len(audio) > 10 * stride + chunk
    # consumed text: window-0's first segment only, then the later windows'
    assert out == "7-8 6 6"


def test_teacher_seek_conditioning_prompt_is_text_only(tiny_pair):
    """With conditioning on, the next window's prompt context must be the
    consumed TEXT tokens (timestamps/specials stripped), as upstream."""
    from privacy_preserve_federated_asr_tpu.data.teacher import WhisperTeacher

    _, cfg, params = tiny_pair
    cfg = _ts_cfg(cfg)
    tb = cfg.timestamp_begin
    teacher = WhisperTeacher(
        cfg, params, detokenize=lambda ids: "-".join(map(str, ids)),
        compression_ratio_threshold=None, logprob_threshold=None,
        condition_on_previous_text=True, timestamps=True)
    chunk = teacher.chunk
    audio = np.zeros(int(1.5 * chunk), np.float32)
    seen_prompts = []

    def fake_decode(stack, idx, temperature, seed,
                    prompts=None, prompt_lens=None):
        seen_prompts.append(
            None if prompts is None
            else [int(t) for t in prompts[0][-int(prompt_lens[0]):]]
            if int(prompt_lens[0]) else [])
        n = len(np.asarray(idx))
        row = [tb, 7, 8, tb + 10, tb + 10, 9, cfg.eot_token] \
            if len(seen_prompts) == 1 else [tb, 6, tb + 4, cfg.eot_token]
        ids = np.full((n, 12), cfg.eot_token, np.int64)
        ids[:, : len(row)] = row
        texts = [teacher._ids_to_text(r) for r in ids]
        return texts, np.zeros((n,), np.float32), ids

    teacher._decode_windows = fake_decode
    teacher.transcribe_batch([audio])
    assert seen_prompts[0] is None          # window 0: unconditioned
    assert seen_prompts[1] == [cfg.prev_token, 7, 8]  # consumed text only


def test_decode_timestamps_matches_hf_logits_processor(tiny_pair):
    """Token-by-token oracle parity for the timestamp rules: drive the SAME
    HF torch model with transformers' WhisperTimeStampLogitsProcessor (the
    upstream ApplyTimestampRules port) in a hand-rolled greedy loop and
    require identical ids from decode_with_stats(timestamps=True).

    Needs whisper's vocab layout (text < EOT < specials < timestamps), so
    this builds its own tiny pair with eos=50 / tb=55 instead of reusing
    the module fixture's eot=0 layout."""
    from types import SimpleNamespace

    import dataclasses
    import jax

    from transformers import WhisperConfig, WhisperForConditionalGeneration
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    hf_cfg = WhisperConfig(
        vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=8,
        max_source_positions=64, max_target_positions=24,
        decoder_start_token_id=51, eos_token_id=50, pad_token_id=50,
        bos_token_id=50)
    torch.manual_seed(7)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = dataclasses.replace(
        config_from_hf(hf_cfg), sot_token=51, language_token=52,
        task_token=53, no_timestamps_token=54, prev_token=49,
        timestamp_begin_token=None)  # tb = 55, whisper's no_ts + 1 layout
    assert cfg.timestamp_begin == 55
    params = port_hf_whisper(hf.state_dict(), cfg)

    rng = np.random.default_rng(33)
    audio = rng.normal(0, 0.5, size=(2, chunk_samples(cfg))).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio), cfg.num_mel_bins)
    max_init_idx = 4
    ours = np.asarray(decode_with_stats(
        cfg, params, mel, temperature=0.0, rng=jax.random.PRNGKey(0),
        timestamps=True,
        max_initial_timestamp=max_init_idx * cfg.timestamp_stride_samples
        / 16000)[0])

    # HF oracle: greedy argmax over processor-filtered scores, stepping the
    # torch model on the growing prefix (begin_index = forced prompt len)
    fe_mel = torch.tensor(np.asarray(mel).transpose(0, 2, 1))
    prompt = cfg.forced_tokens(True)
    proc = WhisperTimeStampLogitsProcessor(
        SimpleNamespace(no_timestamps_token_id=cfg.no_timestamps_token,
                        eos_token_id=cfg.eot_token, bos_token_id=None,
                        max_initial_timestamp_index=max_init_idx,
                        _detect_timestamp_from_logprob=True),
        begin_index=len(prompt))
    with torch.no_grad():
        enc = hf.model.encoder(fe_mel).last_hidden_state
        ids = torch.tensor([prompt] * 2)
        done = [False, False]
        ref_rows = [[], []]
        for _ in range(cfg.max_target_positions - len(prompt)):
            logits = hf.model.decoder(
                input_ids=ids, encoder_hidden_states=enc).last_hidden_state
            logits = hf.proj_out(logits)[:, -1, :]
            scores = proc(ids, logits)
            nxt = scores.argmax(-1)
            for k in range(2):
                if not done[k]:
                    ref_rows[k].append(int(nxt[k]))
                    if int(nxt[k]) == cfg.eot_token:
                        done[k] = True
            if all(done):
                break
            ids = torch.cat([ids, nxt[:, None]], dim=1)

    for k in range(2):
        got = []
        for t in ours[k]:
            got.append(int(t))
            if int(t) == cfg.eot_token:
                break
        ref = ref_rows[k]
        if ref[-1] != cfg.eot_token:  # token budget ran out, no eot marker
            got = got[: len(ref)]
        assert got == ref, f"row {k}: {got} != {ref}"
