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
    config_from_hf,
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
                              no_timestamps_token=4)
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
    path with a stub detokenizer (reference TeacherStudentLearning flow)."""
    _, cfg, params = tiny_pair
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.data.teacher import WhisperTeacher

    # tiny cfg: 30 s mel (3000 frames) exceeds max_source_positions, so feed
    # short audio but monkeypatch pad length via the public pad_or_trim
    teacher = WhisperTeacher(cfg, params,
                             detokenize=lambda ids: " ".join(map(str, ids)))
    teacher._pad_or_trim = lambda a: pad_or_trim(
        a, 2 * cfg.max_source_positions * 160)

    rng = np.random.default_rng(4)
    exs = [AsrExample(path=f"S00{i}_PAR_0_0.wav",
                      array=rng.normal(0, 0.1, 8000).astype(np.float32),
                      text="", dementia_label=0)
           for i in range(3)]
    out = teacher.transcribe(exs, batch_size=2)
    assert set(out) == {e.path for e in exs}
    assert all(isinstance(v, str) for v in out.values())
