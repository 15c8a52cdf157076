"""CTC prefix beam search tests: exactness vs a brute-force alignment-sum
oracle on tiny problems, LM shallow fusion behavior, and the serving-engine
integration."""

import itertools

import jax
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.ops.beam import (
    CharBigramLM,
    beam_search_batch,
    ctc_prefix_beam_search,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

BLANK = 0


def _oracle_sequence_log_probs(log_probs: np.ndarray) -> dict[tuple, float]:
    """Brute force: sum path probabilities over ALL V^T alignments, grouped
    by their collapsed label sequence."""
    T, V = log_probs.shape
    out: dict[tuple, float] = {}
    for path in itertools.product(range(V), repeat=T):
        lp = float(sum(log_probs[t, v] for t, v in enumerate(path)))
        collapsed = tuple(
            k for k, _ in itertools.groupby(path) if k != BLANK)
        out[collapsed] = np.logaddexp(out.get(collapsed, -np.inf), lp)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_beam_matches_bruteforce_oracle(seed):
    """With beam >= all prefixes and no pruning, prefix beam search computes
    the exact per-sequence probabilities — the top hypothesis and its score
    must match full enumeration."""
    rng = np.random.default_rng(seed)
    T, V = 4, 3
    logits = rng.normal(0, 1.5, (T, V))
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    oracle = _oracle_sequence_log_probs(log_probs)
    best_seq = max(oracle, key=oracle.get)

    beams = ctc_prefix_beam_search(log_probs, beam_size=10_000,
                                   blank_id=BLANK, prune_log_prob=-1e9)
    assert beams[0].ids == best_seq
    np.testing.assert_allclose(beams[0].log_prob, oracle[best_seq], rtol=1e-6)
    # every returned hypothesis's probability is exact
    for h in beams:
        np.testing.assert_allclose(h.log_prob, oracle[h.ids], rtol=1e-6)


def test_beam_can_beat_greedy():
    """The classic CTC case: greedy picks per-frame argmaxes that collapse
    to a worse sequence than the probability-mass winner."""
    # frame 1 splits mass between 'a' and blank; frame 2 between 'a'/'b';
    # sequence (a,) accumulates mass from several alignments
    lp = np.log(np.array([
        [0.4, 0.6, 0.0001],   # blank, a, b
        [0.4, 0.0001, 0.6],
    ]) + 1e-9)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    greedy = tuple(
        k for k, _ in itertools.groupby(np.argmax(lp, -1)) if k != BLANK)
    oracle = _oracle_sequence_log_probs(lp)
    best = max(oracle, key=oracle.get)
    beams = ctc_prefix_beam_search(lp, beam_size=100, prune_log_prob=-1e9)
    assert beams[0].ids == best
    # (construction sanity: greedy is (a, b) here, best need not equal it)
    assert greedy == (1, 2)


def test_lm_fusion_flips_ambiguous_decision():
    """Posterior nearly ties sequences (1,) and (2,); an LM trained on
    sequences ending in 2 must flip the beam's winner to (2,)."""
    lp = np.log(np.array([
        [0.02, 0.50, 0.48],
        [0.96, 0.02, 0.02],
    ]))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    no_lm = ctc_prefix_beam_search(lp, beam_size=50, prune_log_prob=-1e9)
    assert no_lm[0].ids == (1,)

    lm = CharBigramLM(vocab_size=3, smoothing=0.1).fit([[2], [2], [2], [2]])
    with_lm = ctc_prefix_beam_search(lp, beam_size=50, prune_log_prob=-1e9,
                                     lm_fn=lm, lm_alpha=1.0)
    assert with_lm[0].ids == (2,)


def test_char_bigram_lm_normalizes_and_counts():
    lm = CharBigramLM(vocab_size=4, smoothing=1.0).fit([[1, 2], [1, 3]])
    for prefix in ((), (1,), (2,)):
        np.testing.assert_allclose(np.exp(lm(prefix)).sum(), 1.0, rtol=1e-9)
    # after 1, tokens 2 and 3 are equally likely and more likely than 0
    p = np.exp(lm((1,)))
    assert p[2] == p[3] > p[0]
    # start context prefers 1
    assert np.argmax(lm(())) == 1


def test_beam_batch_respects_frame_lengths():
    rng = np.random.default_rng(3)
    lp = rng.normal(0, 1, (2, 5, 3))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    full = beam_search_batch(lp, [5, 2], beam_size=100)
    short = ctc_prefix_beam_search(np.asarray(lp[1, :2], np.float32),
                                   beam_size=100)
    assert full[1][0].ids == short[0].ids


def test_extraction_beam_mode_row_schema():
    """extract_embeddings(beam_size>0) keeps the row schema; pred_str comes
    from the beam decode."""
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.evaluation import extract_embeddings

    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    tok = CTCCharTokenizer()
    rng = np.random.default_rng(0)
    exs = [AsrExample(
        path=f"S00{i}_PAR_0_0.wav",
        array=rng.normal(0, 1, 3200).astype(np.float32), text="HI OK",
        dementia_label=i % 2,
        input_values=rng.normal(0, 1, 3200).astype(np.float32),
        labels=np.asarray(tok.encode("HI OK"), np.int32)) for i in range(3)]
    rows = extract_embeddings(cfg, params, exs, tok, batch_size=2,
                              time_multiple=3200, beam_size=6)
    assert len(rows) == 3
    assert all(isinstance(r.pred_str, str) for r in rows)
    assert all(r.hidden_states.ndim == 2 for r in rows)


def test_native_matches_python():
    """The C++ decoder (native/beam.cpp) must return the Python backend's
    top hypothesis — ids exactly, fused score to fp32 tolerance — across
    random posteriors, with and without the bigram LM."""
    from privacy_preserve_federated_asr_tpu.ops.beam import (
        ctc_prefix_beam_search_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native toolchain unavailable")
    lm = CharBigramLM(vocab_size=6, smoothing=0.5).fit(
        [[1, 2, 3], [1, 2, 4], [5, 2]])
    for seed in range(8):
        rng = np.random.default_rng(seed)
        T = int(rng.integers(3, 40))
        lp = rng.normal(0, 2.0, (T, 6))
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        lp = lp.astype(np.float32)
        for use_lm in (None, lm):
            py = ctc_prefix_beam_search(lp, beam_size=12, lm_fn=use_lm,
                                        lm_alpha=0.5, lm_beta=0.1)[0]
            nat = ctc_prefix_beam_search_native(lp, beam_size=12, lm=use_lm,
                                                lm_alpha=0.5, lm_beta=0.1)
            assert nat.ids == py.ids, (seed, use_lm is not None)
            np.testing.assert_allclose(nat.log_prob, py.score, rtol=1e-4,
                                       atol=1e-4)


def test_batch_auto_backend_uses_native_and_matches():
    from privacy_preserve_federated_asr_tpu.ops.beam import native_available

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    lp = rng.normal(0, 1.5, (3, 20, 5)).astype(np.float32)
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    lengths = [20, 13, 7]
    auto = beam_search_batch(lp, lengths, beam_size=10, backend="auto")
    pure = beam_search_batch(lp, lengths, beam_size=10, backend="python")
    for a, p in zip(auto, pure):
        assert a[0].ids == p[0].ids


def test_serving_engine_beam_mode():
    """beam_size>0: the engine decodes via prefix beam search; transcripts
    contain tokenizer characters and the result schema is unchanged."""
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine,
        ServingConfig,
    )

    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    tok = CTCCharTokenizer()
    wave = np.random.default_rng(0).normal(0, 0.3, 6400).astype(np.float32)
    greedy_eng = InferenceEngine(cfg, params, tok, ServingConfig(
        batch_size=2, time_multiple=3200, max_seconds=1.0,
        compute_dtype="float32"))
    beam_eng = InferenceEngine(cfg, params, tok, ServingConfig(
        batch_size=2, time_multiple=3200, max_seconds=1.0,
        compute_dtype="float32", beam_size=8))
    g = greedy_eng.infer_batch([wave])[0]
    b = beam_eng.infer_batch([wave])[0]
    assert b.frames == g.frames and b.ad_pred == g.ad_pred
    assert isinstance(b.transcript, str)
    # streaming sessions keep working on a beam-configured engine (they use
    # the greedy per-frame ids internally)
    from privacy_preserve_federated_asr_tpu.serving import StreamingSession

    s = StreamingSession(beam_eng)
    s.feed(wave)
    assert s.finish().total_frames == g.frames
