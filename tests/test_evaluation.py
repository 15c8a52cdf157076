"""Evaluation/analysis layer tests: extraction rows, detail-WER grouping,
SVM speaker vote, mask statistics vs sklearn, forced-toggle vs loop oracle."""

import numpy as np
import jax
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.evaluation import (
    detailed_wer_report,
    extract_embeddings,
    mask_node_statistics,
    mask_off_n_groups,
    aggressive_passive_masking,
    per_utt_on_rates,
    predict_ad_svm,
    rows_to_pickle,
    speaker_vote_metrics,
)
from privacy_preserve_federated_asr_tpu.evaluation.forced_toggle import (
    reference_mask_off_n_groups,
)
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _examples(n=6, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = 3200 + 320 * (i % 3)
        arr = rng.normal(0, 1, size=ln).astype(np.float32)
        role = "PAR" if i % 3 else "INV"
        out.append(AsrExample(
            path=f"S{i % 3:03d}_{role}_0_{i}.wav", array=arr, text="HI THERE",
            dementia_label=(i % 3) % 2, input_values=arr,
            labels=np.asarray(TOK.encode("HI THERE"), dtype=np.int32)))
    return out


def test_extract_embeddings_rows(tmp_path):
    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(), stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    exs = _examples()
    rows = extract_embeddings(cfg, params, exs, TOK, batch_size=4, time_multiple=3200)
    assert len(rows) == len(exs)
    by_path = {r.path: r for r in rows}
    for ex in exs:
        r = by_path[ex.path]
        t = r.hidden_states.shape[0]
        assert r.lm_mask.shape == (t, cfg.hidden_size)
        assert set(np.unique(r.lm_mask)) <= {0.0, 1.0}
        assert r.dementia_logits.shape == (t, 2)
        assert r.pred_AD in (0, 1)
        assert isinstance(r.pred_str, str)
    # different-length utts must have different unpadded frame counts
    lens = {r.path: r.hidden_states.shape[0] for r in rows}
    assert len(set(lens.values())) > 1

    rows_to_pickle(rows, str(tmp_path / "out.pkl"))
    import pandas as pd
    df = pd.read_pickle(tmp_path / "out.pkl")
    assert list(df.columns)[:3] == ["path", "text", "dementia_labels"]
    assert df.hidden_states[0].ndim == 3  # reference keeps [1, T, D]


def test_detailed_wer_report_groups(tmp_path):
    rows = [
        {"path": "S001_PAR_0.wav", "text": "A B C", "pred_str": "A B C", "dementia_labels": 1},
        {"path": "S002_PAR_0.wav", "text": "A B", "pred_str": "A X", "dementia_labels": 0},
        {"path": "S002_INV_0.wav", "text": "HELLO", "pred_str": "HELLO", "dementia_labels": 0},
        {"path": "S003_PAR_0.wav", "text": "GO HOME NOW", "pred_str": "GO HOME", "dementia_labels": 1},
    ]
    id2mmse = {"S001": 28, "S003": 15}
    rep = detailed_wer_report(rows, level=3, id2mmse=id2mmse, out_dir=str(tmp_path))
    assert rep["overall"]["n_utts"] == 4
    assert rep["AD"]["n_utts"] == 2
    assert rep["HC_INV"]["n_utts"] == 1 and rep["HC_INV"]["wer"] == 0.0
    assert rep["HC_PAR"]["wer"] == 0.5  # 1 sub / 2 ref words
    assert rep["MMSE 30-25"]["n_utts"] == 1 and rep["MMSE 30-25"]["wer"] == 0.0
    assert rep["MMSE 20-10"]["wer"] == pytest.approx(1 / 3)
    assert (tmp_path / "overall.txt").exists()


def test_speaker_vote_metrics():
    paths = ["S001_PAR_0", "S001_PAR_1", "S001_PAR_2", "S002_PAR_0", "S003_INV_0"]
    preds = [1, 1, 0, 0, 1]  # S001 votes 2/3 AD; S002 votes HC; INV ignored
    m = speaker_vote_metrics(paths, preds, {"S001": 1, "S002": 0})
    assert m["ACC"] == 1.0 and m["Sens"] == 1.0 and m["Spec"] == 1.0


def test_predict_ad_svm_separable(tmp_path):
    rng = np.random.default_rng(0)
    def mk(n, label, spk_base):
        rows = []
        for i in range(n):
            h = rng.normal(loc=3.0 * label, scale=0.3, size=(1, 10, 8)).astype(np.float32)
            rows.append({"path": f"S{spk_base + i:03d}_PAR_0.wav",
                         "hidden_states": h, "lm_mask": np.ones_like(h),
                         "dementia_labels": label})
        return rows
    train = mk(10, 0, 0) + mk(10, 1, 100)
    test = mk(5, 0, 50) + mk(5, 1, 150)
    spk2label = {f"S{i:03d}": 0 for i in range(100)}
    spk2label.update({f"S{i:03d}": 1 for i in range(100, 200)})
    m = predict_ad_svm(train, test, spk2label, pooling="mean",
                       results_csv=str(tmp_path / "results.csv"))
    assert m["ACC"] == 1.0 and m["UAR"] == 1.0
    assert (tmp_path / "results.csv").read_text().count("\n") == 2


def test_mask_node_statistics_matches_sklearn():
    from sklearn.metrics import mutual_info_score

    rng = np.random.default_rng(1)
    rows = [{"lm_mask": rng.integers(0, 2, size=(1, 20, 5)).astype(np.float32),
             "dementia_mask": rng.integers(0, 2, size=(1, 20, 5)).astype(np.float32)}
            for _ in range(3)]
    stats = mask_node_statistics(rows)
    # oracle: reference triple loop with sklearn MI
    d = 5
    mex = np.zeros(d); mi = np.zeros(d); r11 = np.zeros(d)
    lm_on = np.zeros(d); ad_on = np.zeros(d)
    for r in rows:
        lm = r["lm_mask"][0].T; ad = r["dementia_mask"][0].T
        for j in range(d):
            mex[j] += (lm[j] != ad[j]).sum() / len(ad[j])
            mi[j] += mutual_info_score(lm[j], ad[j])
            lm_on[j] += lm[j].sum() / len(lm[j])
            ad_on[j] += ad[j].sum() / len(ad[j])
            r11[j] += ((lm[j] == 1) * (ad[j] == 1)).sum() / len(ad[j])
    n = len(rows)
    np.testing.assert_allclose(stats["mex_rate"], mex / n, rtol=1e-6)
    np.testing.assert_allclose(stats["mutual_info"], mi / n, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(stats["lm_on_rate"], lm_on / n, rtol=1e-6)
    np.testing.assert_allclose(stats["ad_on_rate"], ad_on / n, rtol=1e-6)
    np.testing.assert_allclose(stats["rate_11"], r11 / n, rtol=1e-6)

    rates = per_utt_on_rates(rows)
    assert rates["lm_on_rate"].shape == (3,)


def test_mask_off_n_groups_matches_reference_loop():
    rng = np.random.default_rng(2)
    scores = rng.normal(size=(2, 4, 16)).astype(np.float32)
    ours = np.asarray(mask_off_n_groups(scores, num_per_group=4, num_off=2))
    oracle = reference_mask_off_n_groups(scores, 4, 2)
    np.testing.assert_array_equal(ours, oracle)


@pytest.mark.parametrize("aggressive", [True, False])
def test_aggressive_passive_masking_invariants(aggressive):
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(1, 6, 12)).astype(np.float32)
    mask = (rng.random((1, 6, 12)) > 0.5).astype(np.float32)
    out = np.asarray(aggressive_passive_masking(scores, mask, 0.5, aggressive))
    if aggressive:
        # off stays off; on-count drops by floor(0.5 * on)
        assert np.all(out[mask == 0] == 0)
        for j in range(6):
            on0 = mask[0, j].sum()
            assert out[0, j].sum() == on0 - np.floor(on0 * 0.5)
    else:
        assert np.all(out[mask == 1] == 1)
        for j in range(6):
            off0 = 12 - mask[0, j].sum()
            assert out[0, j].sum() == mask[0, j].sum() + np.floor(off0 * 0.5)
    # ratio == 1 shortcuts
    full = np.asarray(aggressive_passive_masking(scores, mask, 1.0, aggressive))
    assert np.all(full == (0.0 if aggressive else 1.0))


def test_forced_toggle_extract():
    from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
    from privacy_preserve_federated_asr_tpu.evaluation.forced_toggle import (
        forced_toggle_extract)
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample

    tok = CTCCharTokenizer()
    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(), stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    exs = []
    for i in range(4):
        arr = rng.normal(0, 1, 3200).astype(np.float32)
        exs.append(AsrExample(path=f"S{i:03d}_PAR_0.wav", array=arr, text="HI",
                              dementia_label=0, input_values=arr,
                              labels=np.asarray(tok.encode("HI"), dtype=np.int32)))
    rows, w = forced_toggle_extract(cfg, params, exs, tok, mode="off_groups",
                                    batch_size=2, time_multiple=3200,
                                    num_per_group=cfg.hidden_size // 4, num_off=4)
    # all groups off -> lm mask fully zero
    assert all(r["forced_on_rate"] == 0.0 for r in rows)
    assert w is not None
    rows2, _ = forced_toggle_extract(cfg, params, exs, tok, mode="passive",
                                     batch_size=2, time_multiple=3200, ratio=1.0)
    assert all(r["forced_on_rate"] == 1.0 for r in rows2)


def test_sampling_partitions():
    from privacy_preserve_federated_asr_tpu.parallel.sampling import (
        iid_partition, noniid_shard_partition, noniid_unequal_partition)

    p = iid_partition(100, 4, seed=0)
    all_idx = np.concatenate(list(p.values()))
    assert len(all_idx) == 100 and len(np.unique(all_idx)) == 100

    labels = np.repeat(np.arange(10), 10)
    q = noniid_shard_partition(labels, 5, shards_per_client=2, seed=0)
    # each client sees at most 2 shards -> at most ~2-3 distinct labels
    for idx in q.values():
        assert len(np.unique(labels[idx])) <= 4
    assert len(np.unique(np.concatenate(list(q.values())))) == 100

    u = noniid_unequal_partition(labels, 5, seed=0)
    total = np.concatenate([v for v in u.values() if len(v)])
    assert len(np.unique(total)) == len(total)


def test_wer_golden_jiwer_semantics():
    """Hand-verified golden H/S/D/I counts with jiwer/compute_measures
    semantics (the reference vendors jiwer in centralized/detail_wer.py:
    88-241; jiwer itself is not in this image, so the goldens are frozen
    hand-derived values, incl. whitespace normalization and the corpus
    aggregation rule total_errors / total_ref_words)."""
    from privacy_preserve_federated_asr_tpu.train.metrics import (
        ErrorCounts, wer, word_error_counts)

    cases = [
        # (ref, hyp, hits, subs, dels, ins)
        ("the cat sat", "the cat sat", 3, 0, 0, 0),
        ("the cat sat", "the bat sat", 2, 1, 0, 0),
        ("the cat sat", "cat sat", 2, 0, 1, 0),
        ("the cat sat", "the big cat sat", 3, 0, 0, 1),
        ("a b c d", "x y", 0, 2, 2, 0),
        ("a", "a a a", 1, 0, 0, 2),
        ("a b", "", 0, 0, 2, 0),
        ("", "x y", 0, 0, 0, 2),
        ("  the   cat ", "the cat", 2, 0, 0, 0),   # whitespace normalization
        ("a b a b", "b a b", 3, 0, 1, 0),           # shift alignment
    ]
    for ref, hyp, h, s, d, i in cases:
        c = word_error_counts(ref, hyp)
        assert (c.hits, c.substitutions, c.deletions, c.insertions) == \
            (h, s, d, i), (ref, hyp, c)

    # jiwer WER on the single pair
    c = word_error_counts("the cat sat", "the bat sat")
    assert c.wer == pytest.approx(1 / 3)
    # corpus aggregation: sum of errors / sum of ref words (jiwer semantics,
    # NOT the mean of per-utterance WERs)
    assert wer(["the cat sat", "a b c d"], ["the bat sat", "x y"]) == \
        pytest.approx((1 + 4) / (3 + 4))
    # empty-reference conventions
    assert ErrorCounts(0, 0, 0, 0).wer == 0.0
    assert ErrorCounts(0, 0, 0, 2).wer == float("inf")


def test_detail_wer_golden_report():
    """Frozen end-to-end detail-WER report on a tiny synthetic extraction:
    grouped HC/AD counts must match hand-computed values (reference
    detail_wer.py type-2 grouping)."""
    from privacy_preserve_federated_asr_tpu.evaluation.detail_wer import (
        detailed_wer_report)

    rows = [
        {"path": "S001_PAR_0_0.wav", "text": "the cat sat",
         "pred_str": "the bat sat", "dementia_labels": 0},
        {"path": "S001_PAR_1_0.wav", "text": "a b c d",
         "pred_str": "a b c d", "dementia_labels": 0},
        {"path": "S002_PAR_0_0.wav", "text": "hello there friend",
         "pred_str": "hello friend", "dementia_labels": 1},
        {"path": "S002_PAR_1_0.wav", "text": "one two",
         "pred_str": "one two three", "dementia_labels": 1},
    ]
    report = detailed_wer_report(rows, level=2)
    hc, ad = report["HC_all"], report["AD"]
    assert hc["n_utts"] == 2 and ad["n_utts"] == 2
    # HC: 1 sub over 7 ref words; AD: 1 del + 1 ins over 5 ref words
    assert hc["substitutions"] == 1 and hc["wer"] == pytest.approx(1 / 7)
    assert ad["deletions"] == 1 and ad["insertions"] == 1
    assert ad["wer"] == pytest.approx(2 / 5)


def test_extract_embeddings_bf16_close_to_fp32():
    """bf16 extraction (serving precision, opt-in) dumps float32 rows whose
    masks/predictions agree with the fp32 path."""
    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(), stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    exs = _examples()
    r32 = extract_embeddings(cfg, params, exs, TOK, batch_size=4,
                             time_multiple=3200)
    r16 = extract_embeddings(cfg, params, exs, TOK, batch_size=4,
                             time_multiple=3200, compute_dtype="bfloat16")
    for a, b in zip(r32, r16):
        assert b.hidden_states.dtype == np.float32
        assert a.hidden_states.shape == b.hidden_states.shape
        np.testing.assert_allclose(a.hidden_states, b.hidden_states,
                                   atol=0.15, rtol=0.1)
        assert a.pred_AD == b.pred_AD


def test_extract_embeddings_dp_mesh_matches_single_device():
    """Mesh data-parallel extraction (the reference's torch.nn.DataParallel
    eval, centralized/eval_toggle_GS.py:629-639, as GSPMD batch sharding)
    must reproduce the single-device rows exactly: params replicate, batch
    rows shard over the 'data' axis, and the un-padding/decode host path is
    untouched."""
    from privacy_preserve_federated_asr_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0,
            activation_dropout=0.0, final_dropout=0.0),
        stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    exs = _examples(n=7, seed=3)  # odd count: last batch padded + masked
    ref = extract_embeddings(cfg, params, exs, TOK, batch_size=4,
                             time_multiple=3200)
    mesh = make_mesh(client=1, data=4)
    got = extract_embeddings(cfg, params, exs, TOK, batch_size=4,
                             time_multiple=3200, mesh=mesh)
    assert len(got) == len(ref) == len(exs)
    ref_by, got_by = ({r.path: r for r in rows} for rows in (ref, got))
    for p in ref_by:
        a, b = ref_by[p], got_by[p]
        assert a.pred_str == b.pred_str
        assert a.pred_AD == b.pred_AD
        np.testing.assert_allclose(b.hidden_states, a.hidden_states,
                                   atol=2e-5)
        np.testing.assert_allclose(b.dementia_logits, a.dementia_logits,
                                   atol=2e-5)

    with pytest.raises(ValueError, match="divide"):
        extract_embeddings(cfg, params, exs, TOK, batch_size=3,
                           time_multiple=3200, mesh=mesh)
