"""Data-layer parity tests vs HF Wav2Vec2 processor components."""

import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data import (
    CTCCharTokenizer,
    LengthBucketBatcher,
    filter_by_speakers,
    normalize_input_values,
    pad_batch,
)
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample, id_to_label


@pytest.fixture(scope="module")
def hf_tokenizer(tmp_path_factory):
    from transformers import Wav2Vec2CTCTokenizer
    import json

    vocab = CTCCharTokenizer().vocab
    p = tmp_path_factory.mktemp("tok") / "vocab.json"
    p.write_text(json.dumps(vocab))
    return Wav2Vec2CTCTokenizer(str(p))


def test_tokenizer_encode_matches_hf(hf_tokenizer):
    tok = CTCCharTokenizer()
    for text in ["HELLO WORLD", "THE QUICK BROWN FOX", "DON'T STOP", "A", "TWO  SPACES"]:
        ours = tok.encode(text)
        theirs = hf_tokenizer(text).input_ids
        assert ours == theirs, text


def test_tokenizer_ctc_decode_matches_hf(hf_tokenizer):
    tok = CTCCharTokenizer()
    # raw CTC frames: repeats + blanks, incl. pad-separated double letters
    ids = [0, 11, 11, 5, 0, 15, 15, 0, 15, 8, 4, 4, 0, 18, 8, 13, 15, 14, 0, 0]
    assert tok.decode(ids) == hf_tokenizer.decode(ids) == "HELLO WORLD"


def test_normalize_matches_hf_feature_extractor():
    from transformers import Wav2Vec2FeatureExtractor

    fe = Wav2Vec2FeatureExtractor(do_normalize=True, return_attention_mask=True)
    rng = np.random.default_rng(0)
    x = rng.normal(0.0, 0.1, size=24001).astype(np.float32)
    theirs = fe(x, sampling_rate=16000).input_values[0]
    ours = normalize_input_values(x)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_id_to_label():
    spk2label = {"S001": 1, "S002": 0}
    assert id_to_label("S001_PAR_12_34.wav", spk2label) == 1
    assert id_to_label("S001_INV_12_34.wav", spk2label) == 0
    assert id_to_label("S002_PAR_0_1.wav", spk2label) == 0


def _mk_examples(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = int(rng.integers(2000, 50000))
        out.append(
            AsrExample(
                path=f"S{i:03d}_PAR_0_1.wav",
                array=rng.normal(size=ln).astype(np.float32),
                text="HELLO",
                dementia_label=int(i % 2),
                input_values=rng.normal(size=ln).astype(np.float32),
                labels=np.array([11, 5, 15, 15, 8], dtype=np.int32),
            )
        )
    return out


def test_pad_batch_static_shapes_and_mask():
    exs = _mk_examples(3)
    b = pad_batch(exs, time_multiple=16000, label_multiple=8, pad_to_size=4)
    assert b.input_values.shape[0] == 4
    assert b.input_values.shape[1] % 16000 == 0
    assert b.labels.shape[1] == 8
    assert b.sample_mask.tolist() == [1.0, 1.0, 1.0, 0.0]
    assert (b.labels[0, 5:] == -100).all()
    # padded region zeros
    assert b.input_values[0, b.input_lengths[0]:].sum() == 0.0


def test_length_bucket_batcher_covers_all_and_bounded_shapes():
    exs = _mk_examples(17, seed=1)
    batcher = LengthBucketBatcher(exs, batch_size=4, time_multiple=16000)
    batches = list(batcher.epoch(epoch_seed=0))
    assert len(batches) == 5
    seen = [p for b in batches for p in b.paths]
    assert sorted(seen) == sorted(e.path for e in exs)
    shapes = {b.input_values.shape for b in batches}
    # length-sorted batching keeps distinct shapes small
    assert len(shapes) <= 4
    # deterministic given a seed, but ordering differs across seeds
    order2 = [b.paths for b in batcher.epoch(epoch_seed=0)]
    assert order2 == [b.paths for b in batches]


def test_filter_by_speakers():
    exs = _mk_examples(6)
    got = filter_by_speakers(exs, ["S000", "S003"])
    assert [e.path for e in got] == ["S000_PAR_0_1.wav", "S003_PAR_0_1.wav"]


def test_shuffle_window_reshuffles_membership():
    exs = _mk_examples(32, seed=5)
    b = LengthBucketBatcher(exs, batch_size=4, time_multiple=8000,
                            shuffle_window=2)
    e1 = [set(x.paths) for x in b.epoch(epoch_seed=1)]
    e2 = [set(x.paths) for x in b.epoch(epoch_seed=2)]
    # all examples covered each epoch
    assert set().union(*e1) == {e.path for e in exs}
    assert set().union(*e2) == {e.path for e in exs}
    # membership differs between epochs (HF LengthGroupedSampler behavior)
    assert e1 != e2
    # same seed -> identical epochs
    e1b = [set(x.paths) for x in b.epoch(epoch_seed=1)]
    assert e1 == e1b


def test_epoch_indices_matches_epoch():
    """epoch_indices must produce the same batch composition and order as
    epoch (both fixed-membership and shuffle_window modes)."""
    import numpy as np

    from privacy_preserve_federated_asr_tpu.data.collate import (
        LengthBucketBatcher)
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample

    rng = np.random.default_rng(0)
    exs = []
    for i in range(11):
        ln = 1600 + 320 * int(rng.integers(0, 8))
        arr = rng.normal(0, 1, size=ln).astype(np.float32)
        exs.append(AsrExample(
            path=f"u{i}.wav", array=arr, text="HI", dementia_label=i % 2,
            input_values=arr, labels=np.asarray([4, 5], dtype=np.int32)))

    for sw in (None, 2):
        b = LengthBucketBatcher(exs, 4, time_multiple=1600, seed=0,
                                shuffle_window=sw)
        for seed in (0, 7):
            idx_groups = list(b.epoch_indices(epoch_seed=seed))
            batches = list(b.epoch(epoch_seed=seed))
            assert len(idx_groups) == len(batches)
            for g, bt in zip(idx_groups, batches):
                assert len(g) == 4
                real = [j for j in g if j >= 0]
                assert [b.examples[j].path for j in real] == bt.paths
                assert all(j == -1 for j in g[len(real):])
                np.testing.assert_array_equal(
                    bt.sample_mask, [1.0] * len(real) + [0.0] * (4 - len(real)))
