"""End-to-end text-branch fine-tuning tests (VERDICT r4 item #1/#2/#7).

The reference trains its text classifiers with the pretrained encoder
INSIDE the graph — ``SingleForwardModel.forward`` runs ``inp_model(inp)``
and ``configure_optimizers`` builds ``AdamW(self.parameters())``
(centralized/Dementia_challenge_models.py:304-313, Lightning DDP). These
tests prove the TPU-native equivalent: gradients flow into the flax BERT
(torch-oracle gradient parity), fine-tuning learns a task the frozen-head
baseline cannot, dp=2 batch sharding reproduces single-device training,
and the heterogeneous experiments consume REAL audio through the frozen
SSL conv frontend (reference ``extract_features[:, 0, :]``,
Dementia_challenge_models.py:295-297).
"""

import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.text import (
    BertConfigT,
    FinetuneConfig,
    FinetuneTextModel,
    FinetuneTextTrainer,
    FinetuneTrainerConfig,
    WordPieceTokenizer,
    port_hf_bert,
)


def _order_task(n=64, seed=0):
    """Token ORDER decides the label ("alpha beta"=0, "beta alpha"=1): a
    bag-of-words embedding is identical for both classes, so only a model
    that adapts its features (position-aware encoder) can separate it."""
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for i in range(n):
        lab = i % 2
        filler = " ".join(rng.choice(["cat", "dog", "sun", "sky"], size=3))
        texts.append(("alpha beta " if lab == 0 else "beta alpha ") + filler)
        labels.append(lab)
    return texts, np.asarray(labels, dtype=np.int32)


@pytest.fixture(scope="module")
def order_split():
    texts, labels = _order_task(64)
    return (texts[:48], labels[:48]), (texts[48:], labels[48:])


def _tiny_trainer(tok, **kw):
    cfg = FinetuneConfig(
        bert=BertConfigT.tiny_for_tests().replace(vocab_size=len(tok.vocab)))
    tcfg = FinetuneTrainerConfig(
        num_epochs=kw.pop("num_epochs", 8), batch_size=8,
        learning_rate=kw.pop("learning_rate", 3e-3), max_length=16, **kw)
    return FinetuneTextTrainer(cfg, tok, tcfg)


def test_finetune_learns_order_task_and_moves_encoder(order_split):
    import jax

    (xtr, ytr), (xte, yte) = order_split
    tok = WordPieceTokenizer.from_corpus(xtr)
    tr = _tiny_trainer(tok)
    tr.init_params()
    before = jax.device_get(tr.params)
    tr.fit([xtr], ytr, val_texts_per_input=[xte], val_labels=yte)
    acc = tr.evaluate([xte], yte)["acc"]
    # the encoder itself must move — that's the whole point of this mode
    assert tr.encoder_param_norm_delta(before) > 1e-2
    assert acc >= 0.9, acc

    # frozen-head baseline: SAME random-init encoder, embeddings computed
    # once, only the head trains (the .classifier.TextTrainer fast path).
    # Position info exists in the pooled embedding but is entangled; the
    # head cannot un-mix what fine-tuning can reshape.
    import jax.numpy as jnp

    from privacy_preserve_federated_asr_tpu.text import (
        TextClassifierConfig,
        TextTrainer,
    )
    from privacy_preserve_federated_asr_tpu.text.classifier import (
        TextTrainerConfig,
    )
    from privacy_preserve_federated_asr_tpu.text.bert import BertEncoder

    enc = BertEncoder(tr.cfg.bert)
    enc_params = before["encoder_0"]

    def embed(texts):
        ids, mask = tr.tokenize([texts])
        _, pooled = enc.apply({"params": enc_params},
                              jnp.asarray(ids[:, 0]), jnp.asarray(mask[:, 0]))
        return np.asarray(pooled)

    head = TextTrainer(
        TextClassifierConfig(embed_dim=tr.cfg.bert.hidden_size,
                             hidden_dim=tr.cfg.bert.hidden_size),
        TextTrainerConfig(num_epochs=8, batch_size=8, learning_rate=3e-3))
    head.fit(embed(xtr), ytr, embed(xte), yte)
    frozen_acc = head.evaluate(embed(xte), yte)["acc"]
    assert acc > frozen_acc + 0.1, (acc, frozen_acc)


def test_finetune_gradient_parity_vs_torch():
    """Full-graph gradient oracle: the same tiny BERT + linear clf1/clf2
    head in torch (reference head, Dementia_challenge_models.py:243-244,
    307) and flax produce matching loss AND parameter gradients."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = BertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    tm = BertModel(hf_cfg).eval()
    clf1 = torch.nn.Linear(32, 16)
    clf2 = torch.nn.Linear(16, 2)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 200, size=(4, 10))
    mask = np.ones((4, 10), dtype=np.int64)
    mask[2, 7:] = 0
    mask[3, 5:] = 0
    y = np.asarray([0, 1, 1, 0])

    t_ids = torch.tensor(ids, dtype=torch.long)
    t_mask = torch.tensor(mask, dtype=torch.long)
    pooled = tm(t_ids, attention_mask=t_mask).pooler_output
    logits_t = clf2(clf1(pooled))
    loss_t = torch.nn.functional.cross_entropy(logits_t, torch.tensor(y))
    loss_t.backward()

    cfgT = BertConfigT(
        vocab_size=200, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout=0.0,
        attention_dropout=0.0)
    fcfg = FinetuneConfig(bert=cfgT)
    model = FinetuneTextModel(fcfg)
    params = {
        "encoder_0": port_hf_bert(tm.state_dict(), cfgT),
        "clf1": {"kernel": clf1.weight.detach().numpy().T,
                 "bias": clf1.bias.detach().numpy()},
        "clf2": {"kernel": clf2.weight.detach().numpy().T,
                 "bias": clf2.bias.detach().numpy()},
    }
    params = jax.tree_util.tree_map(jnp.asarray, params)

    def loss_fn(p):
        logits = model.apply({"params": p}, jnp.asarray(ids),
                             jnp.asarray(mask))
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(
            logp, jnp.asarray(y)[:, None], 1))

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-4)

    pairs = [
        (grads["encoder_0"]["word_embeddings"]["embedding"],
         tm.embeddings.word_embeddings.weight.grad.numpy()),
        (grads["encoder_0"]["layer_0"]["query"]["kernel"],
         tm.encoder.layer[0].attention.self.query.weight.grad.numpy().T),
        (grads["encoder_0"]["layer_1"]["intermediate"]["kernel"],
         tm.encoder.layer[1].intermediate.dense.weight.grad.numpy().T),
        (grads["encoder_0"]["pooler"]["kernel"],
         tm.pooler.dense.weight.grad.numpy().T),
        (grads["clf1"]["kernel"], clf1.weight.grad.numpy().T),
        (grads["clf2"]["bias"], clf2.bias.grad.numpy()),
    ]
    for g_jax, g_torch in pairs:
        np.testing.assert_allclose(np.asarray(g_jax), g_torch,
                                   rtol=2e-3, atol=2e-5)


def test_finetune_dp2_matches_single_device(order_split):
    """dp=2 shards the batch over a 2-device 'data' mesh (the reference
    text branch trains under Lightning DDP, 0207_DM_SentenceLvl1input.py:
    102); the training trajectory must equal the single-device one."""
    import jax

    (xtr, ytr), (xte, yte) = order_split
    tok = WordPieceTokenizer.from_corpus(xtr)

    # (a) rigorous: one forward-backward — loss and RAW gradients must
    # match to GSPMD reduction-order tolerance (the psum the mesh inserts
    # is exact up to fp ordering; comparing before Adam's m/sqrt(v)
    # rescaling, which amplifies fp noise on near-zero elements into
    # +-lr sign flips)
    grads = {}
    for dp in (1, 2):
        tr = _tiny_trainer(tok, num_epochs=1, dp=dp)
        tr.init_params()
        loss, g = tr.loss_and_grads([xtr[:8]], ytr[:8])
        grads[dp] = (loss, g)
    assert abs(grads[1][0] - grads[2][0]) < 1e-6
    flat1 = jax.tree_util.tree_leaves(grads[1][1])
    flat2 = jax.tree_util.tree_leaves(grads[2][1])
    assert len(flat1) == len(flat2) and len(flat1) > 10
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # (b) trajectory: full fit loss curves agree closely (Adam can flip
    # +-lr on elements whose gradient is at fp-noise scale, so params
    # compare loosely; a sharding BUG — wrong psum, half the data —
    # would shift the loss curve by far more than this bound)
    losses = {}
    for dp in (1, 2):
        tr = _tiny_trainer(tok, num_epochs=2, learning_rate=1e-3, dp=dp)
        out = tr.fit([xtr], ytr)
        losses[dp] = [row["train_loss"] for row in out["history"]]
    np.testing.assert_allclose(losses[1], losses[2], rtol=5e-3, atol=5e-4)


def test_finetune_registry_experiments():
    """Registry experiments run in BOTH modes (frozen fast path and
    end-to-end fine-tune), including the attentionFuse two-tower spec."""
    from privacy_preserve_federated_asr_tpu.text import run_experiment

    rng = np.random.default_rng(0)
    rows = []
    for i in range(24):
        lab = i % 2
        word = "apple" if lab == 0 else "banana"
        rows.append({
            "path": f"S{i:03d}_PAR_{i}_0.wav",
            "text": f"the {word} story " + " ".join(
                rng.choice(["one", "two", "three"], size=2)),
            "pred_str": f"the {word} story",
            "dementia_labels": lab,
        })
    train_rows, test_rows = rows[:16], rows[16:]

    for name in ("sentence_1input",
                 "sentence_2input_heterogeneous_attention_fuse"):
        frozen = run_experiment(name, train_rows, test_rows)
        assert "acc" in frozen and "mode" not in frozen
        from privacy_preserve_federated_asr_tpu.text.finetune import (
            FinetuneTrainerConfig,
        )

        ft = run_experiment(
            name, train_rows, test_rows, finetune=True,
            ftcfg=FinetuneTrainerConfig(num_epochs=2, batch_size=4,
                                        learning_rate=1e-3, max_length=16))
        assert ft["mode"] == "finetune" and 0.0 <= ft["acc"] <= 1.0


def test_finetune_regression_twin():
    """MMSE regression under fine-tuning (SingleForwardModelRegression,
    Dementia_challenge_models.py:577)."""
    texts = [f"score level {i % 4} words" for i in range(32)]
    y = np.asarray([float(i % 4) for i in range(32)], dtype=np.float32)
    tok = WordPieceTokenizer.from_corpus(texts)
    cfg = FinetuneConfig(
        bert=BertConfigT.tiny_for_tests().replace(vocab_size=len(tok.vocab)),
        regression=True)
    tr = FinetuneTextTrainer(cfg, tok, FinetuneTrainerConfig(
        num_epochs=20, batch_size=8, learning_rate=5e-3, max_length=12,
        early_stopping_patience=20))
    tr.fit([texts], y, val_texts_per_input=[texts], val_labels=y)
    mse = tr.evaluate([texts], y)["mse"]
    assert mse < 1.0, mse   # var(y)=1.25; learning must beat the mean


def test_cli_text_finetune(tmp_path, capsys):
    """`cli text --finetune` (plain sessions and registry experiment):
    the end-to-end mode is reachable from the reference-parity CLI."""
    import json

    import pandas as pd

    from privacy_preserve_federated_asr_tpu.cli import main

    rows = []
    for i in range(12):
        lab = i % 2
        rows.append({"path": f"S{i:03d}_PAR_{i}_0.wav",
                     "text": f"the {'apple' if lab == 0 else 'banana'} story",
                     "pred_str": "x", "dementia_labels": lab})
    for name, sl in (("tr.pkl", slice(0, 8)), ("te.pkl", slice(8, 12))):
        pd.DataFrame(rows[sl]).to_pickle(tmp_path / name)

    main(["text", "--train_pkl", str(tmp_path / "tr.pkl"),
          "--test_pkl", str(tmp_path / "te.pkl"),
          "--finetune", "--epochs", "2", "--train_batch_size", "4",
          "--max_length", "16", "-lr", "1e-3"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "finetune" and "test_acc" in out

    main(["text", "--train_pkl", str(tmp_path / "tr.pkl"),
          "--test_pkl", str(tmp_path / "te.pkl"),
          "--experiment", "sentence_1input", "--finetune",
          "--epochs", "1", "--train_batch_size", "4", "--max_length", "16"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "finetune" and out["experiment"] == "sentence_1input"


def test_max_length_beyond_position_table_fails_loud_or_scales():
    """Out-of-range nn.Embed position lookups return NaN rows that
    silently poison every logit (code-review r5 finding #1): the trainer
    must refuse max_length > max_position_embeddings up front, and the
    registry's default tiny config must scale its position table to the
    requested max_length instead."""
    from privacy_preserve_federated_asr_tpu.text import run_experiment
    from privacy_preserve_federated_asr_tpu.text.finetune import (
        FinetuneTrainerConfig,
    )

    texts = [f"word{i} alpha" for i in range(8)]
    tok = WordPieceTokenizer.from_corpus(texts)
    cfg = FinetuneConfig(bert=BertConfigT.tiny_for_tests().replace(
        vocab_size=len(tok.vocab)))   # position table = 64
    with pytest.raises(AssertionError, match="max_position_embeddings"):
        FinetuneTextTrainer(cfg, tok, FinetuneTrainerConfig(max_length=128))

    rows = [{"path": f"S{i:03d}_PAR_{i}_0.wav",
             "text": f"{'apple' if i % 2 == 0 else 'banana'} tale",
             "pred_str": "x", "dementia_labels": i % 2} for i in range(12)]
    out = run_experiment(
        "sentence_1input", rows[:8], rows[8:], finetune=True,
        ftcfg=FinetuneTrainerConfig(num_epochs=1, batch_size=4,
                                    learning_rate=1e-3, max_length=128))
    # if the registry didn't scale the position table, the trainer's
    # up-front assert above would have fired inside run_experiment
    assert out["mode"] == "finetune" and 0.0 <= out["acc"] <= 1.0


def test_sweep_text_finetune_axis(tmp_path):
    """`cli sweep text --grid finetune=true,...`: the end-to-end mode is
    sweepable like any other axis (reference run_dementia_BERT.sh grids)."""
    from privacy_preserve_federated_asr_tpu.sweep import sweep_text

    rows = []
    for i in range(12):
        lab = i % 2
        rows.append({"path": f"S{i:03d}_PAR_{i}_0.wav",
                     "text": f"{'apple' if lab == 0 else 'banana'} tale",
                     "pred_str": "x", "dementia_labels": lab})
    csv = tmp_path / "sweep.csv"
    out = sweep_text(
        {"experiment": ["sentence_1input"], "finetune": ["true"],
         "max_length": [12], "num_epochs": [1], "batch_size": [4]},
        rows[:8], rows[8:], results_csv=str(csv))
    assert len(out) == 1 and out[0]["mode"] == "finetune"
    assert csv.exists() and "finetune" in csv.read_text().splitlines()[0]


def _write_wavs(tmp_path, specs):
    """specs: {stem: hz} -> writes 16 kHz mono PCM16 sine wavs."""
    from scipy.io import wavfile

    t = np.arange(8000) / 16000.0
    for stem, hz in specs.items():
        wav = (0.5 * np.sin(2 * np.pi * hz * t) * 32767).astype(np.int16)
        wavfile.write(str(tmp_path / f"{stem}.wav"), 16000, wav)


def test_ssl_audio_backend_embeds_real_waveforms(tmp_path):
    """The en/gr/multi/wv backends embed the actual WAVEFORM through the
    frozen SSL conv frontend — content-sensitive, path-insensitive
    (reference extract_features[:, 0, :] semantics), unlike the old
    hash-the-path-string placeholder."""
    from privacy_preserve_federated_asr_tpu.text import make_ssl_audio_backend
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig

    _write_wavs(tmp_path, {"a": 200, "b": 1200, "c": 200})
    embed = make_ssl_audio_backend(
        cfg=BackboneConfig.tiny_for_tests(), audio_root=str(tmp_path),
        time_multiple=8000)
    out = embed(["a.wav", "b.wav", "c.wav"])
    assert out.shape[0] == 3 and out.shape[1] >= 8
    # different audio -> different embedding; same audio, different path
    # stem -> (near-)identical embedding
    assert np.linalg.norm(out[0] - out[1]) > 1e-3
    np.testing.assert_allclose(out[0], out[2], atol=1e-5)


def test_heterogeneous_experiment_consumes_real_audio(tmp_path):
    """sentence_3input_heterogeneous end to end with audio_root: the 'en'
    input rides the real conv-frontend features; no hash-fallback warning
    fires. Without audio_root the fallback warns."""
    import warnings

    from privacy_preserve_federated_asr_tpu.models import BackboneConfig
    from privacy_preserve_federated_asr_tpu.text import run_experiment
    from privacy_preserve_federated_asr_tpu.text.audio_backend import (
        make_ssl_audio_backend,
    )

    rows = []
    for i in range(16):
        lab = i % 2
        stem = f"S{i:03d}_PAR_{i}_0"
        _write_wavs(tmp_path, {stem: 200 + 700 * lab})
        rows.append({"path": f"{stem}.wav",
                     "text": f"{'apple' if lab == 0 else 'banana'} tale",
                     "pred_str": "x", "dementia_labels": lab})
    backends = {"en": make_ssl_audio_backend(
        cfg=BackboneConfig.tiny_for_tests(), audio_root=str(tmp_path),
        time_multiple=8000)}

    with warnings.catch_warnings():
        warnings.simplefilter("error")   # any hash-fallback warning fails
        out = run_experiment("sentence_3input_heterogeneous",
                             rows[:12], rows[12:], backends=backends)
    assert "acc" in out

    with pytest.warns(UserWarning, match="no audio information"):
        run_experiment("sentence_3input_heterogeneous", rows[:12], rows[12:])

    # finetune mode consumes the same real audio as frozen `extra`
    from privacy_preserve_federated_asr_tpu.text.finetune import (
        FinetuneTrainerConfig,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ft = run_experiment(
            "sentence_3input_heterogeneous", rows[:12], rows[12:],
            backends=backends, finetune=True,
            ftcfg=FinetuneTrainerConfig(num_epochs=1, batch_size=4,
                                        learning_rate=1e-3, max_length=12))
    assert ft["mode"] == "finetune"
