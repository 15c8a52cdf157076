"""Tests for single-toggle / FSM variant models and the multitask N-best
machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.federated.multitask import (
    attach_pseudo_labels,
    copy_first_head_to_lm_head,
    generate_pseudo_labels,
    init_lm_heads_from_lm_head,
    multitask_loss,
)
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig, DACSModel
from privacy_preserve_federated_asr_tpu.models.variants import (
    FSMModel,
    SingleToggleModel,
    fsm_loss,
    fsm_trainable,
    single_toggle_loss,
    single_toggle_trainable,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()
LABELS = np.array([[11, 5, 15, 15, 8]], dtype=np.int32)


def _cfg(stage, **kw):
    return DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=stage, ad_loss="cel", **kw)


def _x(b=1, t=3200, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(0, 1, (b, t)).astype(np.float32))


def test_single_toggle_forward_and_loss():
    cfg = _cfg(stage=2)
    model = SingleToggleModel(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "gumbel": jax.random.PRNGKey(1)}, _x())["params"]
    assert params["arbitrator"]["kernel"].shape == (cfg.hidden_size, 2 * cfg.hidden_size)
    out = model.apply({"params": params}, _x(), rngs={"gumbel": jax.random.PRNGKey(2)})
    assert set(np.unique(np.asarray(out.lm_mask))) <= {0.0, 1.0}

    for stage in (1, 2, 3):
        loss, metrics = single_toggle_loss(
            out, jnp.asarray(LABELS), jnp.array([5]), jnp.array([1]),
            cfg.replace(stage=stage))
        assert np.isfinite(float(loss))
    # gradient reaches the arbitrator in stage 2
    def f(p):
        o = model.apply({"params": p}, _x(), rngs={"gumbel": jax.random.PRNGKey(2)})
        return single_toggle_loss(o, jnp.asarray(LABELS), jnp.array([5]),
                                  jnp.array([1]), cfg)[0]
    g = jax.grad(f)(params)
    assert float(jnp.abs(g["arbitrator"]["kernel"]).max()) > 0

    pred = single_toggle_trainable(2)
    assert pred(("arbitrator", "kernel")) and not pred(("lm_head", "kernel"))
    pred3 = single_toggle_trainable(3)
    assert pred3(("lm_head", "kernel")) and not pred3(("backbone", "encoder"))


def test_fsm_forward_and_loss_all_stages():
    cfg = _cfg(stage=1)
    model = FSMModel(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, _x())["params"]
    for name in ("lm_fsm", "dementia_fsm", "lm_grl", "dementia_grl", "similar_fc"):
        assert name in params, name
    out = model.apply({"params": params}, _x())
    assert set(np.unique(np.asarray(out.lm_mask))) <= {0.0, 1.0}
    assert set(np.unique(np.asarray(out.dementia_mask))) <= {0.0, 1.0}

    for stage in (1, 2, 3, 4, 5, 6):
        loss, metrics = fsm_loss(out, jnp.asarray(LABELS), jnp.array([5]),
                                 jnp.array([1]), cfg.replace(stage=stage),
                                 params["similar_fc"]["kernel"])
        assert np.isfinite(float(loss)), stage

    # GRL branch flips gradients: d(ctc_reversed)/d(backbone) must oppose an
    # unreversed copy — check sign flip through the lm_grl head path
    def loss_rev(p):
        o = model.apply({"params": p}, _x())
        return fsm_loss(o, jnp.asarray(LABELS), jnp.array([5]), jnp.array([1]),
                        cfg.replace(stage=4), p["similar_fc"]["kernel"])[0]
    g = jax.grad(loss_rev)(params)
    # stage 4 trains lm_grl only; grads exist there
    assert float(jnp.abs(g["lm_grl"]["kernel"]).max()) > 0

    pred = fsm_trainable(6)
    assert pred(("lm_fsm", "kernel")) and pred(("dementia_fsm", "kernel"))
    assert not pred(("lm_head", "kernel")) and not pred(("backbone", "encoder", "x"))


def test_fsm_masks_have_no_gradient_path():
    """Reproduced reference quirk: '+ 0 * fsm(mask)' is a zero-gradient
    straight-through hack, so FSM params get no gradient from the mask."""
    cfg = _cfg(stage=6)
    model = FSMModel(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)}, _x())["params"]

    def mask_sum(p):
        return jnp.sum(model.apply({"params": p}, _x()).lm_mask)

    g = jax.grad(mask_sum)(params)
    assert float(jnp.abs(g["lm_fsm"]["kernel"]).max()) == 0.0


def test_multitask_heads_and_loss():
    cfg = _cfg(stage=2, num_lms=3)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    params = init_lm_heads_from_lm_head(params, 3)
    np.testing.assert_array_equal(params["lm_heads_0"]["kernel"],
                                  params["lm_head"]["kernel"])

    model = DACSModel(cfg)
    out = model.apply({"params": params}, _x(), rngs={"gumbel": jax.random.PRNGKey(1)})
    assert len(out.extra_logits) == 3
    assert out.extra_logits[0][1].shape[-1] == cfg.backbone.vocab_size

    labels_stack = jnp.asarray(np.stack([LABELS, LABELS, LABELS]))  # [3, 1, 5]
    ll = jnp.full((3, 1), 5, dtype=jnp.int32)
    for stage in (0, 1, 2):
        loss, m = multitask_loss(out, labels_stack, ll, jnp.array([1]),
                                 cfg.replace(stage=stage),
                                 params["similar_fc"]["kernel"])
        assert np.isfinite(float(loss)), stage

    # all heads identical + same labels -> per-head CTC equals single-head CTC
    from privacy_preserve_federated_asr_tpu.ops.ctc import ctc_loss
    lp = jax.nn.log_softmax(out.extra_logits[0][0].astype(jnp.float32), -1)
    single = ctc_loss(lp, jnp.asarray(LABELS), out.frame_lengths, jnp.array([5]))
    _, m0 = multitask_loss(out, labels_stack, ll, jnp.array([1]),
                           cfg.replace(stage=0), params["similar_fc"]["kernel"])
    np.testing.assert_allclose(float(m0["ctc_unmask"]), float(single), rtol=1e-5)

    params2 = copy_first_head_to_lm_head(params)
    np.testing.assert_array_equal(params2["lm_head"]["kernel"],
                                  params["lm_heads_0"]["kernel"])


def test_generate_and_attach_pseudo_labels():
    cfg = _cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    exs = []
    for i in range(3):
        arr = rng.normal(0, 1, 3200).astype(np.float32)
        exs.append(AsrExample(path=f"adrso{i:03d}_PAR_0.wav", array=arr, text=None,
                              dementia_label=0, input_values=arr))
    pseudo = generate_pseudo_labels(cfg, params, exs, TOK, num_lms=2,
                                    batch_size=2, time_multiple=3200)
    assert set(pseudo) == {e.path for e in exs}
    for trs in pseudo.values():
        assert len(trs) == 2
        for text, ids, conf in trs:
            assert isinstance(text, str) and 0.0 <= conf <= 1.0
            assert ids == TOK.encode(text)

    labeled = attach_pseudo_labels(exs, pseudo)
    kept = [e for e in labeled]
    for e in kept:
        assert e.text == pseudo[e.path][0][0]


def test_teacher_transcript_merge(tmp_path):
    from privacy_preserve_federated_asr_tpu.data.teacher import (
        add_transcripts, load_transcripts)

    rng = np.random.default_rng(1)
    exs = [AsrExample(path=f"adrso{i:03d}_PAR_0.wav",
                      array=rng.normal(0, 1, 3200).astype(np.float32),
                      text=None, dementia_label=0) for i in range(3)]
    exs.append(AsrExample(path="short.wav", array=np.zeros(100, np.float32),
                          text=None, dementia_label=0))
    import json
    p = tmp_path / "transcript.json"
    p.write_text(json.dumps({"adrso000_PAR_0.wav": "hello there",
                             "adrso001_PAR_0.wav": "",
                             "adrso002_PAR_0.wav": "ok go",
                             "short.wav": "too short"}))
    trs = load_transcripts(str(p))
    out = add_transcripts(exs, trs, TOK)
    assert [e.path for e in out] == ["adrso000_PAR_0.wav", "adrso002_PAR_0.wav"]
    assert out[0].text == "HELLO THERE"  # uppercased
    assert out[0].labels is not None


def test_dacs_with_sewd_backbone_smoke():
    """DACS heads + toggling masks over the SEW-D encoder (model_type switch)."""
    cfg = DACSConfig(
        backbone=BackboneConfig(
            model_type="sew-d", hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            conv_dim=(16, 24), conv_kernel=(10, 3), conv_stride=(5, 2),
            conv_bias=False, feat_extract_norm="group",
            pos_conv_type="single", num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, squeeze_factor=2,
            position_buckets=16, relative_attention=True,
            pos_att_type=("p2c", "c2p"), norm_rel_ebd="layer_norm",
            hidden_act="gelu_python",
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    model = DACSModel(cfg)
    out = model.apply({"params": params}, _x(b=2),
                      rngs={"gumbel": jax.random.PRNGKey(1)})
    assert out.logits.shape[-1] == cfg.backbone.vocab_size
    from privacy_preserve_federated_asr_tpu.models.objectives import dacs_loss
    labels = jnp.asarray(np.tile(LABELS, (2, 1)))
    loss, _ = dacs_loss(out, labels, jnp.array([5, 5]), jnp.array([1, 0]), cfg,
                        params["similar_fc"]["kernel"])
    assert np.isfinite(float(loss))


def test_transcribe_with_ctc_model_teacher():
    from privacy_preserve_federated_asr_tpu.data.teacher import (
        add_transcripts, transcribe_with_ctc_model)

    cfg = _cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.default_rng(2)
    exs = [AsrExample(path=f"adrso{i:03d}_PAR_0.wav",
                      array=rng.normal(0, 1, 3200).astype(np.float32),
                      text=None, dementia_label=0) for i in range(3)]
    for e in exs:
        e.input_values = e.array
    trs = transcribe_with_ctc_model(cfg, params, exs, TOK, batch_size=2,
                                    time_multiple=3200)
    assert set(trs) == {e.path for e in exs}
    # merge only keeps non-empty teacher transcripts
    out = add_transcripts(exs, trs, TOK)
    for e in out:
        assert e.text and e.labels is not None


def test_multitask_local_update_end_to_end():
    """The unsupervised N-best client update runs end to end: pseudo-label,
    train the N heads, copy head 0 back; trained params change."""
    from privacy_preserve_federated_asr_tpu.federated.multitask import (
        multitask_local_update)

    cfg = _cfg(stage=0, num_lms=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(9))
    rng = np.random.default_rng(3)
    exs = [AsrExample(path=f"adrso{i:03d}_PAR_0.wav",
                      array=rng.normal(0, 1, 3200).astype(np.float32),
                      text=None, dementia_label=i % 2,
                      input_values=rng.normal(0, 1, 3200).astype(np.float32))
           for i in range(4)]
    out, losses = multitask_local_update(
        cfg, params, exs, TOK, num_epochs=1, batch_size=2,
        time_multiple=3200, learning_rate=1e-4, warmup_steps=1)
    assert losses and all(np.isfinite(l) for l in losses)
    # lm_head got the trained 1-best head back
    np.testing.assert_array_equal(np.asarray(out["lm_head"]["kernel"]),
                                  np.asarray(out["lm_heads_0"]["kernel"]))
    # pseudo transcripts may be empty for a random model; heads still exist
    assert "lm_heads_1" in out
