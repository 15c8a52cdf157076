"""Int8 (dynamic W8A8) inference-path tests: quantizer numerics, the Dense
dot_general drop-in, backbone output closeness to the fp path, and the
inference-only guard rails."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import (
    BackboneConfig,
    DACSConfig,
)
from privacy_preserve_federated_asr_tpu.ops.quant import (
    int8_dense_dot_general,
    quantize_symmetric,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params


def test_quantize_symmetric_roundtrip_error_bound():
    x = jnp.asarray(np.random.default_rng(0).normal(0, 3, (8, 64)), jnp.float32)
    q, scale = quantize_symmetric(x, axis=-1)
    assert q.dtype == jnp.int8
    # symmetric rounding error is at most half a quantization step per entry
    err = np.abs(np.asarray(q, np.float32) * np.asarray(scale) - np.asarray(x))
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


def test_quantize_symmetric_zero_row_safe():
    x = jnp.zeros((2, 16), jnp.float32)
    q, scale = quantize_symmetric(x, axis=-1)
    assert np.isfinite(np.asarray(scale)).all()
    assert (np.asarray(q) == 0).all()


def test_int8_dot_general_matches_fp_within_tolerance():
    rng = np.random.default_rng(1)
    lhs = jnp.asarray(rng.normal(0, 1, (3, 17, 64)), jnp.float32)
    rhs = jnp.asarray(rng.normal(0, 0.05, (64, 48)), jnp.float32)
    dims = (((2,), (0,)), ((), ()))
    got = int8_dense_dot_general(lhs, rhs, dims)
    want = lax.dot_general(lhs, rhs, dims)
    rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
    assert rel < 0.02, rel


def test_int8_dot_general_non_dense_pattern_falls_back_exact():
    # batched matmul (not the Dense pattern): must route to lax untouched
    rng = np.random.default_rng(2)
    lhs = jnp.asarray(rng.normal(0, 1, (2, 5, 8)), jnp.float32)
    rhs = jnp.asarray(rng.normal(0, 1, (2, 8, 3)), jnp.float32)
    dims = (((2,), (1,)), ((0,), (0,)))
    np.testing.assert_array_equal(
        int8_dense_dot_general(lhs, rhs, dims), lax.dot_general(lhs, rhs, dims))


def _tiny_cfg(**kw):
    return DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0, **kw),
        stage=2, ad_loss="cel")


def test_backbone_int8_forward_close_to_fp():
    """dense_impl='int8' swaps every projection/FFN matmul; the model output
    must stay close to the fp forward (same params, same input)."""
    from privacy_preserve_federated_asr_tpu.models.recipes import get_recipe

    cfg = _tiny_cfg()
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    iv = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 3200)),
                     jnp.float32)
    outs = {}
    for compute in ("float32", "int8"):
        ccfg, dtype = cfg.resolve_compute(compute)
        model = get_recipe(ccfg.method).make_model(ccfg, dtype=jnp.float32)
        out = model.apply({"params": params}, iv, deterministic=True,
                          rngs={"gumbel": jax.random.PRNGKey(0)})
        outs[compute] = np.asarray(out.hidden_states, np.float32)
    a, b = outs["float32"], outs["int8"]
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos


def test_sewd_int8_forward_close_to_fp():
    """The SEW-D backbone has its own Dense layers (disentangled attention
    projections, squeeze/upsample); dense_impl='int8' must cover them too."""
    from privacy_preserve_federated_asr_tpu.models.sewd import SEWDBackbone

    cfg = BackboneConfig(
        model_type="sew-d", hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 24), conv_kernel=(10, 3, 1), conv_stride=(5, 2, 1),
        conv_bias=False, feat_extract_norm="group",
        pos_conv_type="single", num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        squeeze_factor=2, position_buckets=16, relative_attention=True,
        pos_att_type=("p2c", "c2p"), norm_rel_ebd="layer_norm",
        max_position_embeddings=64, layer_norm_eps=1e-7,
        feature_layer_norm_eps=1e-5, hidden_act="gelu_python",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0,
    )
    iv = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 3200)),
                     jnp.float32)
    model = SEWDBackbone(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), iv)["params"]
    a = np.asarray(model.apply({"params": params}, iv, deterministic=True))
    model8 = SEWDBackbone(cfg.replace(dense_impl="int8"), dtype=jnp.float32)
    b = np.asarray(model8.apply({"params": params}, iv, deterministic=True))
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos


def test_resolve_compute_int8_sets_dense_impl_and_bf16():
    cfg = _tiny_cfg()
    ccfg, dtype = cfg.resolve_compute("int8")
    assert ccfg.backbone.dense_impl == "int8" and dtype == jnp.bfloat16
    ccfg, dtype = cfg.resolve_compute("float32")
    assert ccfg.backbone.dense_impl == "fp" and dtype == jnp.float32


def test_trainer_rejects_int8():
    from privacy_preserve_federated_asr_tpu.train.trainer import (
        Trainer,
        TrainerConfig,
    )

    cfg = _tiny_cfg()
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="training requires"):
        Trainer(cfg.replace(backbone=cfg.backbone.replace(dense_impl="int8")),
                params, [], None, CTCCharTokenizer(), TrainerConfig())
    with pytest.raises(ValueError, match="training requires"):
        Trainer(cfg, params, [], None, CTCCharTokenizer(),
                TrainerConfig(compute_dtype="int8"))


# --- int8_train (SwitchBack custom-VJP, ops/quant.py) ---------------------


def test_int8_train_forward_matches_int8_inference():
    """The trainable dot's forward is the SAME dynamic-W8A8 math as the
    inference dot — serving a model trained with int8_train under the int8
    inference path is exact."""
    from privacy_preserve_federated_asr_tpu.ops.quant import (
        int8_train_dense_dot_general,
    )

    rng = np.random.default_rng(4)
    lhs = jnp.asarray(rng.normal(0, 1, (3, 17, 64)), jnp.float32)
    rhs = jnp.asarray(rng.normal(0, 0.05, (64, 48)), jnp.float32)
    dims = (((2,), (0,)), ((), ()))
    np.testing.assert_array_equal(
        int8_train_dense_dot_general(lhs, rhs, dims),
        int8_dense_dot_general(lhs, rhs, dims))


def test_int8_train_gradients_close_to_fp():
    """SwitchBack gradients: grad_weight is exact compute-dtype math on the
    un-quantized operands; grad_input is int8-quantized. Both must stay
    directionally aligned with the fp path's gradients."""
    from privacy_preserve_federated_asr_tpu.ops.quant import (
        int8_train_dense_dot_general,
    )

    rng = np.random.default_rng(5)
    lhs = jnp.asarray(rng.normal(0, 1, (4, 33, 64)), jnp.float32)
    rhs = jnp.asarray(rng.normal(0, 0.05, (64, 48)), jnp.float32)
    dims = (((2,), (0,)), ((), ()))

    def loss(dot):
        return lambda a, w: 0.5 * (dot(a, w, dims) ** 2).sum()

    g_q = jax.grad(loss(int8_train_dense_dot_general), argnums=(0, 1))(lhs, rhs)
    g_fp = jax.grad(loss(lax.dot_general), argnums=(0, 1))(lhs, rhs)
    for got, want in zip(g_q, g_fp):
        a, b = np.asarray(got, np.float64).ravel(), np.asarray(
            want, np.float64).ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.99, cos


def test_int8_train_non_dense_pattern_differentiable_exact():
    from privacy_preserve_federated_asr_tpu.ops.quant import (
        int8_train_dense_dot_general,
    )

    rng = np.random.default_rng(6)
    lhs = jnp.asarray(rng.normal(0, 1, (2, 5, 8)), jnp.float32)
    rhs = jnp.asarray(rng.normal(0, 1, (2, 8, 3)), jnp.float32)
    dims = (((2,), (1,)), ((0,), (0,)))
    f_q = lambda a, w: int8_train_dense_dot_general(a, w, dims).sum()
    f_fp = lambda a, w: lax.dot_general(a, w, dims).sum()
    np.testing.assert_array_equal(f_q(lhs, rhs), f_fp(lhs, rhs))
    for got, want in zip(jax.grad(f_q, (0, 1))(lhs, rhs),
                         jax.grad(f_fp, (0, 1))(lhs, rhs)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6)


def test_trainer_accepts_int8_train_and_steps():
    """dense_impl='int8_train' trains: two steps on tiny data produce a
    finite, changing loss and updated params."""
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.train.trainer import (
        Trainer,
        TrainerConfig,
    )

    tok = CTCCharTokenizer()
    cfg = _tiny_cfg().replace(stage=0)
    cfg = cfg.replace(backbone=cfg.backbone.replace(dense_impl="int8_train"))
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(7)
    examples = []
    for i in range(4):
        arr = rng.normal(0, 0.3, 3200).astype(np.float32)
        text = ["HI", "OK GO"][i % 2]
        examples.append(AsrExample(
            path=f"S{i:03d}_PAR_0_0.wav", array=arr, text=text,
            dementia_label=i % 2, input_values=arr,
            labels=np.asarray(tok.encode(text), dtype=np.int32)))
    tr = Trainer(cfg, params, examples, None, tok,
                 TrainerConfig(num_epochs=1, batch_size=2,
                               time_multiple=3200, warmup_steps=1,
                               logging_steps=10**6, cache_encoder=False))
    before = [np.asarray(x).copy()
              for x in jax.tree_util.tree_leaves(tr.state.params)]
    tr.train()
    after = [np.asarray(x) for x in jax.tree_util.tree_leaves(tr.state.params)]
    assert all(np.isfinite(x).all() for x in after)
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_int8_train_learns_ctc_to_zero_wer(tmp_path):
    """Learning proof for the quantized training path: stage-0 CTC
    fine-tuning with SwitchBack int8 matmuls reaches WER 0 on the same
    tone-coded synthetic speech as the fp proof (tests/test_learning.py) —
    the straight-through estimator is good enough to converge, not just to
    produce finite gradients."""
    from privacy_preserve_federated_asr_tpu.train.trainer import (
        Trainer,
        TrainerConfig,
    )

    from tests.test_learning import _BB, _make_examples

    exs = _make_examples()
    cfg = DACSConfig(
        backbone=_BB.replace(dense_impl="int8_train"), stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    tr = Trainer(cfg, params, exs, exs, CTCCharTokenizer(), TrainerConfig(
        num_epochs=70, batch_size=8, time_multiple=3200,
        learning_rate=1e-3, warmup_steps=20, logging_steps=10**6,
        eval_steps=10**6, log_dir=str(tmp_path)))
    tr.train()
    ev = tr.evaluate()
    assert ev["eval_wer"] == 0.0, ev


def test_federated_engine_runs_int8_train_round():
    """cli federated --int8 path: the jitted FL round (vmap local scan +
    FedAvg + graft) runs with SwitchBack int8 matmuls and moves the
    stage network finitely."""
    from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
    from privacy_preserve_federated_asr_tpu.federated import (
        FederatedConfig,
        FederatedEngine,
    )

    tok = CTCCharTokenizer()
    cfg = _tiny_cfg().replace(stage=0)
    cfg = cfg.replace(backbone=cfg.backbone.replace(dense_impl="int8_train"))
    params = init_dacs_params(cfg, jax.random.PRNGKey(42))

    def mk(n, seed):
        rng = np.random.default_rng(seed)
        out = []
        for i in range(n):
            arr = rng.normal(0, 0.3, 3200).astype(np.float32)
            text = ["HI", "OK GO"][i % 2]
            out.append(AsrExample(
                path=f"S{seed}{i:02d}_PAR_0_0.wav", array=arr, text=text,
                dementia_label=i % 2, input_values=arr,
                labels=np.asarray(tok.encode(text), dtype=np.int32)))
        return out

    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, batch_size=2,
        time_multiple=3200, warmup_steps=1)
    eng = FederatedEngine(cfg, fcfg, {0: mk(4, 1), 1: mk(4, 2)},
                          mk(4, 3), None, tok, params)
    before = jax.tree.map(np.array, eng.global_params)
    after = eng.run_rounds(stage=0, num_rounds=1)
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = [np.asarray(x) for x in jax.tree_util.tree_leaves(after)]
    assert all(np.isfinite(x).all() for x in flat_a)
    assert any(not np.allclose(b, a) for b, a in zip(flat_b, flat_a))


def test_serving_engine_int8_smoke():
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine,
        ServingConfig,
    )

    cfg = _tiny_cfg()
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(
        cfg, params, CTCCharTokenizer(),
        ServingConfig(batch_size=2, time_multiple=3200, max_seconds=1.0,
                      compute_dtype="int8"))
    res = eng.infer_batch([np.random.default_rng(0)
                           .normal(0, 0.3, 3200).astype(np.float32)])[0]
    assert res.ad_pred in (0, 1) and res.frames > 0
