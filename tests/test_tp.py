"""Tensor parallelism: Megatron-style encoder sharding over a "model" mesh
axis (parallel/tp.py) must reproduce single-device training exactly (up to
fp32 reduction order) — GSPMD partitions the matmuls and inserts the
col->row all-reduces; no hand-written collectives to get wrong."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from privacy_preserve_federated_asr_tpu.data.audio import normalize_input_values
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.parallel.tp import (
    tp_partition_spec,
    tp_shardings,
    validate_tp_divisibility,
)
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _tiny_cfg(stage=0):
    return DACSConfig(backbone=BackboneConfig.tiny_for_tests(
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        final_dropout=0.0), stage=stage, ad_loss="cel")


def _examples(n, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        sig = rng.normal(0, 1, 3200).astype(np.float32)
        text = ["HI", "OK GO", "NO", "YES SIR"][i % 4]
        out.append(AsrExample(
            path=f"S{i:03d}_PAR_0_{i}.wav", array=sig, text=text,
            dementia_label=i % 2, input_values=normalize_input_values(sig),
            labels=np.asarray(TOK.encode(text), dtype=np.int32)))
    return out


def test_tp_partition_spec_rules():
    # column-parallel: output features sharded
    assert tp_partition_spec(("a", "q_proj", "kernel"), 2) == P(None, "model")
    assert tp_partition_spec(("a", "v_proj", "bias"), 1) == P("model")
    assert tp_partition_spec(("a", "intermediate_dense", "kernel"), 2) == \
        P(None, "model")
    # scan-layers layout: leading stacked-layer dim stays unsharded
    assert tp_partition_spec(("s", "q_proj", "kernel"), 3) == \
        P(None, None, "model")
    assert tp_partition_spec(("s", "intermediate_dense", "bias"), 2) == \
        P(None, "model")
    # row-parallel: input features sharded, bias replicated
    assert tp_partition_spec(("a", "out_proj", "kernel"), 2) == P("model", None)
    assert tp_partition_spec(("a", "output_dense", "kernel"), 3) == \
        P(None, "model", None)
    assert tp_partition_spec(("a", "out_proj", "bias"), 1) == P()
    # everything else replicated
    assert tp_partition_spec(("a", "layer_norm", "scale"), 1) == P()
    assert tp_partition_spec(("lm_head", "kernel"), 2) == P()
    assert tp_partition_spec(("step",), 0) == P()


def test_tp_shardings_covers_state_tree():
    cfg = _tiny_cfg()
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    sh = tp_shardings(mesh, params)
    flat = jax.tree.leaves(sh)
    assert len(flat) == len(jax.tree.leaves(params))
    enc = sh["backbone"]["encoder"]["layers_0"]
    assert enc["attention"]["q_proj"]["kernel"].spec == P(None, "model")
    assert enc["attention"]["out_proj"]["kernel"].spec == P("model", None)
    assert enc["feed_forward"]["intermediate_dense"]["bias"].spec == P("model")
    assert sh["lm_head"]["kernel"].spec == P()


def test_validate_tp_divisibility():
    bb = BackboneConfig.tiny_for_tests()  # D=32, I=64, H=4
    validate_tp_divisibility(bb, 2)
    validate_tp_divisibility(bb, 4)
    with pytest.raises(ValueError, match="num_attention_heads"):
        validate_tp_divisibility(bb, 8)


def test_trainer_tp_matches_single_device():
    """tp=2 (encoder Megatron-sharded over a "model" mesh) must reproduce
    single-device training."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (run under the 8-virtual-CPU env)")
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(5))
    exs = _examples(8, seed=5)
    base = dict(num_epochs=2, batch_size=4, time_multiple=3200,
                warmup_steps=1, logging_steps=1000, learning_rate=1e-4)

    tr1 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base))
    p1 = jax.device_get(tr1.train().params)
    tr2 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base, tp=2))
    p2 = jax.device_get(tr2.train().params)
    for path in (("lm_head", "kernel"),
                 ("backbone", "encoder", "layers_0", "attention", "q_proj",
                  "kernel"),
                 ("backbone", "encoder", "layers_0", "feed_forward",
                  "output_dense", "kernel")):
        a, b = p1, p2
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg="/".join(path))


def test_trainer_dp_times_tp_matches_single_device():
    """Combined dp=2 x tp=2 over a ("data", "model") mesh == single device."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (run under the 8-virtual-CPU env)")
    cfg = _tiny_cfg(stage=2)  # full DACS loss incl. gumbel + GRL + AM-softmax
    params = init_dacs_params(cfg, jax.random.PRNGKey(7))
    exs = _examples(8, seed=7)
    base = dict(num_epochs=1, batch_size=4, time_multiple=3200,
                warmup_steps=1, logging_steps=1000, learning_rate=1e-4,
                cache_encoder=False)

    tr1 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base))
    p1 = jax.device_get(tr1.train().params)
    tr2 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base, dp=2, tp=2))
    p2 = jax.device_get(tr2.train().params)
    arb1, arb2 = p1["arbitrator"]["kernel"], p2["arbitrator"]["kernel"]
    np.testing.assert_allclose(np.asarray(arb2), np.asarray(arb1),
                               rtol=2e-4, atol=1e-6)


def test_tp_rejects_pallas_attention():
    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(
        attention_impl="pallas"), stage=0)
    params = init_dacs_params(
        DACSConfig(backbone=BackboneConfig.tiny_for_tests(), stage=0),
        jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="Pallas"):
        Trainer(cfg, params, _examples(4), None, TOK, TrainerConfig(tp=2))
