"""Sequence parallelism (parallel/sp.py): the time-sharded stack must
reproduce the single-device model exactly — forward, and training through
the sharded backward — and the sharding must be PHYSICAL (each "seq"
device holds T/seq frames of the stack activations; replication cannot
masquerade as SP, the lesson of round 2's ``data``-axis finding)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from privacy_preserve_federated_asr_tpu.data.audio import normalize_input_values
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
from privacy_preserve_federated_asr_tpu.models.port import stack_scan_layers
from privacy_preserve_federated_asr_tpu.parallel.sp import (
    make_sp_forward,
    make_sp_stack,
)
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _cfg(stage=2, layers=4, **bkw):
    return DACSConfig(backbone=BackboneConfig.tiny_for_tests(
        num_hidden_layers=layers, hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, final_dropout=0.0, **bkw),
        stage=stage, ad_loss="cel")


def _stacked(params, cfg):
    out = dict(params)
    out["backbone"] = stack_scan_layers(
        dict(params["backbone"]), cfg.backbone.num_hidden_layers)
    return out


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


def _mesh(dp, sp):
    n = dp * sp
    if len(jax.devices()) < n:
        pytest.skip(f"needs >= {n} devices (run under the 8-virtual-CPU env)")
    return Mesh(np.array(jax.devices()[:n]).reshape(dp, sp), ("data", "seq"))


@pytest.mark.parametrize("dp,sp", [(1, 2), (2, 2)])
def test_sp_forward_matches_vanilla(dp, sp):
    """Deterministic sequence-parallel forward == the plain model, for every
    output the losses consume."""
    mesh = _mesh(dp, sp)
    cfg = _cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    model = DACSModel(cfg)
    b = 4
    rng = np.random.default_rng(1)
    iv = jnp.asarray(rng.normal(0, 1, (b, 3200)).astype(np.float32))
    il = jnp.asarray([3200, 2000, 2613, 1600], jnp.int32)
    gk = {"gumbel": jax.random.PRNGKey(3)}

    ref = model.apply({"params": params}, iv, il, deterministic=True, rngs=gk)
    fwd = make_sp_forward(model, mesh)
    got = jax.jit(lambda p, iv, il: fwd(p, iv, il, deterministic=True,
                                        rngs=gk))(_stacked(params, cfg), iv, il)

    for name in ("logits", "logits_r", "logits_unmask", "hidden_states",
                 "dementia_logits_lm", "dementia_logits_ad", "lm_mask",
                 "ad_mask"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), np.asarray(getattr(ref, name)),
            rtol=2e-5, atol=1e-5, err_msg=name)
    np.testing.assert_array_equal(np.asarray(got.frame_lengths),
                                  np.asarray(ref.frame_lengths))


def test_sp_stack_is_physically_time_sharded():
    """PROOF of sharding: run the sp stack WITHOUT the exit gather and check
    the carry's addressable shards each hold exactly T/seq frames — the
    lesson of round 2 (a numerics test alone is satisfied by replication)."""
    mesh = _mesh(1, 2)
    cfg = _cfg(stage=2)
    bcfg = cfg.backbone
    model = DACSModel(cfg)
    params = _stacked(init_dacs_params(cfg, jax.random.PRNGKey(0)), cfg)
    lp = params["backbone"]["encoder"]["layers_scan"]["layer"]
    b, t, d = 2, 16, bcfg.hidden_size
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (b, t, d)),
                    jnp.float32)
    fm = jnp.ones((b, t), jnp.int32)

    stack = make_sp_stack(bcfg, jnp.float32, mesh)

    # the INSIDE layout: jit a probe that stops before the exit constraint
    from privacy_preserve_federated_asr_tpu.models.backbone import EncoderLayer

    layer = EncoderLayer(bcfg, jnp.float32)
    from jax.sharding import NamedSharding

    inside = NamedSharding(mesh, P(None, "seq", None))

    def probe(lp, x, fm):
        bias = jnp.where(fm[:, None, None, :].astype(bool), 0.0, -1e9)
        y = jax.lax.with_sharding_constraint(x, inside)

        def body(carry, lpi):
            out = layer.apply({"params": lpi}, carry, bias, True, fm)
            return jax.lax.with_sharding_constraint(out, inside), None

        y, _ = jax.lax.scan(body, y, lp)
        return y

    y = jax.jit(probe)(lp, x, fm)
    assert y.sharding.spec == P(None, "seq"), y.sharding
    shard_shapes = {s.data.shape for s in y.addressable_shards}
    assert shard_shapes == {(b, t // 2, d)}, shard_shapes

    # and the full stack_fn exits re-gathered (downstream = vanilla layout)
    out = jax.jit(lambda lp, x, fm: stack(
        lp, x, fm, jax.random.PRNGKey(0), True))(lp, x, fm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(y),
                               rtol=1e-6, atol=1e-6)
    assert all(s.data.shape == (b, t, d) for s in out.addressable_shards)


def test_sp_lowered_runs_half_time_blocks():
    """The optimized HLO really computes on T/2 frame tiles inside the scan
    (per-device FFN matmuls at [B, T/2, D]) — sequence sharding survived
    GSPMD propagation end-to-end."""
    mesh = _mesh(1, 2)
    cfg = _cfg(stage=2)
    bcfg = cfg.backbone
    model = DACSModel(cfg)
    params = _stacked(init_dacs_params(cfg, jax.random.PRNGKey(0)), cfg)
    lp = params["backbone"]["encoder"]["layers_scan"]["layer"]
    b, t, d = 2, 16, bcfg.hidden_size
    x = jnp.zeros((b, t, d), jnp.float32)
    fm = jnp.ones((b, t), jnp.int32)
    stack = make_sp_stack(bcfg, jnp.float32, mesh)
    txt = jax.jit(lambda lp, x, fm: stack(
        lp, x, fm, jax.random.PRNGKey(0), True)
    ).lower(lp, x, fm).compile().as_text()
    # per-device FFN-up matmul output at T/2 rows (flattened or not), fp32
    assert (f"f32[{b * t // 2},{bcfg.intermediate_size}]" in txt
            or f"f32[{b},{t // 2},{bcfg.intermediate_size}]" in txt), \
        "no half-time FFN tile in the lowered stack"
    assert "all-gather" in txt or "all-to-all" in txt or \
        "collective-permute" in txt, "no cross-seq collective in the stack"


def test_trainer_sp_matches_single_device():
    """sp=2 training (sharded forward AND backward) == single device —
    stage 0, so gradients flow through every sharded layer."""
    _mesh(1, 2)  # skip early on 1-device runs
    cfg = _cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(5))
    exs = _examples(8, seed=5)
    base = dict(num_epochs=2, batch_size=4, time_multiple=3200,
                warmup_steps=1, logging_steps=1000, learning_rate=1e-4,
                scan_layers=True)

    tr1 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base))
    p1 = jax.device_get(tr1.train().params)
    tr2 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base, sp=2, cache_frontend=False))
    p2 = jax.device_get(tr2.train().params)
    for path in (("lm_head", "kernel"),
                 ("backbone", "encoder", "layers_scan", "layer", "attention",
                  "q_proj", "kernel"),
                 ("backbone", "encoder", "layers_scan", "layer",
                  "feed_forward", "output_dense", "kernel"),
                 ("backbone", "feature_projection", "projection", "kernel")):
        a, b = p1, p2
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg="/".join(path))


def test_trainer_dp_times_sp_matches_single_device():
    """dp=2 x sp=2 over a ("data", "seq") mesh: batch rows sharded over
    "data" while stack activations shard time over "seq" — must equal
    single-device training."""
    _mesh(2, 2)
    cfg = _cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(9))
    exs = _examples(8, seed=9)
    base = dict(num_epochs=1, batch_size=4, time_multiple=3200,
                warmup_steps=1, logging_steps=1000, learning_rate=1e-4,
                scan_layers=True)

    tr1 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base))
    p1 = jax.device_get(tr1.train().params)
    tr2 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base, dp=2, sp=2, cache_frontend=False))
    p2 = jax.device_get(tr2.train().params)
    for path in (("lm_head", "kernel"),
                 ("backbone", "encoder", "layers_scan", "layer", "attention",
                  "q_proj", "kernel")):
        a, b = p1, p2
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg="/".join(path))


def test_trainer_sp_validation():
    cfg = _cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    exs = _examples(4)
    with pytest.raises(ValueError, match="scan_layers"):
        Trainer(cfg, params, exs, None, TOK, TrainerConfig(sp=2))
    with pytest.raises(ValueError, match="composes with dp only"):
        Trainer(cfg, params, exs, None, TOK,
                TrainerConfig(sp=2, tp=2, scan_layers=True))
    with pytest.raises(ValueError, match="composes with dp only"):
        Trainer(cfg, params, exs, None, TOK,
                TrainerConfig(sp=2, pp=2, scan_layers=True))
    cfgp = _cfg(stage=0, attention_impl="pallas")
    with pytest.raises(ValueError, match="opaque to GSPMD"):
        Trainer(cfgp, init_dacs_params(cfgp, jax.random.PRNGKey(0)), exs,
                None, TOK, TrainerConfig(sp=2, scan_layers=True))
