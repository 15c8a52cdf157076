"""Pipeline parallelism (parallel/pp.py): the GPipe pipeline over a "pipe"
mesh axis must reproduce the single-device model exactly — forward, and
training through the pipelined backward — and the lowered program must
actually contain the collective-permute ring (pipelining can't silently
degrade to replication)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from privacy_preserve_federated_asr_tpu.data.audio import normalize_input_values
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
from privacy_preserve_federated_asr_tpu.models.port import stack_scan_layers
from privacy_preserve_federated_asr_tpu.parallel.pp import (
    make_pp_forward,
    validate_pp,
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


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs >= {n} devices (run under the 8-virtual-CPU env)")
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


def test_validate_pp():
    bb = BackboneConfig.tiny_for_tests(num_hidden_layers=4)
    validate_pp(bb, 2, batch_size=4, num_microbatches=2)
    with pytest.raises(ValueError, match="num_hidden_layers"):
        validate_pp(bb, 3, batch_size=4, num_microbatches=3)
    with pytest.raises(ValueError, match="never fill"):
        validate_pp(bb, 4, batch_size=4, num_microbatches=2)
    with pytest.raises(ValueError, match="batch_size"):
        validate_pp(bb, 2, batch_size=5, num_microbatches=2)


@pytest.mark.parametrize("pp,micro", [(2, 2), (4, 4), (2, 4)])
def test_pp_forward_matches_vanilla(pp, micro):
    """Deterministic pipelined forward == the plain model, for every output
    the losses consume, across stage counts and microbatch splits."""
    mesh = _mesh(pp)
    cfg = _cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    model = DACSModel(cfg)
    b = 4
    rng = np.random.default_rng(1)
    iv = jnp.asarray(rng.normal(0, 1, (b, 3200)).astype(np.float32))
    il = jnp.asarray([3200, 2000, 2613, 1600], jnp.int32)
    gk = {"gumbel": jax.random.PRNGKey(3)}

    ref = model.apply({"params": params}, iv, il, deterministic=True, rngs=gk)
    fwd = make_pp_forward(model, mesh, num_microbatches=micro)
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


def test_trainer_pp_matches_single_device():
    """pp=2 training (pipelined forward AND backward) == single device —
    stage 0, so gradients flow through every pipelined layer."""
    mesh = _mesh(2)  # skip early on 1-device runs
    del mesh
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
                  TrainerConfig(**base, pp=2, cache_frontend=False))
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


def test_trainer_dp_times_pp_matches_single_device():
    """dp=2 x pp=2 over a ("data", "pipe") mesh: batch rows GSPMD-sharded
    over "data" while the layer stack pipelines over "pipe" — must equal
    single-device training."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (run under the 8-virtual-CPU env)")
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
                  TrainerConfig(**base, dp=2, pp=2, pp_microbatches=2,
                                cache_frontend=False))
    p2 = jax.device_get(tr2.train().params)
    for path in (("lm_head", "kernel"),
                 ("backbone", "encoder", "layers_scan", "layer", "attention",
                  "q_proj", "kernel")):
        a, b = p1, p2
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-6, err_msg="/".join(path))


def test_pp_lowered_contains_permute_ring():
    """The lowered pipeline really is a pipeline: layer params arrive
    pre-sharded over "pipe" (no all-gather materializes the full stack) and
    activations move by collective-permute."""
    mesh = _mesh(2)
    cfg = _cfg(stage=2)
    params = _stacked(init_dacs_params(cfg, jax.random.PRNGKey(0)), cfg)
    model = DACSModel(cfg)
    fwd = make_pp_forward(model, mesh, num_microbatches=2)
    iv = jnp.zeros((4, 3200), jnp.float32)
    il = jnp.full((4,), 3200, jnp.int32)
    txt = jax.jit(
        lambda p, iv, il: fwd(p, iv, il, deterministic=True,
                              rngs={"gumbel": jax.random.PRNGKey(0)})
    ).lower(params, iv, il).compile().as_text()
    assert "collective-permute" in txt


def test_trainer_pp_validation():
    cfg = _cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    exs = _examples(4)
    with pytest.raises(ValueError, match="scan_layers"):
        Trainer(cfg, params, exs, None, TOK, TrainerConfig(pp=2))
    with pytest.raises(ValueError, match="tp x pp"):
        Trainer(cfg, params, exs, None, TOK,
                TrainerConfig(pp=2, tp=2, scan_layers=True))
    with pytest.raises(ValueError, match="num_hidden_layers"):
        Trainer(cfg, params, exs, None, TOK,
                TrainerConfig(pp=3, scan_layers=True))
