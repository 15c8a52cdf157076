"""FedProx (train/optim.py proximal_term) and FedOpt server optimizers
(FederatedConfig.server_optimizer): proximal-gradient math, drift damping
through the engine, FedAvgM/FedAdam round behavior, and the vanishing-knob
equivalences with reference FedAvg."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.federated import FederatedConfig
from privacy_preserve_federated_asr_tpu.train.optim import proximal_term

from tests.test_dp import _engine


def test_proximal_term_gradient_math():
    mu = 0.3
    tx = proximal_term(mu)
    ref = {"w": jnp.array([1.0, -2.0]), "b": jnp.array([0.5])}
    state = tx.init(ref)
    w = {"w": jnp.array([1.5, -2.5]), "b": jnp.array([0.5])}
    g = {"w": jnp.array([0.1, 0.2]), "b": jnp.array([1.0])}
    updates, state2 = tx.update(g, state, w)
    np.testing.assert_allclose(
        np.asarray(updates["w"]),
        np.asarray(g["w"]) + mu * (np.asarray(w["w"]) - np.asarray(ref["w"])),
        rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["b"]), np.asarray(g["b"]),
                               rtol=1e-6)  # w == ref -> pure gradient
    with pytest.raises(ValueError, match="params"):
        tx.update(g, state)


def test_proximal_term_caps_drift_under_constant_pull():
    """Under a constant external gradient, FedProx equilibrates where
    ``mu * (w - ref) = -g`` — the drift is capped at ``|g|/mu`` — while the
    vanilla optimizer keeps walking ~lr per step."""
    import optax

    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer

    ref = {"w": jnp.zeros((8,), jnp.float32)}
    g = {"w": jnp.ones((8,), jnp.float32)}

    def drift(mu):
        tx = make_optimizer(ref, stage=2, learning_rate=1e-3,
                            trainable_pred=lambda p: True, fedprox_mu=mu)
        w, st = ref, tx.init(ref)
        for _ in range(40):
            updates, st = tx.update(g, st, w)
            w = optax.apply_updates(w, updates)
        return float(np.abs(np.asarray(w["w"])).max())

    d_vanilla = drift(0.0)
    d_prox = drift(1000.0)
    assert d_vanilla > 0.02          # ~40 * lr of steady walking
    assert d_prox < 0.005            # capped near |g|/mu = 1e-3


def test_engine_fedprox_reaches_the_local_optimizer():
    """--fedprox_mu must change the round aggregate (the knob is wired
    through the jitted round), deterministically, touching only the stage
    network."""

    def run(mu):
        eng = _engine(seed=0)
        eng.fcfg = dataclasses.replace(eng.fcfg, fedprox_mu=mu, local_ep=3)
        eng.run_rounds(stage=2, num_rounds=1)
        return eng.global_params

    prox_a = run(1e3)
    prox_b = run(1e3)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        prox_a, prox_b)
    vanilla = run(0.0)
    diff = np.abs(np.asarray(prox_a["arbitrator"]["kernel"], np.float32) -
                  np.asarray(vanilla["arbitrator"]["kernel"], np.float32)).max()
    assert diff > 0
    np.testing.assert_array_equal(np.asarray(prox_a["lm_head"]["kernel"]),
                                  np.asarray(vanilla["lm_head"]["kernel"]))


def test_server_momentum_vanishing_equals_vanilla():
    """server_optimizer=momentum with lr=1, momentum=0 IS plain FedAvg:
    the server step applies the whole delta once."""
    plain = _engine(seed=0)
    plain.run_rounds(stage=2, num_rounds=1)
    srv = _engine(seed=0)
    srv.fcfg = dataclasses.replace(
        srv.fcfg, server_optimizer="momentum", server_lr=1.0,
        server_momentum=0.0)
    srv.run_rounds(stage=2, num_rounds=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-6, atol=1e-7),
        plain.global_params, srv.global_params)


def test_server_momentum_accumulates_across_rounds():
    """FedAvgM: with momentum > 0 the second round's server step carries
    the first round's delta — the 2-round result must differ from vanilla,
    deterministically."""

    def run(server):
        eng = _engine(seed=0)
        if server:
            eng.fcfg = dataclasses.replace(
                eng.fcfg, server_optimizer="momentum", server_lr=1.0,
                server_momentum=0.9, num_rounds=2)
        else:
            eng.fcfg = dataclasses.replace(eng.fcfg, num_rounds=2)
        eng.run_rounds(stage=2, num_rounds=2)
        return eng.global_params

    a = run(True)
    b = run(True)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b)
    vanilla = run(False)
    diff = np.abs(np.asarray(a["arbitrator"]["kernel"], np.float32) -
                  np.asarray(vanilla["arbitrator"]["kernel"], np.float32)).max()
    assert diff > 0


def test_server_adam_round_touches_only_stage_network():
    eng = _engine(seed=0)
    eng.fcfg = dataclasses.replace(
        eng.fcfg, server_optimizer="adam", server_lr=1e-3)
    before = jax.tree.map(np.array, eng.global_params)
    eng.run_rounds(stage=2, num_rounds=1)
    after = eng.global_params
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(after))
    moved = np.abs(np.asarray(after["arbitrator"]["kernel"], np.float32) -
                   np.asarray(before["arbitrator"]["kernel"], np.float32)).max()
    assert moved > 0
    # zero pseudo-gradient outside the grafted stage network -> zero Adam
    # moments -> bit-identical params
    np.testing.assert_array_equal(np.asarray(after["lm_head"]["kernel"]),
                                  np.asarray(before["lm_head"]["kernel"]))


def test_server_state_checkpoint_resume(tmp_path):
    """FedAvgM resume must be exact: the server momentum is checkpointed
    with each round, so re-running round 2 from a round-1 checkpoint
    reproduces the straight-through 2-round result (without the restore,
    round 2 would restart momentum from zero and diverge)."""
    import shutil

    d = str(tmp_path / "rounds")

    def eng():
        e = _engine(seed=0)
        e.fcfg = dataclasses.replace(
            e.fcfg, server_optimizer="momentum", server_lr=1.0,
            server_momentum=0.9, round_save_dir=d, num_rounds=2)
        return e

    e1 = eng()
    e1.run_rounds(stage=2, num_rounds=2)
    assert (tmp_path / "rounds" / "stage2-round-2-server").exists()

    shutil.rmtree(tmp_path / "rounds" / "stage2-round-2")
    shutil.rmtree(tmp_path / "rounds" / "stage2-round-2-server")
    e2 = eng()
    e2.run_rounds(stage=2, num_rounds=2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-6, atol=1e-7),
        e1.global_params, e2.global_params)


def test_server_optimizer_name_validated():
    with pytest.raises(ValueError, match="server_optimizer"):
        FederatedConfig(server_optimizer="yogi")


def test_server_state_masked_to_stage_network():
    """The server optimizer state must cover only the stage's aggregated
    sub-network (the rest of the tree has identically-zero deltas) — no
    full-tree fp32 moments."""
    eng = _engine(seed=0)
    eng.fcfg = dataclasses.replace(eng.fcfg, server_optimizer="adam")
    st = eng._server_opt_state(2)
    n_arb = len(jax.tree_util.tree_leaves(eng.global_params["arbitrator"]))
    n_total = len(jax.tree_util.tree_leaves(eng.global_params))
    assert n_total > n_arb
    # adam: mu + nu per masked-in leaf, + the count scalar
    assert len(jax.tree_util.tree_leaves(st)) == 2 * n_arb + 1


def test_server_adam_default_lr_caps_the_step():
    """FedAdam's default server_lr must be the moderate per-optimizer
    default (1e-2), not momentum's 1.0 — Adam normalizes the pseudo-
    gradient, so the first-round step is ~lr per coordinate."""
    eng = _engine(seed=0)
    eng.fcfg = dataclasses.replace(eng.fcfg, server_optimizer="adam")
    before = np.asarray(eng.global_params["arbitrator"]["kernel"], np.float32)
    eng.run_rounds(stage=2, num_rounds=1)
    after = np.asarray(eng.global_params["arbitrator"]["kernel"], np.float32)
    step = np.abs(after - before).max()
    assert 0 < step <= 0.0101, step


def test_compress_bits_validated_in_config():
    with pytest.raises(ValueError, match="compress_bits"):
        FederatedConfig(compress_bits=16)
    with pytest.raises(ValueError, match="compress_bits"):
        FederatedConfig(compress_bits=1)
