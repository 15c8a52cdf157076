"""DP-FedAvg tests (parallel/fed.py dp_fedavg_stacked + engine wiring):
clip math against hand computation, vanishing-DP equivalence with plain
FedAvg, noise-scale statistics, and determinism through the jitted round."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.federated import (
    FederatedConfig,
    FederatedEngine,
)
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.parallel import (
    dp_fedavg_stacked,
    fedavg_stacked,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def test_dp_clipping_matches_hand_computation():
    g = {"w": jnp.zeros((2,)), "b": jnp.zeros((1,))}
    # client deltas: norms 5 (over both leaves: 3-4-0) and 1
    c1 = {"w": jnp.array([3.0, 4.0]), "b": jnp.array([0.0])}
    c2 = {"w": jnp.array([0.0, 0.0]), "b": jnp.array([1.0])}
    stacked = _stack([c1, c2])
    out = dp_fedavg_stacked(stacked, g, clip_norm=2.5,
                            noise_multiplier=0.0, rng=jax.random.PRNGKey(0))
    # c1 scaled by 2.5/5 = 0.5 -> (1.5, 2.0, 0); c2 within the clip
    np.testing.assert_allclose(out["w"], np.array([0.75, 1.0]), rtol=1e-6)
    np.testing.assert_allclose(out["b"], np.array([0.5]), rtol=1e-6)


def test_dp_with_no_noise_large_clip_equals_fedavg():
    trees = [
        {"a": jnp.asarray(np.random.default_rng(s).normal(0, 1, (3, 4)),
                          jnp.float32)}
        for s in range(3)
    ]
    g = {"a": jnp.asarray(np.random.default_rng(9).normal(0, 1, (3, 4)),
                          jnp.float32)}
    stacked = _stack(trees)
    plain = fedavg_stacked(stacked)
    dp = dp_fedavg_stacked(stacked, g, clip_norm=1e9, noise_multiplier=0.0,
                           rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(dp["a"]), np.asarray(plain["a"]),
                               rtol=1e-5, atol=1e-6)


def test_dp_noise_scale():
    """With zero deltas the output-global difference IS the noise: its std
    must be clip * z / K."""
    k, clip, z = 4, 2.0, 1.5
    g = {"w": jnp.zeros((200, 200), jnp.float32)}
    stacked = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (k,) + x.shape), g)
    out = dp_fedavg_stacked(stacked, g, clip_norm=clip, noise_multiplier=z,
                            rng=jax.random.PRNGKey(2))
    noise = np.asarray(out["w"])
    want = clip * z / k
    assert abs(noise.std() - want) / want < 0.02
    assert abs(noise.mean()) < 4 * want / np.sqrt(noise.size)


def _engine(dp_clip=None, dp_noise=0.0, seed=0):
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=2, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(42))

    def mk(n, seed):
        rng = np.random.default_rng(seed)
        out = []
        for i in range(n):
            text = ["HI", "YES", "NO WAY", "OK GO"][i % 4]
            arr = rng.normal(0, 1, size=3200).astype(np.float32)
            out.append(AsrExample(
                path=f"S{seed}{i:02d}_PAR_0_0.wav", array=arr, text=text,
                dementia_label=i % 2, input_values=arr,
                labels=np.asarray(TOK.encode(text), dtype=np.int32)))
        return out

    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
        batch_size=2, time_multiple=3200, seed=seed, warmup_steps=1,
        dp_clip_norm=dp_clip, dp_noise_multiplier=dp_noise)
    clients = {0: mk(4, seed=1), 1: mk(4, seed=2)}
    return FederatedEngine(cfg, fcfg, clients, mk(4, seed=3), None, TOK,
                           params)


def test_engine_dp_round_deterministic_and_differs_from_vanilla():
    eng_a = _engine(dp_clip=0.05, dp_noise=0.1)
    eng_a.run_rounds(stage=2, num_rounds=1)
    eng_b = _engine(dp_clip=0.05, dp_noise=0.1)
    eng_b.run_rounds(stage=2, num_rounds=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        eng_a.global_params, eng_b.global_params)

    vanilla = _engine()
    vanilla.run_rounds(stage=2, num_rounds=1)
    diff = np.abs(
        np.asarray(eng_a.global_params["arbitrator"]["kernel"]) -
        np.asarray(vanilla.global_params["arbitrator"]["kernel"])).max()
    assert diff > 0  # clipping + noise changed the aggregate


def test_engine_dp_vanishing_equals_vanilla_round():
    """clip -> huge, noise -> 0: the DP path must reproduce the vanilla
    aggregate to fp32 tolerance."""
    dp = _engine(dp_clip=1e9, dp_noise=0.0)
    dp.run_rounds(stage=2, num_rounds=1)
    vanilla = _engine()
    vanilla.run_rounds(stage=2, num_rounds=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6),
        dp.global_params, vanilla.global_params)


def test_dp_noise_without_clip_rejected():
    """noise_multiplier > 0 with no clip norm is undefined (std = clip *
    multiplier / K) — it must fail loudly, not silently run plain FedAvg."""
    with pytest.raises(ValueError, match="dp_clip_norm"):
        FederatedConfig(dp_noise_multiplier=1.0)


def test_round_ckpts_ignores_orbax_tmp_debris(tmp_path):
    """A crash mid-save leaves '<name>.orbax-checkpoint-tmp-<ts>' behind;
    its all-digit timestamp must not parse as a (huge, unfinished) round."""
    import dataclasses as dc

    d = tmp_path / "rounds"
    d.mkdir()
    (d / "stage2-round-3").mkdir()
    (d / "stage2-round-3.orbax-checkpoint-tmp-1755501234567890").mkdir()
    (d / "stage1-round-9").mkdir()        # other stage: excluded too
    eng = _engine()
    eng.fcfg = dc.replace(eng.fcfg, round_save_dir=str(d))
    assert [(r, p.name) for r, p in eng._round_ckpts(2)] == \
        [(3, "stage2-round-3")]


def test_engine_dp_rejects_weighted():
    eng = _engine(dp_clip=1.0)
    eng.fcfg = dataclasses.replace(eng.fcfg, fedavg_weighted=True)
    with pytest.raises(ValueError, match="unweighted"):
        eng.run_rounds(stage=2, num_rounds=1)


def test_round_checkpoint_save_resume(tmp_path):
    """Round checkpoints: a restarted engine resumes from the newest
    matching-stage checkpoint and reproduces the straight-through run."""
    import dataclasses as dc
    import shutil

    d = str(tmp_path / "rounds")

    def engine_with_dir():
        eng = _engine(seed=0)
        eng.fcfg = dc.replace(eng.fcfg, round_save_dir=d, num_rounds=2)
        return eng

    eng1 = engine_with_dir()
    eng1.run_rounds(stage=2, num_rounds=2)
    assert sorted(p.name for p in (tmp_path / "rounds").glob("*round-*")) == \
        ["stage2-round-1", "stage2-round-2"]

    # fresh engine, same dir: fully resumed, params identical, no new rounds
    eng2 = engine_with_dir()
    eng2.run_rounds(stage=2, num_rounds=2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        eng1.global_params, eng2.global_params)

    # drop the newest checkpoint: resume at round 1, re-run round 2 only,
    # same final params (round math is deterministic in seed + plan)
    shutil.rmtree(tmp_path / "rounds" / "stage2-round-2")
    eng3 = engine_with_dir()
    eng3.run_rounds(stage=2, num_rounds=2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-6, atol=1e-7),
        eng1.global_params, eng3.global_params)

    # wrong-stage checkpoints are ignored
    eng4 = engine_with_dir()
    assert eng4._maybe_resume_rounds(stage=0) == 0


def test_engine_dp_with_mesh_matches_no_mesh():
    """The DP aggregation (per-client clip norms + noised mean) must be
    GSPMD-correct when the client axis is sharded over a mesh."""
    import dataclasses as dc

    from privacy_preserve_federated_asr_tpu.parallel import make_mesh

    plain = _engine(dp_clip=0.05, dp_noise=0.1)
    plain.run_rounds(stage=2, num_rounds=1)
    meshed = _engine(dp_clip=0.05, dp_noise=0.1)
    meshed.fcfg = dc.replace(meshed.fcfg, mesh=make_mesh(client=2, data=2))
    meshed.run_rounds(stage=2, num_rounds=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-5, atol=1e-5),  # GSPMD reduction-order fp noise
        plain.global_params, meshed.global_params)
