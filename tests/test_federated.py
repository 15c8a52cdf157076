"""Federated engine tests: weight surgery, FedAvg math, round invariants,
client-parallel vs sequential equivalence, and mesh execution on the
8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.federated import FederatedConfig, FederatedEngine
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.parallel import (
    average_weights,
    fedavg_stacked,
    graft_network,
    make_mesh,
    network_mask,
    select_network,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()


def _tiny_cfg(stage=0):
    return DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=stage, ad_loss="cel")


def _examples(n, seed):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = 3200
        text = ["HI", "YES", "NO WAY", "OK GO"][i % 4]
        arr = rng.normal(0, 1, size=ln).astype(np.float32)
        out.append(AsrExample(
            path=f"S{seed}{i:02d}_PAR_0_0.wav", array=arr, text=text,
            dementia_label=i % 2, input_values=arr,
            labels=np.asarray(TOK.encode(text), dtype=np.int32)))
    return out


def test_network_select_and_graft():
    cfg = _tiny_cfg()
    p1 = init_dacs_params(cfg, jax.random.PRNGKey(0))
    p2 = init_dacs_params(cfg, jax.random.PRNGKey(1))

    sel = select_network(p1, "ASR")
    assert set(sel) == {"backbone", "lm_head"}
    assert set(select_network(p1, "AD")) == {"dementia_head"}
    assert set(select_network(p1, "toggling_network")) == {"arbitrator"}

    grafted = graft_network(p1, p2, "AD")
    np.testing.assert_array_equal(grafted["dementia_head"]["kernel"],
                                  p2["dementia_head"]["kernel"])
    np.testing.assert_array_equal(grafted["lm_head"]["kernel"], p1["lm_head"]["kernel"])
    np.testing.assert_array_equal(
        grafted["backbone"]["feature_projection"]["projection"]["kernel"],
        p1["backbone"]["feature_projection"]["projection"]["kernel"])

    mask = network_mask(p1, "toggling_network")
    assert mask["arbitrator"]["kernel"] and not mask["lm_head"]["kernel"]


def test_fedavg_stacked_matches_average_weights():
    cfg = _tiny_cfg()
    ps = [init_dacs_params(cfg, jax.random.PRNGKey(i)) for i in range(3)]
    host_avg = average_weights(ps)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    dev_avg = fedavg_stacked(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6),
        host_avg, dev_avg)
    # weighted
    w_host = average_weights(ps, weights=[1.0, 2.0, 3.0])
    w_dev = fedavg_stacked(stacked, jnp.array([1.0, 2.0, 3.0]))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5),
        w_host, w_dev)


def _make_engine(stage, mesh=None, seed=0):
    cfg = _tiny_cfg(stage=stage)
    params = init_dacs_params(cfg, jax.random.PRNGKey(42))
    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
        batch_size=2, time_multiple=3200, seed=seed, warmup_steps=1, mesh=mesh)
    clients = {0: _examples(4, seed=1), 1: _examples(4, seed=2)}
    return FederatedEngine(cfg, fcfg, clients, _examples(4, seed=3), None, TOK, params)


@pytest.mark.parametrize("stage", [0, 1, 2])
def test_round_only_updates_stage_network(stage):
    from privacy_preserve_federated_asr_tpu.federated.engine import STAGE_NETWORK

    eng = _make_engine(stage)
    before = jax.tree.map(np.array, eng.global_params)
    after = eng.run_rounds(stage=stage, num_rounds=1)
    mask = network_mask(before, STAGE_NETWORK[stage])

    changed = unchanged_ok = True
    for (path, b), a, m in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree.leaves(after), jax.tree.leaves(mask),
    ):
        if not m:
            np.testing.assert_array_equal(b, np.asarray(a), err_msg=str(path))
    # something in the stage network must have moved
    diffs = [
        float(np.abs(np.asarray(a) - b).max())
        for (path, b), a, m in zip(
            jax.tree_util.tree_flatten_with_path(before)[0],
            jax.tree.leaves(after), jax.tree.leaves(mask)) if m
    ]
    assert max(diffs) > 0, f"stage {stage}: aggregated network unchanged"


def test_engine_with_mesh_matches_no_mesh():
    # batch_size=2 shards over data=2 (1 row/device); row sharding +
    # collective replica groups are asserted in tests/test_fl_dp.py
    after_plain = _make_engine(1).run_rounds(stage=1, num_rounds=1)
    mesh = make_mesh(client=2, data=2)
    after_mesh = _make_engine(1, mesh=mesh).run_rounds(stage=1, num_rounds=1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        after_plain, after_mesh)


def test_client_parallel_matches_sequential():
    """The vmapped round must equal training each client separately on the
    same data/rng and averaging on the host (N clients on 1 program == N
    independent programs) — SURVEY.md §4's client-count invariance test."""
    eng = _make_engine(1)
    batches = eng._client_round_batches(eng.client_ids, 0)
    steps = batches.input_values.shape[1]
    rngs = jax.random.split(jax.random.PRNGKey(eng.fcfg.seed + 0), 2)

    # engine result
    after = eng.run_rounds(stage=1, num_rounds=1)

    # sequential: rebuild the same local_train per client
    import optax
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.train.optim import make_optimizer
    from privacy_preserve_federated_asr_tpu.train.steps import make_train_step
    from privacy_preserve_federated_asr_tpu.train.train_state import DACSTrainState

    cfg = eng.cfg.replace(stage=1)
    model = DACSModel(cfg)
    tx = make_optimizer(jax.eval_shape(lambda: eng.global_params), stage=1,
                        warmup_steps=1, total_steps=steps)
    train_step = make_train_step(model, tx, cfg)
    params0 = _make_engine(1).global_params  # fresh copy of same init

    client_params = []
    for i in range(2):
        # the engine splits once per local phase: phase rng = split(rng)[1]
        phase_rng = jax.random.split(rngs[i])[1]
        state = DACSTrainState(step=jnp.zeros((), jnp.int32), params=params0,
                               opt_state=tx.init(params0), rng=phase_rng)
        cb = jax.tree.map(lambda x: x[i], batches)
        for s in range(steps):
            state, _ = train_step(state, jax.tree.map(lambda x: x[s], cb))
        client_params.append(state.params)
    manual_global = graft_network(params0, average_weights(client_params), "AD")

    np.testing.assert_allclose(
        np.asarray(after["dementia_head"]["kernel"]),
        np.asarray(manual_global["dementia_head"]["kernel"]), rtol=1e-5, atol=1e-6)


def test_full_pipeline_smoke():
    eng = _make_engine(0)
    eng.fcfg.global_ep = 1
    final = eng.run_full_pipeline()
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(
        jax.tree.map(np.asarray, final)))


def test_semi_supervised_round_phases():
    """supervised_level 0.5: unsupervised (pseudo-labeled) phase then
    supervised phase in one round, each with a fresh optimizer."""
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(42))
    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, batch_size=2,
        time_multiple=3200, seed=0, warmup_steps=1, supervised_level=0.5)
    eng = FederatedEngine(
        cfg, fcfg, {0: _examples(4, seed=1), 1: _examples(4, seed=2)},
        _examples(4, seed=3), None, TOK, params,
        client_unsup_examples={0: _examples(4, seed=4), 1: _examples(2, seed=5)})
    before = jax.tree.map(np.array, eng.global_params)
    after = eng.run_rounds(stage=0, num_rounds=1)
    assert not np.allclose(np.asarray(after["lm_head"]["kernel"]),
                           before["lm_head"]["kernel"])
    # fully unsupervised variant runs too
    fcfg0 = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, batch_size=2,
        time_multiple=3200, seed=0, warmup_steps=1, supervised_level=0.0)
    eng0 = FederatedEngine(
        cfg, fcfg0, {0: _examples(4, seed=1), 1: _examples(4, seed=2)},
        _examples(4, seed=3), None, TOK, params,
        client_unsup_examples={0: _examples(4, seed=4), 1: _examples(2, seed=5)})
    eng0.run_rounds(stage=0, num_rounds=1)


def test_engine_eval_step_cached_across_rounds():
    """Per-round evaluate() must reuse one jitted eval step (a fresh Trainer
    per round retraces; on the real TPU each retrace costs minutes)."""
    eng = _make_engine(0)
    eng.eval_examples = _examples(4, seed=3)
    ev1 = eng.evaluate(stage=0)
    tr1 = eng._eval_trainers[0]
    eng.run_rounds(stage=0, num_rounds=1)
    ev2 = eng.evaluate(stage=0)
    assert eng._eval_trainers[0] is tr1
    assert set(ev1) == set(ev2) and np.isfinite(ev2["eval_loss"])
    # params swap actually takes effect: post-round eval sees the new params
    assert ev1["eval_loss"] != ev2["eval_loss"]


def _mt_engine(sl, num_lms=3, seed=0, warmup=1):
    cfg = _tiny_cfg(stage=0).replace(num_lms=num_lms)
    params = init_dacs_params(cfg.replace(num_lms=1), jax.random.PRNGKey(42))
    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, batch_size=2,
        time_multiple=3200, seed=seed, warmup_steps=warmup,
        supervised_level=sl)
    return FederatedEngine(
        cfg, fcfg, {0: _examples(4, seed=1), 1: _examples(4, seed=2)},
        _examples(4, seed=3), None, TOK, params,
        client_unsup_examples={0: _examples(4, seed=4), 1: _examples(2, seed=5)})


def test_engine_multitask_round_smoke():
    """num_lms>1 + supervised_level<1: the round runs the N-best multitask
    phase (reference ASRLocalUpdate_Multitask dispatched per round) and the
    global params keep their original structure (no lm_heads_* scratch)."""
    eng = _mt_engine(sl=0.5)
    before = jax.tree.map(np.array, eng.global_params)
    after = eng.run_rounds(stage=0, num_rounds=1)
    assert set(after.keys()) == set(before.keys())
    assert not np.allclose(np.asarray(after["lm_head"]["kernel"]),
                           before["lm_head"]["kernel"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree.leaves(after))


def test_engine_multitask_matches_standalone_local_update():
    """At K=1/frac=1/stage0/sl=0, one engine round must reproduce the
    standalone multitask_local_update (same pseudo labels, same optimizer,
    same rng stream) up to the dropped lm_heads_* scratch keys."""
    from privacy_preserve_federated_asr_tpu.federated.multitask import (
        multitask_local_update)

    cfg = _tiny_cfg(stage=0).replace(num_lms=2)
    params = init_dacs_params(cfg.replace(num_lms=1), jax.random.PRNGKey(7))
    seed = 3
    unsup = _examples(4, seed=11)
    fcfg = FederatedConfig(
        num_rounds=1, num_clients=1, frac=1.0, local_ep=1, batch_size=2,
        time_multiple=3200, seed=seed, warmup_steps=1, supervised_level=0.0)
    eng = FederatedEngine(cfg, fcfg, {0: _examples(4, seed=1)},
                          _examples(4, seed=3), None, TOK, params,
                          client_unsup_examples={0: unsup})
    got = eng.run_rounds(stage=0, num_rounds=1)

    # reproduce the engine's per-client rng derivation for round 0, client 0
    r0 = jax.random.split(jax.random.PRNGKey(seed + 7919 * 0), 1)[0]
    _, sub = jax.random.split(r0)
    want, losses = multitask_local_update(
        cfg, params, unsup, TOK, num_epochs=1, batch_size=2,
        time_multiple=3200, warmup_steps=1, seed=seed, rng=sub)
    want = {k: v for k, v in want.items() if not k.startswith("lm_heads_")}
    assert losses
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        got, want)


def test_resident_matches_staged_round():
    """Device-resident client data (upload once + per-round index gathers)
    must reproduce the staged path exactly — variable lengths, uneven
    client sizes (dead steps), 2 rounds."""
    def mk(n, seed):
        rng = np.random.default_rng(seed)
        out = []
        for i in range(n):
            ln = [3200, 6400, 3200, 4800][i % 4]
            text = ["HI", "YES", "NO WAY", "OK GO"][i % 4]
            arr = rng.normal(0, 1, size=ln).astype(np.float32)
            out.append(AsrExample(
                path=f"S{seed}{i:02d}_PAR_0_0.wav", array=arr, text=text,
                dementia_label=i % 2, input_values=arr,
                labels=np.asarray(TOK.encode(text), dtype=np.int32)))
        return out

    results = {}
    for resident in (False, True):
        cfg = _tiny_cfg(stage=0)
        params = init_dacs_params(cfg, jax.random.PRNGKey(42))
        fcfg = FederatedConfig(
            num_rounds=2, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
            batch_size=2, time_multiple=3200, seed=0, warmup_steps=1,
            resident_client_data=resident)
        clients = {0: mk(5, seed=1), 1: mk(3, seed=2)}
        eng = FederatedEngine(cfg, fcfg, clients, mk(4, seed=3), None, TOK,
                              jax.tree.map(np.array, params))
        results[resident] = jax.device_get(
            eng.run_rounds(stage=0, num_rounds=2))
        assert eng._last_dead_step_frac > 0  # 3 vs 2 steps -> dead step
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        results[True], results[False])


def test_cached_encoder_rounds_match_staged_stage2():
    """Stage-2 rounds on CACHED encoder outputs (frozen deterministic
    backbone computed once, heads trained on the cache) must reproduce the
    staged full-forward path."""
    def mk(n, seed):
        rng = np.random.default_rng(seed)
        out = []
        for i in range(n):
            ln = [3200, 6400, 4800][i % 3]
            text = ["HI", "YES", "NO WAY"][i % 3]
            arr = rng.normal(0, 1, size=ln).astype(np.float32)
            out.append(AsrExample(
                path=f"S{seed}{i:02d}_PAR_0_0.wav", array=arr, text=text,
                dementia_label=i % 2, input_values=arr,
                labels=np.asarray(TOK.encode(text), dtype=np.int32)))
        return out

    results = {}
    for resident in (False, True):
        cfg = _tiny_cfg(stage=2)
        params = init_dacs_params(cfg, jax.random.PRNGKey(42))
        fcfg = FederatedConfig(
            num_rounds=2, num_clients=2, frac=1.0, local_ep=2, global_ep=1,
            batch_size=2, time_multiple=3200, seed=0, warmup_steps=1,
            resident_client_data=resident)
        clients = {0: mk(4, seed=1), 1: mk(3, seed=2)}
        eng = FederatedEngine(cfg, fcfg, clients, mk(4, seed=3), None, TOK,
                              jax.tree.map(np.array, params))
        results[resident] = jax.device_get(eng.run_rounds(stage=2, num_rounds=2))
        if resident:  # the cached path actually engaged
            assert eng._round_hidden, "hidden cache was not built"
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        results[True], results[False])


def test_hidden_cache_persists_and_invalidates_on_stage0():
    """The frozen-backbone encoder-output cache survives consecutive
    stage-1/2 run_rounds calls (the backbone is untouched there) and is
    dropped after stage-0 training mutates the backbone — subsequent
    stage-2 rounds must rebuild from the NEW backbone."""
    cfg = _tiny_cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(11))
    fcfg = FederatedConfig(
        num_rounds=1, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
        batch_size=2, time_multiple=3200, seed=0, warmup_steps=1,
        resident_client_data=True)
    clients = {0: _examples(4, seed=1), 1: _examples(3, seed=2)}
    eng = FederatedEngine(cfg, fcfg, clients, _examples(4, seed=3), None,
                          TOK, jax.tree.map(np.array, params))

    eng.run_rounds(stage=2, num_rounds=1)
    assert eng._round_hidden, "hidden cache not built"
    key, (h0, _) = next(iter(eng._round_hidden.items()))
    eng.run_rounds(stage=2, num_rounds=1)
    assert eng._round_hidden[key][0] is h0, "cache must persist across calls"

    eng.run_rounds(stage=0, num_rounds=1)  # trains the backbone
    assert not eng._round_hidden, "stage-0 rounds must invalidate the cache"

    eng.run_rounds(stage=2, num_rounds=1)
    h1 = eng._round_hidden[key][0]
    assert h1 is not h0
    assert not np.allclose(np.asarray(h0), np.asarray(h1)), \
        "rebuilt cache must reflect the stage-0-trained backbone"


def test_cached_rounds_with_dual_sources_match_staged():
    """supervised_level=0.5 rounds run an unsupervised phase then a
    supervised phase; with resident data BOTH sources get hidden caches —
    results must match the staged full-forward path."""
    results = {}
    for resident in (False, True):
        cfg = _tiny_cfg(stage=1)
        params = init_dacs_params(cfg, jax.random.PRNGKey(21))
        fcfg = FederatedConfig(
            num_rounds=2, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
            batch_size=2, time_multiple=3200, seed=0, warmup_steps=1,
            supervised_level=0.5, resident_client_data=resident)
        clients = {0: _examples(4, seed=1), 1: _examples(3, seed=2)}
        unsup = {0: _examples(3, seed=4), 1: _examples(4, seed=5)}
        eng = FederatedEngine(cfg, fcfg, clients, _examples(4, seed=3), None,
                              TOK, jax.tree.map(np.array, params),
                              client_unsup_examples=unsup)
        results[resident] = jax.device_get(eng.run_rounds(stage=1, num_rounds=2))
        if resident:
            assert len(eng._round_hidden) == 2, "both sources must be cached"
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        results[True], results[False])


def test_engine_hidden_cache_budget_fallback():
    """An over-budget hidden cache falls back to full-forward resident
    rounds (marked once, no retry) and still trains."""
    cfg = _tiny_cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(5))
    fcfg = FederatedConfig(
        num_rounds=2, num_clients=2, frac=1.0, local_ep=1, global_ep=1,
        batch_size=2, time_multiple=3200, seed=0, warmup_steps=1,
        resident_client_data=True, cache_budget_bytes=64)
    clients = {0: _examples(4, seed=1), 1: _examples(3, seed=2)}
    eng = FederatedEngine(cfg, fcfg, clients, _examples(4, seed=3), None,
                          TOK, jax.tree.map(np.array, params))
    eng.run_rounds(stage=2, num_rounds=2)
    assert not eng._round_hidden
    assert eng._hidden_over_budget
