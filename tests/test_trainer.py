"""Trainer/optimizer behavior tests: stage freezing invariants, loss
descent, eval + WER plumbing, checkpoint round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.train.optim import (
    make_optimizer,
    stage_trainable_predicate,
    trainable_mask,
)
from privacy_preserve_federated_asr_tpu.train.steps import DeviceBatch
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig
from privacy_preserve_federated_asr_tpu.train.checkpoint import CheckpointManager

TOK = CTCCharTokenizer()


def _tiny_cfg(stage=0, **kw):
    return DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=stage, ad_loss="cel", **kw,
    )


def _examples(n=8, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ln = 3200 + 320 * int(rng.integers(0, 4))
        text = ["HI", "YES", "NO WAY", "OK"][i % 4]
        arr = rng.normal(0, 1, size=ln).astype(np.float32)
        out.append(AsrExample(
            path=f"S{i:03d}_PAR_0_0.wav", array=arr, text=text,
            dementia_label=i % 2, input_values=arr,
            labels=np.asarray(TOK.encode(text), dtype=np.int32)))
    return out


def test_stage_trainable_predicate():
    pred0 = stage_trainable_predicate(0)
    assert pred0(("backbone", "encoder", "layers_0", "attention", "q_proj", "kernel"))
    assert not pred0(("backbone", "feature_extractor", "conv_layers_0", "conv", "kernel"))
    assert pred0(("lm_head", "kernel"))
    assert not pred0(("arbitrator", "kernel"))
    pred1 = stage_trainable_predicate(1)
    assert pred1(("dementia_head", "bias"))
    assert not pred1(("backbone", "encoder", "layer_norm", "scale"))
    assert not pred1(("lm_head", "kernel"))
    pred2 = stage_trainable_predicate(2)
    assert pred2(("arbitrator", "kernel"))
    assert not pred2(("dementia_head", "kernel"))


@pytest.mark.parametrize("stage", [0, 1, 2])
def test_trainer_respects_stage_freezing(stage, tmp_path):
    cfg = _tiny_cfg(stage=stage)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    before = jax.tree.map(np.array, params)
    tr = Trainer(cfg, params, _examples(), None, TOK,
                 TrainerConfig(num_epochs=1, batch_size=4, time_multiple=3200,
                               warmup_steps=1, logging_steps=100))
    state = tr.train()
    after = jax.device_get(state.params)
    mask = trainable_mask(before, stage)

    flat_before = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_after = jax.tree.leaves(after)
    flat_mask = jax.tree.leaves(mask)
    changed_any = False
    for (path, b), a, m in zip(flat_before, flat_after, flat_mask):
        if not m:
            np.testing.assert_array_equal(b, a, err_msg=str(path))
        elif not np.allclose(b, a):
            changed_any = True
    assert changed_any, f"stage {stage}: no trainable parameter changed"


def test_loss_decreases_stage0():
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(1))
    tr = Trainer(cfg, params, _examples(4), None, TOK,
                 TrainerConfig(num_epochs=30, batch_size=4, time_multiple=3200,
                               learning_rate=5e-4, warmup_steps=1, logging_steps=1000))
    b = next(tr.train_batcher.epoch(0))
    db = DeviceBatch.from_host(b)
    first = None
    for i in range(30):
        tr.state, metrics = tr._train_step(tr.state, db)
        if first is None:
            first = float(metrics["ctc_unmask"])
    last = float(metrics["ctc_unmask"])
    assert last < first * 0.8, (first, last)


def test_evaluate_returns_wer_and_logs(tmp_path):
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(2))
    tr = Trainer(cfg, params, _examples(4), _examples(4, seed=3), TOK,
                 TrainerConfig(num_epochs=1, batch_size=2, time_multiple=3200,
                               log_file="test_log.txt", log_dir=str(tmp_path)))
    ev = tr.evaluate()
    # untrained model babbles -> insertion-dominated WER can exceed 1
    assert 0.0 <= ev["eval_wer"] < 100.0
    assert np.isfinite(ev["eval_loss"])
    assert 0.0 <= ev["eval_ad_acc"] <= 1.0
    tr.logger.log(ev)
    assert (tmp_path / "test_log.txt").exists()


def test_checkpoint_roundtrip_and_prune(tmp_path):
    cfg = _tiny_cfg()
    params = init_dacs_params(cfg, jax.random.PRNGKey(3))
    cm = CheckpointManager(str(tmp_path / "ck"), save_total_limit=2)
    for step in (100, 200, 300):
        cm.save(jax.device_get(params), step, metadata={"stage": 0})
    assert cm.latest_step() == 300
    assert not (tmp_path / "ck" / "checkpoint-100").exists()  # pruned
    restored = cm.restore(300)
    jax.tree.map(np.testing.assert_array_equal, jax.device_get(params), restored)
    cm.save_final(jax.device_get(params), metadata={"stage": 0})
    final = cm.restore("final")
    jax.tree.map(np.testing.assert_array_equal, jax.device_get(params), final)


def test_resume_from_checkpoint_exact(tmp_path):
    """Full-state resume: continue-from-checkpoint must equal uninterrupted
    training (params + optimizer moments + rng restored)."""
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(7))
    exs = _examples(8, seed=7)
    # constant LR: schedule horizons differ between the split and full runs
    base = dict(num_epochs=1, batch_size=4, time_multiple=3200,
                warmup_steps=1, logging_steps=1000, seed=3,
                learning_rate=1e-4)

    # uninterrupted: 2 epochs
    tr_full = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                      TrainerConfig(**{**base, "num_epochs": 2}))
    full = jax.device_get(tr_full.train().params)

    # interrupted: 1 epoch + save, then resume for 1 more epoch
    tr_a = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                   TrainerConfig(**base, save_dir=str(tmp_path / "ck"),
                                 save_steps=2))  # 8/4 = 2 steps/epoch
    tr_a.train()
    # epoch seeding is seed+epoch: second run's epoch 0 == full run's epoch 1
    tr_b = Trainer(cfg, jax.tree.map(np.array, params), exs, None, TOK,
                   TrainerConfig(**{**base, "seed": base["seed"] + 1},
                                 resume_from=str(tmp_path / "ck" / "checkpoint-2")))
    resumed = jax.device_get(tr_b.train().params)

    # rng streams differ (per-step dropout/gumbel keys come from the restored
    # rng for tr_b vs the continued stream for tr_full), but with dropout off
    # and stage-0 gumbel unused in the loss, updates are deterministic
    np.testing.assert_allclose(
        np.asarray(resumed["lm_head"]["kernel"]),
        np.asarray(full["lm_head"]["kernel"]), rtol=2e-4, atol=1e-6)


def test_record_result_tensorboard_sink(tmp_path):
    """The third metric sink (reference record_result, update.py:398-411):
    history rows re-emitted as TB scalars Loss/train, Loss/test, wer/test."""
    from privacy_preserve_federated_asr_tpu.train.logging import record_result

    history = [
        {"loss": 3.0, "epoch": 1.0},
        {"eval_loss": 2.5, "eval_wer": 0.9, "epoch": 1.0},
        {"train_loss": 2.8, "epoch": 2.0},
    ]
    out = record_result(history, str(tmp_path / "mymodel"),
                        logs_root=str(tmp_path / "logs"))
    assert out is not None
    import glob
    events = glob.glob(out + "/events.out.tfevents.*")
    assert events, "no TB event file written"
    # round-trip: the scalars are actually in the event file
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(out)
    acc.Reload()
    tags = set(acc.Tags()["scalars"])
    assert {"Loss/train", "Loss/test", "wer/test"} <= tags
    assert acc.Scalars("Loss/train")[0].step == 100
    assert abs(acc.Scalars("wer/test")[0].value - 0.9) < 1e-6


def test_prefetch_device_batches_order_and_errors():
    """The prefetch pipeline preserves batch order, matches the synchronous
    path, and re-raises worker exceptions on the consumer thread."""
    import numpy as np
    import pytest

    from privacy_preserve_federated_asr_tpu.data.collate import Batch
    from privacy_preserve_federated_asr_tpu.train.prefetch import (
        prefetch_device_batches)

    def mk(i):
        return Batch(
            input_values=np.full((2, 8), float(i), dtype=np.float32),
            input_lengths=np.array([8, 8], dtype=np.int32),
            labels=np.full((2, 3), i, dtype=np.int32),
            label_lengths=np.array([3, 3], dtype=np.int32),
            dementia_labels=np.array([0, 1], dtype=np.int32),
            sample_mask=np.ones((2,), dtype=np.float32),
            paths=[f"a{i}", f"b{i}"],
        )

    batches = [mk(i) for i in range(7)]
    for depth in (0, 2, 16):
        got = list(prefetch_device_batches(iter(batches), depth))
        assert [b.paths for b, _ in got] == [b.paths for b in batches]
        for (b, db), src in zip(got, batches):
            np.testing.assert_array_equal(np.asarray(db.input_values),
                                          src.input_values)
            np.testing.assert_array_equal(np.asarray(db.labels), src.labels)

    def boom():
        yield batches[0]
        raise RuntimeError("loader failed")

    out = prefetch_device_batches(boom(), depth=2)
    next(out)
    with pytest.raises(RuntimeError, match="loader failed"):
        list(out)


def test_trainer_scan_layers_roundtrip(tmp_path):
    """scan_layers=True: per-layer incoming params are stacked for the scan
    model, training runs, and the final export is unstacked back to the
    portable per-layer layout an unrolled model consumes directly."""
    from privacy_preserve_federated_asr_tpu.train.checkpoint import load_params

    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(1))  # per-layer layout
    assert "layers_0" in params["backbone"]["encoder"]
    tr = Trainer(cfg, params, _examples(4), None, TOK, TrainerConfig(
        num_epochs=2, batch_size=4, time_multiple=3200, warmup_steps=1,
        scan_layers=True, save_dir=str(tmp_path / "m"),
        save_steps=1000, logging_steps=1000, eval_steps=10**9))
    assert "layers_scan" in tr.state.params["backbone"]["encoder"]
    state = tr.train()
    assert "layers_scan" in state.params["backbone"]["encoder"]
    final = load_params(str(tmp_path / "m" / "final"))
    assert "layers_0" in final["backbone"]["encoder"]
    assert "layers_scan" not in final["backbone"]["encoder"]

    # the exported params drive the unrolled model to the same loss as the
    # scan state on a fixed batch
    from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
    from privacy_preserve_federated_asr_tpu.models.objectives import dacs_loss

    b = next(tr.train_batcher.epoch(0))
    db = DeviceBatch.from_host(b)

    def loss_with(model, p):
        out = model.apply(
            {"params": p}, db.input_values, db.input_lengths,
            deterministic=True, rngs={"gumbel": jax.random.PRNGKey(0)})
        return float(dacs_loss(out, db.labels, db.label_lengths,
                               db.dementia_labels, cfg,
                               p["similar_fc"]["kernel"], db.sample_mask)[0])

    l_scan = loss_with(DACSModel(cfg, scan_layers=True), state.params)
    l_unrolled = loss_with(DACSModel(cfg), final)
    np.testing.assert_allclose(l_unrolled, l_scan, rtol=1e-5)


def test_trainer_dp_matches_single_device():
    """dp=2 (batch sharded over a "data" mesh, params replicated, GSPMD
    gradient all-reduce) must reproduce single-device training."""
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
                  TrainerConfig(**base, dp=2))
    p2 = jax.device_get(tr2.train().params)
    np.testing.assert_allclose(
        np.asarray(p2["lm_head"]["kernel"]),
        np.asarray(p1["lm_head"]["kernel"]), rtol=2e-4, atol=1e-6)
    enc1 = p1["backbone"]["encoder"]["layers_0"]["attention"]["q_proj"]["kernel"]
    enc2 = p2["backbone"]["encoder"]["layers_0"]["attention"]["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(enc2), np.asarray(enc1),
                               rtol=2e-4, atol=1e-6)


def test_prefetch_worker_released_on_abandon():
    """Abandoning a prefetch generator (break/close) must release its worker
    thread instead of leaving it blocked on the queue forever."""
    import threading
    import time

    from privacy_preserve_federated_asr_tpu.train.prefetch import prefetch_iter

    before = threading.active_count()
    it = prefetch_iter(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()  # consumer abandons early
    for _ in range(100):
        if threading.active_count() <= before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= before


@pytest.mark.parametrize("stage", [1, 2])
def test_cached_encoder_trainer_matches_full_forward(stage, tmp_path):
    """Stages 1/2 train heads on CACHED encoder outputs by default (the
    frozen backbone is deterministic there); the final params, losses and
    eval metrics must reproduce the full-forward path."""
    results = {}
    for cached in (False, True):
        cfg = _tiny_cfg(stage=stage)
        params = init_dacs_params(cfg, jax.random.PRNGKey(7))
        tr = Trainer(cfg, jax.tree.map(np.array, params), _examples(6),
                     _examples(4, seed=9), TOK,
                     TrainerConfig(num_epochs=2, batch_size=4,
                                   time_multiple=3200, warmup_steps=1,
                                   logging_steps=100, eval_steps=10_000,
                                   cache_encoder=cached, seed=5,
                                   log_dir=str(tmp_path)))
        assert tr._cache_encoder is cached
        state = tr.train()
        if cached:
            assert tr._hidden, "train cache was not built"
        results[cached] = (jax.device_get(state.params), tr.evaluate())
    p0, e0 = results[False]
    p1, e1 = results[True]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        p0, p1)
    for k in e0:
        np.testing.assert_allclose(e0[k], e1[k], rtol=2e-4, atol=1e-6, err_msg=k)


def test_cache_encoder_budget_fallback(tmp_path):
    """Over-budget cache falls back to the full-forward path and still
    trains (no retry loop, no crash)."""
    cfg = _tiny_cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(3))
    tr = Trainer(cfg, params, _examples(6), None, TOK,
                 TrainerConfig(num_epochs=2, batch_size=4, time_multiple=3200,
                               warmup_steps=1, cache_budget_bytes=16,
                               log_dir=str(tmp_path)))
    tr.train()
    assert tr._hidden is False  # marked over-budget once, not rebuilt


def test_cache_encoder_rejects_stage0():
    cfg = _tiny_cfg(stage=0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(3))
    with pytest.raises(ValueError, match="frozen backbone"):
        Trainer(cfg, params, _examples(4), None, TOK,
                TrainerConfig(cache_encoder=True))


def _multibucket_examples(n=8, seed=0):
    """Examples whose padded lengths SPAN several time buckets (3200/6400/
    9600 at time_multiple=3200): the cached-frontend path must reproduce the
    full-forward path at every bucket shape — the pos-conv stack is not
    padding-invariant, so a one-bucket fixture would not catch a cache that
    replays batches at the wrong padded length."""
    rng = np.random.default_rng(seed)
    out = []
    lens = [3200, 4800, 6400, 8000, 9600, 3200, 7200, 5600]
    for i in range(n):
        ln = lens[i % len(lens)]
        text = ["HI", "YES", "NO WAY", "OK"][i % 4]
        arr = rng.normal(0, 1, size=ln).astype(np.float32)
        out.append(AsrExample(
            path=f"S{i:03d}_PAR_0_0.wav", array=arr, text=text,
            dementia_label=i % 2, input_values=arr,
            labels=np.asarray(TOK.encode(text), dtype=np.int32)))
    return out


@pytest.mark.parametrize("dropout", [0.0, 0.2])
def test_cached_frontend_trainer_matches_full_forward(dropout, tmp_path):
    """Stage 0 trains on CACHED conv-frontend outputs by default (the
    feature extractor is frozen in every recipe and has no dropout); the
    final params, losses and eval metrics must reproduce the full-forward
    path — including with live dropout, because flax RNG streams are
    module-path-keyed and every stochastic layer sits after the cache
    point, and across MIXED time buckets, because the cached step replays
    each batch at its own bucket length."""
    results = {}
    for cached in (False, True):
        cfg = DACSConfig(
            backbone=BackboneConfig.tiny_for_tests(
                hidden_dropout=dropout, attention_dropout=dropout,
                activation_dropout=0.0, final_dropout=dropout),
            stage=0, ad_loss="cel")
        params = init_dacs_params(cfg, jax.random.PRNGKey(7))
        tr = Trainer(cfg, jax.tree.map(np.array, params),
                     _multibucket_examples(8), _multibucket_examples(4, seed=9),
                     TOK,
                     TrainerConfig(num_epochs=2, batch_size=4,
                                   time_multiple=3200, warmup_steps=1,
                                   logging_steps=100, eval_steps=10_000,
                                   cache_frontend=cached, seed=5,
                                   log_dir=str(tmp_path)))
        assert tr._cache_frontend is cached
        state = tr.train()
        if cached:
            assert tr._features, "frontend cache was not built"
        results[cached] = (jax.device_get(state.params), tr.evaluate())
    p0, e0 = results[False]
    p1, e1 = results[True]
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        p0, p1)
    for k in e0:
        np.testing.assert_allclose(e0[k], e1[k], rtol=2e-4, atol=1e-6, err_msg=k)


def test_cache_frontend_deactivated_by_encoder_cache():
    """Stages 1/2 use the deeper encoder cache; the frontend cache must not
    double-activate."""
    cfg = _tiny_cfg(stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(3))
    tr = Trainer(cfg, params, _examples(4), None, TOK,
                 TrainerConfig(cache_frontend=True))
    assert tr._cache_encoder and not tr._cache_frontend
