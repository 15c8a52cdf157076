"""Method-family recipe tests: the one Trainer drives the GRL baseline,
single-toggle and FSM methods end-to-end (reference: one trainer script +
model class per family — trainer_data2vec.py, trainer_data2vec_toggle.py,
trainer_data2vec_5st.py), with each recipe's freezing semantics honored."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.models.recipes import (
    RECIPES,
    get_recipe,
    init_recipe_params,
    validate_stage,
)
from privacy_preserve_federated_asr_tpu.train.optim import _path_strings
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig

TOK = CTCCharTokenizer()


def _cfg(method, stage, **kw):
    return DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        method=method, stage=stage, ad_loss="cel", **kw)


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


# every (method, stage) the registry declares, end to end through the Trainer
# (dacs is covered by tests/test_trainer.py; grl's stages differ only in the
# LR default, one suffices)
CASES = ([("grl", 0)]
         + [("single_toggle", st) for st in RECIPES["single_toggle"].stages]
         + [("fsm", st) for st in RECIPES["fsm"].stages]
         # toggle_more stages 1/2 are the dacs stages (covered there); the
         # joint stage 3 is the method's own path (and exercises the
         # cached-encoder default at a stage dacs doesn't have)
         + [("toggle_more", 3)])


@pytest.mark.parametrize("method,stage", CASES)
def test_recipe_trains_and_respects_freezing(method, stage, tmp_path):
    cfg = _cfg(method, stage)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    before = jax.tree.map(np.array, params)
    tr = Trainer(cfg, params, _examples(), _examples(4, seed=5), TOK,
                 TrainerConfig(num_epochs=1, batch_size=4, time_multiple=3200,
                               warmup_steps=1, logging_steps=100,
                               eval_steps=10_000, log_dir=str(tmp_path)))
    state = tr.train()
    after = jax.device_get(state.params)

    pred = get_recipe(method).trainable(stage)
    flat = jax.tree_util.tree_flatten_with_path(before)[0]
    changed_trainable = False
    for (path, b), a in zip(flat, jax.tree.leaves(after)):
        trainable = pred(_path_strings(path))
        if trainable:
            changed_trainable = changed_trainable or not np.allclose(a, b)
        else:
            np.testing.assert_array_equal(
                a, b, err_msg=f"frozen leaf changed: {_path_strings(path)}")
    if method == "fsm" and stage in (5, 6):
        # reference quirk (trainer_data2vec_5st.py:306 "+ 0 * fsm(mask)"):
        # these stages train only the FSM scorers, whose straight-through
        # hack contributes exactly zero gradient — faithfully reproduced,
        # so nothing moves beyond AdamW weight decay at near-zero LR
        assert not changed_trainable, (
            "FSM stage 5/6 zero-gradient quirk no longer holds")
    else:
        assert changed_trainable, "no trainable parameter moved"

    ev = tr.evaluate()
    assert np.isfinite(ev["eval_loss"])
    assert 0.0 <= ev["eval_wer"]
    assert 0.0 <= ev["eval_ad_acc"] <= 1.0


def test_grl_reverse_negates_dementia_head_gradient():
    """REVERSE (reference --GRL) inserts gradient reversal on the pooled AD
    logits: every parameter upstream of that point — including the
    dementia_head — gets its AD-branch gradient scaled by -lambda."""
    from privacy_preserve_federated_asr_tpu.models.objectives import (
        grl_multitask_loss,
    )
    from privacy_preserve_federated_asr_tpu.models.recipes import DACS

    lam = 0.5
    cfg = _cfg("grl", 0, lambda_grl=lam)
    params = init_dacs_params(cfg, jax.random.PRNGKey(1))
    model = DACS.make_model(cfg)
    rng = np.random.default_rng(0)
    iv = jnp.asarray(rng.normal(0, 1, (2, 3200)).astype(np.float32))
    labels = jnp.asarray([[11, 5], [12, 6]], dtype=jnp.int32)
    ll = jnp.asarray([2, 2], dtype=jnp.int32)
    dem = jnp.asarray([0, 1], dtype=jnp.int32)

    def loss(p, reverse):
        out = model.apply({"params": p}, iv, deterministic=True,
                          rngs={"gumbel": jax.random.PRNGKey(0)})
        return grl_multitask_loss(out, labels, ll, dem, cfg, reverse=reverse)[0]

    g_plain = jax.grad(lambda p: loss(p, False))(params)["dementia_head"]["kernel"]
    g_rev = jax.grad(lambda p: loss(p, True))(params)["dementia_head"]["kernel"]
    np.testing.assert_allclose(np.asarray(g_rev), -lam * np.asarray(g_plain),
                               rtol=1e-5, atol=1e-7)


def test_validate_stage_rejects_out_of_range():
    with pytest.raises(ValueError, match="stages"):
        validate_stage(_cfg("single_toggle", 0))
    with pytest.raises(ValueError, match="stages"):
        validate_stage(_cfg("fsm", 0))
    # the joint stage 3 belongs to toggle_more, not plain dacs
    with pytest.raises(ValueError, match="stages"):
        validate_stage(_cfg("dacs", 3))
    with pytest.raises(ValueError, match="stages"):
        validate_stage(_cfg("toggle_more", 0))
    with pytest.raises(ValueError, match="unknown method"):
        validate_stage(_cfg("dacs", 0).replace(method="nope"))


def test_toggle_more_stage3_loss_is_stage2_minus_am_softmax():
    """Reference OtherMdls_Toggle_more.py:1052-1060: stage 2's final loss is
    loss + dementia_loss_rev + loss_r + dementia_loss + score_loss; stage 3
    drops score_loss. Same outputs, stage-routed dacs_loss must agree."""
    from privacy_preserve_federated_asr_tpu.models.objectives import dacs_loss
    from privacy_preserve_federated_asr_tpu.models.recipes import DACS

    cfg2 = _cfg("toggle_more", 2)
    params = init_dacs_params(cfg2, jax.random.PRNGKey(3))
    model = DACS.make_model(cfg2)
    rng = np.random.default_rng(2)
    iv = jnp.asarray(rng.normal(0, 1, (2, 3200)).astype(np.float32))
    out = model.apply({"params": params}, iv, deterministic=True,
                      rngs={"gumbel": jax.random.PRNGKey(0)})
    labels = jnp.asarray([[11, 5], [12, 6]], dtype=jnp.int32)
    ll = jnp.asarray([2, 2], dtype=jnp.int32)
    dem = jnp.asarray([0, 1], dtype=jnp.int32)
    kern = params["similar_fc"]["kernel"]

    f2, m2 = dacs_loss(out, labels, ll, dem, cfg2, kern)
    f3, m3 = dacs_loss(out, labels, ll, dem, cfg2.replace(stage=3), kern)
    np.testing.assert_allclose(np.asarray(f3),
                               np.asarray(f2 - m2["am_softmax"]), rtol=1e-6)
    # stage 3 with metrics off must DCE the AM-softmax term (reported as 0)
    f3b, m3b = dacs_loss(out, labels, ll, dem, cfg2.replace(stage=3), kern,
                         aux_metrics=False)
    np.testing.assert_allclose(np.asarray(f3b), np.asarray(f3), rtol=1e-6)
    assert float(m3b["am_softmax"]) == 0.0 and float(m3["am_softmax"]) != 0.0


def test_caches_rejected_for_variant_methods():
    cfg = _cfg("single_toggle", 2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="DACS"):
        Trainer(cfg, params, _examples(4), None, TOK,
                TrainerConfig(cache_encoder=True))
    tr = Trainer(cfg, params, _examples(4), None, TOK, TrainerConfig())
    assert not tr._cache_encoder and not tr._cache_frontend


def test_federated_engine_rejects_variant_methods():
    from privacy_preserve_federated_asr_tpu.federated import (
        FederatedConfig,
        FederatedEngine,
    )

    cfg = _cfg("fsm", 1)
    params = init_recipe_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="DACS method only"):
        FederatedEngine(cfg, FederatedConfig(), {0: _examples(2)},
                        _examples(2), None, TOK, params)


@pytest.mark.parametrize("method,has_lm,has_ad", [
    ("dacs", True, True),            # eval_toggle_GS.py row schema
    ("toggle_more", True, True),     # eval_toggle_more.py:249-262
    ("fsm", True, True),             # eval_FSM.py
    ("single_toggle", True, False),  # eval_SingleToggle.py: lm_mask only
    ("grl", False, False),           # eval.py / eval_finetune.py: no masks
])
def test_extraction_row_schema_per_method(method, has_lm, has_ad, tmp_path):
    import pickle

    from privacy_preserve_federated_asr_tpu.evaluation import (
        extract_embeddings,
        rows_to_pickle,
    )

    stage = {"dacs": 2, "toggle_more": 3, "grl": 0,
             "single_toggle": 2, "fsm": 1}[method]
    cfg = _cfg(method, stage)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    rows = extract_embeddings(cfg, params, _examples(4), TOK, batch_size=2,
                              time_multiple=3200)
    assert len(rows) == 4
    for r in rows:
        assert r.hidden_states.shape[1] == cfg.hidden_size
        assert (r.lm_mask is not None) == has_lm
        assert (r.dementia_mask is not None) == has_ad
        assert r.dementia_logits.shape[1] == 2
        assert r.pred_AD in (0, 1)
    pkl = str(tmp_path / "rows.pkl")
    rows_to_pickle(rows, pkl)
    with open(pkl, "rb") as f:
        df = pickle.load(f)
    assert ("lm_mask" in df.columns) == has_lm
    assert ("dementia_mask" in df.columns) == has_ad


def test_single_toggle_eval_and_extract_agree_on_ad_stream():
    """In-training evaluation and extraction must score the SAME AD stream
    (the lm-masked one the method trains and its reference eval script
    dumps, eval_SingleToggle.py:341,454) — a drift here means eval_ad_acc
    and pickled pred_AD come from different classifiers."""
    cfg = _cfg("single_toggle", 2)
    r = get_recipe("single_toggle")
    params = init_recipe_params(cfg, jax.random.PRNGKey(0))
    model = r.make_model(cfg)
    iv = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 3200)),
                     dtype=jnp.float32)
    out = model.apply({"params": params}, iv, deterministic=True,
                      rngs={"gumbel": jax.random.PRNGKey(0)})
    assert r.eval_streams(out, cfg)[1] is out.dementia_logits_lm
    assert r.extract_streams(out, cfg)[1] is out.dementia_logits_lm


def test_frontend_cache_rejected_for_groupnorm_frontend():
    """GroupNorm conv frontends (wav2vec2-base, sew-d) normalize each
    channel over the whole padded time axis, so the frontend cache's
    value-at-any-padding invariant does not hold: explicit cache_frontend
    must be rejected and the default must stay off."""
    cfg = DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0).replace(feat_extract_norm="group"),
        stage=0, ad_loss="cel")
    from privacy_preserve_federated_asr_tpu.train.train_state import (
        init_dacs_params as init,
    )

    params = init(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="padding-invariant"):
        Trainer(cfg, params, _examples(4), None, TOK,
                TrainerConfig(cache_frontend=True))
    tr = Trainer(cfg, params, _examples(4), None, TOK, TrainerConfig())
    assert not tr._cache_frontend


def test_graft_matching_heads_skips_mismatched_shapes():
    """A DACS torch checkpoint's D->4D arbitrator must not be grafted into
    a single-toggle (D->2D) param tree; matching heads still graft."""
    from privacy_preserve_federated_asr_tpu.cli import _graft_matching_heads

    d, v = 8, 5
    params = {
        "arbitrator": {"kernel": np.zeros((d, 2 * d)), "bias": np.zeros(2 * d)},
        "lm_head": {"kernel": np.zeros((d, v)), "bias": np.zeros(v)},
    }
    ported = {
        "arbitrator": {"kernel": np.ones((d, 4 * d)), "bias": np.ones(4 * d)},
        "lm_head": {"kernel": np.ones((d, v)), "bias": np.ones(v)},
        "dementia_head": {"kernel": np.ones((d, 2)), "bias": np.ones(2)},
    }
    _graft_matching_heads(params, ported)
    assert params["arbitrator"]["kernel"].shape == (d, 2 * d)
    assert float(params["arbitrator"]["kernel"].sum()) == 0.0  # untouched
    assert float(params["lm_head"]["kernel"].sum()) == d * v   # grafted
    assert "dementia_head" not in params                       # absent head


def test_serving_engine_uses_method_model():
    """cli serve accepts --method; the engine must build the recipe's model
    and serve its eval streams (a DACSModel against a variant tree would
    die inside apply)."""
    from privacy_preserve_federated_asr_tpu.serving import (
        InferenceEngine,
        ServingConfig,
    )

    cfg = _cfg("single_toggle", 2)
    params = init_recipe_params(cfg, jax.random.PRNGKey(0))
    eng = InferenceEngine(cfg, params, TOK,
                          ServingConfig(batch_size=2, time_multiple=3200,
                                        max_seconds=1.0,
                                        compute_dtype="float32"))
    res = eng.infer_batch([np.random.default_rng(0)
                           .normal(0, 0.3, 3200).astype(np.float32)])[0]
    assert res.ad_pred in (0, 1) and res.frames > 0


def test_variant_param_trees_have_expected_heads():
    st = init_recipe_params(_cfg("single_toggle", 2), jax.random.PRNGKey(0))
    assert set(st) >= {"backbone", "arbitrator", "lm_head", "dementia_head"}
    d = _cfg("single_toggle", 2).hidden_size
    assert st["arbitrator"]["kernel"].shape == (d, 2 * d)  # lm mask only

    fsm = init_recipe_params(_cfg("fsm", 1), jax.random.PRNGKey(0))
    assert set(fsm) >= {"backbone", "lm_fsm", "dementia_fsm", "lm_head",
                        "dementia_head", "lm_grl", "dementia_grl", "similar_fc"}
    assert fsm["lm_fsm"]["kernel"].shape == (d, d)
