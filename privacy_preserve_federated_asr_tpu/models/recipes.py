"""Method-family recipes: one Trainer drives every reference method.

The reference implements each DACS method family as its own trainer script
with an in-file model class and its own freezing code:

* ``dacs``          — centralized/trainer_data2vec_2st.py + the canonical FL
                      model (federated/src/models.py:262-631)
* ``grl``           — centralized/trainer_data2vec.py with the GRL/multi-task
                      baseline model (centralized/Models.py:298-425,
                      ``Data2VecAudioForCTC(config, LAMBDA, REVERSE)``)
* ``single_toggle`` — centralized/trainer_data2vec_toggle.py:53-334
* ``fsm``           — centralized/trainer_data2vec_5st.py:68-398
* ``toggle_more``   — centralized/functions/OtherMdls_Toggle_more.py:702-1100
                      (the DACS model with an extra joint stage 3)

Here a method is a :class:`Recipe` — (model builder, loss, per-stage
trainable-parameter predicate, backbone-trains flag, eval streams) — selected
by ``DACSConfig.method``; the Trainer, steps and CLI stay method-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .config import DACSConfig
from .dacs import DACSModel
from .objectives import dacs_loss, grl_multitask_loss
from .variants import (
    FSMModel,
    SingleToggleModel,
    fsm_loss,
    fsm_trainable,
    single_toggle_loss,
    single_toggle_trainable,
)


@dataclasses.dataclass(frozen=True)
class Recipe:
    """Everything stage/method-routed training needs, as pure functions.

    ``loss`` has the unified signature
    ``(outputs, labels, label_lengths, dementia_labels, cfg, params,
    sample_mask, aux_metrics) -> (final_loss, metrics)``.
    ``eval_streams(outputs, cfg) -> (ctc_logits, ad_logits)`` picks the
    streams greedy decode and the AD vote consume during evaluation and
    serving.
    ``extract_streams(outputs, cfg) -> (ctc_logits, ad_logits,
    lm_mask | None, ad_mask | None)`` picks what the method's reference
    eval script dumps per utterance (evaluation/extract.py row schema).
    """

    name: str
    stages: tuple[int, ...]
    make_model: Callable[..., Any]           # (cfg, dtype, remat, scan_layers)
    loss: Callable[..., tuple[jax.Array, dict]]
    trainable: Callable[[int], Callable[[tuple[str, ...]], bool]]
    backbone_trains: Callable[[int], bool]
    eval_streams: Callable[[Any, DACSConfig], tuple[jax.Array, jax.Array]]
    extract_streams: Callable[[Any, DACSConfig], tuple]
    # frozen-forward caching (trainer cache_encoder/cache_frontend + the
    # federated engine's cached rounds) is wired for the DACS model only
    supports_cache: bool = False


# ---------------------------------------------------------------------------
# dacs (default)
# ---------------------------------------------------------------------------

def _dacs_stage_trainable(stage: int):
    from ..train.optim import stage_trainable_predicate

    return stage_trainable_predicate(stage)


def _dacs_loss(out, labels, label_lengths, dementia_labels, cfg, params,
               sample_mask, aux_metrics):
    return dacs_loss(out, labels, label_lengths, dementia_labels, cfg,
                     params["similar_fc"]["kernel"], sample_mask,
                     aux_metrics=aux_metrics)


def _dacs_eval_streams(out, cfg):
    if cfg.stage == 2:
        return out.logits, out.dementia_logits_ad
    return out.logits_unmask, out.dementia_logits_unmask


def _dacs_extract_streams(out, cfg):
    """eval_toggle_GS.py / eval_toggle_more.py row: both masks + AD-masked
    dementia logits."""
    return out.logits, out.dementia_logits_ad, out.lm_mask, out.ad_mask


DACS = Recipe(
    name="dacs",
    stages=(0, 1, 2),
    make_model=lambda cfg, dtype=jnp.float32, remat=False, scan_layers=False:
        DACSModel(cfg, dtype=dtype, remat=remat, scan_layers=scan_layers),
    loss=_dacs_loss,
    trainable=_dacs_stage_trainable,
    backbone_trains=lambda stage: stage == 0,
    eval_streams=_dacs_eval_streams,
    extract_streams=_dacs_extract_streams,
    supports_cache=True,
)


# ---------------------------------------------------------------------------
# toggle_more — the DACS model with a joint stage 3
# ---------------------------------------------------------------------------

def _toggle_more_eval_streams(out, cfg):
    if cfg.stage == 1:
        return out.logits_unmask, out.dementia_logits_unmask
    return out.logits, out.dementia_logits_ad


TOGGLE_MORE = Recipe(
    name="toggle_more",
    # same model/loss family as dacs; stages 1/2 match dacs exactly and
    # stage 3 jointly trains arbitrator + lm_head + dementia_head with the
    # stage-2 loss minus the AM-softmax term (OtherMdls_Toggle_more.py:
    # 736-753 freeze block, :1048-1060 loss routing). TOGGLE_RATIO /
    # GS_TAU experiments ride DACSConfig.toggle_ratio / gs_tau.
    stages=(1, 2, 3),
    make_model=DACS.make_model,
    loss=_dacs_loss,
    trainable=_dacs_stage_trainable,
    # the encoder is frozen in every toggle_more stage (only heads train)
    backbone_trains=lambda stage: False,
    eval_streams=_toggle_more_eval_streams,
    extract_streams=_dacs_extract_streams,
    supports_cache=True,
)


# ---------------------------------------------------------------------------
# grl baseline
# ---------------------------------------------------------------------------

def _grl_trainable(stage: int):
    """Reference GRL model trains everything except the conv feature
    extractor (centralized/Models.py:317 ``freeze_feature_encoder``); the
    DACS-only heads sharing our model (arbitrator/similar_fc/lm_heads_*)
    stay frozen — they don't exist in the reference GRL model."""

    def pred(path: tuple[str, ...]) -> bool:
        if path[0] == "backbone":
            return path[1] != "feature_extractor"
        return path[0] in ("lm_head", "dementia_head")

    return pred


def _grl_loss(out, labels, label_lengths, dementia_labels, cfg, params,
              sample_mask, aux_metrics):
    del params, aux_metrics
    return grl_multitask_loss(out, labels, label_lengths, dementia_labels,
                              cfg, reverse=cfg.grl_reverse,
                              sample_mask=sample_mask)


GRL = Recipe(
    name="grl",
    stages=(0, 1, 2),  # single-recipe method; stage only sets the LR default
    make_model=DACS.make_model,  # unmasked streams of the shared DACS model
    loss=_grl_loss,
    trainable=_grl_trainable,
    backbone_trains=lambda stage: True,
    eval_streams=lambda out, cfg: (out.logits_unmask,
                                   out.dementia_logits_unmask),
    # eval.py / eval_finetune.py rows carry no mask columns
    extract_streams=lambda out, cfg: (out.logits_unmask,
                                      out.dementia_logits_unmask, None, None),
)


# ---------------------------------------------------------------------------
# single-toggle
# ---------------------------------------------------------------------------

def _st_loss(out, labels, label_lengths, dementia_labels, cfg, params,
             sample_mask, aux_metrics):
    del params, aux_metrics
    return single_toggle_loss(out, labels, label_lengths, dementia_labels,
                              cfg, sample_mask)


SINGLE_TOGGLE = Recipe(
    name="single_toggle",
    stages=(1, 2, 3),
    make_model=lambda cfg, dtype=jnp.float32, remat=False, scan_layers=False:
        SingleToggleModel(cfg, dtype=dtype, remat=remat,
                          scan_layers=scan_layers),
    loss=_st_loss,
    trainable=single_toggle_trainable,
    # the backbone is frozen in every single-toggle stage
    # (trainer_data2vec_toggle.py:83-100)
    backbone_trains=lambda stage: False,
    # AD logits come from the lm-masked stream — the stream the method
    # trains and its eval script dumps (eval_SingleToggle.py:341,454)
    eval_streams=lambda out, cfg: (out.logits, out.dementia_logits_lm),
    # eval_SingleToggle.py rows: lm_mask only, no dementia_mask column
    extract_streams=lambda out, cfg: (out.logits, out.dementia_logits_lm,
                                      out.lm_mask, None),
)


# ---------------------------------------------------------------------------
# fsm
# ---------------------------------------------------------------------------

def _fsm_loss(out, labels, label_lengths, dementia_labels, cfg, params,
              sample_mask, aux_metrics):
    del aux_metrics
    return fsm_loss(out, labels, label_lengths, dementia_labels, cfg,
                    params["similar_fc"]["kernel"], sample_mask)


FSM = Recipe(
    name="fsm",
    stages=(1, 2, 3, 4, 5, 6),
    make_model=lambda cfg, dtype=jnp.float32, remat=False, scan_layers=False:
        FSMModel(cfg, dtype=dtype, remat=remat, scan_layers=scan_layers,
                 lm_thres=cfg.fsm_lm_thres, ad_thres=cfg.fsm_ad_thres),
    loss=_fsm_loss,
    trainable=fsm_trainable,
    # stages 1/2 fine-tune the encoder (trainer_data2vec_5st.py:108-148)
    backbone_trains=lambda stage: stage in (1, 2),
    eval_streams=lambda out, cfg: (out.logits, out.dementia_logits),
    # eval_FSM.py:177-230: both (sigmoid-threshold) masks
    extract_streams=lambda out, cfg: (out.logits, out.dementia_logits,
                                      out.lm_mask, out.dementia_mask),
)


RECIPES: dict[str, Recipe] = {
    r.name: r for r in (DACS, TOGGLE_MORE, GRL, SINGLE_TOGGLE, FSM)}


def get_recipe(method: str) -> Recipe:
    try:
        return RECIPES[method]
    except KeyError:
        raise ValueError(
            f"unknown method {method!r}; known: {sorted(RECIPES)}") from None


def validate_stage(cfg: DACSConfig) -> None:
    r = get_recipe(cfg.method)
    if cfg.stage not in r.stages:
        raise ValueError(
            f"method {r.name!r} supports stages {r.stages}, got {cfg.stage}")


def init_recipe_params(cfg: DACSConfig, rng: jax.Array,
                       example_len: int = 3200) -> Any:
    """Randomly initialize params for ``cfg.method``'s model (pretrained
    backbone weights come from :func:`..models.port.port_hf_state_dict`)."""
    model = get_recipe(cfg.method).make_model(cfg)
    variables = model.init(
        {"params": rng, "gumbel": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, example_len), dtype=jnp.float32),
    )
    return variables["params"]
