"""End-to-end learning proofs for the method-family variants on the same
tone-coded synthetic speech as tests/test_learning.py — the DACS recipe's
proof already exists there; these cover:

  * grl: multi-task baseline (reference trainer_data2vec.py) — CTC and the
    AD head co-train on the unmasked stream;
  * single_toggle (reference trainer_data2vec_toggle.py): stage 1 learns
    the AD head on a frozen pre-trained encoder, stage 2 trains only the
    D->2D arbitrator so the lm-masked stream keeps decoding while the AD
    head recovers less from it (privacy direction).
"""

import jax
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import (
    BackboneConfig,
    DACSConfig,
    init_recipe_params,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig

from tests.test_learning import _BB, _make_examples

TOK = CTCCharTokenizer()


def _train(cfg, params, exs, epochs, lr, log_dir):
    tr = Trainer(cfg, params, exs, exs, TOK, TrainerConfig(
        num_epochs=epochs, batch_size=8, time_multiple=3200,
        learning_rate=lr, warmup_steps=20, logging_steps=10**6,
        eval_steps=10**6, log_dir=log_dir))
    st = tr.train()
    return jax.device_get(st.params), tr.evaluate()


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    """Stage-0-trained DACS params (encoder + CTC head know the alphabet)
    shared by the variant tests."""
    exs = _make_examples()
    log_dir = str(tmp_path_factory.mktemp("base"))
    cfg = DACSConfig(backbone=_BB, stage=0, ad_loss="cel")
    params = jax.device_get(init_dacs_params(cfg, jax.random.PRNGKey(0)))
    params, ev = _train(cfg, params, exs, epochs=70, lr=1e-3, log_dir=log_dir)
    assert ev["eval_wer"] == 0.0, ev
    return exs, params


def test_grl_multitask_learns(tmp_path):
    """Plain multi-task CE (REVERSE off, the reference default): CTC decodes
    and the AD head separates the accents, trained jointly from scratch."""
    exs = _make_examples()
    cfg = DACSConfig(backbone=_BB, stage=0, ad_loss="cel", method="grl",
                     grl_reverse=False)
    params = jax.device_get(init_recipe_params(cfg, jax.random.PRNGKey(0)))
    params, ev = _train(cfg, params, exs, epochs=150, lr=1e-3,
                        log_dir=str(tmp_path))
    assert ev["eval_wer"] == 0.0, ev
    assert ev["eval_ad_acc"] >= 0.85, ev


def _st_stream_accs(exs, params):
    """Unmasked vs lm-masked AD accuracy from the single-toggle model's own
    forward (the Trainer's eval AD stream is the lm-masked one, which is
    meaningless before the arbitrator trains)."""
    import jax.numpy as jnp

    from privacy_preserve_federated_asr_tpu.models.variants import (
        SingleToggleModel,
    )
    from privacy_preserve_federated_asr_tpu.ops.decode import ad_vote

    model = SingleToggleModel(DACSConfig(backbone=_BB, stage=2, ad_loss="cel",
                                         method="single_toggle"))
    acc = {"unmask": 0, "lm": 0}
    for e in exs:
        out = model.apply({"params": params},
                          jnp.asarray(e.input_values)[None, :],
                          jnp.asarray([len(e.input_values)]),
                          deterministic=True,
                          rngs={"gumbel": jax.random.PRNGKey(0)})
        for key, logits in (("unmask", out.dementia_logits_unmask),
                            ("lm", out.dementia_logits_lm)):
            pred = int(np.asarray(ad_vote(logits, out.frame_mask))[0])
            acc[key] += int(pred == e.dementia_label)
    return {k: v / len(exs) for k, v in acc.items()}


def test_single_toggle_two_stage_learns(base, tmp_path):
    exs, trained = base
    log_dir = str(tmp_path)

    # graft the trained encoder + CTC head into a single-toggle tree
    cfg1 = DACSConfig(backbone=_BB, stage=1, ad_loss="cel",
                      method="single_toggle")
    params = jax.device_get(init_recipe_params(cfg1, jax.random.PRNGKey(1)))
    params["backbone"] = trained["backbone"]
    params["lm_head"] = trained["lm_head"]

    # stage 1: AD head trains on the UNMASKED encoder stream
    params, _ = _train(cfg1, params, exs, epochs=150, lr=1e-2,
                       log_dir=log_dir)
    acc1 = _st_stream_accs(exs, params)
    assert acc1["unmask"] >= 0.85, acc1

    # stage 2: only the D->2D arbitrator trains; the lm-masked stream must
    # keep decoding (its CTC term) while the reversed AD CE pushes the mask
    # to hide the accent from the (frozen) AD head
    cfg2 = cfg1.replace(stage=2)
    params, ev2 = _train(cfg2, params, exs, epochs=200, lr=2e-3,
                         log_dir=log_dir)
    assert ev2["eval_wer"] == 0.0, ev2

    # privacy direction: the (frozen) AD head recovers less from the
    # lm-masked stream than from the unmasked one
    acc2 = _st_stream_accs(exs, params)
    assert acc2["unmask"] >= 0.85, acc2          # head untouched by stage 2
    assert acc2["lm"] <= acc2["unmask"] - 0.15, (acc1, acc2)

    # frozen parts really froze: backbone and heads unchanged by stage 2
    np.testing.assert_array_equal(
        np.asarray(params["lm_head"]["kernel"]),
        np.asarray(trained["lm_head"]["kernel"]))


def test_fsm_stage2_learns(base, tmp_path):
    """FSM stage 2 (encoder + FSM masks + heads; sigmoid-threshold masks
    carry the reference's zero-gradient quirk, so the masks stay at their
    init and learning flows through the encoder/heads). Like the reference
    (which fine-tunes a PRETRAINED data2vec, trainer_data2vec_5st.py), it
    starts from the trained encoder: CTC decodes through the fixed random
    mask and the AD head separates the accents."""
    exs, trained = base
    cfg = DACSConfig(backbone=_BB, stage=2, ad_loss="cel", method="fsm")
    params = jax.device_get(init_recipe_params(cfg, jax.random.PRNGKey(2)))
    params["backbone"] = trained["backbone"]
    params["lm_head"] = trained["lm_head"]
    params, ev = _train(cfg, params, exs, epochs=150, lr=1e-3,
                        log_dir=str(tmp_path))
    assert ev["eval_wer"] <= 0.05, ev
    assert ev["eval_ad_acc"] >= 0.85, ev


def test_toggle_more_pipeline_learns(base, tmp_path):
    """toggle_more = the reference's stages 1 (AD head) -> 2 (arbitrator,
    exactly DACS stage 2 — loss-identity tested in test_recipes) -> 3
    (joint arbitrator + both heads, no AM-softmax). After the full
    pipeline the lm-masked stream still decodes while the AD head recovers
    little from it (privacy holds through the joint fine-tune)."""
    from tests.test_learning import _stream_stats

    exs, trained = base
    cfg1 = DACSConfig(backbone=_BB, stage=1, ad_loss="cel",
                      method="toggle_more")
    params = jax.device_get(init_recipe_params(cfg1, jax.random.PRNGKey(3)))
    params["backbone"] = trained["backbone"]
    params["lm_head"] = trained["lm_head"]
    params, _ = _train(cfg1, params, exs, epochs=150, lr=1e-2,
                       log_dir=str(tmp_path))
    accs1, _, _ = _stream_stats(exs, params)
    assert accs1["unmask"] >= 0.85, accs1

    # stage 2: arbitrator only (== DACS stage 2) — masks diverge
    params, ev2 = _train(cfg1.replace(stage=2), params, exs, epochs=200,
                         lr=2e-3, log_dir=str(tmp_path))
    assert ev2["eval_wer"] == 0.0, ev2
    accs2, _, _ = _stream_stats(exs, params)
    assert accs2["lm"] <= 0.6, accs2  # privacy established

    # stage 3: short joint fine-tune of arbitrator + both heads must keep
    # decode AND privacy (the distinct toggle_more phase,
    # OtherMdls_Toggle_more.py:736-753,1048-1060)
    params, ev3 = _train(cfg1.replace(stage=3), params, exs, epochs=50,
                         lr=5e-4, log_dir=str(tmp_path))
    assert ev3["eval_wer"] <= 0.05, ev3
    accs3, _, _ = _stream_stats(exs, params)
    assert accs3["lm"] <= 0.6, (accs2, accs3)
