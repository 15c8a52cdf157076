"""End-to-end learning proof for the full 3-stage DACS recipe on
tone-coded synthetic speech.

Each character is a distinct sine frequency; "AD" speakers speak the same
alphabet frequency-shifted by 1.25x (an "accent" marker present in every
frame, like the prosodic/lexical markers real AD speech carries). The
reference pipeline this reproduces (centralized/trainer_data2vec_2st.py,
federated/src/models.py:375-631):

  stage 0  fine-tune encoder + CTC head        -> WER reaches 0
  stage 1  AD head on the frozen encoder       -> AD acc >> chance
  stage 2  arbitrator (toggling net) only      -> the learned lm mask
           still decodes (WER 0) while the AD head recovers nothing
           from the lm-masked stream (privacy), and the two masks
           diverge from their ~0.5/0.5 random init.

Thresholds were calibrated on both the TPU and CPU backends (identical
qualitative outcomes; see PERF.md provenance in git history).
"""

import numpy as np
import jax
import jax.numpy as jnp

from privacy_preserve_federated_asr_tpu.data.audio import normalize_input_values
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.models.dacs import DACSModel
from privacy_preserve_federated_asr_tpu.ops.decode import ad_vote
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()
CHARS = {"A": 440.0, "B": 880.0, "C": 1320.0, "D": 1760.0}
SR, DUR = 16000, 0.2


def _synth(text, ad, rng):
    shift = 1.25 if ad else 1.0  # the AD "accent"
    segs = [np.sin(2 * np.pi * CHARS[ch] * shift * np.arange(int(SR * DUR)) / SR)
            for ch in text]
    sig = np.concatenate(segs) + rng.normal(0, 0.05, int(SR * DUR) * len(text))
    return sig.astype(np.float32)


def _make_examples():
    rng = np.random.default_rng(0)
    words = ["AB", "BA", "CAD", "DC", "ABC", "CB", "AD", "BD", "DAB", "CA",
             "BC", "DA"]
    exs = []
    for i, w in enumerate(words * 2):
        ad = i % 2
        sig = _synth(w, ad, rng)
        exs.append(AsrExample(
            path=f"S{i:03d}_PAR_0_{i}.wav", array=sig, text=w,
            dementia_label=ad, input_values=normalize_input_values(sig),
            labels=np.asarray(TOK.encode(w), dtype=np.int32)))
    return exs


_BB = BackboneConfig.tiny_for_tests(
    hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    final_dropout=0.0)


def _stage_train(exs, stage, params, epochs, lr, log_dir):
    cfg = DACSConfig(backbone=_BB, stage=stage, ad_loss="cel")
    tr = Trainer(cfg, params, exs, exs, TOK, TrainerConfig(
        num_epochs=epochs, batch_size=8, time_multiple=3200,
        learning_rate=lr, warmup_steps=20, logging_steps=10**6,
        eval_steps=10**6, log_dir=log_dir))
    st = tr.train()
    return jax.device_get(st.params), tr.evaluate()


def _stream_stats(exs, params):
    """Per-stream AD accuracy and mask on-rates from the eval forward."""
    model = DACSModel(DACSConfig(backbone=_BB, stage=2, ad_loss="cel"))
    accs = {"lm": 0, "ad": 0, "unmask": 0}
    lm_on = ad_on = 0.0
    for e in exs:
        iv = jnp.asarray(e.input_values)[None, :]
        il = jnp.asarray([len(e.input_values)])
        out = model.apply({"params": params}, iv, il, deterministic=True,
                          rngs={"gumbel": jax.random.PRNGKey(0)})
        for key, logits in (("lm", out.dementia_logits_lm),
                            ("ad", out.dementia_logits_ad),
                            ("unmask", out.dementia_logits_unmask)):
            pred = int(np.asarray(ad_vote(logits, out.frame_mask))[0])
            accs[key] += int(pred == e.dementia_label)
        t = int(out.frame_lengths[0])
        lm_on += float(np.asarray(out.lm_mask)[0, :t].mean())
        ad_on += float(np.asarray(out.ad_mask)[0, :t].mean())
    n = len(exs)
    return {k: v / n for k, v in accs.items()}, lm_on / n, ad_on / n


def test_dacs_three_stage_pipeline_learns(tmp_path):
    exs = _make_examples()
    log_dir = str(tmp_path)
    params = jax.device_get(init_dacs_params(
        DACSConfig(backbone=_BB, stage=0, ad_loss="cel"),
        jax.random.PRNGKey(0)))

    # stage 0: encoder + CTC head learn the tone alphabet (both accents)
    params, ev0 = _stage_train(exs, 0, params, epochs=70, lr=1e-3,
                               log_dir=log_dir)
    assert ev0["eval_wer"] == 0.0, ev0

    # untrained arbitrator: masks are ~Bernoulli(0.5), streams at chance
    _, lm_on0, ad_on0 = _stream_stats(exs, params)
    assert 0.3 < lm_on0 < 0.7 and 0.3 < ad_on0 < 0.7, (lm_on0, ad_on0)

    # stage 1: AD head on the frozen encoder picks up the accent marker
    params, ev1 = _stage_train(exs, 1, params, epochs=150, lr=1e-2,
                               log_dir=log_dir)
    assert ev1["eval_wer"] == 0.0, ev1
    assert ev1["eval_ad_acc"] >= 0.85, ev1

    # stage 2: train only the toggling network
    params, ev2 = _stage_train(exs, 2, params, epochs=200, lr=2e-3,
                               log_dir=log_dir)
    accs, lm_on, ad_on = _stream_stats(exs, params)

    # the lm-masked stream still decodes perfectly...
    assert ev2["eval_wer"] == 0.0, ev2
    # ...while the AD head recovers nothing from it (privacy: GRL pushed
    # the lm mask to drop accent-bearing channels)
    assert accs["lm"] <= 0.6, accs
    # the masks diverged from their random init: the lm mask keeps a
    # majority of channels on, the ad mask turned almost everything off
    # under the reversed-CTC adversary
    assert lm_on >= 0.6, (lm_on, ad_on)
    assert ad_on <= 0.2, (lm_on, ad_on)
    # heads/encoder are frozen in stage 2: the unmasked AD stream still
    # carries the stage-1 classifier's accuracy
    assert accs["unmask"] >= 0.85, accs
