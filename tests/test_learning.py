"""End-to-end learning proof: the full pipeline (conv frontend ->
transformer -> CTC -> greedy decode -> WER) learns tone-coded synthetic
speech, where each character is a distinct sine frequency. A fresh tiny
model reaches low WER within ~100 steps; random chance is ~100% WER."""

import numpy as np
import jax

from privacy_preserve_federated_asr_tpu.data.audio import normalize_input_values
from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.train.trainer import Trainer, TrainerConfig
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params

TOK = CTCCharTokenizer()
CHARS = {"A": 440.0, "B": 880.0, "C": 1320.0, "D": 1760.0}
SR, DUR = 16000, 0.2


def _synth(text, rng):
    segs = [np.sin(2 * np.pi * CHARS[ch] * np.arange(int(SR * DUR)) / SR)
            for ch in text]
    sig = np.concatenate(segs) + rng.normal(0, 0.05, int(SR * DUR) * len(text))
    return sig.astype(np.float32)


def test_ctc_pipeline_learns_tone_coded_speech():
    rng = np.random.default_rng(0)
    words = ["AB", "BA", "CAD", "DC", "ABC", "CB", "AD", "BD", "DAB", "CA",
             "BC", "DA"]
    exs = []
    for i, w in enumerate(words * 2):
        sig = _synth(w, rng)
        exs.append(AsrExample(
            path=f"S{i:03d}_PAR_0_{i}.wav", array=sig, text=w,
            dementia_label=i % 2, input_values=normalize_input_values(sig),
            labels=np.asarray(TOK.encode(w), dtype=np.int32)))

    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        final_dropout=0.0), stage=0, ad_loss="cel")
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    tr = Trainer(cfg, params, exs, exs, TOK, TrainerConfig(
        num_epochs=45, batch_size=8, time_multiple=3200, learning_rate=1e-3,
        warmup_steps=20, logging_steps=10000, eval_steps=100000))
    tr.train()
    ev = tr.evaluate()
    # perfect 0.0 at 60 epochs; leave slack for the shortened schedule
    assert ev["eval_wer"] < 0.3, ev
