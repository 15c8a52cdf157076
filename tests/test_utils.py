"""Tests: experiment harnesses, profiling, SpecAugment."""

import jax
import jax.numpy as jnp
import numpy as np

from privacy_preserve_federated_asr_tpu.data.dataset import AsrExample
from privacy_preserve_federated_asr_tpu.data.tokenizer import CTCCharTokenizer
from privacy_preserve_federated_asr_tpu.models import BackboneConfig, DACSConfig
from privacy_preserve_federated_asr_tpu.models.backbone import SSLBackbone, sample_span_mask
from privacy_preserve_federated_asr_tpu.train.trainer import TrainerConfig
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params
from privacy_preserve_federated_asr_tpu.utils import (
    StepProfiler,
    exp_details,
    grid_search,
    train_50_50,
)

TOK = CTCCharTokenizer()


def _examples(n=8, seed=0, speakers=("S000", "S001", "S002", "S003")):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        arr = rng.normal(0, 1, 3200).astype(np.float32)
        text = ["HI", "OK GO"][i % 2]
        out.append(AsrExample(
            path=f"{speakers[i % len(speakers)]}_PAR_0_{i}.wav", array=arr,
            text=text, dementia_label=i % 2, input_values=arr,
            labels=np.asarray(TOK.encode(text), dtype=np.int32)))
    return out


def _cfg(stage=0):
    return DACSConfig(
        backbone=BackboneConfig.tiny_for_tests(
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            final_dropout=0.0),
        stage=stage, ad_loss="cel")


def test_exp_details_prints_config():
    text = exp_details(_cfg(2), extra={"rounds": 3})
    assert "Current Stage   : 2" in text and "rounds" in text


def test_grid_search_returns_best():
    cfg = _cfg(0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    tcfg = TrainerConfig(num_epochs=1, batch_size=4, time_multiple=3200,
                         warmup_steps=1, logging_steps=100)
    best, rows = grid_search(
        cfg, tcfg, {"learning_rate": [1e-4, 1e-3], "gs_tau": [0.5]},
        params, _examples(4), _examples(4, seed=1), TOK)
    assert len(rows) == 2
    assert best["eval_wer"] == min(r["eval_wer"] for r in rows)
    assert {"learning_rate", "gs_tau", "eval_wer"} <= set(rows[0])


def test_train_50_50_curriculum():
    cfg = _cfg(0)
    params = init_dacs_params(cfg, jax.random.PRNGKey(1))
    exs = _examples(8)
    tcfg = TrainerConfig(num_epochs=1, batch_size=2, time_multiple=3200,
                         warmup_steps=1, logging_steps=100)
    out = train_50_50(cfg, tcfg, params, exs, None, TOK,
                      first_speakers=["S000", "S001"],
                      second_speakers=["S002", "S003"])
    assert not np.allclose(np.asarray(out["lm_head"]["kernel"]),
                           np.asarray(params["lm_head"]["kernel"]))


def test_step_profiler():
    prof = StepProfiler()
    for _ in range(3):
        with prof:
            pass
    s = prof.summary()
    assert s["steps"] == 3 and s["p90_ms"] >= 0


def test_sample_span_mask_coverage_and_padding():
    rng = jax.random.PRNGKey(0)
    valid = jnp.ones((8, 200), dtype=jnp.int32).at[:, 150:].set(0)
    m = sample_span_mask(rng, (8, 200), mask_prob=0.3, mask_length=10,
                         valid_mask=valid)
    cov = float(jnp.mean(m[:, :150].astype(jnp.float32)))
    assert 0.1 < cov < 0.5  # expected ~0.3
    # spans can bleed at most mask_length-1 past the last valid start
    assert float(jnp.sum(m[:, 159:].astype(jnp.float32))) == 0.0


def test_spec_augment_applies_only_in_training():
    cfg = BackboneConfig.tiny_for_tests(mask_time_prob=0.5, mask_feature_prob=0.2,
                                        hidden_dropout=0.0, attention_dropout=0.0,
                                        activation_dropout=0.0)
    model = SSLBackbone(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 3200)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x,
                        deterministic=False)["params"]
    assert "masked_spec_embed" in params
    out_train1 = model.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(2)})
    out_train2 = model.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(3)})
    out_eval = model.apply({"params": params}, x, deterministic=True)
    assert not np.allclose(np.asarray(out_train1), np.asarray(out_train2))
    out_eval2 = model.apply({"params": params}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


def test_jsonl_logger_csv_dump(tmp_path):
    from privacy_preserve_federated_asr_tpu.train.logging import JsonlLogger

    lg = JsonlLogger(str(tmp_path), "log.txt", echo=False)
    lg.log({"loss": 1.5, "step": 1})
    lg.log({"eval_wer": 0.3, "step": 2})
    lg.dump_scalars_csv(str(tmp_path / "scalars.csv"))
    lines = (tmp_path / "scalars.csv").read_text().strip().splitlines()
    assert lines[0].split(",") == ["eval_wer", "loss", "step"]
    assert len(lines) == 3
    import json
    rows = [json.loads(l) for l in (tmp_path / "log.txt").read_text().splitlines()]
    assert rows[0]["loss"] == 1.5
