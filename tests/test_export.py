"""Reverse-port tests: flax params -> HF torch state_dict (models/export.py).

Two guarantees: (a) port(export(params)) round-trips bit-exactly, and
(b) the exported dict loads into a real HF torch module with strict=True
and the torch forward matches our flax forward — i.e. a model trained here
is consumable by the reference world."""

import jax
import numpy as np
import pytest
import torch

from privacy_preserve_federated_asr_tpu.models import (
    BackboneConfig,
    DACSConfig,
    port_hf_state_dict,
)
from privacy_preserve_federated_asr_tpu.models.export import (
    export_dacs_heads,
    export_for_ctc_state_dict,
    export_hf_state_dict,
)
from privacy_preserve_federated_asr_tpu.models.port import (
    port_dacs_heads,
    stack_scan_layers,
)
from privacy_preserve_federated_asr_tpu.train.train_state import init_dacs_params


def _init_backbone(cfg, seed=0):
    from privacy_preserve_federated_asr_tpu.models import SSLBackbone

    import jax.numpy as jnp

    model = SSLBackbone(cfg)
    return model.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 3200), jnp.float32))["params"]


def _assert_trees_equal(a, b):
    # weight-normed pos-conv kernels round-trip only to fp32 rounding (the
    # split's g is stored rounded); everything else is bit-exact, which
    # rtol=1e-6 also accepts
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, va in la:
        np.testing.assert_allclose(np.asarray(va, np.float32),
                                   np.asarray(lb[path], np.float32),
                                   rtol=1e-6, atol=1e-8, err_msg=str(path))


@pytest.mark.parametrize("kind", ["stacked", "single"])
def test_export_port_roundtrip(kind):
    if kind == "stacked":
        cfg = BackboneConfig.tiny_for_tests()
    else:
        cfg = BackboneConfig.tiny_for_tests(
            model_type="wav2vec2", pos_conv_type="single",
            num_conv_pos_embeddings=16, do_stable_layer_norm=True)
    params = _init_backbone(cfg)
    for style in ("parametrizations", "legacy"):
        sd = export_hf_state_dict(params, cfg, weight_norm_style=style)
        back = port_hf_state_dict(sd, cfg, encoder_prefix="")
        _assert_trees_equal(params, back)


def test_export_accepts_scan_layout():
    cfg = BackboneConfig.tiny_for_tests()
    params = _init_backbone(cfg)
    stacked = stack_scan_layers(params, cfg.num_hidden_layers)
    sd_a = export_hf_state_dict(params, cfg)
    sd_b = export_hf_state_dict(stacked, cfg)
    assert sd_a.keys() == sd_b.keys()
    for k in sd_a:
        np.testing.assert_array_equal(sd_a[k], sd_b[k])


def test_exported_state_dict_loads_into_hf_torch_strict_and_matches():
    """Export -> torch load_state_dict(strict=True) -> forward parity."""
    from transformers import Data2VecAudioConfig, Data2VecAudioModel

    cfg = BackboneConfig.tiny_for_tests()
    params = _init_backbone(cfg, seed=3)
    hf_cfg = Data2VecAudioConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        conv_pos_kernel_size=cfg.conv_pos_kernel_size,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0,
    )
    torch.manual_seed(0)
    hf = Data2VecAudioModel(hf_cfg)
    sd = {k: torch.from_numpy(v.copy())
          for k, v in export_hf_state_dict(params, cfg).items()}
    # keep HF's own init for params our backbone never uses (e.g.
    # masked_spec_embed when the config instantiates SpecAugment —
    # mask_time_prob=0 everywhere in the reference recipes)
    for k, v in hf.state_dict().items():
        sd.setdefault(k, v)
    hf.load_state_dict(sd, strict=True)
    hf.eval()

    import jax.numpy as jnp

    from privacy_preserve_federated_asr_tpu.models import (
        SSLBackbone,
        feat_extract_output_lengths,
    )

    x = np.random.default_rng(4).normal(0, 1, (2, 3200)).astype(np.float32)
    with torch.no_grad():
        theirs = hf(torch.tensor(x)).last_hidden_state.numpy()
    t_frames = int(feat_extract_output_lengths(cfg, 3200))
    fm = np.ones((2, t_frames), np.int32)
    ours = np.asarray(SSLBackbone(cfg).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(fm)))
    np.testing.assert_allclose(ours, theirs, rtol=5e-4, atol=2e-5)


def test_exported_weight_norm_loads_into_wav2vec2_strict():
    """The split weight-norm keys must satisfy torch's parametrization:
    load strict=True into a weight-normed HF pos-conv and round-trip the
    effective weight."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = BackboneConfig.tiny_for_tests(
        model_type="wav2vec2", pos_conv_type="single",
        num_conv_pos_embeddings=16, do_stable_layer_norm=True)
    params = _init_backbone(cfg, seed=5)
    hf_cfg = Wav2Vec2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0,
    )
    torch.manual_seed(1)
    hf = Wav2Vec2Model(hf_cfg)
    hf_keys = set(hf.state_dict().keys())
    style = ("parametrizations"
             if any("parametrizations" in k for k in hf_keys) else "legacy")
    sd = {k: torch.from_numpy(v.copy()) for k, v in export_hf_state_dict(
        params, cfg, weight_norm_style=style).items()}
    for k, v in hf.state_dict().items():
        sd.setdefault(k, v)
    hf.load_state_dict(sd, strict=True)
    with torch.no_grad():
        eff = hf.encoder.pos_conv_embed.conv.weight.detach().numpy()
    want = np.transpose(
        np.asarray(params["encoder"]["pos_conv_embed"]["conv"]["kernel"]),
        (2, 1, 0))
    np.testing.assert_allclose(eff, want, rtol=1e-6, atol=1e-7)


def test_head_export_roundtrip():
    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(), stage=2,
                     num_lms=3)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    sd = export_dacs_heads(params)
    assert {"lm_head.weight", "dementia_head.weight", "arbitrator.weight",
            "criterion_similar.fc.weight", "lm_heads.0.weight",
            "lm_heads.2.bias"} <= set(sd)
    back = port_dacs_heads(sd)
    for name in ("lm_head", "dementia_head", "arbitrator"):
        np.testing.assert_array_equal(
            np.asarray(params[name]["kernel"], np.float32),
            back[name]["kernel"])
        np.testing.assert_array_equal(
            np.asarray(params[name]["bias"], np.float32), back[name]["bias"])
    np.testing.assert_array_equal(
        np.asarray(params["similar_fc"]["kernel"], np.float32),
        back["similar_fc"]["kernel"])


def test_for_ctc_export_prefixes_encoder():
    cfg = DACSConfig(backbone=BackboneConfig.tiny_for_tests(), stage=2)
    params = init_dacs_params(cfg, jax.random.PRNGKey(0))
    sd = export_for_ctc_state_dict(params, cfg.backbone)
    assert any(k.startswith("data2vec_audio.feature_extractor.") for k in sd)
    assert "lm_head.weight" in sd and "arbitrator.weight" in sd
    # and the ported-back backbone matches
    back = port_hf_state_dict(sd, cfg.backbone)
    _assert_trees_equal(params["backbone"], back)
