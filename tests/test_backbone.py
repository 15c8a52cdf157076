"""Forward-parity tests: flax SSLBackbone vs HF torch models (tiny configs),
via the weight-porting path — proves both the architecture equations and the
checkpoint port are right.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from privacy_preserve_federated_asr_tpu.models import (
    BackboneConfig,
    SSLBackbone,
    feat_extract_output_lengths,
    port_hf_state_dict,
)

B, T = 2, 3200  # 0.2 s of audio


def _forward_ours(cfg, params, x, lengths):
    model = SSLBackbone(cfg)
    frame_len = feat_extract_output_lengths(cfg, x.shape[1])
    fm = (np.arange(frame_len)[None, :] < np.asarray(lengths)[:, None]).astype(np.int32)
    # lengths here are already frame lengths
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(fm))
    return np.asarray(out)


def _rand_audio(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, size=(B, T)).astype(np.float32)
    lengths = np.array([T, T - 1000], dtype=np.int32)
    x[1, lengths[1]:] = 0.0
    return x, lengths


def _check_parity(cfg, torch_model, encoder_prefix=""):
    torch_model.eval()
    x, lengths = _rand_audio()
    attn = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        theirs = torch_model(
            torch.tensor(x), attention_mask=torch.tensor(attn)
        ).last_hidden_state.numpy()

    params = port_hf_state_dict(torch_model.state_dict(), cfg, encoder_prefix=encoder_prefix)
    frame_lengths = feat_extract_output_lengths(cfg, lengths)
    ours_model = SSLBackbone(cfg)
    t_frames = feat_extract_output_lengths(cfg, T)
    fm = (np.arange(t_frames)[None, :] < frame_lengths[:, None]).astype(np.int32)
    ours = np.asarray(ours_model.apply({"params": params}, jnp.asarray(x), jnp.asarray(fm)))

    assert ours.shape == theirs.shape
    # only compare valid frames (HF leaves padded-frame outputs unmasked garbage)
    for b in range(B):
        n = frame_lengths[b]
        np.testing.assert_allclose(ours[b, :n], theirs[b, :n], rtol=5e-4, atol=2e-5)


def test_data2vec_audio_parity():
    from transformers import Data2VecAudioConfig, Data2VecAudioModel

    cfg = BackboneConfig.tiny_for_tests()
    hf_cfg = Data2VecAudioConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        conv_pos_kernel_size=cfg.conv_pos_kernel_size,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
    )
    torch.manual_seed(0)
    _check_parity(cfg, Data2VecAudioModel(hf_cfg))


@pytest.mark.parametrize("stable_ln,fe_norm", [(True, "layer"), (False, "group")])
def test_wav2vec2_parity(stable_ln, fe_norm):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = BackboneConfig.tiny_for_tests(
        model_type="wav2vec2", pos_conv_type="single", num_conv_pos_embeddings=16,
        do_stable_layer_norm=stable_ln, feat_extract_norm=fe_norm, conv_bias=(fe_norm == "layer"),
    )
    hf_cfg = Wav2Vec2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=stable_ln, feat_extract_norm=fe_norm,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
    )
    torch.manual_seed(1)
    _check_parity(cfg, Wav2Vec2Model(hf_cfg))


def test_hubert_parity():
    from transformers import HubertConfig, HubertModel

    cfg = BackboneConfig.tiny_for_tests(
        model_type="hubert", pos_conv_type="single", num_conv_pos_embeddings=16,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )
    hf_cfg = HubertConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads, intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
    )
    torch.manual_seed(2)
    _check_parity(cfg, HubertModel(hf_cfg))


def test_feat_extract_output_lengths_matches_hf():
    from transformers import Data2VecAudioConfig, Data2VecAudioModel

    cfg = BackboneConfig.tiny_for_tests()
    hf_cfg = Data2VecAudioConfig(conv_kernel=list(cfg.conv_kernel),
                                 conv_stride=list(cfg.conv_stride),
                                 conv_dim=list(cfg.conv_dim))
    m = Data2VecAudioModel(hf_cfg)
    for n in [1600, 3200, 12345, 160000]:
        theirs = int(m._get_feat_extract_output_lengths(torch.tensor(n)))
        assert feat_extract_output_lengths(cfg, n) == theirs
