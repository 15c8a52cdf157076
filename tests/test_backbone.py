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


def test_scan_layers_matches_loop():
    """scan_layers=True must be numerically identical to the unrolled loop
    given stacked params."""
    import jax.numpy as jnp
    from privacy_preserve_federated_asr_tpu.models.port import (
        stack_scan_layers, unstack_scan_layers)

    cfg = BackboneConfig.tiny_for_tests(
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    x, lengths = _rand_audio()
    frame_lengths = feat_extract_output_lengths(cfg, lengths)
    t_frames = feat_extract_output_lengths(cfg, T)
    fm = (np.arange(t_frames)[None, :] < frame_lengths[:, None]).astype(np.int32)

    loop_model = SSLBackbone(cfg)
    params = loop_model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    out_loop = loop_model.apply({"params": params}, jnp.asarray(x), jnp.asarray(fm))

    stacked = stack_scan_layers(params, cfg.num_hidden_layers)
    scan_model = SSLBackbone(cfg, scan_layers=True)
    out_scan = scan_model.apply({"params": stacked}, jnp.asarray(x), jnp.asarray(fm))
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=1e-5, atol=1e-6)

    # shape check: scan init produces the same structure we stacked
    scan_init = scan_model.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 scan_init, stacked)

    # round trip
    back = unstack_scan_layers(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, back)


def test_sewd_parity():
    from transformers import SEWDConfig, SEWDModel
    from privacy_preserve_federated_asr_tpu.models.sewd import SEWDBackbone, port_hf_sewd

    cfg = BackboneConfig(
        model_type="sew-d", hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 24), conv_kernel=(10, 3, 1), conv_stride=(5, 2, 1),
        conv_bias=False, feat_extract_norm="group",
        pos_conv_type="single", num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        squeeze_factor=2, position_buckets=16, relative_attention=True,
        pos_att_type=("p2c", "c2p"), norm_rel_ebd="layer_norm",
        max_position_embeddings=64, layer_norm_eps=1e-7,
        feature_layer_norm_eps=1e-5, hidden_act="gelu_python",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0,
    )
    hf_cfg = SEWDConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        feat_extract_norm="group",
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        squeeze_factor=cfg.squeeze_factor, position_buckets=cfg.position_buckets,
        max_position_embeddings=cfg.max_position_embeddings,
        share_att_key=True, relative_attention=True,
        pos_att_type=["p2c", "c2p"], norm_rel_ebd="layer_norm",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, hidden_act="gelu_python",
        layer_norm_eps=cfg.layer_norm_eps,
        feature_layer_norm_eps=cfg.feature_layer_norm_eps,
    )
    torch.manual_seed(3)
    hf = SEWDModel(hf_cfg)
    hf.eval()

    x, lengths = _rand_audio(seed=4)
    attn = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        theirs = hf(torch.tensor(x),
                    attention_mask=torch.tensor(attn)).last_hidden_state.numpy()

    params = port_hf_sewd(hf.state_dict(), cfg, encoder_prefix="")
    frame_lengths = feat_extract_output_lengths(cfg, lengths)
    t_frames = feat_extract_output_lengths(cfg, T)
    fm = (np.arange(t_frames)[None, :] < frame_lengths[:, None]).astype(np.int32)
    ours = np.asarray(SEWDBackbone(cfg).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(fm)))

    assert ours.shape == theirs.shape
    # compare inner valid region (pooled length x squeeze)
    for b in range(B):
        n = (frame_lengths[b] // cfg.squeeze_factor) * cfg.squeeze_factor
        np.testing.assert_allclose(ours[b, :n], theirs[b, :n], rtol=2e-3, atol=3e-4)
