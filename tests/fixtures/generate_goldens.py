"""Generate golden port fixtures: per backbone family, a tiny seeded HF
torch checkpoint + input + HF forward output, frozen into an .npz.

Run once (requires torch + transformers, both baked into this image):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/fixtures/generate_goldens.py

The committed fixtures decouple the parity tests from in-process HF module
construction: tests/test_golden_port.py ports each frozen state_dict and
must reproduce the frozen HF logits — if our port or forward drifts from
the real checkpoint layout, the goldens catch it even if transformers'
in-process behavior drifts too (VERDICT r1 "Next #5a").
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
B, T = 2, 3200


def _rand_audio(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, size=(B, T)).astype(np.float32)
    lengths = np.array([T, T - 1000], dtype=np.int32)
    x[1, lengths[1]:] = 0.0
    return x, lengths


def _cfg_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg))


def _save(name, cfg, model, torch, seed_audio):
    model.eval()
    x, lengths = _rand_audio(seed_audio)
    attn = (np.arange(T)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        expected = model(torch.tensor(x),
                         attention_mask=torch.tensor(attn)).last_hidden_state.numpy()
    arrays = {f"sd/{k}": v.detach().cpu().numpy()
              for k, v in model.state_dict().items()}
    np.savez_compressed(
        HERE / f"golden_{name}.npz", x=x, lengths=lengths, expected=expected,
        meta=np.frombuffer(_cfg_json(cfg).encode(), dtype=np.uint8), **arrays)
    print(f"golden_{name}.npz: {len(arrays)} tensors, "
          f"expected {expected.shape}")


def main():
    import torch

    from privacy_preserve_federated_asr_tpu.models import BackboneConfig

    # --- data2vec-audio ---------------------------------------------------
    from transformers import Data2VecAudioConfig, Data2VecAudioModel

    cfg = BackboneConfig.tiny_for_tests()
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
        mask_time_prob=0.0)
    torch.manual_seed(10)
    _save("data2vec", cfg, Data2VecAudioModel(hf_cfg), torch, seed_audio=20)

    # --- wav2vec2 (base layout: group-norm FE, no stable LN) --------------
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    cfg = BackboneConfig.tiny_for_tests(
        model_type="wav2vec2", pos_conv_type="single",
        num_conv_pos_embeddings=16, do_stable_layer_norm=False,
        feat_extract_norm="group", conv_bias=False)
    hf_cfg = Wav2Vec2Config(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=False, feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0)
    torch.manual_seed(11)
    _save("wav2vec2", cfg, Wav2Vec2Model(hf_cfg), torch, seed_audio=21)

    # --- hubert (large layout: layer-norm FE, stable LN) -------------------
    from transformers import HubertConfig, HubertModel

    cfg = BackboneConfig.tiny_for_tests(
        model_type="hubert", pos_conv_type="single",
        num_conv_pos_embeddings=16, do_stable_layer_norm=True,
        feat_extract_norm="layer")
    hf_cfg = HubertConfig(
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
        mask_time_prob=0.0)
    torch.manual_seed(12)
    _save("hubert", cfg, HubertModel(hf_cfg), torch, seed_audio=22)

    # --- unispeech-sat ------------------------------------------------------
    from transformers import UniSpeechSatConfig, UniSpeechSatModel

    cfg = BackboneConfig.tiny_for_tests(
        model_type="unispeech-sat", pos_conv_type="single",
        num_conv_pos_embeddings=16, do_stable_layer_norm=True,
        feat_extract_norm="layer", conv_bias=True)
    hf_cfg = UniSpeechSatConfig(
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
        mask_time_prob=0.0)
    torch.manual_seed(13)
    _save("unispeech_sat", cfg, UniSpeechSatModel(hf_cfg), torch, seed_audio=23)

    # --- SEW-D --------------------------------------------------------------
    from transformers import SEWDConfig, SEWDModel

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
        feat_proj_dropout=0.0, final_dropout=0.0)
    hf_cfg = SEWDConfig(
        hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=list(cfg.conv_dim), conv_kernel=list(cfg.conv_kernel),
        conv_stride=list(cfg.conv_stride), conv_bias=cfg.conv_bias,
        feat_extract_norm="group",
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups,
        squeeze_factor=cfg.squeeze_factor,
        position_buckets=cfg.position_buckets,
        max_position_embeddings=cfg.max_position_embeddings,
        share_att_key=True, relative_attention=True,
        pos_att_type=["p2c", "c2p"], norm_rel_ebd="layer_norm",
        hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, layerdrop=0.0,
        mask_time_prob=0.0, hidden_act="gelu_python",
        layer_norm_eps=cfg.layer_norm_eps,
        feature_layer_norm_eps=cfg.feature_layer_norm_eps)
    torch.manual_seed(14)
    _save("sewd", cfg, SEWDModel(hf_cfg), torch, seed_audio=24)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    main()
