from .config import BackboneConfig, DACSConfig
from .backbone import SSLBackbone, feat_extract_output_lengths
from .dacs import DACSModel, DACSOutputs
from .export import export_for_ctc_state_dict, export_hf_state_dict
from .port import port_hf_state_dict
from .recipes import RECIPES, Recipe, get_recipe, init_recipe_params
from .whisper import (
    WhisperConfigT,
    WhisperModel,
    chunk_samples,
    compression_ratio,
    config_from_hf,
    decode_with_stats,
    greedy_decode,
    log_mel_spectrogram,
    port_hf_whisper,
)

__all__ = [
    "WhisperConfigT",
    "WhisperModel",
    "chunk_samples",
    "compression_ratio",
    "config_from_hf",
    "decode_with_stats",
    "greedy_decode",
    "log_mel_spectrogram",
    "port_hf_whisper",
    "BackboneConfig",
    "DACSConfig",
    "SSLBackbone",
    "feat_extract_output_lengths",
    "DACSModel",
    "DACSOutputs",
    "port_hf_state_dict",
    "export_hf_state_dict",
    "export_for_ctc_state_dict",
    "RECIPES",
    "Recipe",
    "get_recipe",
    "init_recipe_params",
]
