from .config import BackboneConfig, DACSConfig
from .backbone import SSLBackbone, feat_extract_output_lengths
from .dacs import DACSModel, DACSOutputs
from .port import port_hf_state_dict

__all__ = [
    "BackboneConfig",
    "DACSConfig",
    "SSLBackbone",
    "feat_extract_output_lengths",
    "DACSModel",
    "DACSOutputs",
    "port_hf_state_dict",
]
