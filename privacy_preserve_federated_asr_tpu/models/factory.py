"""Backbone factory: model_type -> encoder module."""

from __future__ import annotations

import jax.numpy as jnp

from .backbone import SSLBackbone
from .config import BackboneConfig
from .sewd import SEWDBackbone


def make_backbone(cfg: BackboneConfig, dtype: jnp.dtype = jnp.float32,
                  remat: bool = False, scan_layers: bool = False,
                  name: str = "backbone"):
    """SSLBackbone for wav2vec2/hubert/data2vec/unispeech-sat; SEWDBackbone
    for the squeezed DeBERTa-style encoder."""
    if cfg.model_type == "sew-d":
        return SEWDBackbone(cfg, dtype, remat, scan_layers, name=name)
    return SSLBackbone(cfg, dtype, remat, scan_layers, name=name)
