"""Port HF torch checkpoints (data2vec/wav2vec2/hubert/unispeech-sat) to
flax param pytrees for :class:`SSLBackbone` / :class:`DACSModel`.

The reference loads pretrained encoders with ``from_pretrained``
(e.g. facebook/data2vec-audio-large-960h, federated/src/options.py:30); this
module provides the equivalent capability: given a torch ``state_dict``
(or a numpy dict), produce the matching flax params.

Layout conversions:
  * Dense:   torch ``weight [out, in]``        -> ``kernel = weight.T``
  * Conv1d:  torch ``weight [out, in/g, k]``   -> ``kernel = transpose(2,1,0)``
  * LayerNorm/GroupNorm: ``weight`` -> ``scale``
  * weight-normed pos conv (wav2vec2/hubert): ``weight_g``/``weight_v``
    (or ``parametrizations.weight.original{0,1}``) are merged into a plain
    kernel — weight norm is a reparametrization, not a distinct function.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from .config import BackboneConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _merge_weight_norm(sd: Mapping[str, Any], prefix: str) -> np.ndarray:
    """Merge torch weight_norm(g, v) -> effective conv weight [out, in/g, k].

    wav2vec2 uses ``weight_norm(conv, dim=2)``: g has shape [1, 1, k] and v
    is normalized over dims (0, 1) per k-slice. Supports both the legacy
    ``weight_g/weight_v`` and the new ``parametrizations.weight.original*``.
    """
    for g_key, v_key in (
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
    ):
        if g_key in sd:
            g = _np(sd[g_key]).astype(np.float64)
            v = _np(sd[v_key]).astype(np.float64)
            reduce_dims = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
            norm = np.sqrt(np.sum(v * v, axis=reduce_dims, keepdims=True))
            return (g * v / np.maximum(norm, 1e-12)).astype(np.float32)
    return _np(sd[f"{prefix}.weight"])


def port_hf_state_dict(
    state_dict: Mapping[str, Any],
    cfg: BackboneConfig,
    encoder_prefix: str | None = None,
) -> dict:
    """Torch state_dict -> flax params for :class:`SSLBackbone`.

    ``encoder_prefix`` strips a wrapping model attribute (e.g.
    ``"data2vec_audio."`` when porting from a ForCTC checkpoint); if None it
    is auto-detected from common prefixes.
    """
    if encoder_prefix is None:
        for cand in ("data2vec_audio.", "wav2vec2.", "hubert.", "unispeech_sat.", ""):
            if any(k.startswith(cand + "feature_extractor.") for k in state_dict):
                encoder_prefix = cand
                break
        else:
            raise ValueError("could not locate a speech encoder in the state_dict")
    sd = {k[len(encoder_prefix):]: v for k, v in state_dict.items() if k.startswith(encoder_prefix)}

    params: dict = {}

    # ---- feature extractor convs ----
    for i in range(len(cfg.conv_dim)):
        base = f"feature_extractor.conv_layers.{i}"
        _set(params, ("feature_extractor", f"conv_layers_{i}", "conv", "kernel"),
             _np(sd[f"{base}.conv.weight"]).transpose(2, 1, 0))
        if f"{base}.conv.bias" in sd:
            _set(params, ("feature_extractor", f"conv_layers_{i}", "conv", "bias"),
                 _np(sd[f"{base}.conv.bias"]))
        norm_key = f"{base}.layer_norm.weight"
        if norm_key in sd:
            _set(params, ("feature_extractor", f"conv_layers_{i}", "layer_norm", "scale"),
                 _np(sd[norm_key]))
            _set(params, ("feature_extractor", f"conv_layers_{i}", "layer_norm", "bias"),
                 _np(sd[f"{base}.layer_norm.bias"]))

    # ---- feature projection ----
    _set(params, ("feature_projection", "layer_norm", "scale"),
         _np(sd["feature_projection.layer_norm.weight"]))
    _set(params, ("feature_projection", "layer_norm", "bias"),
         _np(sd["feature_projection.layer_norm.bias"]))
    _set(params, ("feature_projection", "projection", "kernel"),
         _np(sd["feature_projection.projection.weight"]).T)
    _set(params, ("feature_projection", "projection", "bias"),
         _np(sd["feature_projection.projection.bias"]))

    # ---- positional conv ----
    if cfg.pos_conv_type == "stacked":
        for i in range(cfg.num_conv_pos_embeddings):
            base = f"encoder.pos_conv_embed.layers.{i}.conv"
            _set(params, ("encoder", "pos_conv_embed", f"layers_{i}", "conv", "kernel"),
                 _np(sd[f"{base}.weight"]).transpose(2, 1, 0))
            _set(params, ("encoder", "pos_conv_embed", f"layers_{i}", "conv", "bias"),
                 _np(sd[f"{base}.bias"]))
    else:
        w = _merge_weight_norm(sd, "encoder.pos_conv_embed.conv")
        _set(params, ("encoder", "pos_conv_embed", "conv", "kernel"), w.transpose(2, 1, 0))
        _set(params, ("encoder", "pos_conv_embed", "conv", "bias"),
             _np(sd["encoder.pos_conv_embed.conv.bias"]))

    # ---- encoder-level layer norm ----
    _set(params, ("encoder", "layer_norm", "scale"), _np(sd["encoder.layer_norm.weight"]))
    _set(params, ("encoder", "layer_norm", "bias"), _np(sd["encoder.layer_norm.bias"]))

    # ---- transformer layers ----
    for i in range(cfg.num_hidden_layers):
        base = f"encoder.layers.{i}"
        dst = ("encoder", f"layers_{i}")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _set(params, dst + ("attention", proj, "kernel"),
                 _np(sd[f"{base}.attention.{proj}.weight"]).T)
            _set(params, dst + ("attention", proj, "bias"),
                 _np(sd[f"{base}.attention.{proj}.bias"]))
        for ln in ("layer_norm", "final_layer_norm"):
            _set(params, dst + (ln, "scale"), _np(sd[f"{base}.{ln}.weight"]))
            _set(params, dst + (ln, "bias"), _np(sd[f"{base}.{ln}.bias"]))
        for dense in ("intermediate_dense", "output_dense"):
            _set(params, dst + ("feed_forward", dense, "kernel"),
                 _np(sd[f"{base}.feed_forward.{dense}.weight"]).T)
            _set(params, dst + ("feed_forward", dense, "bias"),
                 _np(sd[f"{base}.feed_forward.{dense}.bias"]))

    return params


def stack_scan_layers(backbone_params: dict, num_layers: int) -> dict:
    """Convert per-layer encoder params (``layers_{i}``) into the stacked
    layout used by ``scan_layers=True`` (``layers_scan/layer`` with a
    leading layer axis). Same math, one compiled layer."""
    import jax

    enc = dict(backbone_params["encoder"])
    layers = [enc.pop(f"layers_{i}") for i in range(num_layers)]
    enc["layers_scan"] = {"layer": jax.tree.map(
        lambda *xs: np.stack(xs), *layers)}
    out = dict(backbone_params)
    out["encoder"] = enc
    return out


def unstack_scan_layers(backbone_params: dict) -> dict:
    """Inverse of :func:`stack_scan_layers` (stacked -> per-layer names)."""
    import jax

    enc = dict(backbone_params["encoder"])
    stacked = enc.pop("layers_scan")["layer"]
    num_layers = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(num_layers):
        enc[f"layers_{i}"] = jax.tree.map(lambda x: np.asarray(x[i]), stacked)
    out = dict(backbone_params)
    out["encoder"] = enc
    return out


_HEAD_MAP = {
    # torch attribute -> flax module name (reference federated/src/models.py:292-299)
    "lm_head": "lm_head",
    "dementia_head": "dementia_head",
    "arbitrator": "arbitrator",
}


def port_dacs_heads(state_dict: Mapping[str, Any]) -> dict:
    """Port DACS task-head weights (lm_head / dementia_head / arbitrator /
    AM-softmax fc) from a reference ForCTC checkpoint."""
    params: dict = {}
    for torch_name, flax_name in _HEAD_MAP.items():
        wk = f"{torch_name}.weight"
        if wk in state_dict:
            _set(params, (flax_name, "kernel"), _np(state_dict[wk]).T)
            bk = f"{torch_name}.bias"
            if bk in state_dict:
                _set(params, (flax_name, "bias"), _np(state_dict[bk]))
    if "criterion_similar.fc.weight" in state_dict:
        _set(params, ("similar_fc", "kernel"), _np(state_dict["criterion_similar.fc.weight"]).T)
    # multitask N-best heads (reference Data2VecAudioForCTCMultitask_model.py:270-275)
    lm_heads = sorted(
        {int(m.group(1)) for k in state_dict
         if (m := re.match(r"lm_heads\.(\d+)\.weight", k))}
    )
    for i in lm_heads:
        _set(params, (f"lm_heads_{i}", "kernel"), _np(state_dict[f"lm_heads.{i}.weight"]).T)
        _set(params, (f"lm_heads_{i}", "bias"), _np(state_dict[f"lm_heads.{i}.bias"]))
    return params
