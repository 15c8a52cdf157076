"""Export flax param pytrees back to HF torch ``state_dict`` layout — the
inverse of :mod:`models.port`.

The reference world consumes HF checkpoints (``from_pretrained`` /
``load_state_dict``, e.g. federated/src/update.py:223-283 weight surgery);
this module closes the migration loop: train on TPU here, export, and any
reference-style torch pipeline (or plain HF ``Wav2Vec2ForCTC``-family
model) can load the result with ``strict=True``.

Layout conversions (exact inverses of port.py):
  * Dense:   ``kernel`` -> ``weight = kernel.T``
  * Conv1d:  ``kernel [k, in/g, out]`` -> ``weight = transpose(2, 1, 0)``
  * LayerNorm/GroupNorm: ``scale`` -> ``weight``
  * weight-normed pos conv (wav2vec2/hubert "single"): the merged kernel W
    splits as ``v = W``, ``g = ||W||`` over the non-kept dims (weight_norm
    dim=2), so ``g * v/||v|| == W`` exactly. Key style is selectable:
    legacy ``weight_g/weight_v`` or torch>=2 ``parametrizations.weight.
    original{0,1}``.
"""

from __future__ import annotations

import numpy as np

from .config import BackboneConfig


def _np32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _split_weight_norm(w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merged conv weight [out, in/g, k] -> (g [1,1,k], v [out,in/g,k]) with
    ``weight_norm(v, g, dim=2)`` reproducing ``w`` exactly."""
    g = np.sqrt(np.sum(w.astype(np.float64) ** 2, axis=(0, 1), keepdims=True))
    return g.astype(np.float32), _np32(w)


def export_hf_state_dict(
    backbone_params: dict,
    cfg: BackboneConfig,
    encoder_prefix: str = "",
    weight_norm_style: str = "parametrizations",
) -> dict:
    """Flax :class:`SSLBackbone` params -> HF torch ``state_dict`` (numpy
    values; wrap with ``torch.from_numpy`` to load). ``encoder_prefix``
    prepends a wrapping attribute (e.g. ``"data2vec_audio."`` for a ForCTC
    layout). ``weight_norm_style``: "parametrizations" (torch >= 2 modules)
    or "legacy" (weight_g/weight_v)."""
    p = backbone_params
    if "layers_scan" in p.get("encoder", {}):
        from .port import unstack_scan_layers

        p = unstack_scan_layers(p)
    sd: dict[str, np.ndarray] = {}

    def put(key: str, value: np.ndarray) -> None:
        sd[encoder_prefix + key] = _np32(value)

    # ---- feature extractor convs ----
    for i in range(len(cfg.conv_dim)):
        src = p["feature_extractor"][f"conv_layers_{i}"]
        base = f"feature_extractor.conv_layers.{i}"
        put(f"{base}.conv.weight", np.transpose(src["conv"]["kernel"], (2, 1, 0)))
        if "bias" in src["conv"]:
            put(f"{base}.conv.bias", src["conv"]["bias"])
        if "layer_norm" in src:
            put(f"{base}.layer_norm.weight", src["layer_norm"]["scale"])
            put(f"{base}.layer_norm.bias", src["layer_norm"]["bias"])

    # ---- feature projection ----
    fp = p["feature_projection"]
    put("feature_projection.layer_norm.weight", fp["layer_norm"]["scale"])
    put("feature_projection.layer_norm.bias", fp["layer_norm"]["bias"])
    put("feature_projection.projection.weight", np.asarray(fp["projection"]["kernel"]).T)
    put("feature_projection.projection.bias", fp["projection"]["bias"])

    # ---- positional conv ----
    enc = p["encoder"]
    if cfg.pos_conv_type == "stacked":
        for i in range(cfg.num_conv_pos_embeddings):
            conv = enc["pos_conv_embed"][f"layers_{i}"]["conv"]
            base = f"encoder.pos_conv_embed.layers.{i}.conv"
            put(f"{base}.weight", np.transpose(conv["kernel"], (2, 1, 0)))
            put(f"{base}.bias", conv["bias"])
    else:
        conv = enc["pos_conv_embed"]["conv"]
        w = np.transpose(np.asarray(conv["kernel"]), (2, 1, 0))
        g, v = _split_weight_norm(w)
        if weight_norm_style == "legacy":
            gk, vk = ("encoder.pos_conv_embed.conv.weight_g",
                      "encoder.pos_conv_embed.conv.weight_v")
        elif weight_norm_style == "parametrizations":
            gk, vk = ("encoder.pos_conv_embed.conv.parametrizations.weight.original0",
                      "encoder.pos_conv_embed.conv.parametrizations.weight.original1")
        else:
            raise ValueError(f"unknown weight_norm_style {weight_norm_style!r}")
        put(gk, g)
        put(vk, v)
        put("encoder.pos_conv_embed.conv.bias", conv["bias"])

    # ---- encoder-level layer norm ----
    put("encoder.layer_norm.weight", enc["layer_norm"]["scale"])
    put("encoder.layer_norm.bias", enc["layer_norm"]["bias"])

    # ---- transformer layers ----
    for i in range(cfg.num_hidden_layers):
        src = enc[f"layers_{i}"]
        base = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(f"{base}.attention.{proj}.weight",
                np.asarray(src["attention"][proj]["kernel"]).T)
            put(f"{base}.attention.{proj}.bias", src["attention"][proj]["bias"])
        for ln in ("layer_norm", "final_layer_norm"):
            put(f"{base}.{ln}.weight", src[ln]["scale"])
            put(f"{base}.{ln}.bias", src[ln]["bias"])
        for dense in ("intermediate_dense", "output_dense"):
            put(f"{base}.feed_forward.{dense}.weight",
                np.asarray(src["feed_forward"][dense]["kernel"]).T)
            put(f"{base}.feed_forward.{dense}.bias", src["feed_forward"][dense]["bias"])

    return sd


def export_dacs_heads(params: dict) -> dict:
    """DACS task heads -> reference ForCTC ``state_dict`` keys
    (federated/src/models.py:292-299; multitask lm_heads per
    Data2VecAudioForCTCMultitask_model.py:270-275)."""
    sd: dict[str, np.ndarray] = {}
    for flax_name, torch_name in (("lm_head", "lm_head"),
                                  ("dementia_head", "dementia_head"),
                                  ("arbitrator", "arbitrator")):
        if flax_name in params:
            sd[f"{torch_name}.weight"] = _np32(np.asarray(params[flax_name]["kernel"]).T)
            if "bias" in params[flax_name]:
                sd[f"{torch_name}.bias"] = _np32(params[flax_name]["bias"])
    if "similar_fc" in params:
        sd["criterion_similar.fc.weight"] = _np32(
            np.asarray(params["similar_fc"]["kernel"]).T)
    i = 0
    while f"lm_heads_{i}" in params:
        sd[f"lm_heads.{i}.weight"] = _np32(np.asarray(params[f"lm_heads_{i}"]["kernel"]).T)
        sd[f"lm_heads.{i}.bias"] = _np32(params[f"lm_heads_{i}"]["bias"])
        i += 1
    return sd


def export_for_ctc_state_dict(params: dict, cfg: BackboneConfig,
                              weight_norm_style: str = "parametrizations") -> dict:
    """Full reference-style ForCTC export: encoder under its HF attribute
    name + task heads at the top level — loadable by the reference's
    ``update_network_weight`` surgery and by HF ForCTC models (the plain
    lm_head maps 1:1)."""
    prefix = {
        "data2vec-audio": "data2vec_audio.",
        "wav2vec2": "wav2vec2.",
        "hubert": "hubert.",
        "unispeech-sat": "unispeech_sat.",
    }.get(cfg.model_type)
    if prefix is None:
        raise ValueError(f"no ForCTC export mapping for {cfg.model_type!r}")
    sd = export_hf_state_dict(params["backbone"], cfg, encoder_prefix=prefix,
                              weight_norm_style=weight_norm_style)
    sd.update(export_dacs_heads(params))
    return sd
