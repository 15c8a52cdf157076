"""Golden checkpoint-port fixtures: frozen tiny HF state_dicts + frozen HF
forward outputs per backbone family (tests/fixtures/golden_*.npz, produced
by generate_goldens.py). Porting the frozen state_dict and running OUR
forward must reproduce the frozen HF logits — catches port-layout or
forward drift independent of in-process transformers behavior."""

import dataclasses
import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.models import (
    BackboneConfig,
    SSLBackbone,
    feat_extract_output_lengths,
    port_hf_state_dict,
)

FIXTURES = Path(__file__).parent / "fixtures"
FAMILIES = ["data2vec", "wav2vec2", "hubert", "unispeech_sat", "sewd"]


def _load(name):
    z = np.load(FIXTURES / f"golden_{name}.npz")
    meta = json.loads(bytes(z["meta"]).decode())
    # json round-trip turns tuples into lists; BackboneConfig wants tuples
    tuple_fields = {f.name for f in dataclasses.fields(BackboneConfig)
                    if isinstance(getattr(BackboneConfig(), f.name), tuple)}
    cfg = BackboneConfig(**{
        k: tuple(v) if k in tuple_fields and isinstance(v, list) else v
        for k, v in meta.items()})
    sd = {k[len("sd/"):]: z[k] for k in z.files if k.startswith("sd/")}
    return cfg, sd, z["x"], z["lengths"], z["expected"]


@pytest.mark.parametrize("name", FAMILIES)
def test_golden_port_reproduces_hf_logits(name):
    cfg, sd, x, lengths, expected = _load(name)
    frame_lengths = feat_extract_output_lengths(cfg, lengths)
    t_frames = feat_extract_output_lengths(cfg, x.shape[1])
    fm = (np.arange(t_frames)[None, :] <
          np.asarray(frame_lengths)[:, None]).astype(np.int32)

    if name == "sewd":
        from privacy_preserve_federated_asr_tpu.models.sewd import (
            SEWDBackbone, port_hf_sewd)

        params = port_hf_sewd(sd, cfg, encoder_prefix="")
        ours = np.asarray(SEWDBackbone(cfg).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(fm)))
        tol = dict(rtol=2e-3, atol=3e-4)
    else:
        params = port_hf_state_dict(sd, cfg, encoder_prefix="")
        ours = np.asarray(SSLBackbone(cfg).apply(
            {"params": params}, jnp.asarray(x), jnp.asarray(fm)))
        tol = dict(rtol=5e-4, atol=5e-5)

    assert ours.shape == expected.shape
    for b, n in enumerate(frame_lengths):
        if name == "sewd":
            n = (int(n) // cfg.squeeze_factor) * cfg.squeeze_factor
        np.testing.assert_allclose(ours[b, :n], expected[b, :n], **tol)
