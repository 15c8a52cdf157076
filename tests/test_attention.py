"""Pallas flash attention vs XLA attention: forward + gradients, masking,
non-multiple sequence lengths (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from privacy_preserve_federated_asr_tpu.ops.attention import (
    attention_xla,
    multihead_attention,
)

B, H, D = 2, 4, 16


def _inputs(t, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, t, H, D)).astype(np.float32))
               for _ in range(3))
    lengths = np.array([t, max(t // 2, 1)])
    mask = jnp.asarray((np.arange(t)[None, :] < lengths[:, None]).astype(np.int32))
    return q, k, v, mask


@pytest.mark.parametrize("t", [128, 256])
def test_flash_forward_matches_xla(t):
    q, k, v, mask = _inputs(t)
    ref = attention_xla(q, k, v, mask)
    got = multihead_attention(q, k, v, mask, impl="pallas", block=128)
    # compare valid query rows (padded-query rows are junk in both);
    # tolerances cover TPU execution where the Mosaic kernel and the XLA
    # einsum accumulate in different orders/precisions
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-2, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got[1, : t // 2]),
                               np.asarray(ref[1, : t // 2]), rtol=1e-2, atol=5e-3)


def test_flash_pads_non_multiple_lengths():
    q, k, v, mask = _inputs(100)
    ref = attention_xla(q, k, v, mask)
    got = multihead_attention(q, k, v, mask, impl="pallas", block=128)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-2, atol=5e-3)


def test_flash_gradients_match_xla():
    q, k, v, mask = _inputs(128, seed=1)
    g_out = jnp.asarray(np.random.default_rng(2).normal(
        0, 1, q.shape).astype(np.float32))
    # zero the cotangent on invalid query rows: their outputs are undefined
    valid_q = mask[:, :, None, None].astype(jnp.float32)
    g_out = g_out * valid_q

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v, mask) * g_out)
        return f

    ref_grads = jax.grad(loss(lambda *a: attention_xla(*a)), argnums=(0, 1, 2))(q, k, v)
    got_grads = jax.grad(
        loss(lambda *a: multihead_attention(*a, impl="pallas", block=128)),
        argnums=(0, 1, 2))(q, k, v)
    for gr, gg, name in zip(ref_grads, got_grads, "qkv"):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gr),
                                   rtol=1e-2, atol=5e-3, err_msg=name)


def test_backbone_with_pallas_attention_matches_xla():
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, SSLBackbone
    from privacy_preserve_federated_asr_tpu.models.backbone import (
        feat_extract_output_lengths)

    cfg = BackboneConfig.tiny_for_tests(
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 3200)).astype(np.float32))
    lengths = np.array([3200, 2400])
    t_frames = feat_extract_output_lengths(cfg, 3200)
    frame_lengths = feat_extract_output_lengths(cfg, lengths)
    fm = jnp.asarray((np.arange(t_frames)[None, :] <
                      frame_lengths[:, None]).astype(np.int32))

    m_xla = SSLBackbone(cfg)
    params = m_xla.init(jax.random.PRNGKey(0), x)["params"]
    out_xla = m_xla.apply({"params": params}, x, fm)
    m_pl = SSLBackbone(cfg.replace(attention_impl="pallas"))
    out_pl = m_pl.apply({"params": params}, x, fm)
    for b, n in enumerate(frame_lengths):
        np.testing.assert_allclose(np.asarray(out_pl)[b, :n],
                                   np.asarray(out_xla)[b, :n],
                                   rtol=5e-4, atol=5e-5)
