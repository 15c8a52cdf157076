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


def _np_keep_mask(seed, bh, t, rate):
    """Reconstruct the kernel's counter-based keep mask in numpy."""
    def fmix32(x):
        x = np.asarray(x, np.uint32)
        x ^= x >> np.uint32(16); x = x * np.uint32(0x85EBCA6B)
        x ^= x >> np.uint32(13); x = x * np.uint32(0xC2B2AE35)
        x ^= x >> np.uint32(16)
        return x

    with np.errstate(over="ignore"):
        seed_bh = fmix32(np.uint32(seed) + np.uint32(bh) * np.uint32(0x9E3779B9))
    rows, cols = np.meshgrid(np.arange(t, dtype=np.uint32),
                             np.arange(t, dtype=np.uint32), indexing="ij")
    h = fmix32((rows * np.uint32(t) + cols) ^ seed_bh)
    h31 = h & np.uint32(0x7FFFFFFF)
    threshold = min(int(rate * 2147483648.0), 2147483647)
    return h31 >= np.uint32(threshold)


def _xla_with_mask(q, k, v, mask, keep, rate):
    """Reference attention with an explicit keep mask [B*H, T, T]."""
    from privacy_preserve_federated_asr_tpu.ops.attention import NEG_INF
    b, t, h, d = q.shape
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k)
    bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
    probs = jax.nn.softmax((scores + bias).astype(jnp.float32), axis=-1)
    keep = jnp.asarray(keep.reshape(b, h, t, t))
    probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def test_flash_dropout_matches_mask_reconstruction():
    """Pallas in-kernel dropout == XLA attention given the SAME hash mask,
    for values AND gradients (proves fwd/bwd regenerate one mask and the
    dropout chain rule is right)."""
    t, rate = 128, 0.3
    q, k, v, mask = _inputs(t, seed=3)
    seed = jnp.full((1, 1), 12345, jnp.int32)

    from privacy_preserve_federated_asr_tpu.ops.attention import _flash_attention
    got = _flash_attention(q, k, v, mask, seed, 64, rate)
    keep = np.stack([_np_keep_mask(12345, bh, t, rate) for bh in range(B * H)])
    ref = _xla_with_mask(q, k, v, mask, keep, rate)
    valid = np.asarray(mask, bool)  # padded queries see all-NEG_INF rows
    np.testing.assert_allclose(np.asarray(got)[valid], np.asarray(ref)[valid],
                               rtol=2e-4, atol=2e-5)

    def loss_flash(q, k, v):
        y = _flash_attention(q, k, v, mask, seed, 64, rate)
        return jnp.sum(jnp.where(valid[:, :, None, None], y, 0.0) ** 2)

    def loss_ref(q, k, v):
        y = _xla_with_mask(q, k, v, mask, keep, rate)
        return jnp.sum(jnp.where(valid[:, :, None, None], y, 0.0) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_flash_dropout_rate_statistics():
    """The realized drop rate matches the configured rate, and a zero rate
    reproduces the no-dropout path exactly."""
    t = 256
    q, k, v, mask = _inputs(t, seed=4)
    mask = jnp.ones_like(mask)
    base = multihead_attention(q, k, v, mask, impl="pallas")
    zero = multihead_attention(q, k, v, mask, impl="pallas", dropout_rate=0.0,
                               dropout_rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(zero))

    for rate in (0.1, 0.5):
        keep = np.stack([_np_keep_mask(777, bh, t, rate) for bh in range(B * H)])
        realized = 1.0 - keep.mean()
        assert abs(realized - rate) < 0.01, (realized, rate)

    # different rngs -> different masks -> different outputs
    o1 = multihead_attention(q, k, v, mask, impl="pallas", dropout_rate=0.4,
                             dropout_rng=jax.random.PRNGKey(1))
    o2 = multihead_attention(q, k, v, mask, impl="pallas", dropout_rate=0.4,
                             dropout_rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))
    # expectation preserved: mean over many masks ~ no-dropout output
    outs = [multihead_attention(q, k, v, mask, impl="pallas", dropout_rate=0.4,
                                dropout_rng=jax.random.PRNGKey(s))
            for s in range(20)]
    avg = np.mean([np.asarray(o) for o in outs], axis=0)
    err = np.abs(avg - np.asarray(base)).mean() / np.abs(np.asarray(base)).mean()
    assert err < 0.25, err


def test_backbone_pallas_attention_dropout_trains_stochastic():
    """With attention_dropout > 0 the pallas backbone produces different
    outputs across dropout rngs (the old kernel silently skipped it)."""
    from privacy_preserve_federated_asr_tpu.models import BackboneConfig, SSLBackbone

    cfg = BackboneConfig.tiny_for_tests(
        hidden_dropout=0.0, activation_dropout=0.0, final_dropout=0.0,
        attention_dropout=0.5).replace(attention_impl="pallas")
    model = SSLBackbone(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 3200)),
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def fwd(seed):
        return np.asarray(model.apply(
            {"params": params}, x, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(seed)}))

    a, b = fwd(1), fwd(2)
    assert not np.allclose(a, b)
    # deterministic mode is unaffected by the rng plumbing
    d1 = np.asarray(model.apply({"params": params}, x, deterministic=True))
    d2 = np.asarray(model.apply({"params": params}, x, deterministic=True))
    np.testing.assert_array_equal(d1, d2)
