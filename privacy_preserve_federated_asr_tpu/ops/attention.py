"""Fused multi-head attention kernels (Pallas/TPU) with an XLA fallback.

``multihead_attention(q, k, v, key_mask, impl=...)`` computes softmax
attention with fp32 accumulation, optional key masking, and optional
attention-probability dropout (torch/HF semantics: dropout applied to the
normalized probabilities, scaled by 1/keep).

  * ``impl="xla"``   — einsum + softmax (XLA fuses well at these sizes).
  * ``impl="pallas"``— FlashAttention-style fused kernel: online-softmax
    forward and recompute backward, never materializing the [B,H,T,T]
    probability tensor in HBM. The wrapper pads T to the block size and
    masks the padded keys.

Dropout inside the kernel is COUNTER-BASED: the keep decision for
probability (bh, row, col) is a pure murmur3-fmix32 hash of the position
and a per-call seed — no PRNG state, so the recompute backward regenerates
the exact forward mask for free, any block size produces the same mask,
and the CPU interpreter (tests) matches the TPU bit-for-bit. The same
derivation as standard flash-attention backward goes through unchanged:
with A = D .* softmax(S) (D the scaled keep mask), the delta trick
delta = rowsum(dO .* O) still holds because rowsum((D.*dA).*P) =
rowsum(dA.*A).

Utterance encoders here see T ~ 250-1500 frames, so this is bandwidth
relief rather than a memory necessity; both impls are numerically
verified against each other (tests/test_attention.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30
DEFAULT_BLOCK = 128

# murmur3 fmix32 constants as wrapping int32
_FMIX_C1 = -2048144789   # 0x85EBCA6B
_FMIX_C2 = -1028477387   # 0xC2B2AE35
_GOLDEN = -1640531527    # 0x9E3779B9


def _use_interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests/CI)
    return jax.default_backend() != "tpu"


def _fmix32(x):
    """murmur3 finalizer on wrapping int32 (good avalanche, pure)."""
    shr = jax.lax.shift_right_logical
    x = x ^ shr(x, 16)
    x = x * _FMIX_C1
    x = x ^ shr(x, 13)
    x = x * _FMIX_C2
    x = x ^ shr(x, 16)
    return x


def _keep_threshold(rate: float) -> int:
    """hash31 < threshold  <=>  DROP (P(drop) = rate)."""
    return min(int(rate * 2147483648.0), 2147483647)


def _keep_block(seed_bh, q_off, k_off, bq, bk, t, threshold):
    """[BQ, BK] bool keep mask for global rows q_off+i, cols k_off+j."""
    rows = q_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = k_off + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    h = _fmix32((rows * t + cols) ^ seed_bh)
    h31 = h & 0x7FFFFFFF
    return h31 >= threshold


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def attention_xla(q, k, v, key_mask=None, dropout_rate: float = 0.0,
                  dropout_rng=None):
    """q,k,v: [B, T, H, D]; key_mask: [B, T] (1 = valid). Returns [B,T,H,D]."""
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref,
                *, block_k, scale, rate):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, T, D]; o_ref: [1, BQ, D];
    # mask_ref: [1, 1, T]; seed_ref: [1, 1]. Intermediates 2-D (Mosaic-friendly).
    _, bq, d = q_ref.shape
    t = k_ref.shape[1]
    q = q_ref[0].astype(jnp.float32) * scale
    bh, qi = pl.program_id(0), pl.program_id(1)
    seed_bh = _fmix32(seed_ref[0, 0] + bh * _GOLDEN)
    threshold = _keep_threshold(rate)

    def body(i, carry):
        acc, m_i, l_i = carry  # [BQ, D], [BQ, 1], [BQ, 1]
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [BQ, BK]
        mask = mask_ref[0, :, pl.ds(i * block_k, block_k)]           # [1, BK]
        s = jnp.where(mask > 0, s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)                                  # [BQ, 1]
        # the softmax denominator uses UNdropped p; dropout only gates what
        # reaches the value accumulation (torch drops normalized probs)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _keep_block(seed_bh, qi * bq, i * block_k, bq, block_k,
                               t, threshold)
            p = jnp.where(keep, p, 0.0)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, t // block_k, body, (acc0, m0, l0))
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    o_ref[0] = (acc * inv_keep / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, block_q, scale, rate):
    # per (b*h) program: q/k/v/o/do: [1, T, D]; mask: [1, 1, T].
    # softmax statistics are recomputed per q block (no lse round-trip);
    # the dropout keep mask is regenerated from the same positional hash.
    _, t, d = q_ref.shape
    kv = k_ref[0].astype(jnp.float32)
    vv = v_ref[0].astype(jnp.float32)
    mask = mask_ref[0]                                                # [1, T]
    bh = pl.program_id(0)
    seed_bh = _fmix32(seed_ref[0, 0] + bh * _GOLDEN)
    threshold = _keep_threshold(rate)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dk_acc0 = jnp.zeros((t, d), jnp.float32)
    dv_acc0 = jnp.zeros((t, d), jnp.float32)

    def body(i, carry):
        dk_acc, dv_acc = carry
        sl = pl.ds(i * block_q, block_q)
        q = q_ref[0, sl, :].astype(jnp.float32) * scale
        o = o_ref[0, sl, :].astype(jnp.float32)
        do = do_ref[0, sl, :].astype(jnp.float32)
        s = jax.lax.dot_general(q, kv, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [BQ, T]
        s = jnp.where(mask > 0, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)  # [BQ, T]
        if rate > 0.0:
            keep = _keep_block(seed_bh, i * block_q, 0, block_q, t, t, threshold)
            a = jnp.where(keep, p, 0.0) * inv_keep   # dropped, scaled probs
        else:
            a = p
        dv_acc = dv_acc + jax.lax.dot_general(
            a, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if rate > 0.0:  # chain rule through the dropout gate
            dp = jnp.where(keep, dp, 0.0) * inv_keep
        # delta = rowsum(dO .* O): valid with dropout because
        # rowsum((D.*dA).*P) = rowsum(dA.*(D.*P)) = rowsum(dA.*A)
        delta = jnp.sum(do * o, axis=1, keepdims=True)               # [BQ, 1]
        ds = p * (dp - delta)                                        # [BQ, T]
        dq = jax.lax.dot_general(ds, kv, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, sl, :] = dq.astype(dq_ref.dtype)
        # note: q here is pre-scaled, so this already includes d s/d k = scale*q
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk_acc, dv_acc = jax.lax.fori_loop(0, t // block_q, body, (dk_acc0, dv_acc0))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_fwd_call(seed, qh, kh, vh, maskh, block, rate):
    bh, t, d = qh.shape
    scale = 1.0 / math.sqrt(d)
    seed_spec = pl.BlockSpec((1, 1), lambda b, qi: (0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block, scale=scale, rate=rate),
        grid=(bh, t // block),
        in_specs=[
            seed_spec,
            pl.BlockSpec((1, block, d), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, t, d), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda b, qi: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), qh.dtype),
        interpret=_use_interpret(),
    )(seed, qh, kh, vh, maskh)
    return out


def _flash_bwd_call(seed, qh, kh, vh, maskh, out, gh, block, rate):
    bh, t, d = qh.shape
    scale = 1.0 / math.sqrt(d)
    seed_spec = pl.BlockSpec((1, 1), lambda i: (0, 0))
    spec_td = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    mask_spec = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, block_q=block, scale=scale, rate=rate),
        grid=(bh,),
        in_specs=[seed_spec, spec_td, spec_td, spec_td, mask_spec, spec_td, spec_td],
        out_specs=[spec_td, spec_td, spec_td],
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), qh.dtype)] * 3,
        interpret=_use_interpret(),
    )(seed, qh, kh, vh, maskh, out, gh)
    return dq, dk, dv


def _split_heads(x):
    b, t, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_attention(q, k, v, key_mask, seed, block, rate):
    y, _ = _flash_attention_fwd(q, k, v, key_mask, seed, block, rate)
    return y


def _flash_attention_fwd(q, k, v, key_mask, seed, block, rate):
    b, t, h, d = q.shape
    qh, kh, vh = _split_heads(q), _split_heads(k), _split_heads(v)
    maskh = jnp.repeat(key_mask.astype(jnp.float32), h, axis=0)[:, None, :]
    out = _flash_fwd_call(seed, qh, kh, vh, maskh, block, rate)
    y = out.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return y, (qh, kh, vh, maskh, seed, out, (b, t, h, d))


def _flash_attention_bwd(block, rate, saved, gy):
    qh, kh, vh, maskh, seed, out, (b, t, h, d) = saved
    gh = gy.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    dq, dk, dv = _flash_bwd_call(seed, qh, kh, vh, maskh, out, gh, block, rate)

    def back(x):
        return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)

    return back(dq), back(dk), back(dv), None, None


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def auto_block(t: int) -> int:
    """Largest power-of-2 block <= 512 that divides T padded to the 128
    grid, so no extra padding is introduced beyond the 128 granularity.
    Measured on v5e (B=16 H=16 D=64, fwd+bwd): larger blocks win big —
    T=256: 3.07ms @256 vs 3.76 @128 (XLA 4.18); T=1024: 7.47 @512 vs
    13.76 @128 (XLA 14.97)."""
    padded = -(-t // 128) * 128
    for b in (512, 256, 128):
        if padded % b == 0:
            return b
    return 128


def multihead_attention(q, k, v, key_mask=None, impl: str = "xla",
                        block: int | None = None, dropout_rate: float = 0.0,
                        dropout_rng=None):
    """Softmax attention over [B, T, H, D] with optional key masking and
    attention-prob dropout (``dropout_rate > 0`` needs ``dropout_rng``).
    ``block=None`` picks the measured-best block for T."""
    rate = float(dropout_rate)
    if impl == "xla":
        return attention_xla(q, k, v, key_mask, rate, dropout_rng)
    if impl != "pallas":
        raise ValueError(f"unknown attention impl {impl!r}")
    b, t, h, d = q.shape
    if block is None:
        block = auto_block(t)
    if key_mask is None:
        key_mask = jnp.ones((b, t), jnp.int32)
    if rate > 0.0:
        assert dropout_rng is not None, "dropout needs an rng"
        seed = jax.random.randint(
            dropout_rng, (1, 1), jnp.iinfo(jnp.int32).min,
            jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)
    pad = (-t) % block
    if pad:
        q, k, v = (jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) for x in (q, k, v))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
        return _flash_attention(q, k, v, key_mask, seed, block, rate)[:, :t]
    return _flash_attention(q, k, v, key_mask, seed, block, rate)
