"""Fused multi-head attention kernels (Pallas/TPU) with an XLA fallback.

``multihead_attention(q, k, v, key_mask, impl=...)`` computes softmax
attention with fp32 accumulation and optional key masking.

  * ``impl="xla"``   — einsum + softmax (XLA fuses well at these sizes).
  * ``impl="pallas"``— FlashAttention-style fused kernel: online-softmax
    forward and recompute backward, never materializing the [B,H,T,T]
    probability tensor in HBM. The wrapper pads T to the block size and
    masks the padded keys.

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


def _use_interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on CPU (tests/CI)
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def attention_xla(q, k, v, key_mask=None):
    """q,k,v: [B, T, H, D]; key_mask: [B, T] (1 = valid). Returns [B,T,H,D]."""
    d = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if key_mask is not None:
        bias = jnp.where(key_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k, scale):
    # q_ref: [1, BQ, D]; k_ref/v_ref: [1, T, D]; o_ref: [1, BQ, D];
    # mask_ref: [1, 1, T]. All intermediates kept 2-D (Mosaic-friendly).
    _, bq, d = q_ref.shape
    t = k_ref.shape[1]
    q = q_ref[0].astype(jnp.float32) * scale

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
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, t // block_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, block_q, scale):
    # per (b*h) program: q/k/v/o/do: [1, T, D]; mask: [1, 1, T].
    # softmax statistics are recomputed per q block (no lse round-trip).
    _, t, d = q_ref.shape
    kv = k_ref[0].astype(jnp.float32)
    vv = v_ref[0].astype(jnp.float32)
    mask = mask_ref[0]                                                # [1, T]

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
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
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


def _flash_fwd_call(qh, kh, vh, maskh, block):
    bh, t, d = qh.shape
    scale = 1.0 / math.sqrt(d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block, scale=scale),
        grid=(bh, t // block),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, t, d), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, qi: (b, 0, 0)),
            pl.BlockSpec((1, 1, t), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block, d), lambda b, qi: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), qh.dtype),
        interpret=_use_interpret(),
    )(qh, kh, vh, maskh)
    return out


def _flash_bwd_call(qh, kh, vh, maskh, out, gh, block):
    bh, t, d = qh.shape
    scale = 1.0 / math.sqrt(d)
    spec_td = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    mask_spec = pl.BlockSpec((1, 1, t), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, block_q=block, scale=scale),
        grid=(bh,),
        in_specs=[spec_td, spec_td, spec_td, mask_spec, spec_td, spec_td],
        out_specs=[spec_td, spec_td, spec_td],
        out_shape=[jax.ShapeDtypeStruct((bh, t, d), qh.dtype)] * 3,
        interpret=_use_interpret(),
    )(qh, kh, vh, maskh, out, gh)
    return dq, dk, dv


def _split_heads(x):
    b, t, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, key_mask, block):
    y, _ = _flash_attention_fwd(q, k, v, key_mask, block)
    return y


def _flash_attention_fwd(q, k, v, key_mask, block):
    b, t, h, d = q.shape
    qh, kh, vh = _split_heads(q), _split_heads(k), _split_heads(v)
    maskh = jnp.repeat(key_mask.astype(jnp.float32), h, axis=0)[:, None, :]
    out = _flash_fwd_call(qh, kh, vh, maskh, block)
    y = out.reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return y, (qh, kh, vh, maskh, out, (b, t, h, d))


def _flash_attention_bwd(block, saved, gy):
    qh, kh, vh, maskh, out, (b, t, h, d) = saved
    gh = gy.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    dq, dk, dv = _flash_bwd_call(qh, kh, vh, maskh, out, gh, block)

    def back(x):
        return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)

    return back(dq), back(dk), back(dv), None


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def multihead_attention(q, k, v, key_mask=None, impl: str = "xla",
                        block: int = DEFAULT_BLOCK):
    """Softmax attention over [B, T, H, D] with optional key masking."""
    if impl == "xla":
        return attention_xla(q, k, v, key_mask)
    if impl != "pallas":
        raise ValueError(f"unknown attention impl {impl!r}")
    b, t, h, d = q.shape
    if key_mask is None:
        key_mask = jnp.ones((b, t), jnp.int32)
    pad = (-t) % block
    if pad:
        q, k, v = (jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) for x in (q, k, v))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
        return _flash_attention(q, k, v, key_mask, block)[:, :t]
    return _flash_attention(q, k, v, key_mask, block)
