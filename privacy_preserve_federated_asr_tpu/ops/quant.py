"""Int8 (W8A8) dynamic-quantization matmul for the inference path.

PERF.md §4: at the model's row count this chip's bf16 dependent-matmul
ceiling is ~92 TFLOP/s; the MXU's s8 path measures 1.28-1.57× that
(118-195 TF/s depending on shape — not the datasheet 2×). Training
semantics forbid it by default (the reference trains fp16 with fp32 CTC),
but the forward-only surfaces — serving (serving/engine.py), batched
extraction (evaluation/extract.py) — trade a bounded quantization error
for a measured serving win (PERF.md §6). The TRAINING variant below is a
measured wash on the bench chip (PERF.md §4) and exists for chips with a
true 2× s8 path.

Recipe (standard dynamic W8A8, computed inside the jitted forward):

* activations: symmetric per-token (per row of the [.., T, D] input)
  abs-max scaling to int8 — dynamic, no calibration pass;
* weights: symmetric per-output-channel abs-max scaling to int8
  (re-quantized from the live fp kernel each call: the extra read of the
  weight matrix is ~1 ms of HBM traffic per step vs ~13 ms saved MXU time);
* int8×int8 → int32 accumulate (``lax.dot_general`` with
  ``preferred_element_type=int32`` lowers to the MXU's s8 path), then one
  fused rescale by (token_scale × channel_scale).

``int8_dense_dot_general`` plugs straight into ``flax.linen.Dense``'s
``dot_general`` hook, so the backbone swaps every projection/FFN matmul
by config (``BackboneConfig.dense_impl = "int8"``) without touching the
module tree or the checkpoint layout. Inference-only: the rounding has no
useful gradient (Trainer rejects the flag).

``int8_train_dense_dot_general`` is the TRAINING variant
(``dense_impl="int8_train"``, ``cli train --int8``): the same dynamic-W8A8
forward wrapped in a ``custom_vjp`` with SwitchBack-style gradients
(Wortsman et al., 2023 — int8 forward and int8 grad-input matmul, which
together carry ~5/6 of the step's matmul FLOPs at these shapes, while the
outlier-sensitive grad-weight matmul stays in the compute dtype). The
quantization itself is straight-through: gradients are computed from the
un-quantized operands, so the estimator matches the fp path in
expectation and the parameter/optimizer/checkpoint layout is unchanged.

The reference has no quantization anywhere (pure fp16 autocast); this is
TPU-native headroom beyond parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def quantize_symmetric(x: jax.Array, axis, bound: int = 127):
    """Symmetric abs-max int8 quantization along ``axis``.

    Returns ``(q, scale)`` with ``q`` int8 and ``x ≈ q * scale`` (scale
    keeps the reduced dims, so it broadcasts back). Scales are fp32; an
    all-zero row quantizes to zeros with scale 1 (no NaN/inf).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / bound, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -bound, bound).astype(jnp.int8)
    return q, scale


def int8_dense_dot_general(lhs, rhs, dimension_numbers, precision=None,
                           preferred_element_type=None):
    """``lax.dot_general`` drop-in for the Dense pattern: contract the last
    lhs dim against rhs dim 0, no batch dims (exactly what
    ``flax.linen.Dense`` emits). Quantizes both operands on the fly and
    accumulates in int32 on the MXU's s8 path.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if (tuple(lb), tuple(rb)) != ((), ()) or tuple(lc) != (lhs.ndim - 1,) \
            or tuple(rc) != (0,):
        # not the Dense pattern — fall back to the fp path rather than
        # silently mis-scaling
        return lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=preferred_element_type)
    a_q, a_scale = quantize_symmetric(lhs, axis=-1)      # per token
    w_q, w_scale = quantize_symmetric(rhs, axis=0)       # per out-channel
    out = lax.dot_general(a_q, w_q, dimension_numbers,
                          preferred_element_type=jnp.int32)
    out = out.astype(jnp.float32) * a_scale * w_scale    # both broadcast
    return out.astype(lhs.dtype)


def _is_dense_pattern(lhs, dimension_numbers) -> bool:
    (lc, rc), (lb, rb) = dimension_numbers
    return (tuple(lb), tuple(rb)) == ((), ()) and \
        tuple(lc) == (lhs.ndim - 1,) and tuple(rc) == (0,)


def _int8_dot_fwd_value(lhs, rhs):
    """Shared forward math: per-token lhs x per-out-channel rhs, s8 MXU
    accumulate, fused rescale. ``lhs [..., K] @ rhs [K, N] -> [..., N]``."""
    dn = (((lhs.ndim - 1,), (0,)), ((), ()))
    a_q, a_scale = quantize_symmetric(lhs, axis=-1)
    w_q, w_scale = quantize_symmetric(rhs, axis=0)
    out = lax.dot_general(a_q, w_q, dn, preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * a_scale * w_scale).astype(lhs.dtype)


@jax.custom_vjp
def _int8_train_dot(lhs, rhs):
    return _int8_dot_fwd_value(lhs, rhs)


def _int8_train_dot_fwd(lhs, rhs):
    return _int8_dot_fwd_value(lhs, rhs), (lhs, rhs)


def _int8_train_dot_bwd(res, g):
    lhs, rhs = res
    # grad_lhs = g @ rhs^T — the second-largest matmul of the step; int8
    # per SwitchBack (the incoming gradient is per-token scaled, the
    # transposed weight per-input-channel scaled)
    g_q, g_scale = quantize_symmetric(g, axis=-1)            # [..., 1]
    wt = rhs.T                                               # [N, K]
    wt_q, wt_scale = quantize_symmetric(wt, axis=0)          # [1, K]
    dn = (((g.ndim - 1,), (0,)), ((), ()))
    d_lhs = lax.dot_general(g_q, wt_q, dn, preferred_element_type=jnp.int32)
    d_lhs = (d_lhs.astype(jnp.float32) * g_scale * wt_scale).astype(lhs.dtype)
    # grad_rhs = lhs^T @ g — outlier-sensitive (it feeds the optimizer);
    # stays in the compute dtype with fp32 accumulation
    k = lhs.shape[-1]
    lhs2 = lhs.reshape(-1, k)
    g2 = g.reshape(-1, g.shape[-1])
    d_rhs = lax.dot_general(
        lhs2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(rhs.dtype)
    return d_lhs, d_rhs


_int8_train_dot.defvjp(_int8_train_dot_fwd, _int8_train_dot_bwd)


def int8_train_dense_dot_general(lhs, rhs, dimension_numbers, precision=None,
                                 preferred_element_type=None):
    """Trainable ``lax.dot_general`` drop-in for the Dense pattern: int8
    W8A8 forward, SwitchBack gradients (int8 grad-input matmul, compute-
    dtype grad-weight matmul), straight-through w.r.t. quantization.
    Non-Dense patterns fall back to the differentiable fp path.
    """
    if not _is_dense_pattern(lhs, dimension_numbers):
        return lax.dot_general(lhs, rhs, dimension_numbers,
                               precision=precision,
                               preferred_element_type=preferred_element_type)
    return _int8_train_dot(lhs, rhs)
