"""Gradient Reversal Layer (GRL) as a JAX custom-vjp.

Semantics match the reference `ReverseLayerF`
(reference: federated/src/models.py:61-73): identity in the forward pass,
gradient multiplied by ``-lambda`` in the backward pass. In JAX this is a
``custom_vjp`` rather than an autograd.Function, so it composes with jit /
grad / vmap / shard_map and fuses into the surrounding XLA graph for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x: jax.Array, lam: float) -> jax.Array:
    """Identity forward; backward multiplies the cotangent by ``-lam``."""
    del lam
    return x


def _grl_fwd(x, lam):
    return x, lam


def _grl_bwd(lam, g):
    return (jnp.asarray(-lam, dtype=g.dtype) * g, None)


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)
