"""Train state: params + optimizer state + PRNG keys as one pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.config import DACSConfig
from ..models.dacs import DACSModel


@flax.struct.dataclass
class DACSTrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array  # folded per-step into dropout/gumbel keys

    def next_rngs(self) -> tuple[dict[str, jax.Array], jax.Array]:
        rng, r_drop, r_gs = jax.random.split(self.rng, 3)
        return {"dropout": r_drop, "gumbel": r_gs}, rng


def init_dacs_params(cfg: DACSConfig, rng: jax.Array, example_len: int = 3200) -> Any:
    """Randomly initialize params for ``cfg.method``'s model (pretrained
    weights come from :func:`..models.port.port_hf_state_dict` instead)."""
    if cfg.method != "dacs":
        from ..models.recipes import init_recipe_params

        return init_recipe_params(cfg, rng, example_len)
    model = DACSModel(cfg)
    variables = model.init(
        {"params": rng, "gumbel": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, example_len), dtype=jnp.float32),
    )
    return variables["params"]


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
) -> DACSTrainState:
    return DACSTrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=rng,
    )
