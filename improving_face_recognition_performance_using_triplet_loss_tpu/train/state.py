"""Functional train state (params + optimizer state + BN stats + step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """Replicated train state threaded through jitted steps.

    ``base_key`` is a fixed PRNG key; per-step keys are derived by folding in
    the step counter (and the data-axis index under shard_map), which keeps
    resume-from-checkpoint deterministic without storing an evolving key.
    """

    params: Any
    opt_state: Any
    batch_stats: Any
    step: jnp.ndarray
    base_key: jax.Array
    aux: Any = None  # optional extra state (e.g. center-loss centers table)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    aux: Any = None,
    **apply_kwargs,
) -> TrainState:
    """Initialize model variables + optimizer state."""
    init_rng, base_key = jax.random.split(rng)
    variables = model.init(init_rng, sample_input, **apply_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        step=jnp.zeros((), jnp.int32),
        base_key=base_key,
        aux=aux,
    )
