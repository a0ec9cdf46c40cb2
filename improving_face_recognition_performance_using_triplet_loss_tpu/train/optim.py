"""Optimizers + the reference's learning-rate schedule, in optax.

The reference trains the backbone with Adam(lr=2.4e-4) under a
``FactorScheduler(step=6*epoch_size, factor=0.88, stop_factor_lr=5e-15)``
with weight decay 1e-5 (train_efm.py:200,212-213; mutli_gpu_v3.py:159-160),
and the triplet head with SGD(2.4e-4, wd=1e-5) (pre-trained_efm_v3.py:185).

MXNet applies weight decay by adding ``wd * w`` to the gradient *before* the
Adam moment updates — matched here by placing ``add_decayed_weights`` before
``scale_by_adam`` in the chain (unlike AdamW's decoupled decay).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def factor_schedule(
    base_lr: float,
    decay_every_steps: int,
    factor: float = 0.88,
    stop_lr: float = 5e-15,
) -> optax.Schedule:
    """lr(step) = max(base * factor^(step // decay_every), stop_lr).

    Matches ``mx.lr_scheduler.FactorScheduler`` semantics (train_efm.py:212).
    """

    import jax.numpy as jnp

    def schedule(step):
        lr = base_lr * jnp.power(factor, step // max(decay_every_steps, 1))
        return jnp.maximum(lr, stop_lr)

    return schedule


def adam_factor(
    base_lr: float = 2.4e-4,
    decay_every_steps: int = 1,
    factor: float = 0.88,
    stop_lr: float = 5e-15,
    weight_decay: float = 1e-5,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    """Adam + factor schedule + MXNet-style (coupled) weight decay."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2),
        optax.scale_by_learning_rate(
            factor_schedule(base_lr, decay_every_steps, factor, stop_lr)
        ),
    )


def backbone_optimizer(
    name: str,
    base_lr: float = 2.4e-4,
    decay_every_steps: int = 1,
    factor: float = 0.88,
    stop_lr: float = 5e-15,
    weight_decay: float = 1e-5,
) -> optax.GradientTransformation:
    """The facenet optimizer family (facenet.py:168-184: ADAGRAD, ADADELTA,
    ADAM, RMSPROP, MOM) on the reference backbone recipe's factor schedule
    + coupled weight decay (train_efm.py:212-213). ``adam`` is the
    reference default and identical to :func:`adam_factor`."""
    cores = {
        "adam": [optax.scale_by_adam(b1=0.9, b2=0.999)],
        "adagrad": [optax.scale_by_rss(initial_accumulator_value=0.1)],
        "adadelta": [optax.scale_by_adadelta(rho=0.9, eps=1e-6)],
        # facenet's RMSPropOptimizer(decay=0.9, momentum=0.9, epsilon=1.0)
        "rmsprop": [optax.scale_by_rms(decay=0.9, eps=1.0),
                    optax.trace(decay=0.9)],
        # facenet's MomentumOptimizer(0.9, use_nesterov=True)
        "mom": [optax.trace(decay=0.9, nesterov=True)],
        "sgd": [],
    }
    if name not in cores:
        raise ValueError(f"optimizer {name!r}; choose from {sorted(cores)}")
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        *cores[name],
        optax.scale_by_learning_rate(
            factor_schedule(base_lr, decay_every_steps, factor, stop_lr)
        ),
    )


def sgd_wd(
    lr: float = 2.4e-4, weight_decay: float = 1e-5
) -> optax.GradientTransformation:
    """Plain SGD with coupled weight decay (head training,
    pre-trained_efm_v3.py:185)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(lr),
    )


class ParamEmaState(NamedTuple):
    """Wrapper optimizer state carrying an EMA of the PARAMS."""

    inner: optax.OptState
    ema: optax.Params


def with_param_ema(tx: optax.GradientTransformation,
                   decay: float = 0.999) -> optax.GradientTransformation:
    """Track an exponential moving average of the parameters alongside any
    optimizer (facenet's tf.train.ExponentialMovingAverage over trainables,
    facenet.py:168-211 — it evaluates the averaged weights). The EMA rides
    in the optimizer state, so orbax checkpoints/resume carry it for free;
    read it back with :func:`get_ema_params`.
    """

    def init(params):
        return ParamEmaState(tx.init(params),
                             jax.tree_util.tree_map(jnp.asarray, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("with_param_ema requires params in update()")
        updates, inner = tx.update(updates, state.inner, params)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema,
            new_params)
        return updates, ParamEmaState(inner, ema)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """The EMA params from a with_param_ema-wrapped optimizer state."""
    if not isinstance(opt_state, ParamEmaState):
        raise TypeError("optimizer was not wrapped with with_param_ema")
    return opt_state.ema
