"""Class-parallel (tensor-parallel) softmax cross-entropy.

At the reference's real scale the ID softmax spans 78,579 Celeb1M identities
(README.md:23-26) — the fc2 classifier ``[feat_dim, C]`` is the one matrix
worth model-sharding. These ops compute softmax CE and argmax-accuracy over
a class dimension SHARDED across a mesh axis: each shard owns a contiguous
class block ``[idx*C_local, (idx+1)*C_local)``, the log-sum-exp reduces with
``pmax``/``psum`` over ICI, and the label logit is fetched from whichever
shard owns it. Gradients need no special handling — jax transposes the
collectives, so the backbone receives the full dCE/dfeat automatically.

The reference's never-activated two-stage ``ctx_group`` model parallelism
(mutli_gpu_v3.py:74-98, SURVEY.md §2.1.2) is the capability ancestor; this
is its TPU-native realization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def class_parallel_softmax_ce(
    local_logits: jnp.ndarray,
    labels: jnp.ndarray,
    axis_name: str,
) -> jnp.ndarray:
    """Mean softmax CE where the class dim of ``local_logits`` [B, C/m] is
    sharded over ``axis_name`` and ``labels`` [B] hold GLOBAL class ids."""
    c_local = local_logits.shape[-1]
    idx = jax.lax.axis_index(axis_name)
    # stable logsumexp over the global class dim; the stabilizer is a
    # mathematical constant (d logsumexp is invariant to it), and pmax has
    # no VJP — stop_gradient keeps gradients exact
    # (stop_gradient must wrap the INPUT: pmax itself has no JVP rule, so a
    # tracer may not reach it even when the output gradient is cut)
    gmax = jax.lax.pmax(
        jnp.max(jax.lax.stop_gradient(local_logits), axis=-1),
        axis_name)  # [B]
    sumexp = jax.lax.psum(
        jnp.sum(jnp.exp(local_logits - gmax[:, None]), axis=-1), axis_name)
    # the label's logit lives on exactly one shard; psum assembles it
    local_label = labels.astype(jnp.int32) - idx * c_local
    in_shard = (local_label >= 0) & (local_label < c_local)
    safe = jnp.clip(local_label, 0, c_local - 1)
    picked = jnp.take_along_axis(local_logits, safe[:, None], axis=1)[:, 0]
    label_logit = jax.lax.psum(jnp.where(in_shard, picked, 0.0), axis_name)
    nll = jnp.log(sumexp) + gmax - label_logit
    return jnp.mean(nll)


def class_parallel_argmax(local_logits: jnp.ndarray,
                          axis_name: str) -> jnp.ndarray:
    """Global argmax over the sharded class dim (accuracy metric). Ties
    resolve to the smallest global class index (np.argmax convention).
    Integer metric: gradients are cut so pmax/pmin (no JVP rules) never see
    tracers under jax.grad."""
    local_logits = jax.lax.stop_gradient(local_logits)
    c_local = local_logits.shape[-1]
    idx = jax.lax.axis_index(axis_name)
    lmax = jnp.max(local_logits, axis=-1)
    larg = jnp.argmax(local_logits, axis=-1).astype(jnp.int32) + idx * c_local
    gmax = jax.lax.pmax(lmax, axis_name)
    big = jnp.iinfo(jnp.int32).max
    cand = jnp.where(lmax >= gmax, larg, big)
    return jax.lax.pmin(cand, axis_name)
