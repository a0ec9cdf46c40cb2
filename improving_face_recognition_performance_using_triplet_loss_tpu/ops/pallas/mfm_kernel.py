"""Fused 3-way EFM activation as a Pallas VPU kernel.

Computes concat(max(s0,s1,s2), min(s0,s1,s2)) over the channel (lane) axis
for [rows, C] inputs in one VMEM pass — the fc-path EFM of the models
(lightcnn.py:123-128). The pure-JAX ``ops.mfm.efm3`` is the oracle; XLA
usually fuses that chain into the producing matmul already, so this kernel
is for the standalone-activation case (feature post-processing, serving)
and as the validated template for further fusions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _efm3_kernel(x_ref, out_ref, *, third: int):
    x = x_ref[:]
    s0 = x[:, :third]
    s1 = x[:, third:2 * third]
    s2 = x[:, 2 * third:]
    mx = jnp.maximum(jnp.maximum(s0, s1), s2)
    mn = jnp.minimum(jnp.minimum(s0, s1), s2)
    out_ref[:, :third] = mx
    out_ref[:, third:] = mn


def efm3_pallas(x: jnp.ndarray, block_rows: int = 256,
                interpret: bool = False) -> jnp.ndarray:
    """[N, C] -> [N, 2C/3]; rows tiled over the grid, channels in VMEM."""
    n, c = x.shape
    if c % 3 != 0:
        raise ValueError(f"channels must divide by 3, got {c}")
    third = c // 3
    block_rows = min(block_rows, n)
    grid = (pl.cdiv(n, block_rows),)
    return pl.pallas_call(
        functools.partial(_efm3_kernel, third=third),
        out_shape=jax.ShapeDtypeStruct((n, 2 * third), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, 2 * third), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x)
