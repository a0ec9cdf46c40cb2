"""Trainable embedding heads over frozen features.

The reference's head-only triplet models are a single bias-free Dense layer:
128-d over 342-d CSV features (pre-trained_efm_v3.py:180-181) and 342-d over
the frozen backbone's normalized features (final_efm.py:218-219).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class LinearHead(nn.Module):
    """Bias-free linear projection head: [B, D_in] -> [B, out_dim]."""

    out_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        out = nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                       name="proj")(x)
        return out.astype(jnp.float32)
