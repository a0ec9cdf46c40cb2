"""DeepFace embedding network (Taigman et al., CVPR 2014).

The reference names DeepFace as one of its three triplet-loss targets
(README.md:8,15) but ships NO code — only an architecture screenshot
(SURVEY.md C28). Reconstructed from the paper: C1 11x11x32 conv -> 3x3/2
maxpool -> C3 9x9x16 conv -> three LOCALLY-CONNECTED layers (L4 9x9x16,
L5 7x7x16, L6 5x5x16) -> F7 4096-d fully connected (the embedding) ->
F8 softmax. Canonical input 152x152x3; any size >= 64 works (the LC layers
size themselves at init).

TPU-first locally-connected design: untied conv weights are a poor fit for
direct translation; here each LC layer is patch extraction
(``conv_general_dilated_patches``) followed by a per-position einsum
contraction — i.e., one big batched matmul on the MXU instead of H'xW'
little convolutions.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class LocallyConnected2D(nn.Module):
    """Conv with untied (per-position) weights; VALID padding, stride 1."""

    features: int
    kernel: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel
        b, h, w, c = x.shape
        oh, ow = h - kh + 1, w - kw + 1
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B, OH, OW, C*KH*KW]
        weights = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (oh, ow, patches.shape[-1], self.features), self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (oh, ow, self.features), self.dtype)
        out = jnp.einsum("bhwp,hwpf->bhwf", patches.astype(self.dtype),
                         weights, preferred_element_type=jnp.float32)
        return out.astype(self.dtype) + bias


class DeepFace(nn.Module):
    """DeepFace: (logits, 4096-d F7 embedding). Input [B, H, W, C]."""

    num_classes: int
    dtype: Any = jnp.float32
    feature_dim: int = 4096
    lc_features: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        if min(x.shape[1], x.shape[2]) < 65:
            raise ValueError(
                "DeepFace's VALID conv/LC ladder needs inputs >= 65x65 "
                f"(canonical 152x152); got {x.shape[1]}x{x.shape[2]}")
        d = self.dtype
        x = x.astype(d)
        # C1 + M2
        x = nn.relu(nn.Conv(32, (11, 11), padding="VALID", dtype=d,
                            name="c1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        # C3
        x = nn.relu(nn.Conv(16, (9, 9), padding="VALID", dtype=d,
                            name="c3")(x))
        # L4-L6 locally connected
        x = nn.relu(LocallyConnected2D(self.lc_features, (9, 9), dtype=d,
                                       name="l4")(x))
        x = nn.relu(LocallyConnected2D(self.lc_features, (7, 7), dtype=d,
                                       name="l5")(x))
        x = nn.relu(LocallyConnected2D(self.lc_features, (5, 5), dtype=d,
                                       name="l6")(x))
        x = x.reshape((x.shape[0], -1))
        # F7 embedding (paper: ReLU + dropout before the classifier)
        feat = nn.relu(nn.Dense(self.feature_dim, dtype=d, name="f7")(x))
        h = nn.Dropout(rate=0.5, deterministic=not train, name="f7_drop")(feat)
        logits = nn.Dense(self.num_classes, dtype=d, name="f8")(h)
        return logits.astype(jnp.float32), feat.astype(jnp.float32)
