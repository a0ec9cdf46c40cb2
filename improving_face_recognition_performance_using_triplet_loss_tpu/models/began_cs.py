"""BEGAN-CS generator / autoencoder-discriminator (Chang et al., 2018).

The reference names "BEGAN-CS model with Triplet Loss" as a capability
(README.md:8,19) with no code — result grids only (SURVEY.md C29).
Reconstructed from the BEGAN (Berthelot et al. 2017) and BEGAN-CS papers:

- Generator/Decoder: z [h] -> Dense(8*8*n) -> 3x (conv3x3 n, conv3x3 n,
  2x nearest upsample) -> conv3x3 to 3 channels. ELU activations.
- Encoder: conv3x3 n -> blocks with channel widening (n, 2n, 3n ...) and
  stride-2 downsampling -> Dense(h). The encoder embedding doubles as the
  face-embedding space on which the thesis applies triplet loss.
- Discriminator = Encoder -> Decoder autoencoder; pixel L1 reconstruction
  losses drive the boundary-equilibrium game, and the CS term
  |z - Enc(G(z))| constrains the latent space (the "-CS" addition).

Canonical image size 64x64 (README.md:38-39 result grids are 64x64).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class Decoder(nn.Module):
    """z [B, h] -> image [B, size, size, channels] in [-1, 1]."""

    size: int = 64
    channels: int = 3
    n: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        base = 8
        num_ups = {8: 0, 16: 1, 32: 2, 64: 3, 128: 4}[self.size]
        x = nn.Dense(base * base * self.n, dtype=d, name="fc")(z.astype(d))
        x = x.reshape((-1, base, base, self.n))
        for i in range(num_ups + 1):
            x = nn.elu(nn.Conv(self.n, (3, 3), padding="SAME", dtype=d,
                               name=f"conv{i}a")(x))
            x = nn.elu(nn.Conv(self.n, (3, 3), padding="SAME", dtype=d,
                               name=f"conv{i}b")(x))
            if i < num_ups:
                x = _upsample2x(x)
        x = nn.Conv(self.channels, (3, 3), padding="SAME", dtype=d,
                    name="to_img")(x)
        return jnp.tanh(x).astype(jnp.float32)


class Encoder(nn.Module):
    """image [B, size, size, C] -> z [B, h] (the embedding space)."""

    h_dim: int = 64
    n: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dtype
        x = x.astype(d)
        x = nn.elu(nn.Conv(self.n, (3, 3), padding="SAME", dtype=d,
                           name="conv_in")(x))
        size = x.shape[1]
        i = 0
        while size > 8:
            width = self.n * (i + 1)
            x = nn.elu(nn.Conv(width, (3, 3), padding="SAME", dtype=d,
                               name=f"block{i}a")(x))
            x = nn.elu(nn.Conv(width, (3, 3), strides=(2, 2), padding="SAME",
                               dtype=d, name=f"block{i}down")(x))
            size //= 2
            i += 1
        x = x.reshape((x.shape[0], -1))
        z = nn.Dense(self.h_dim, dtype=d, name="fc")(x)
        return z.astype(jnp.float32)


class Generator(nn.Module):
    """BEGAN generator (same topology as the decoder, separate weights)."""

    size: int = 64
    channels: int = 3
    n: int = 64
    h_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        return Decoder(self.size, self.channels, self.n, self.dtype,
                       name="dec")(z)


class AutoencoderDiscriminator(nn.Module):
    """Encoder -> Decoder; returns (reconstruction, latent)."""

    size: int = 64
    channels: int = 3
    n: int = 64
    h_dim: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        z = Encoder(self.h_dim, self.n, self.dtype, name="enc")(x)
        recon = Decoder(self.size, self.channels, self.n, self.dtype,
                        name="dec")(z)
        return recon, z

    def encode(self, variables, x):
        """Embedding-only application (for triplet training / extraction)."""
        return Encoder(self.h_dim, self.n, self.dtype, name="enc").apply(
            {"params": variables["params"]["enc"]}, x)
