"""BEGAN / BEGAN-CS loss pieces (Berthelot 2017; Chang 2018).

- Autoencoder pixel loss: L(v) = mean |v - D(v)| (L1).
- Boundary equilibrium: L_D = L(x) - k_t L(G(z)); L_G = L(G(z));
  k_{t+1} = clip(k_t + lambda_k (gamma L(x) - L(G(z))), 0, 1).
- Convergence measure: M = L(x) + |gamma L(x) - L(G(z))|.
- CS constraint: L_cs = mean |z - Enc(G(z))| keeps the discriminator's
  latent space anchored to the generator's input space.
"""

from __future__ import annotations

import jax.numpy as jnp


def recon_l1(x: jnp.ndarray, recon: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(x - recon))


def cs_constraint(z: jnp.ndarray, z_recovered: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(z - z_recovered))


def k_update(k_t: jnp.ndarray, loss_real: jnp.ndarray,
             loss_fake: jnp.ndarray, gamma: float = 0.5,
             lambda_k: float = 1e-3) -> jnp.ndarray:
    balance = gamma * loss_real - loss_fake
    return jnp.clip(k_t + lambda_k * balance, 0.0, 1.0)


def convergence_measure(loss_real: jnp.ndarray, loss_fake: jnp.ndarray,
                        gamma: float = 0.5) -> jnp.ndarray:
    return loss_real + jnp.abs(gamma * loss_real - loss_fake)
