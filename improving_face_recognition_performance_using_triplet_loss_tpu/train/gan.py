"""BEGAN-CS training step with triplet-loss consistency.

Implements BASELINE.json config #5 ("BEGAN-CS generator/discriminator with
triplet-loss consistency (reconstruction + embedding joint train)") — the
README-only capability of the reference (README.md:19, SURVEY.md C29).

One fused step updates both players:
  L_D = L(x) - k_t L(G(z)) + lambda_cs |z - Enc(G(z))| + beta * TL(Enc(x))
  L_G = L(G(z))
with the boundary-equilibrium k_t update and the convergence measure M.
The discriminator's encoder doubles as the face-embedding net, so the
triplet term (anchor/positive pairs + in-batch mined negatives — the same
machinery as the classifier trainers) shapes its latent space by identity.

Data parallel exactly like steps.py: batch axis sharded, grads pmean'd,
mining pool all-gathered.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from ..losses.began import (convergence_measure, cs_constraint, k_update,
                            recon_l1)
from ..losses.triplet import triplet_loss
from ..ops.distances import rowwise_cosine
from ..parallel.mesh import DATA_AXIS
from .steps import _mine, _pool

GAN_METRIC_KEYS = ("loss_d", "loss_g", "loss_real", "loss_fake", "loss_cs",
                   "loss_triplet", "k_t", "convergence", "pos_cos", "neg_cos")


@flax.struct.dataclass
class GANState:
    gen_params: Any
    gen_opt: Any
    disc_params: Any
    disc_opt: Any
    k_t: jnp.ndarray
    step: jnp.ndarray
    base_key: jax.Array


def create_gan_state(generator, discriminator, gen_tx, disc_tx, rng,
                     sample_images, h_dim: int) -> GANState:
    kg, kd, base = jax.random.split(rng, 3)
    z = jnp.zeros((1, h_dim), jnp.float32)
    gen_params = generator.init(kg, z)["params"]
    disc_params = discriminator.init(kd, sample_images[:1])["params"]
    return GANState(
        gen_params=gen_params, gen_opt=gen_tx.init(gen_params),
        disc_params=disc_params, disc_opt=disc_tx.init(disc_params),
        k_t=jnp.zeros((), jnp.float32), step=jnp.zeros((), jnp.int32),
        base_key=base)


def make_began_cs_train_step(
    generator,
    discriminator,
    gen_tx: optax.GradientTransformation,
    disc_tx: optax.GradientTransformation,
    *,
    h_dim: int = 64,
    gamma: float = 0.5,
    lambda_k: float = 1e-3,
    lambda_cs: float = 0.1,
    triplet_weight: float = 0.1,
    triplet_margin: float = 0.2,
    mining_mode: str = "random",
    axis_name: str | None = None,
):
    """(state, anchor, positive, labels) -> (state, metrics)."""

    def step(state: GANState, anchor: jnp.ndarray, positive: jnp.ndarray,
             labels: jnp.ndarray):
        b = anchor.shape[0]
        key = jax.random.fold_in(state.base_key, state.step)
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_z, k_mine = jax.random.split(key)
        labels = labels.astype(jnp.int32)
        real = jnp.concatenate([anchor, positive], axis=0)  # [2B, H, W, C]
        z = jax.random.uniform(k_z, (2 * b, h_dim), jnp.float32, -1.0, 1.0)

        def disc_loss_fn(disc_params):
            fake = generator.apply({"params": state.gen_params}, z)
            fake = jax.lax.stop_gradient(fake)
            recon_real, z_real = discriminator.apply(
                {"params": disc_params}, real)
            recon_fake, z_fake = discriminator.apply(
                {"params": disc_params}, fake)
            l_real = recon_l1(real, recon_real)
            l_fake = recon_l1(fake, recon_fake)
            l_cs = cs_constraint(z, z_fake)
            # triplet consistency on the encoder embedding of real images
            anc_e, pos_e = z_real[:b], z_real[b:]
            pool_feat, pool_labels = _pool(anc_e, pos_e, labels, axis_name)
            neg_e = _mine(mining_mode, k_mine, anc_e, pos_e, pool_feat,
                          labels, pool_labels, None)
            tl = triplet_loss(anc_e, pos_e, neg_e, margin=triplet_margin,
                              normalize=True)
            loss_d = (l_real - state.k_t * l_fake + lambda_cs * l_cs
                      + triplet_weight * tl)
            aux = {
                "loss_real": l_real, "loss_fake": l_fake, "loss_cs": l_cs,
                "loss_triplet": tl,
                "pos_cos": rowwise_cosine(anc_e, pos_e),
                "neg_cos": rowwise_cosine(anc_e, neg_e),
            }
            return loss_d, aux

        def gen_loss_fn(gen_params):
            fake = generator.apply({"params": gen_params}, z)
            recon_fake, _ = discriminator.apply(
                {"params": state.disc_params}, fake)
            return recon_l1(fake, recon_fake)

        (loss_d, aux), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(state.disc_params)
        loss_g, g_grads = jax.value_and_grad(gen_loss_fn)(state.gen_params)
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
            g_grads = jax.lax.pmean(g_grads, axis_name)
            loss_d = jax.lax.pmean(loss_d, axis_name)
            loss_g = jax.lax.pmean(loss_g, axis_name)
            aux = {k: (jax.lax.pmean(v, axis_name) if v.ndim == 0 else v)
                   for k, v in aux.items()}

        d_updates, d_opt = disc_tx.update(d_grads, state.disc_opt,
                                          state.disc_params)
        g_updates, g_opt = gen_tx.update(g_grads, state.gen_opt,
                                         state.gen_params)
        new_k = k_update(state.k_t, aux["loss_real"], aux["loss_fake"],
                         gamma, lambda_k)
        new_state = state.replace(
            gen_params=optax.apply_updates(state.gen_params, g_updates),
            gen_opt=g_opt,
            disc_params=optax.apply_updates(state.disc_params, d_updates),
            disc_opt=d_opt,
            k_t=new_k,
            step=state.step + 1)
        metrics = {
            "loss_d": loss_d, "loss_g": loss_g, "k_t": new_k,
            "convergence": convergence_measure(aux["loss_real"],
                                               aux["loss_fake"], gamma),
            **aux,
        }
        return new_state, metrics

    return step


def shard_map_gan_step(step_fn, mesh, axis_name: str = DATA_AXIS):
    mspec = {k: (P(axis_name) if k in ("pos_cos", "neg_cos") else P())
             for k in GAN_METRIC_KEYS}
    return jax.jit(jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), mspec), check_vma=False))
