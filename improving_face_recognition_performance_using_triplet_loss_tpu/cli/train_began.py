"""BEGAN-CS + triplet-consistency training (BASELINE.json config #5).

Trains the BEGAN-CS generator/autoencoder-discriminator on identity-labeled
face images with the boundary-equilibrium game, the CS latent constraint,
and triplet loss on the encoder embedding space. Saves per-interval sample
grids (the README.md:38-39 artifact) and the convergence-measure curve.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", help=".npz image store (images+labels)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-size", type=int, default=32)
    p.add_argument("--out-dir", default="runs/train_began")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--h-dim", type=int, default=64)
    p.add_argument("--filters", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--gamma", type=float, default=0.5)
    p.add_argument("--lambda-k", type=float, default=1e-3)
    p.add_argument("--lambda-cs", type=float, default=0.1)
    p.add_argument("--triplet-weight", type=float, default=0.1)
    p.add_argument("--triplet-margin", type=float, default=0.2)
    p.add_argument("--mining", default="random",
                   choices=["random", "semi_hard", "semi_hard_fused", "hard"])
    p.add_argument("--sample-every", type=int, default=10)
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p


def save_sample_grid(images: np.ndarray, path: str, cols: int = 8) -> str:
    """Tile [N, H, W, C] in [-1, 1] into one jpg grid (README result format)."""
    import cv2

    n, h, w, c = images.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, c), np.float32)
    for i in range(n):
        r, cl = divmod(i, cols)
        grid[r * h:(r + 1) * h, cl * w:(cl + 1) * w] = images[i]
    grid = ((grid + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    if c == 1:
        grid = grid[..., 0]
    cv2.imwrite(path, grid if c == 1 else cv2.cvtColor(grid,
                                                       cv2.COLOR_RGB2BGR))
    return path


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import optax

    from ._common import setup_logging, log_config
    from ..data import PairBatcher
    from ..models.began_cs import AutoencoderDiscriminator, Generator
    from ..parallel import make_mesh
    from ..train.gan import (create_gan_state, make_began_cs_train_step,
                             shard_map_gan_step)
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    log = setup_logging(os.path.join(args.out_dir, "log"), "train_began")
    log_config(log, args)

    from .train_backbone import _load_images
    images, labels, _ = _load_images(args)
    # BEGAN trains on [-1, 1] RGB/gray images (uint8 mmap stores load raw)
    images = np.asarray(images, np.float32)
    if images.max() > 1.5:
        images = images / 255.0
    images = images * 2.0 - 1.0
    size = images.shape[1]
    channels = images.shape[3]
    batch = min(args.batch_size, images.shape[0])

    generator = Generator(size=size, channels=channels, n=args.filters,
                          h_dim=args.h_dim)
    discriminator = AutoencoderDiscriminator(size=size, channels=channels,
                                             n=args.filters, h_dim=args.h_dim)
    gen_tx = optax.adam(args.lr, b1=0.5)
    disc_tx = optax.adam(args.lr, b1=0.5)
    state = create_gan_state(generator, discriminator, gen_tx, disc_tx,
                             jax.random.PRNGKey(args.seed), images[:1],
                             args.h_dim)
    axis = "data" if args.data_parallel else None
    step = make_began_cs_train_step(
        generator, discriminator, gen_tx, disc_tx, h_dim=args.h_dim,
        gamma=args.gamma, lambda_k=args.lambda_k, lambda_cs=args.lambda_cs,
        triplet_weight=args.triplet_weight,
        triplet_margin=args.triplet_margin, mining_mode=args.mining,
        axis_name=axis)
    if args.data_parallel:
        step = shard_map_gan_step(step, make_mesh())
    else:
        step = jax.jit(step)

    sample_z = jax.random.uniform(jax.random.PRNGKey(args.seed + 1),
                                  (16, args.h_dim), jnp.float32, -1, 1)
    batcher = PairBatcher(images, labels, batch, shuffle=True, seed=args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    convergence = []
    for epoch in range(args.epochs):
        ms = []
        for anc, pos, lab in batcher:
            state, metrics = step(state, anc, pos, lab)
            ms.append(metrics)
        if ms:
            last = ms[-1]
            convergence.append(float(last["convergence"]))
            log.info(
                "Epoch %d: M=%.4f d=%.4f g=%.4f cs=%.4f tl=%.4f k=%.4f",
                epoch, float(last["convergence"]), float(last["loss_d"]),
                float(last["loss_g"]), float(last["loss_cs"]),
                float(last["loss_triplet"]), float(last["k_t"]))
        if (epoch + 1) % args.sample_every == 0 or epoch == args.epochs - 1:
            fake = generator.apply({"params": state.gen_params}, sample_z)
            save_sample_grid(np.asarray(fake),
                             os.path.join(args.out_dir,
                                          f"samples_{epoch:04d}.jpg"))

    from ..eval.plots import draw_curve
    if convergence:
        draw_curve({"M": convergence}, "convergence measure",
                   os.path.join(args.out_dir, "convergence.jpg"))
    from ..serve.export import export_params
    export_params(os.path.join(args.out_dir, "export_gen"), state.gen_params,
                  model_name="began_cs_generator", feature_dim=args.h_dim,
                  input_hw=(size, size), input_channels=channels)
    export_params(os.path.join(args.out_dir, "export_disc"),
                  state.disc_params, model_name="began_cs_discriminator",
                  feature_dim=args.h_dim, input_hw=(size, size),
                  input_channels=channels)
    log.info("done")
    return state, convergence


if __name__ == "__main__":
    main()
