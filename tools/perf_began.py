"""BEGAN-CS train-step throughput on the real chip — completes the
model-family perf table (DeepFace and the grayscale ladders already have
rows in BASELINE.md; the reference ships no BEGAN-CS code at all, so any
finite number is beyond parity).

Methodology matches bench.py: K steps chained in one lax.scan program,
scalar fetch at the end (per-dispatch timing lies through the tunnel).

    python tools/perf_began.py [--size 64] [--batch 16] [--filters 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--filters", type=int, default=64)
    ap.add_argument("--h-dim", type=int, default=64)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        AutoencoderDiscriminator,
        Generator,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train.gan import (
        create_gan_state,
        make_began_cs_train_step,
    )

    print("devices:", jax.devices(), file=sys.stderr)
    gen = Generator(size=args.size, channels=1, n=args.filters,
                    h_dim=args.h_dim)
    disc = AutoencoderDiscriminator(size=args.size, channels=1,
                                    n=args.filters, h_dim=args.h_dim)
    gen_tx = optax.adam(1e-4, b1=0.5)
    disc_tx = optax.adam(1e-4, b1=0.5)
    rng = np.random.default_rng(0)
    sample = rng.uniform(-1, 1, (1, args.size, args.size, 1)).astype(
        np.float32)
    state = create_gan_state(gen, disc, gen_tx, disc_tx,
                             jax.random.PRNGKey(0), sample, args.h_dim)
    step = make_began_cs_train_step(gen, disc, gen_tx, disc_tx,
                                    h_dim=args.h_dim, mining_mode="random")

    k = args.steps
    anc = jax.jit(lambda key: jax.random.uniform(
        key, (k, args.batch, args.size, args.size, 1), jnp.float32, -1, 1))(
            jax.random.PRNGKey(1))
    pos = anc[:, :, ::-1]  # horizontal flip per image (same labels)
    lab = jnp.tile(jnp.arange(args.batch) % 4, (k, 1))

    @jax.jit
    def scanned(state, anc, pos, lab):
        def body(st, xl):
            st, m = step(st, *xl)
            return st, m["convergence"]

        st, ms = jax.lax.scan(body, state, (anc, pos, lab))
        return st, ms.sum()

    t0 = time.perf_counter()
    st, _ = scanned(state, anc, pos, lab)
    _ = float(_)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    ts = []
    for _i in range(3):
        t0 = time.perf_counter()
        _st, acc = scanned(state, anc, pos, lab)
        _ = float(acc)
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / k
    n_gen = sum(x.size for x in jax.tree_util.tree_leaves(state.gen_params))
    n_disc = sum(x.size for x in jax.tree_util.tree_leaves(
        state.disc_params))
    print(f"BEGAN-CS {args.size}px B={args.batch} n={args.filters}: "
          f"{dt * 1e3:.1f} ms/step ({2 * args.batch / dt:.0f} imgs/s), "
          f"G {n_gen / 1e6:.1f}M + D {n_disc / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
