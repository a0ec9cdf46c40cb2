"""Pallas fused stem: s2d-conv matmul with the maxout+phase-max epilogue in
VMEM (VERDICT round-1 item 7 — the "fused conv+MFM epilogue" attempt).

The XLA formulation of the space-to-depth stem (ops/s2d_stem.py) loses to
the unfused baseline because the 96/48-lane maxout slices de-fuse from the
conv and the [B, H/2, W/2, 4C] float32 activations round-trip HBM. Here the
conv is an explicit im2col matmul and the ENTIRE epilogue (bias, MFM2/EFM3
maxout, phase max) runs on the f32 accumulator tile in VMEM — HBM sees only
the [M, C_out] result, 8x smaller than the conv output.

Layout: patches [M, K] with K = 4*kh*kw in conv_general_dilated_patches'
channel-major order (q, bi, bj); weights [K, 4C] phase-major; one grid step
owns TM rows, the full K and N (K=36, N<=512 -> weight tile is tiny).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..s2d_stem import pack_stem_weights, space_to_depth2


def _stem_kernel(x_ref, w_ref, b_ref, o_ref, *, c: int, maxout: int):
    y = jnp.dot(x_ref[:], w_ref[:],
                preferred_element_type=jnp.float32)      # [TM, 4C]
    y = y + b_ref[:]                                     # bias, f32
    if maxout == 2:
        half = c // 2
        parts = [y[:, p * c + h * half: p * c + (h + 1) * half]
                 for p in range(4) for h in range(2)]
        out = functools.reduce(jnp.maximum, parts)
    else:  # efm3: concat(max3, per-phase-min3 maxed over phases)
        third = c // 3
        mx = functools.reduce(jnp.maximum, [
            y[:, p * c + s * third: p * c + (s + 1) * third]
            for p in range(4) for s in range(3)])
        mn = functools.reduce(jnp.maximum, [
            functools.reduce(jnp.minimum, [
                y[:, p * c + s * third: p * c + (s + 1) * third]
                for s in range(3)])
            for p in range(4)])
        out = jnp.concatenate([mx, mn], axis=-1)
    o_ref[:] = out.astype(o_ref.dtype)


def _stem2_kernel(x_ref, w_ref, b_ref, w2_ref, b2_ref, o_ref, *, c: int,
                  c2: int):
    """stem dot + mfm2+pool epilogue + the 1x1 follow-up conv + mfm2, all
    on the VMEM tile (lightcnn9's conv1..conv2a prefix — conv2a is 1x1 so
    it chains row-wise with no halo)."""
    y = jnp.dot(x_ref[:], w_ref[:],
                preferred_element_type=jnp.float32)      # [TM, 4C]
    y = y + b_ref[:]
    half = c // 2
    parts = [y[:, p * c + h * half: p * c + (h + 1) * half]
             for p in range(4) for h in range(2)]
    stem = functools.reduce(jnp.maximum, parts)          # [TM, C/2]
    y2 = jnp.dot(stem.astype(x_ref.dtype), w2_ref[:],
                 preferred_element_type=jnp.float32)     # [TM, C2]
    y2 = y2 + b2_ref[:]
    half2 = c2 // 2
    out = jnp.maximum(y2[:, :half2], y2[:, half2:])
    o_ref[:] = out.astype(o_ref.dtype)


def stem2_conv_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    w2: jnp.ndarray,
    bias2: jnp.ndarray,
    *,
    tile_m: int = 4096,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused [conv5x5(Cin=1)+mfm2+pool] -> [conv1x1+mfm2] (the lightcnn9
    conv1..conv2a prefix) in one pallas_call. w2: [1, 1, C/2, C2] or
    [C/2, C2]. Returns [B, H/2, W/2, C2/2]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, ww_, _ = x.shape
    c = w.shape[3]
    w2 = w2.reshape(w2.shape[-2], w2.shape[-1])
    c2 = w2.shape[1]
    hh, ww = h // 2, ww_ // 2

    xp = space_to_depth2(x)
    patches = jax.lax.conv_general_dilated_patches(
        xp, (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    m = b * hh * ww
    k = patches.shape[-1]
    patches = patches.reshape(m, k)
    wp = pack_stem_weights(w)
    wp = jnp.transpose(wp, (2, 0, 1, 3)).reshape(k, 4 * c)

    if m % tile_m != 0:
        tile_m = max(g for g in (2048, 1024, 512, 256, 128, 64, 32, 16, 8, 1)
                     if m % g == 0)
    out = pl.pallas_call(
        functools.partial(_stem2_kernel, c=c, c2=c2),
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 4 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c // 2, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, c2 // 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c2 // 2), x.dtype),
        interpret=interpret,
    )(patches, wp.astype(x.dtype),
      jnp.tile(bias.astype(jnp.float32), 4)[None, :],
      w2.astype(x.dtype), bias2.astype(jnp.float32)[None, :])
    return out.reshape(b, hh, ww, c2 // 2)


def stem_conv_maxout_pool_pallas(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    maxout: int = 2,
    tile_m: int = 4096,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Drop-in fused equivalent of conv(5x5, Cin=1)+{mfm2|efm3}+maxpool2.

    x: [B, H, W, 1]; w: [5, 5, 1, C]; bias: [C]. Returns
    [B, H/2, W/2, C_out] numerically equal to the unfused path.
    """
    if interpret is None:
        # no compiled Pallas backend on CPU: interpret there, compile on TPU
        interpret = jax.default_backend() == "cpu"
    b, h, ww_, _ = x.shape
    c = w.shape[3]
    c_out = c // 2 if maxout == 2 else 2 * (c // 3)
    hh, ww = h // 2, ww_ // 2

    xp = space_to_depth2(x)                               # [B, hh, ww, 4]
    # im2col: [B, hh, ww, 4*9] channel-major (q, bi, bj)
    patches = jax.lax.conv_general_dilated_patches(
        xp, (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    m = b * hh * ww
    k = patches.shape[-1]                                 # 36
    patches = patches.reshape(m, k)
    # weights [3,3,4,4C] (bi, bj, q, n) -> channel-major K: (q, bi, bj)
    wp = pack_stem_weights(w)
    wp = jnp.transpose(wp, (2, 0, 1, 3)).reshape(k, 4 * c)

    if m % tile_m != 0:
        tile_m = max(g for g in (512, 256, 128, 64, 32, 16, 8, 1)
                     if m % g == 0)
    grid = (m // tile_m,)
    out = pl.pallas_call(
        functools.partial(_stem_kernel, c=c, maxout=maxout),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 4 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, c_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c_out), x.dtype),
        interpret=interpret,
    )(patches, wp.astype(x.dtype),
      jnp.tile(bias.astype(jnp.float32), 4)[None, :])
    return out.reshape(b, hh, ww, c_out)
