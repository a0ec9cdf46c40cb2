"""Pallas fused front-half for LightCNN9: conv1(5x5)+mfm+pool -> conv2a(1x1)
+mfm -> conv2(3x3)+mfm -> 2x2 pool, one kernel, VMEM-resident end to end.

MEASURED OUTCOME (round 3, real v5e — the experiment this kernel exists
for): the fused chain LOSES to XLA, 2.52 ms vs 2.22 ms per B=128 batch
at 128px (best of tile_b 1/2/4/8 and both W-tap/maxout formulations =
0.886x). The in-kernel ablation (tools/perf_front9.py PF_ABLATE=1)
locates the floor: the stem DOT ALONE — [4096, 36] x [36, 384] per
image — costs 1.05-1.07 ms regardless of tile_b, i.e. 13.8 TFLOP/s,
the same K=36-starved MXU rate XLA's own s2d-stem lowering achieves;
everything downstream (conv2a+conv2+pool) runs in ~1.0 ms here vs
~1.1 ms in XLA, so the fusion headroom the chain was built to capture
is already captured by XLA's elementwise fusion. This is the sixth and
final front-end formulation (docs/DESIGN.md "Fused front-half chain"):
the extraction ceiling is the K=36 contraction structure, not HBM
round-trips. The kernel stays in-tree as the documented proof + a
working example of multi-layer VMEM-resident conv chaining in Pallas.

This was the "full custom front-half conv pipeline" that docs/DESIGN.md
(round 2/3) named as the one remaining extraction lever: the three layers
it subsumes (conv1 2.37 ms, conv2a 0.76 ms, conv2 1.70 ms at B=256) are
~73% of the measured extraction batch, bound by XLA's small-channel conv
lowering (stem 22% of its K-derated MXU roofline) and by the HBM
round-trips between them. Here every intermediate activation lives in
VMEM: HBM sees the s2d stem patches in ([M, 36] bf16) and the pooled
32px output ([B, 32, 32, C2/2]) — nothing else.

Structure per grid step (one whole 64x64-grid image, so no halo exchange
is ever needed):

  patches [4096, 36] --K=36 dot--> [4096, 4*C1] --phase-max+mfm--> [4096, C1/2]
    --K=C1/2 dot (1x1)--> [4096, C2a] --mfm--> [64, 64, C2a/2]
    --W-pad+concat in VMEM--> [64, 64, 3*C2a/2]
    --3 H-shifted K=3*C2a/2 dots--> [4096, C2] --mfm--> [64, 64, C2/2]
    --2x2 max pool--> [1024, C2/2]

The 3x3 conv2 runs as three MXU dots of contraction depth 3*C2a/2 (=144
for LightCNN9) instead of XLA's small-channel lowering; "SAME" zero
padding is reproduced exactly by the zero columns/rows of the padded
VMEM copies. Weight layout transforms are host-side one-offs.

The five prior formulations and their measured losses are documented in
docs/DESIGN.md ("Fused-stem attempts", "Multi-layer VMEM chain"); this
kernel differs from the losing ``stem2_conv_pallas`` in that it subsumes
conv2 — the 174-GFLOP layer — so the pallas_call boundary cost is
amortized over ~10x more work, and it returns the 4x-smaller pooled
tensor, removing the [B, 64, 64, C2/2] HBM round-trip entirely.

Reference behavior being fused: the conv1..pool2 prefix of the LightCNN
paper network (models/lightcnn.py::LightCNN9; the stem itself mirrors
the reference gluon stem, reference lightcnn.py:82-83).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..s2d_stem import pack_stem_weights, space_to_depth2


def _front9_kernel(p_ref, w1_ref, b1_ref, w2a_ref, b2a_ref, w2_ref, b2_ref,
                   o_ref, *, c1: int, c2a: int, c2: int, hw: int,
                   tile_b: int, pool: str, stages: int = 3,
                   wtap: str = "roll", maxout: str = "slices"):
    dt = p_ref.dtype
    m = tile_b * hw * hw  # rows of several images stacked in one tile
    # --- conv1 (s2d stem): one K-dot + bias + phase-max + mfm2 ------------
    y = (jnp.dot(p_ref[:], w1_ref[:],
                 preferred_element_type=jnp.float32)
         + b1_ref[:]).astype(dt)                                 # [M, 4*C1]
    half1 = c1 // 2
    if stages == 0:  # perf-ablation: stem dot only, maxout skipped
        o_ref[:] = y[:, :half1].astype(o_ref.dtype)
        return
    if maxout == "roll":
        # max over the 8 phase/half groups as a lane-rotate tree: 3
        # rotates + 3 maxes on the full [M, 4*C1] f32 tensor, then one
        # offset-0 slice — avoids 7 unaligned-lane-slice relayouts
        yf = y.astype(jnp.float32)
        for sh in (4 * half1, 2 * half1, half1):
            yf = jnp.maximum(yf, pltpu.roll(yf, 8 * half1 - sh, 1))
        stem = yf[:, :half1].astype(dt)
    else:
        stem = functools.reduce(jnp.maximum, [
            y[:, p * c1 + h * half1: p * c1 + (h + 1) * half1]
            for p in range(4) for h in range(2)])                # [M, C1/2]
    if stages == 1:  # perf-ablation exit (tools/perf_front9.py)
        o_ref[:] = stem.astype(o_ref.dtype)
        return
    # --- conv2a (1x1) + mfm2 ---------------------------------------------
    y2 = (jnp.dot(stem, w2a_ref[:],
                  preferred_element_type=jnp.float32)
          + b2a_ref[:]).astype(dt)
    half2a = c2a // 2
    a = jnp.maximum(y2[:, :half2a], y2[:, half2a:])              # [M, C2a/2]
    if stages == 2:  # perf-ablation exit
        o_ref[:] = a.astype(o_ref.dtype)
        return
    # --- conv2 (3x3 SAME) ------------------------------------------------
    # W taps: sublane rolls by +-1 on the flat [M, C] view (row m =
    # h*hw + w) with iota border masks for "SAME" zeros — a lane-concat of
    # SLICED shifts is rejected by Mosaic ("offset mismatch on non-concat
    # dimension"), rolls keep every operand at offset 0; the rolls run in
    # f32 (tpu.dynamic_rotate has no sub-32-bit form; negative shifts are
    # spelled m-1: roll is a non-negative circular rotate). H taps:
    # slice+concat on the MAJOR dim of the 3-D view — layout-neutral,
    # no rotate at all.
    pos = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    kw = 3 * half2a
    nh = tile_b * hw
    if wtap == "slice3d":
        # W taps as dim-1 slice+concat on the 3-D [NH, W, C] view — pure
        # bf16, border zeros from the concat pads, no rotate/mask at all
        a3 = a.reshape(nh, hw, half2a)
        zw = jnp.zeros((nh, 1, half2a), dt)
        l3 = jnp.concatenate([zw, a3[:, :hw - 1]], axis=1)       # (h, w-1)
        r3 = jnp.concatenate([a3[:, 1:], zw], axis=1)            # (h, w+1)
        xw = jnp.concatenate([l3, a3, r3], axis=2).reshape(m, kw)
    else:
        wpos = pos % hw  # W position within the row, valid for any tile_b
        zero = jnp.zeros((), jnp.float32)
        af = a.astype(jnp.float32)
        left = jnp.where(wpos > 0, pltpu.roll(af, 1, 0), zero)   # (h, w-1)
        right = jnp.where(wpos < hw - 1, pltpu.roll(af, m - 1, 0), zero)
        xw = jnp.concatenate([left.astype(dt), a, right.astype(dt)],
                             axis=1)                             # [M, 3*C2a/2]
    xw3 = xw.reshape(nh, hw, kw)
    zr = jnp.zeros((1, hw, kw), dt)
    up = jnp.concatenate([zr, xw3[:nh - 1]], axis=0)             # (h-1, *)
    down = jnp.concatenate([xw3[1:], zr], axis=0)                # (h+1, *)
    # tile_b > 1: the rows leaking across image boundaries at the
    # concat seams are the H-border taps of a 3x3 SAME conv — they must
    # be zero, which the hpos mask enforces
    if tile_b > 1:
        hpos = (pos // hw) % hw
        zf = jnp.zeros((), jnp.float32)
        up = jnp.where(hpos > 0, up.reshape(m, kw), zf).astype(dt)
        down = jnp.where(hpos < hw - 1, down.reshape(m, kw),
                         zf).astype(dt)
    acc = jnp.zeros((m, c2), jnp.float32) + b2_ref[:]
    for di, taps in enumerate((up, xw3, down)):
        acc = acc + jnp.dot(
            taps.reshape(m, kw), w2_ref[di * kw:(di + 1) * kw],
            preferred_element_type=jnp.float32)                  # [M, C2]
    half2 = c2 // 2
    mm = jnp.maximum(acc[:, :half2], acc[:, half2:]).astype(dt)  # [M, C2/2]
    if pool == "none":
        o_ref[:] = mm.astype(o_ref.dtype)
        return
    # --- 2x2 max pool ----------------------------------------------------
    # H pairs via a major-dim split + static index (strided slices and the
    # [a, b, c] -> [a, b/2, 2c] sublane->lane merge both fail Mosaic's
    # layout inference).
    mm4 = mm.reshape(tile_b * hw, hw, half2).reshape(
        tile_b * hw // 2, 2, hw, half2)
    mh = jnp.maximum(mm4[:, 0], mm4[:, 1])                       # [hw/2, hw, .]
    # W pairs are reduced by the caller (one XLA elementwise max): the
    # even/odd-W subsample has no Mosaic-supported form — the
    # sublane->lane merge reshape, strided slices, and downsizing gathers
    # are all rejected; a half-size output for one extra fused max outside
    # is the cheap trade.
    o_ref[:] = mh.reshape(m // 2, half2).astype(o_ref.dtype)


def _stem_patches(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 1] -> s2d im2col patches [B*(H/2)*(W/2), 36], channel-major
    (q, bi, bj) to match ``pack_stem_weights`` + the transpose below."""
    xp = space_to_depth2(x)
    patches = jax.lax.conv_general_dilated_patches(
        xp, (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, hh, ww, k = patches.shape
    return patches.reshape(b * hh * ww, k)


def pack_front9_weights(params: dict, dtype=jnp.bfloat16) -> dict:
    """Host-side one-off: LightCNN9 conv1/conv2a/conv2 params (the flax
    nn.Conv trees) -> the kernel's matmul layouts."""
    w1 = pack_stem_weights(params["conv1"]["kernel"])
    k1 = w1.shape[0] * w1.shape[1] * w1.shape[2]
    w1 = jnp.transpose(w1, (2, 0, 1, 3)).reshape(k1, -1)         # [36, 4*C1]
    c1 = params["conv1"]["kernel"].shape[3]
    w2a = params["conv2a"]["kernel"].reshape(
        params["conv2a"]["kernel"].shape[-2], -1)                # [C1/2, C2a]
    # conv2 [3, 3, Cin, C2] -> H-major blocks of [3*Cin, C2]: block di holds
    # (dj, cin)-ordered rows to match xw's concat-over-dj lane order
    w2 = params["conv2"]["kernel"]                               # [3,3,Cin,C2]
    # row-major reshape alone yields the (di, dj, cin) row order that
    # matches xw's concat-over-dj lane order
    w2 = w2.reshape(9 * w2.shape[2], w2.shape[3])                # [3*3*Cin, C2]
    return {
        "w1": w1.astype(dtype),
        "b1": jnp.tile(params["conv1"]["bias"].astype(jnp.float32), 4)[None],
        "w2a": w2a.astype(dtype),
        "b2a": params["conv2a"]["bias"].astype(jnp.float32)[None],
        "w2": w2.astype(dtype),
        "b2": params["conv2"]["bias"].astype(jnp.float32)[None],
        "c1": c1,
        "c2a": params["conv2a"]["kernel"].shape[-1],
        "c2": params["conv2"]["kernel"].shape[-1],
    }


def front9_chain_pallas(
    x: jnp.ndarray,
    packed: dict,
    *,
    pool: str = "rows",
    tile_b: int = 4,
    interpret: bool | None = None,
    stages: int = 3,
    wtap: str = "roll",
    maxout: str = "slices",
) -> jnp.ndarray:
    """Fused LightCNN9 conv1..pool2 prefix.

    x: [B, H, W, 1] (H, W multiples of 4); ``packed`` from
    ``pack_front9_weights``. ``pool``: "rows" = H pairs pooled in-kernel,
    W pairs reduced by one fused XLA max outside (returns
    [B, H/4, W/4, C2/2]); "none" = pre-pool [B, H/2, W/2, C2/2]. Both
    numerically match ``front9_reference``.

    ``stages`` (perf ablation, tools/perf_front9.py): 1 = stop after the
    stem (flat [B*HW*HW, C1/2]), 2 = stop after conv2a, 3 = full chain.
    ``wtap``: conv2 W-tap formulation — "roll" (f32 rotates + border
    masks) or "slice3d" (bf16 dim-1 slice+concat on the [NH, W, C] view).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, _ = x.shape
    assert h == w and h % 4 == 0, (h, w)
    assert pool in ("rows", "none"), pool
    hw = h // 2
    if b % tile_b != 0:
        tile_b = max(g for g in (4, 2, 1) if b % g == 0)
    m = tile_b * hw * hw
    c1, c2a, c2 = packed["c1"], packed["c2a"], packed["c2"]
    dt = x.dtype
    patches = _stem_patches(x)
    k1 = patches.shape[-1]
    kw = 3 * (c2a // 2)
    if stages in (0, 1):
        mo, co = m, c1 // 2
    elif stages == 2:
        mo, co = m, c2a // 2
    else:
        mo = {"rows": m // 2, "none": m}[pool]
        co = c2 // 2
    out = pl.pallas_call(
        functools.partial(_front9_kernel, c1=c1, c2a=c2a, c2=c2, hw=hw,
                          tile_b=tile_b, pool=pool, stages=stages,
                          wtap=wtap, maxout=maxout),
        grid=(b // tile_b,),
        in_specs=[
            pl.BlockSpec((m, k1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, 4 * c1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * c1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c1 // 2, c2a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * kw, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mo, co), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // tile_b * mo, co), dt),
        # the f32 intermediates ([M, 4*C1] pre-maxout, the conv2 f32
        # accumulator) exceed the 16 MB default scoped-vmem budget at
        # tile_b > 1; v5e has 128 MB VMEM — let Mosaic use it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(patches, packed["w1"].astype(dt), packed["b1"],
      packed["w2a"].astype(dt), packed["b2a"],
      packed["w2"].astype(dt), packed["b2"])
    if stages < 3:
        return out
    if pool == "rows":  # W pairs: one fused elementwise max in XLA
        # row-major [.., hw, co] -> [.., hw/2, 2co]: lane block 0 is
        # w-even, block 1 is w-odd — exactly the 2x2 pool's W pair
        out = out.reshape(b, hw // 2, hw // 2, 2 * co)
        return jnp.maximum(out[..., :co], out[..., co:])
    return out.reshape(b, hw, hw, co)


def front9_reference(x: jnp.ndarray, params: dict, *,
                     pool_out: bool = True) -> jnp.ndarray:
    """Pure-XLA oracle for the fused chain (the exact model path:
    models/lightcnn.py::LightCNN9 conv1..pool2 with the same params)."""
    from ..mfm import mfm2
    from ..s2d_stem import reference_stem

    dt = x.dtype

    def conv(x, p, pad="SAME"):
        return jax.lax.conv_general_dilated(
            x, p["kernel"].astype(dt), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(dt)

    y = reference_stem(x, params["conv1"]["kernel"].astype(dt),
                       params["conv1"]["bias"].astype(dt), maxout=2)
    y = mfm2(conv(y, params["conv2a"]))
    y = mfm2(conv(y, params["conv2"]))
    if pool_out:
        y = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    return y


__all__ = ["front9_chain_pallas", "front9_reference", "pack_front9_weights"]
