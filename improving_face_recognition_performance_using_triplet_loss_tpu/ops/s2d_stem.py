"""Space-to-depth fused stem: conv(5x5, Cin=1) + maxout + 2x2 maxpool as ONE
MXU-shaped convolution (round-2 adversarial MFU pass, VERDICT item 7).

Why: the LightCNN/EFM stem convolves a 1-channel 128px image with a 5x5
kernel — contraction depth 25 against the MXU's 128 lanes, measured at
~9 TFLOP/s (tools/perf_layers.py), the single largest block of extraction
wall-time. The classic fix is space-to-depth: pack 2x2 pixel blocks into 4
channels, turn the stride-1 5x5 conv into a 3x3x4 conv producing all four
output PHASES as channel groups, and notice that the 2x2 maxpool that
follows is exactly a max over those phases — so conv+maxout+pool collapse
into conv -> reshape -> maxout -> phase-max with NO unpacking and NO
reduce_window. Contraction depth rises 25 -> 36, the spatial grid shrinks
4x, and the pooled intermediate never materializes at full resolution.

Numerics are EXACTLY the baseline path's (same dtype, same contraction
order up to FP reassociation) — tests assert allclose at tight tolerance.

Derivation: with x[u, v] and SAME-2 padding, output phase (pi, pj) at block
(I, J) is y[2I+pi, 2J+pj] = sum_{di,dj} x[2I+pi+di-2, 2J+pj+dj-2] w[di,dj].
Writing u = 2(I+bi-1)+qi gives di = 2 bi + qi - pi, so the packed kernel is
W'[bi, bj, (qi,qj), (pi,pj), c] = w[2bi+qi-pi, 2bj+qj-pj, 0, c] (zero when
the index falls outside [0, 4]), and block-level SAME-1 padding reproduces
the original SAME-2 padding exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_stem_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[5, 5, 1, C] stride-1 SAME kernel -> [3, 3, 4, 4*C] space-to-depth
    kernel (input channels = (qi,qj) blocks; output channels = phase-major
    (pi,pj) x C)."""
    if w.shape[:3] != (5, 5, 1):
        raise ValueError(f"expected [5, 5, 1, C] kernel, got {w.shape}")
    c = w.shape[3]
    out = jnp.zeros((3, 3, 2, 2, 2, 2, c), w.dtype)
    for bi in range(3):
        for bj in range(3):
            for qi in range(2):
                for qj in range(2):
                    for pi in range(2):
                        for pj in range(2):
                            di = 2 * bi + qi - pi
                            dj = 2 * bj + qj - pj
                            if 0 <= di <= 4 and 0 <= dj <= 4:
                                out = out.at[bi, bj, qi, qj, pi, pj].set(
                                    w[di, dj, 0])
    # [3,3,(qi,qj)=4, (pi,pj)=4, C] -> [3, 3, 4, 4*C]
    return out.reshape(3, 3, 4, 4 * c)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 1] -> [B, H/2, W/2, 4] with channel index qi*2+qj."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(b, h // 2, w // 2, 4)


def stem_conv_maxout_pool(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    maxout: int = 2,
) -> jnp.ndarray:
    """Fused conv(5x5 SAME, Cin=1) + {mfm2 | efm3} + maxpool(2,2) stride 2.

    x: [B, H, W, 1] (H, W even); w: [5, 5, 1, C]; bias: [C].
    maxout=2 -> mfm2 (C -> C/2, max of halves);
    maxout=3 -> efm3 (C -> 2C/3, concat(max3, min3)).
    Returns [B, H/2, W/2, C_out] identical to the unfused pipeline.
    """
    import functools

    c = w.shape[3]
    xp = space_to_depth2(x)
    wp = pack_stem_weights(w)
    y = jax.lax.conv_general_dilated(
        xp, wp, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    # phase-major channels: index = p*c + ch. Everything below is pure
    # lane-slice elementwise max/min — it fuses into the conv epilogue (a
    # 5-D reshape + axis-reduce here de-fuses and materializes the f32
    # activations: measured 3x SLOWER than the unfused baseline)
    y = y + jnp.tile(bias.astype(y.dtype), 4)
    if maxout == 2:
        half = c // 2
        parts = [y[..., p * c + h * half: p * c + (h + 1) * half]
                 for p in range(4) for h in range(2)]
        out = functools.reduce(jnp.maximum, parts)
    elif maxout == 3:
        third = c // 3
        mx = functools.reduce(jnp.maximum, [
            y[..., p * c + s * third: p * c + (s + 1) * third]
            for p in range(4) for s in range(3)])
        # per-phase min3 first, THEN max over phases (efm3 before pool)
        mn = functools.reduce(jnp.maximum, [
            functools.reduce(jnp.minimum, [
                y[..., p * c + s * third: p * c + (s + 1) * third]
                for s in range(3)])
            for p in range(4)])
        out = jnp.concatenate([mx, mn], axis=-1)
    else:
        raise ValueError(f"maxout must be 2 or 3, got {maxout}")
    return out.astype(x.dtype)


def reference_stem(x, w, bias, *, maxout: int = 2):
    """The unfused baseline (conv + mfm/efm + reduce_window pool) used as
    the numerical oracle in tests AND as the training/CPU path of
    models.FusedStem.

    No ``preferred_element_type``: with bf16 inputs it would make the conv
    transpose under ``jax.grad`` pair an f32 cotangent with a bf16 kernel
    (dtype error); XLA's MXU accumulates in f32 internally regardless."""
    from .mfm import efm3, mfm2

    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(x.dtype)
    y = mfm2(y) if maxout == 2 else efm3(y)
    return jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


__all__ = ["pack_stem_weights", "space_to_depth2", "stem_conv_maxout_pool",
           "reference_stem"]


def _self_check():  # pragma: no cover - quick manual sanity
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(5, 5, 1, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    got = stem_conv_maxout_pool(x, w, b)
    want = reference_stem(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)
    print("s2d stem matches reference")


if __name__ == "__main__":
    _self_check()
