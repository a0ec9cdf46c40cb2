"""Max-Feature-Map (MFM) and Extended-Feature-Map (EFM) activations.

The reference implements two activation variants on the channel axis
(reference: lightcnn.py:17-39, efm_symbol.py:68-77):

- ``mfm2`` — classic LightCNN MFM: split channels into 2 halves, take the
  elementwise max. C -> C/2.
- ``efm3`` — the thesis "EFM": split channels into 3 slices, concatenate the
  elementwise max-of-3 with the elementwise min-of-3. C -> 2C/3. The max is
  computed as max(max(s0, s1), s2) and the min as min(min(s0, s1), s2); the
  symbol variant writes max(s2, max(s0, s1)) which is identical.

TPU-first design notes: these are pure VPU element-wise ops over the channel
(last, lane) axis. In NHWC layout the slices are contiguous along lanes, so
XLA fuses the slice/max/min/concat chain into the producing convolution's
epilogue — no custom kernel is required for speed-of-light here; a fused
Pallas variant lives in ``ops/pallas/mfm_kernel.py`` and is validated against
these reference implementations.

Layout: channel-last (NHWC / [..., C]) everywhere — the TPU-native layout —
whereas the reference uses NCHW (axis=1 slices). Values are identical.
"""

from __future__ import annotations

import jax.numpy as jnp


def mfm2(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """2-way max-feature-map: C -> C/2 along ``axis``.

    Equivalent to the reference's 2-way branch (efm_symbol.py:62-64,76-77).
    """
    c = x.shape[axis]
    if c % 2 != 0:
        raise ValueError(f"mfm2 requires an even channel count, got {c}")
    a, b = jnp.split(x, 2, axis=axis)
    return jnp.maximum(a, b)


def efm3(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """3-way extended-feature-map: C -> 2C/3 along ``axis``.

    concat(max(s0,s1,s2), min(s0,s1,s2)); reference lightcnn.py:32-38.
    """
    c = x.shape[axis]
    if c % 3 != 0:
        raise ValueError(f"efm3 requires channels divisible by 3, got {c}")
    s0, s1, s2 = jnp.split(x, 3, axis=axis)
    mx = jnp.maximum(jnp.maximum(s0, s1), s2)
    mn = jnp.minimum(jnp.minimum(s0, s1), s2)
    return jnp.concatenate([mx, mn], axis=axis)


def mfm(x: jnp.ndarray, num_slices: int = 3, axis: int = -1) -> jnp.ndarray:
    """Dispatch: 3-way EFM or 2-way MFM, matching the reference's
    ``num % 3 == 0`` selection rule (efm_symbol.py:68-77)."""
    if num_slices == 3:
        return efm3(x, axis=axis)
    if num_slices == 2:
        return mfm2(x, axis=axis)
    raise ValueError(f"num_slices must be 2 or 3, got {num_slices}")


def mfm_out_channels(c: int, num_slices: int = 3) -> int:
    """Output channel count of the activation for input channels ``c``."""
    if num_slices == 3:
        return (c // 3) * 2
    return c // 2
