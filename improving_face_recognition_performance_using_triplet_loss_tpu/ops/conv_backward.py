"""Alternative conv backward formulations (the round-4 backward-MFU
campaign, VERDICT r3 item 3).

Training is the reference's core workload (train_efm.py:206-294), and the
round-3 batch sweep measured train-step MFU flat at 22-24.5% with the
backward filter-gradient convs as the suspected ceiling. XLA lowers the
filter gradient as a conv whose contraction runs over the BATCH and
SPATIAL dims; its output tile is the tiny [k*k*Cin, Cout] filter — for
the early small-channel layers that wastes most of the MXU's output rows
(k^2*Cin = 25..432 vs the 128x128 tile), the same structural ceiling the
forward stem hits on its contraction edge.

``filter_grad_im2col`` re-expresses dW as an explicit matmul:

    patches = im2col(x)                   [B*H*W, k^2*Cin]
    dW      = patches^T @ dy              [k^2*Cin, Cout], K = B*H*W

Same FLOPs and the same structural M — the experiment tests whether
XLA's clean matmul path beats its grad-conv lowering (transposes,
window reversal) on real hardware. ``conv2d_fg_im2col`` wires it into a
drop-in conv via ``jax.custom_vjp`` so the train step can flip between
formulations with one flag; numeric parity with the standard vjp is
pinned in tests/test_train_steps.py.

Measurement: tools/perf_backward.py (per-layer backward roofline).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _conv_fwd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME NHWC conv, f32 accumulation (the ladder's shape —
    every LightCNN/EFMNet conv is stride-1 SAME; pooling downsamples)."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def filter_grad_im2col(x: jnp.ndarray, dy: jnp.ndarray, k: int,
                       padding: str = "SAME",
                       preferred=jnp.float32) -> jnp.ndarray:
    """dW [k, k, Cin, Cout] of a stride-1 ``padding`` conv as an explicit
    im2col matmul. ``x`` [B, H, W, Cin], ``dy`` [B, H', W', Cout].

    ``conv_general_dilated_patches`` emits the patch features
    CHANNEL-MAJOR ([Cin, k, k] order), so the matmul result reshapes to
    (Cin, k, k, Cout) and transposes into HWIO. ``preferred`` is the
    accumulation dtype (f32 is the production setting; bf16 exists for
    the perf_backward measurement variant only — a K=B*H*W contraction
    accumulated in bf16 loses real precision).
    """
    cin = x.shape[-1]
    cout = dy.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        x, (k, k), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, H', W', Cin*k*k]
    m = patches.reshape(-1, cin * k * k)
    g = dy.reshape(-1, cout)
    dw = jnp.dot(m.T, g, preferred_element_type=preferred)
    return dw.reshape(cin, k, k, cout).transpose(1, 2, 0, 3).astype(x.dtype)


def input_grad(dy: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """dX of a stride-1 SAME conv with an ODD square kernel: conv of dy
    with the spatially-flipped, IO-transposed kernel (the textbook
    identity; stays on XLA's standard conv path — the campaign targets
    dW, where the structural waste is). Odd k only: SAME padding is
    asymmetric for even k and the transposed conv would need the (hi,
    lo)-swapped pads, not another SAME conv — callers (and the
    interceptor) must not route even-k convs here."""
    if w.shape[0] % 2 != 1 or w.shape[0] != w.shape[1]:
        raise ValueError(
            f"input_grad supports odd square kernels only, got "
            f"{w.shape[:2]} (even-k SAME padding is asymmetric)")
    w_flip = w[::-1, ::-1].transpose(0, 1, 3, 2)  # [k, k, Cout, Cin]
    return jax.lax.conv_general_dilated(
        dy, w_flip, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dy.dtype)


@jax.custom_vjp
def conv2d_fg_im2col(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 SAME conv whose BACKWARD filter gradient runs the im2col
    matmul formulation (forward and input gradient unchanged)."""
    return _conv_fwd(x, w)


def _fg_fwd(x, w):
    return _conv_fwd(x, w), (x, w)


def _fg_bwd(res, g):
    x, w = res
    g = g.astype(x.dtype)
    dx = input_grad(g, w)
    dw = filter_grad_im2col(x, g, w.shape[0], "SAME").astype(w.dtype)
    return dx.astype(x.dtype), dw


conv2d_fg_im2col.defvjp(_fg_fwd, _fg_bwd)


def conv_interceptor_im2col_bwd():
    """flax ``intercept_methods`` interceptor routing every eligible
    nn.Conv (stride-1 SAME square kernel) through
    :func:`conv2d_fg_im2col` — flips a whole model's training backward to
    the im2col filter-grad formulation without touching model code
    (same mechanism as ops/quantized.py's int8 interceptor)."""
    import flax.linen as nn

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (not isinstance(mod, nn.Conv)
                or context.method_name != "__call__" or not args):
            return next_fun(*args, **kwargs)
        try:
            kernel = mod.variables["params"]["kernel"]
        except Exception:
            return next_fun(*args, **kwargs)
        if (kernel.ndim != 4 or kernel.shape[0] != kernel.shape[1]
                or kernel.shape[0] % 2 != 1):  # even-k SAME: see input_grad
            return next_fun(*args, **kwargs)
        strides = mod.strides or 1
        if strides not in (1, (1, 1)):
            return next_fun(*args, **kwargs)
        if not (isinstance(mod.padding, str) and mod.padding == "SAME"):
            return next_fun(*args, **kwargs)
        if mod.kernel_dilation not in (1, (1, 1), None) or \
                mod.input_dilation not in (1, (1, 1), None):
            return next_fun(*args, **kwargs)
        x = args[0]
        if x.ndim != 4 or x.shape[-1] != kernel.shape[2]:
            return next_fun(*args, **kwargs)
        dtype = mod.dtype or x.dtype
        y = conv2d_fg_im2col(x.astype(dtype), kernel.astype(dtype))
        if mod.use_bias:
            y = y + mod.variables["params"]["bias"].astype(jnp.float32)
        return y.astype(dtype)

    return interceptor
