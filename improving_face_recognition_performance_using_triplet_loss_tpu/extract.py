"""Batch feature extraction (reference C11, extract_feacture_v2.py:43-109).

The reference loads the symbol graph, groups the ``fc2_output`` ID logits and
``concat29_output`` 342-d feature internals, and streams RecordIO batches
through the net, writing L2-normalized rows to CSV one row at a time — a
host-side normalize + IO loop per row (SURVEY.md §3.3). Here the forward,
normalization, and accuracy all run on device in one jitted program; the host
only concatenates ready result arrays.

Target: >= 10k embeddings/sec/chip on LightCNN (BASELINE.md) — see bench.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops.distances import l2_normalize


def _apply_model(model, variables, images, int8: bool):
    """The forward, optionally with every eligible conv on the int8 MXU
    path (ops/quantized.py's generic interceptor — measured 1.11x on
    LightCNN9 bulk extraction, BASELINE.md 'Int8 on the serving nets')."""
    if int8:
        import flax.linen as nn

        from .ops.quantized import int8_conv_interceptor

        with nn.intercept_methods(int8_conv_interceptor()):
            return model.apply(variables, images, train=False)
    return model.apply(variables, images, train=False)


def make_extract_fn(model, *, normalize: bool = True, int8: bool = False):
    """Jitted (variables, images) -> (logits, features[, normalized])."""

    @jax.jit
    def fn(variables, images):
        if images.dtype == jnp.uint8:
            # streaming stores ship uint8; normalize on device (1/255)
            images = images.astype(jnp.float32) / 255.0
        logits, feat = _apply_model(model, variables, images, int8)
        if normalize:
            feat = l2_normalize(feat)
        return logits, feat

    return fn


def make_sharded_extract_fn(model, *, normalize: bool = True, mesh=None,
                            int8: bool = False):
    """Batch-axis SPMD extraction over every visible device — the bulk
    Celeb1M-scale extraction story on a pod (the reference extracts on one
    GPU, extract_feacture_v2.py:50; sharding the batch over the ICI mesh
    is the v5e-8 scaling answer for this stage). The per-call batch must
    divide the mesh's device count."""
    import functools

    from .parallel import data_sharding, make_mesh, replicated_sharding

    mesh = mesh or make_mesh()
    data = data_sharding(mesh)
    repl = replicated_sharding(mesh)

    @functools.partial(jax.jit, in_shardings=(repl, data),
                       out_shardings=(repl, repl))
    def fn(variables, images):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        logits, feat = _apply_model(model, variables, images, int8)
        if normalize:
            feat = l2_normalize(feat)
        return logits, feat

    return fn


def extract_features(
    model,
    variables,
    images: np.ndarray,
    labels: np.ndarray | None = None,
    *,
    batch_size: int = 256,
    normalize: bool = True,
    data_parallel: bool = False,
    int8: bool = False,
) -> tuple[np.ndarray, np.ndarray | None, float]:
    """Extract embeddings for all rows; returns (features, labels, accuracy).

    Pads the final partial batch (the reference drops it) so every input row
    gets an embedding. ``accuracy`` is top-1 ID accuracy when labels given.
    ``images`` may be a uint8 MEMMAP (pack_dataset --mmap store): rows are
    sliced per batch and normalized on device, so Celeb1M-scale extraction
    never materializes the float dataset in host RAM.
    """
    if data_parallel:
        ndev = len(jax.devices())
        if batch_size % ndev:
            raise ValueError(
                f"--data-parallel needs batch_size ({batch_size}) "
                f"divisible by the device count ({ndev})")
        fn = make_sharded_extract_fn(model, normalize=normalize, int8=int8)
    else:
        fn = make_extract_fn(model, normalize=normalize, int8=int8)
    n = images.shape[0]
    feats_out = []
    correct = 0
    counted = 0
    for start in range(0, n, batch_size):
        chunk = images[start:start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)], 0)
        logits, feat = fn(variables, jnp.asarray(chunk))
        feat = np.asarray(feat)[: batch_size - pad]
        feats_out.append(feat)
        if labels is not None:
            pred = np.asarray(jnp.argmax(logits, -1))[: batch_size - pad]
            lab = np.asarray(labels[start:start + batch_size])
            correct += int((pred == lab).sum())
            counted += lab.shape[0]
    features = np.concatenate(feats_out, 0)
    acc = correct / counted if counted else float("nan")
    return features, (None if labels is None else np.asarray(labels)), acc
