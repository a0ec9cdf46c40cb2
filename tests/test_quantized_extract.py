"""Int8 TPU extraction path (ops/quantized.py): post-training per-channel
weight quantization + dynamic activation quantization must track the f32
forward. Runs on the CPU backend (same XLA int8 conv semantics)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (  # noqa: E402
    LightCNN9,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.quantized import (  # noqa: E402
    make_int8_lightcnn9_extract,
    quantize_lightcnn9_params,
)


@pytest.fixture(scope="module")
def trained():
    model = LightCNN9(num_classes=10)
    rng = np.random.default_rng(0)
    x = rng.random((4, 64, 64, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_int8_extract_tracks_f32(trained):
    model, variables, x = trained
    _, want = model.apply(variables, x, train=False)
    want = np.asarray(want, np.float32)
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    fn = make_int8_lightcnn9_extract(
        quantize_lightcnn9_params(variables["params"]),
        compute_dtype=jnp.float32)
    got = np.asarray(fn(x))
    np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, atol=1e-5)
    cos = (got * want).sum(axis=1)
    assert cos.min() > 0.999, f"int8 drifted: {cos}"


def test_int8_weights_are_int8_and_roundtrip(trained):
    _, variables, _ = trained
    q = quantize_lightcnn9_params(variables["params"])
    w8 = q["conv2"]["w8"]
    assert w8.dtype == jnp.int8
    # dequantized weights track the originals within half a step/channel
    w = np.asarray(variables["params"]["conv2"]["kernel"], np.float32)
    deq = np.asarray(w8, np.float32) * np.asarray(q["conv2"]["scale"])
    assert np.max(np.abs(deq - w) / np.asarray(q["conv2"]["scale"])) <= 0.5
    # stem and fc1 pass through unquantized
    assert q["conv1"]["kernel"].dtype == jnp.float32
    assert q["fc1"]["kernel"].dtype == jnp.float32


def test_int8_extract_decision_consistency(trained):
    """Nearest-neighbor decisions over a small gallery are unchanged by
    quantization (the property serving actually relies on)."""
    model, variables, _ = trained
    rng = np.random.default_rng(3)
    base = rng.random((5, 64, 64, 1)).astype(np.float32)
    probes = np.clip(base + 0.02 * rng.standard_normal(base.shape),
                     0, 1).astype(np.float32)

    def embed_f32(imgs):
        _, f = model.apply(variables, imgs, train=False)
        f = np.asarray(f, np.float32)
        return f / np.linalg.norm(f, axis=1, keepdims=True)

    fn = make_int8_lightcnn9_extract(
        quantize_lightcnn9_params(variables["params"]),
        compute_dtype=jnp.float32)
    gal = embed_f32(base)
    got = np.asarray(fn(probes))
    assert (np.argmax(got @ gal.T, axis=1) == np.arange(5)).all()
