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


# ------------------------------------------------- generic interceptor path


@pytest.mark.parametrize("model_name", ["efmnet342", "lightcnn29"])
def test_generic_int8_tracks_f32(model_name):
    """make_int8_extract (the interceptor-based quantizer, VERDICT r2
    item 6) reroutes every eligible conv of the SERVING nets through int8
    with embedding cosine >= 0.999 vs the f32 forward."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
        LightCNN29,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.quantized import (
        make_int8_extract,
    )

    model = (EFMNet342(num_classes=6) if model_name == "efmnet342"
             else LightCNN29(num_classes=6))
    rng = np.random.default_rng(1)
    x = rng.random((3, 32, 32, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, want = model.apply(variables, x, train=False)
    want = np.asarray(want, np.float32)
    want = want / np.linalg.norm(want, axis=1, keepdims=True)
    got = np.asarray(make_int8_extract(model, variables,
                                       compute_dtype=jnp.float32)(x))
    cos = (got * want).sum(axis=1)
    assert cos.min() > 0.999, f"{model_name} int8 drifted: {cos}"


def test_generic_int8_matches_hardcoded_lightcnn9(trained):
    """The interceptor path and the hand-written LightCNN9 ladder agree
    (same eligibility split, same quantization scheme)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.quantized import (
        make_int8_extract,
    )

    model, variables, x = trained
    ladder = np.asarray(make_int8_lightcnn9_extract(
        quantize_lightcnn9_params(variables["params"]),
        compute_dtype=jnp.float32)(x))
    generic = np.asarray(make_int8_extract(model, variables,
                                           compute_dtype=jnp.float32)(x))
    cos = (ladder * generic).sum(axis=1)
    # not bit-identical (the ladder runs the FUSED stem and host-side
    # weight rounding) but both quantized paths agree to the same 0.999
    # tolerance each holds against f32
    assert cos.min() > 0.999, cos


def test_pipeline_int8_embed_decisions_unchanged():
    """The fused pipeline with int8_embed=True returns the same gallery
    index as the full-precision pipeline (nearest-neighbor decisions
    pinned, the serving property)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.pipeline import (
        MTCNNDetector,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
        make_recognition_pipeline,
    )

    rng = np.random.default_rng(2)
    model = EFMNet342(num_classes=6)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    detector = MTCNNDetector()
    frame = rng.uniform(0, 255, (72, 96, 3)).astype(np.float32)
    gallery = rng.normal(size=(32, 342)).astype(np.float32)
    kw = dict(frame_h=72, frame_w=96, embed_size=32,
              thresholds=(0.45, 0.35, 0.3), sim_threshold=-1.0)
    ref = make_recognition_pipeline(detector, model, {"params":
                                    variables["params"]}, gallery, **kw)
    q = make_recognition_pipeline(detector, model, {"params":
                                  variables["params"]}, gallery,
                                  int8_embed=True, **kw)
    out_ref = {k: np.asarray(v) for k, v in ref(frame).items()}
    out_q = {k: np.asarray(v) for k, v in q(frame).items()}
    if not bool(out_ref["found"]):
        pytest.skip("random-weight cascade found no face on this frame")
    assert bool(out_q["found"])
    assert int(out_q["index"]) == int(out_ref["index"])
    np.testing.assert_allclose(out_q["similarity"], out_ref["similarity"],
                               atol=5e-3)


def test_extract_features_cli_int8(tmp_path):
    """`extract_features --int8`: the bulk extraction CLI runs the generic
    int8 conv path end-to-end; embeddings stay cosine-aligned with the
    default path and the CSV/npz sinks are written."""
    import os

    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        extract_features as xf,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        load_feature_store,
    )

    base = xf.main(["--synthetic", "--model", "lightcnn9",
                    "--num-classes", "8", "--batch-size", "16",
                    "--out-dir", str(tmp_path / "f32")])
    q = xf.main(["--synthetic", "--model", "lightcnn9",
                 "--num-classes", "8", "--batch-size", "16", "--int8",
                 "--out-dir", str(tmp_path / "int8")])
    f_b, l_b, _ = base["train"]
    f_q, l_q, _ = q["train"]
    np.testing.assert_array_equal(l_b, l_q)
    cos = np.sum(f_b * f_q, axis=1)  # rows are L2-normalized
    assert cos.min() > 0.99, f"int8 embeddings diverged: min cos {cos.min()}"
    stored, _ = load_feature_store(str(tmp_path / "int8" / "train.npz"))
    np.testing.assert_allclose(stored, f_q, atol=1e-6)
    assert os.path.exists(str(tmp_path / "int8" / "feature_vector_train.csv"))
