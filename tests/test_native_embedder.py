"""Native EFMNet342 forward over the export artifact (VERDICT round-1 item
6: a non-JAX consumer of serve/export.py; reference Feature.hpp:163-205 runs
the embedding net in-process via MXPredCreatePartialOut)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (  # noqa: E402
    EFMNet342,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (  # noqa: E402
    export_params,
)


def _native():
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")
    return native


@pytest.fixture(scope="module")
def export(tmp_path_factory):
    model = EFMNet342(num_classes=10)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    d = str(tmp_path_factory.mktemp("exp") / "export")
    export_params(d, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(64, 64), input_channels=1)
    return model, variables, d


def test_native_matches_jax_forward(export):
    native = _native()
    model, variables, d = export
    rng = np.random.default_rng(1)
    imgs = rng.random((3, 64, 64, 1)).astype(np.float32)
    _, want = model.apply(variables, imgs, train=False)
    with native.NativeEmbedder(d) as emb:
        assert emb.feature_dim == 342
        for i in range(3):
            got = emb.extract(imgs[i, :, :, 0])
            # rtol covers f32 reassociation (the AVX2 6x16 GEMM sums in a
            # different order than XLA)
            np.testing.assert_allclose(got, np.asarray(want[i]), rtol=5e-4,
                                       atol=2e-4)


def test_native_uint8_scale_contract(export):
    native = _native()
    model, variables, d = export
    rng = np.random.default_rng(2)
    u8 = (rng.random((64, 64)) * 255).astype(np.uint8)
    with native.NativeEmbedder(d) as emb:
        got = emb.extract(u8)
        want = emb.extract(u8.astype(np.float32) / 255.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_rejects_wrong_model(tmp_path):
    native = _native()
    import json
    import os

    d = str(tmp_path / "bad")
    os.makedirs(d)
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump({"model": "lightcnn29"}, f)
    with pytest.raises(native.NativeUnavailable):
        native.NativeEmbedder(d)


def test_native_end_to_end_identify(export, tmp_path):
    """The full native serving loop with the export as the only model
    artifact: embed crops natively, enroll in the native store, match a
    probe — one process, no JAX in the loop (item 6 'done' criterion)."""
    native = _native()
    _, _, d = export
    rng = np.random.default_rng(3)
    alice = rng.random((64, 64)).astype(np.float32)
    bob = rng.random((64, 64)).astype(np.float32)
    probe = np.clip(alice + 0.01 * rng.standard_normal((64, 64)), 0,
                    1).astype(np.float32)

    store_path = str(tmp_path / "db.fjdb")
    with native.NativeEmbedder(d) as emb:
        with native.NativeIdentityStore(store_path, emb.feature_dim) as st:
            st.register("alice", emb.extract(alice))
            st.register("bob", emb.extract(bob))
            name, sim = st.match(emb.extract(probe), 0.5)
    assert name == "alice" and sim > 0.9


@pytest.mark.parametrize("model_name,cls_kwargs,size,dim", [
    ("lightcnn9", {}, 32, 256),
    ("lightcnn29", {}, 32, 684),
])
def test_native_matches_jax_forward_other_models(model_name, cls_kwargs,
                                                 size, dim, tmp_path):
    """The native ladder covers every grayscale model family: LightCNN9
    (mfm2 ladder) and LightCNN29 (EFM groups + BatchNorm feature branch)."""
    native = _native()
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN29,
        LightCNN9,
    )

    cls = {"lightcnn9": LightCNN9, "lightcnn29": LightCNN29}[model_name]
    model = cls(num_classes=6, **cls_kwargs)
    rng = np.random.default_rng(3)
    x = rng.random((2, size, size, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # exercise non-trivial BN stats for lightcnn29 (init stats are 0/1)
    if model_name == "lightcnn29":
        bs = variables["batch_stats"]
        bs = jax.tree_util.tree_map(
            lambda v: v + 0.05 * np.arange(v.shape[-1], dtype=np.float32)
            if v.ndim else v, bs)
        variables = {"params": variables["params"], "batch_stats": bs}
    d = str(tmp_path / "exp")
    export_params(d, variables["params"], model_name=model_name,
                  feature_dim=dim, input_hw=(size, size), input_channels=1,
                  batch_stats=variables.get("batch_stats"))
    _, want = model.apply(variables, x, train=False)
    with native.NativeEmbedder(d) as emb:
        assert emb.feature_dim == dim and emb.model == model_name
        for i in range(2):
            got = emb.extract(x[i, :, :, 0])
            np.testing.assert_allclose(got, np.asarray(want[i]), rtol=5e-4,
                                       atol=2e-4)


def test_native_quantized_embeddings_track_f32(export):
    """int8 path (qgemm.hpp): per-channel saturation-safe int8 weights +
    dynamic u8 activations must reproduce the f32 embeddings to >=0.995
    cosine — on RANDOM weights, the hardest case (no trained redundancy
    to absorb quantization noise)."""
    native = _native()
    _, _, d = export
    rng = np.random.default_rng(7)
    imgs = rng.random((4, 64, 64)).astype(np.float32)
    with native.NativeEmbedder(d) as f32, \
            native.NativeEmbedder(d, quantized=True) as q:
        assert q.quantized and not f32.quantized
        for img in imgs:
            a, b = f32.extract(img), q.extract(img)
            cos = float(np.dot(a, b) /
                        (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos > 0.995, f"int8 drifted: cosine {cos}"


def test_native_quantized_identify_decisions_match(export, tmp_path):
    """Quantization must not flip identification decisions: enroll with
    f32, probe with int8 (mixed precision gallery/probe, the deployment
    case when old f32 enrollments meet a quantized embedder)."""
    native = _native()
    _, _, d = export
    rng = np.random.default_rng(8)
    alice = rng.random((64, 64)).astype(np.float32)
    bob = rng.random((64, 64)).astype(np.float32)
    probe = np.clip(alice + 0.01 * rng.standard_normal((64, 64)), 0,
                    1).astype(np.float32)
    store_path = str(tmp_path / "dbq.fjdb")
    with native.NativeEmbedder(d) as f32, \
            native.NativeEmbedder(d, quantized=True) as q, \
            native.NativeIdentityStore(store_path, f32.feature_dim) as st:
        st.register("alice", f32.extract(alice))
        st.register("bob", f32.extract(bob))
        name, sim = st.match(q.extract(probe), 0.5)
    assert name == "alice" and sim > 0.9
