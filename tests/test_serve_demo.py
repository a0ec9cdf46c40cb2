"""serve_demo CLI in-process: the full live-recognition loop (SURVEY §3.4)
with a real (random-init) model, producer thread, and native store."""

from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
    serve_demo,
)


def test_serve_demo_identifies_frames(tmp_path):
    correct, seen = serve_demo.main([
        "--image-size", "32", "--identities", "3", "--frames", "10",
        "--store", str(tmp_path / "demo.fjdb"),
    ])
    assert seen >= 1
    # synthetic identities are trivially separable even for a random CNN
    assert correct == seen


def test_serve_demo_native_loop(tmp_path):
    """--native: the whole loop (queue -> state machine -> embed -> match ->
    store) runs with the C++ forward — the reference's single-process
    runtime shape (Feature.hpp:163-205)."""
    import numpy as np
    import pytest

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve import (
        native,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        export_params,
    )

    try:
        native.load_native()
    except native.NativeUnavailable as e:
        pytest.skip(f"native unavailable: {e}")

    import jax

    model = EFMNet342(num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    export_dir = str(tmp_path / "export")
    export_params(export_dir, variables["params"], model_name="efmnet342",
                  feature_dim=342, input_hw=(32, 32), input_channels=1)

    correct, seen = serve_demo.main([
        "--image-size", "32", "--identities", "3", "--frames", "10",
        "--export-dir", export_dir, "--native",
        "--store", str(tmp_path / "demo_native.fjdb"),
    ])
    assert seen >= 1
    assert correct == seen


def test_serve_demo_streams_mode(tmp_path):
    """--streams: the multi-camera throughput mode runs the vmapped fused
    pipeline on N frames per dispatch and reports per-stream results."""
    found, streams = serve_demo.main([
        "--streams", "2", "--frames", "4", "--frame-size", "48", "48",
        "--image-size", "32", "--det-thresholds", "0.05", "0.05", "0.05",
        "--store", str(tmp_path / "demo.fjdb"),
    ])
    assert streams == 2
    assert 0 <= found <= 2


def test_serve_demo_streams_dynamic_gallery(tmp_path):
    """--streams --dynamic-gallery: throughput mode with the gallery as a
    runtime argument served from a DeviceGallery (bf16 storage to cover
    the --gallery-dtype plumbing too)."""
    found, streams = serve_demo.main([
        "--streams", "2", "--frames", "4", "--frame-size", "48", "48",
        "--image-size", "32", "--det-thresholds", "0.05", "0.05", "0.05",
        "--dynamic-gallery", "--gallery-dtype", "bf16",
        "--store", str(tmp_path / "demo_dg.fjdb"),
    ])
    assert streams == 2
    assert 0 <= found <= 2
