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
