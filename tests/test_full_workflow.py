"""The COMPLETE reference workflow as one chain (SURVEY.md §1 data flow):
image tree -> streaming mmap pack -> joint backbone training (scan-chunked)
-> feature extraction from the mmap store -> identity slicing -> triplet
head training -> no-training cosine eval -> distribution plot -> native
enrollment + identification. Every arrow is the real CLI."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (  # noqa: E402
    synthetic_faces,
)


def test_reference_workflow_end_to_end(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        draw_cos,
        eval_cos,
        extract_features,
        identify,
        pack_dataset,
        slice_dataset,
        train_backbone,
        train_head,
    )

    # 0. a raw folder-of-identities image tree (what alignment would emit)
    imgs, labels = synthetic_faces(num_ids=6, per_id=8, size=24, seed=0)
    tree = str(tmp_path / "aligned")
    counters = {}
    for img, lab in zip(imgs, labels):
        d = os.path.join(tree, f"id{int(lab):03d}")
        os.makedirs(d, exist_ok=True)
        counters[int(lab)] = counters.get(int(lab), 0) + 1
        cv2.imwrite(os.path.join(d, f"{counters[int(lab)]}.png"),
                    (img[..., 0] * 255).astype(np.uint8))

    # 1. streaming pack into an mmap store (was: im2rec)
    store = str(tmp_path / "store")
    pack_dataset.main([tree, store, "--image-size", "16", "--mmap"])

    # 2. joint softmax+triplet backbone training from the mmap store
    run = str(tmp_path / "bb")
    state, history = train_backbone.main([
        "--images", store, "--model", "lightcnn9", "--epochs", "2",
        "--batch-size", "8", "--scan-chunk", "3", "--out-dir", run])
    assert np.isfinite(history[-1].train["loss"])

    # 3. feature extraction with the export, streaming from the mmap store
    ex = str(tmp_path / "ex")
    results = extract_features.main([
        "--train-images", store, "--model", "lightcnn9",
        "--num-classes", "6", "--export-dir", run + "/export",
        "--out-dir", ex, "--batch-size", "16"])
    feats, labs, _ = results["train"]
    assert feats.shape == (48, 256)
    # the reference CSV quartet exists alongside the canonical store
    assert os.path.exists(os.path.join(ex, "feature_vector_train.csv"))

    # 4. identity 0.7/0.3 slicing (was: slice_celeb1m)
    sl = str(tmp_path / "slices")
    slice_dataset.main(["--features", ex + "/train.npz", "--out-dir", sl])
    assert os.path.exists(os.path.join(sl, "train.npz"))

    # 5. triplet head training on the sliced features
    head = str(tmp_path / "head")
    train_head.main(["--features", sl + "/train.npz", "--epochs", "2",
                     "--batch-size", "16", "--out-dir", head])
    assert os.path.exists(os.path.join(head, "cosine_similarity.csv"))

    # 6. no-training cosine measurement + 7. distribution plot
    ec = str(tmp_path / "ec")
    eval_cos.main(["--features", sl + "/test.npz", "--out-dir", ec,
                   "--batch-size", "16"])
    jpg = str(tmp_path / "cdf.jpg")
    draw_cos.main(["--csv", os.path.join(ec, "cosine_similarity.csv"),
                   "--out", jpg])
    assert os.path.exists(jpg)

    # 8. native enrollment + identification on the extracted features
    db = str(tmp_path / "db.fjdb")
    try:
        identify.main(["enroll", "--store", db, "--features",
                       ex + "/train.npz"])
        matches = identify.main(["match", "--store", db, "--features",
                                 ex + "/train.npz", "--sim-th", "0.5"])
    except Exception as e:  # native toolchain missing: the chain above stands
        pytest.skip(f"native layer unavailable: {e}")
    assert all(m["name"] is not None for m in matches)
