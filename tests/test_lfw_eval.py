"""LFW protocol tests: our K-fold + ROC/VAL vs sklearn-based oracles
mirroring facenet.py:428-520 (SURVEY.md §4)."""

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.eval import lfw


def _synthetic_pairs(n=600, dim=32, sep=2.0, seed=0):
    rng = np.random.default_rng(seed)
    issame = rng.random(n) < 0.5
    e1 = rng.normal(size=(n, dim))
    e2 = np.where(issame[:, None],
                  e1 + 0.3 * rng.normal(size=(n, dim)),
                  e1 + sep + rng.normal(size=(n, dim)))
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 /= np.linalg.norm(e2, axis=1, keepdims=True)
    return e1, e2, issame


def test_kfold_matches_sklearn():
    from sklearn.model_selection import KFold

    n, k = 103, 10
    ours = list(lfw.kfold_indices(n, k))
    theirs = list(KFold(n_splits=k, shuffle=False).split(np.arange(n)))
    for (tr_a, te_a), (tr_b, te_b) in zip(ours, theirs):
        np.testing.assert_array_equal(tr_a, tr_b)
        np.testing.assert_array_equal(te_a, te_b)


def test_distance_metrics_match_reference_formulas():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(10, 8))
    b = rng.normal(size=(10, 8))
    d0 = lfw.distance(a, b, 0)
    np.testing.assert_allclose(d0, ((a - b) ** 2).sum(1))
    d1 = lfw.distance(a, b, 1)
    cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
    np.testing.assert_allclose(d1, np.arccos(cos) / np.pi, rtol=1e-6)


def test_calculate_accuracy_counts():
    dist = np.asarray([0.1, 0.9, 0.2, 0.8])
    issame = np.asarray([True, True, False, False])
    tpr, fpr, acc = lfw.calculate_accuracy(0.5, dist, issame)
    assert tpr == 0.5   # 1 of 2 positives below threshold
    assert fpr == 0.5   # 1 of 2 negatives below threshold
    assert acc == 0.5


def test_roc_separable_embeddings_near_perfect():
    e1, e2, issame = _synthetic_pairs(sep=3.0)
    tpr, fpr, accuracy = lfw.calculate_roc(
        np.arange(0, 4, 0.01), e1, e2, issame)
    assert accuracy.shape == (10,)
    assert accuracy.mean() > 0.95


def test_roc_random_embeddings_chance():
    rng = np.random.default_rng(2)
    e1 = rng.normal(size=(600, 16))
    e2 = rng.normal(size=(600, 16))
    issame = rng.random(600) < 0.5
    _, _, accuracy = lfw.calculate_roc(np.arange(0, 4, 0.01) * 16, e1, e2,
                                       issame)
    assert 0.4 < accuracy.mean() < 0.62


def test_val_far_semantics():
    dist = np.asarray([0.1, 0.2, 0.3, 0.9])
    issame = np.asarray([True, True, False, False])
    val, far = lfw.calculate_val_far(0.25, dist, issame)
    assert val == 1.0   # both positives accepted
    assert far == 0.0   # no negatives accepted


def test_calculate_val_reaches_target():
    e1, e2, issame = _synthetic_pairs(sep=2.0, n=1000)
    val, val_std, far = lfw.calculate_val(
        np.arange(0, 4, 0.001), e1, e2, issame, far_target=0.1)
    # achieved FAR should be near the target when attainable
    assert 0.02 < far < 0.25
    assert val > 0.5


def test_evaluate_end_to_end():
    e1, e2, issame = _synthetic_pairs()
    tpr, fpr, acc, acc_std, val, val_std, far = lfw.evaluate(e1, e2, issame)
    assert 0.9 < acc <= 1.0
    assert len(tpr) == len(fpr)


def test_evaluate_subtract_mean_runs():
    e1, e2, issame = _synthetic_pairs(n=200)
    *_, far = lfw.evaluate(e1, e2, issame, subtract_mean=True)
    assert np.isfinite(far)


def test_pairs_file_parsing(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.lfw import (
        get_paths,
        read_pairs,
    )

    lfw_dir = tmp_path / "lfw"
    for name, k in (("Alice_A", 2), ("Bob_B", 1)):
        d = lfw_dir / name
        d.mkdir(parents=True)
        for i in range(1, k + 1):
            (d / f"{name}_{i:04d}.jpg").write_bytes(b"x")
    pairs_txt = tmp_path / "pairs.txt"
    pairs_txt.write_text(
        "10 300\n"
        "Alice_A 1 2\n"
        "Alice_A 1 Bob_B 1\n"
        "Alice_A 1 9\n"  # missing file -> skipped
    )
    pairs = read_pairs(str(pairs_txt))
    paths, issame = get_paths(str(lfw_dir), pairs)
    assert len(paths) == 4
    np.testing.assert_array_equal(issame, [True, False])


def test_calculate_val_warns_on_unreachable_far():
    """When FAR never reaches the target on the train split, the reference
    silently falls back to threshold 0.0 (facenet.py:501) forcing VAL=0; we
    keep the arithmetic but emit a warning so tiny galleries don't read as
    model failures (VERDICT r2 item 9)."""
    # perfectly separated pairs: with thresholds below the negative
    # distances, FAR stays 0 < target on every fold
    e1, e2, issame = _synthetic_pairs(n=60, sep=50.0)
    thresholds = np.arange(0, 0.5, 0.01)
    with pytest.warns(UserWarning, match="FAR never reached"):
        val, _, _ = lfw.calculate_val(
            thresholds, e1, e2, issame, far_target=1e-3, nrof_folds=3)
    assert val == 0.0
