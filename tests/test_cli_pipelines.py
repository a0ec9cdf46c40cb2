"""Integration tests: the reference's full workflow as CLI pipelines
(train_efm -> extract_feacture_v2 -> pre-trained_efm_v3 -> draw_cos_dis_real,
SURVEY.md §1 data flow), on synthetic data, in-process."""

import json
import os

import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
    draw_cos,
    eval_cos,
    extract_features,
    lfw_eval,
    slice_dataset,
    train_backbone,
    train_final,
    train_head,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
    save_feature_store,
    synthetic_faces,
    synthetic_features,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
    save_image_store,
)


@pytest.fixture(scope="module")
def image_store(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    images, labels = synthetic_faces(num_ids=6, per_id=6, size=32, seed=0)
    p = str(d / "train.npz")
    save_image_store(p, images, labels)
    return p


def test_train_backbone_cli_end_to_end(image_store, tmp_path):
    out = str(tmp_path / "bb")
    state, history = train_backbone.main([
        "--images", image_store, "--model", "efmnet342",
        "--epochs", "2", "--batch-size", "12", "--out-dir", out,
        "--checkpoint-every", "1",
    ])
    assert len(history) == 2
    assert os.path.exists(os.path.join(out, "cosine_similarity.csv"))
    assert os.path.exists(os.path.join(out, "export", "manifest.json"))
    assert os.path.exists(os.path.join(out, "train_acc.jpg"))
    # resume continues from epoch 2
    state2, history2 = train_backbone.main([
        "--images", image_store, "--model", "efmnet342",
        "--epochs", "3", "--batch-size", "12", "--out-dir", out, "--resume",
    ])
    assert [h.epoch for h in history2] == [2]


def test_full_reference_workflow(image_store, tmp_path):
    """backbone train -> export -> extraction -> head train -> plots."""
    bb = str(tmp_path / "bb")
    train_backbone.main([
        "--images", image_store, "--model", "efmnet342", "--epochs", "1",
        "--batch-size", "12", "--out-dir", bb,
    ])
    ex = str(tmp_path / "ex")
    results = extract_features.main([
        "--train-images", image_store, "--export-dir",
        os.path.join(bb, "export"), "--num-classes", "6",
        "--out-dir", ex, "--batch-size", "16",
    ])
    feats, labels, acc = results["train"]
    assert feats.shape[1] == 342
    np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-4)
    # head training over the extracted features
    hd = str(tmp_path / "hd")
    state, history = train_head.main([
        "--features", os.path.join(ex, "train.npz"), "--epochs", "2",
        "--batch-size", "18", "--out-dir", hd,
    ])
    assert os.path.exists(os.path.join(hd, "cosine_similarity.csv"))
    out = draw_cos.main([
        "--csv", os.path.join(hd, "cosine_similarity.csv"),
        "--out", str(tmp_path / "cdf.jpg"), "--desire-epoch", "2",
    ])
    assert os.path.exists(out)


def test_train_final_cli(image_store, tmp_path):
    out = str(tmp_path / "fin")
    state, history = train_final.main([
        "--images", image_store, "--model", "efmnet342",
        "--num-classes", "6", "--epochs", "2", "--batch-size", "12",
        "--out-dir", out,
    ])
    assert len(history) == 2
    assert os.path.exists(os.path.join(out, "export", "weights.npz"))


def test_train_final_cli_ema_export(image_store, tmp_path):
    """--ema-decay: the exported head weights are the EMA average, not the
    raw trained params (same facenet.py:195-199 semantics as train_head)."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import (
        load_exported_params,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        get_ema_params,
    )

    out = str(tmp_path / "fin_ema")
    state, _ = train_final.main([
        "--images", image_store, "--model", "efmnet342",
        "--num-classes", "6", "--epochs", "2", "--batch-size", "12",
        "--ema-decay", "0.5", "--lr", "0.05", "--out-dir", out,
    ])  # lr >> reference default so the EMA lag is visible above rtol
    exported, _, _ = load_exported_params(os.path.join(out, "export"))
    ema = get_ema_params(state.opt_state)
    ex_w = jax.tree_util.tree_leaves(exported)[0]
    np.testing.assert_allclose(
        np.asarray(ex_w), np.asarray(jax.tree_util.tree_leaves(ema)[0]),
        rtol=1e-6)
    # EMA at decay 0.5 over a few steps must lag the raw params
    raw = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(ex_w), np.asarray(raw))


def test_eval_cos_and_slice_cli(tmp_path):
    feats, labels = synthetic_features(num_ids=10, per_id=6, dim=32, seed=2)
    store = str(tmp_path / "store.npz")
    save_feature_store(store, feats, labels)
    pos, neg = eval_cos.main([
        "--features", store, "--batch-size", "30",
        "--out-dir", str(tmp_path / "ec"),
    ])
    assert pos.mean() > neg.mean()  # clustered features separate
    slice_dataset.main([
        "--features", store, "--out-dir", str(tmp_path / "sl"),
    ])
    assert os.path.exists(str(tmp_path / "sl" / "train_img.csv"))


def test_lfw_eval_cli_with_images(tmp_path):
    # build interleaved pair images: same-id pairs vs different-id pairs
    images, labels = synthetic_faces(num_ids=8, per_id=4, size=32, seed=5)
    by_id = {i: np.where(labels == i)[0] for i in range(8)}
    rows, issame = [], []
    for i in range(8):
        a, b = by_id[i][:2]
        rows += [images[a], images[b]]
        issame.append(True)
        c = by_id[(i + 1) % 8][0]
        rows += [images[a], images[c]]
        issame.append(False)
    np.savez(str(tmp_path / "pairs.npz"), images=np.asarray(rows),
             issame=np.asarray(issame))
    result = lfw_eval.main([
        "--images", str(tmp_path / "pairs.npz"), "--model", "efmnet342",
        "--num-classes", "8", "--folds", "4", "--batch-size", "8",
        "--out", str(tmp_path / "lfw.json"),
    ])
    assert 0.0 <= result["accuracy_mean"] <= 1.0
    assert json.load(open(tmp_path / "lfw.json"))["n_pairs"] == 16


def test_pack_dataset_cli(tmp_path):
    import cv2

    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        pack_dataset,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        load_image_store,
    )

    src = tmp_path / "tree"
    rng = np.random.default_rng(0)
    for cls in ("alice", "bob", "carol"):
        (src / cls).mkdir(parents=True)
        for i in range(3):
            img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
            cv2.imwrite(str(src / cls / f"{i}.jpg"), img)
    out = str(tmp_path / "packed.npz")
    n, k = pack_dataset.main([str(src), out, "--image-size", "32",
                              "--train-frac", "0.67"])
    assert n == 9 and k == 3
    images, labels = load_image_store(out)
    assert images.shape == (9, 32, 32, 1) and images.dtype == np.uint8
    assert sorted(set(labels.tolist())) == [0, 1, 2]
    tr_i, tr_l = load_image_store(str(tmp_path / "packed_train.npz"))
    te_i, te_l = load_image_store(str(tmp_path / "packed_test.npz"))
    assert tr_i.shape[0] + te_i.shape[0] == 9
    assert set(tr_l) & set(te_l) == set()  # identity-disjoint
    assert json.load(open(tmp_path / "packed.classes.json"))["classes"] == [
        "alice", "bob", "carol"]


def test_cli_dispatcher_and_fx_launcher(tmp_path, capsys):
    """`python -m <pkg>.cli <name>` and the fx.py launcher route to the
    right entry points."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli.__main__ import (
        main as dispatch,
    )

    assert dispatch([]) == 2
    assert dispatch(["--help"]) == 0
    out = capsys.readouterr().out
    assert "train_backbone" in out and "landmarks68" in out

    # a real command end-to-end through the dispatcher
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
        save_feature_store,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
        synthetic_features,
    )

    feats, labels = synthetic_features(num_ids=4, per_id=4, dim=16)
    fpath = str(tmp_path / "f.npz")
    save_feature_store(fpath, feats, labels)
    res = dispatch(["slice_dataset", "--features", fpath,
                    "--out-dir", str(tmp_path / "s")])
    assert res is not None or (tmp_path / "s").exists()
