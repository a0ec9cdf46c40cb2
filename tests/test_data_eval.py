"""Data pipeline + cosine-distribution eval tests (C5, C9, C10, C12)."""

import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
    PairBatcher,
    build_positive_index,
    load_feature_store,
    read_feature_csv,
    read_labels_csv,
    save_feature_store,
    split_identities,
    synthetic_faces,
    synthetic_features,
    write_feature_csv,
    write_labels_csv,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.data.feature_store import (
    export_split_csvs,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.eval.cosine import (
    CosineSimilaritySink,
    pdf_cdf,
    read_similarity_csv,
    separation_score,
)


def test_build_positive_index_first_seen():
    labels = np.asarray([3, 1, 3, 0, 1])
    idx = build_positive_index(labels)
    assert idx[3] == 0 and idx[1] == 1 and idx[0] == 3
    # define_pos keeps the FIRST image per id (train_efm.py:42-43)


def test_pair_batcher_pairs_same_identity():
    feats, labels = synthetic_features(num_ids=8, per_id=4, dim=6)
    pb = PairBatcher(feats, labels, batch_size=8, shuffle=True, seed=1)
    pos_index = pb.positive_index
    n_batches = 0
    for anchor, positive, lab in pb:
        n_batches += 1
        assert anchor.shape == (8, 6) and positive.shape == (8, 6)
        # positive row is the canonical first-seen image of the same identity
        np.testing.assert_array_equal(positive, feats[pos_index[lab]])
    assert n_batches == len(pb) == 4


def test_pair_batcher_epochs_reshuffle():
    feats, labels = synthetic_features(num_ids=4, per_id=4, dim=3)
    pb = PairBatcher(feats, labels, batch_size=4, shuffle=True, seed=0)
    e1 = [lab.tolist() for _, _, lab in pb]
    e2 = [lab.tolist() for _, _, lab in pb]
    assert e1 != e2  # new permutation per epoch


def test_feature_csv_roundtrip(tmp_path):
    feats, labels = synthetic_features(num_ids=3, per_id=2, dim=5)
    fp, lp = str(tmp_path / "f.csv"), str(tmp_path / "l.csv")
    write_feature_csv(fp, feats)
    write_labels_csv(lp, labels)
    rf = read_feature_csv(fp)
    rl = read_labels_csv(lp)
    np.testing.assert_allclose(rf, feats, rtol=1e-6)
    np.testing.assert_allclose(rl, labels.astype(np.float32))
    # reference format: trailing comma per row (extract_feacture_v2.py:70-73)
    first = open(fp).readline().rstrip("\n")
    assert first.endswith(",")


def test_feature_store_roundtrip(tmp_path):
    feats, labels = synthetic_features(num_ids=3, per_id=2, dim=5)
    p = str(tmp_path / "store.npz")
    save_feature_store(p, feats, labels)
    f2, l2 = load_feature_store(p)
    np.testing.assert_allclose(f2, feats)
    np.testing.assert_array_equal(l2, labels)


def test_split_identities_is_by_identity():
    labels = np.asarray([0, 0, 1, 1, 2, 2, 3, 3, 4, 4])
    train, test = split_identities(labels, train_frac=0.6)
    # identities are never split across the masks
    for ident in range(5):
        rows = labels == ident
        assert train[rows].all() or test[rows].all()
    assert train.sum() == 6 and test.sum() == 4  # 3 of 5 ids -> train


def test_export_split_csvs(tmp_path):
    feats, labels = synthetic_features(num_ids=10, per_id=3, dim=4)
    export_split_csvs(str(tmp_path), feats, labels, train_frac=0.7)
    tr = read_feature_csv(str(tmp_path / "train_img.csv"))
    te = read_feature_csv(str(tmp_path / "test_img.csv"))
    assert tr.shape[0] + te.shape[0] == feats.shape[0]
    assert tr.shape[1] == 4


def test_cosine_sink_format_and_reader(tmp_path):
    p = str(tmp_path / "cosine_similarity.csv")
    with CosineSimilaritySink(p, flush_every_rows=4) as sink:
        sink.append([0.9, 0.8], [0.1, 0.2])
        sink.append([0.7], [0.3])
    pos, neg = read_similarity_csv(p)
    # reference slice skips the FIRST row at desire_epoch=1 (the i > 0
    # off-by-one of draw_cos_dis_real.py:17, kept for exact parity)
    np.testing.assert_allclose(pos, [0.8, 0.7])
    np.testing.assert_allclose(neg, [0.2, 0.3])
    # reference format: space-delimited pairs (train_efm.py:252-255)
    assert " " in open(p).readline()


def test_read_similarity_last_epoch_slice(tmp_path):
    p = str(tmp_path / "c.csv")
    with CosineSimilaritySink(p) as sink:
        sink.append(np.arange(100, dtype=float) / 100, np.zeros(100))
    pos, neg = read_similarity_csv(p, desire_epoch=5)
    # keeps rows with index > len - len/5 (draw_cos_dis_real.py:16-21)
    assert len(pos) == 19
    assert pos[0] > 0.8


def test_pdf_cdf_shapes_and_mass():
    rng = np.random.default_rng(0)
    pos = rng.normal(0.7, 0.1, 1000)
    neg = rng.normal(0.0, 0.1, 1000)
    ppdf, npdf, pcdf, ninv, pb, nb = pdf_cdf(pos, neg)
    assert ppdf.shape == (100,) and pb.shape == (101,)
    np.testing.assert_allclose(ppdf.sum(), 1.0)
    np.testing.assert_allclose(pcdf[-1], 1.0)
    np.testing.assert_allclose(ninv[-1], 0.0, atol=1e-12)


def test_separation_score():
    assert separation_score([0.9, 0.8], [0.1, 0.2]) == 1.0
    assert separation_score([0.1], [0.9]) == 0.0
    s = separation_score(np.linspace(0, 1, 100), np.linspace(0, 1, 100))
    assert 0.45 < s < 0.55


def test_plots_smoke(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.eval.plots import (
        draw_curve,
        draw_similarity_figures,
    )

    rng = np.random.default_rng(1)
    out = draw_similarity_figures(
        rng.normal(0.7, 0.1, 500), rng.normal(0, 0.1, 500),
        str(tmp_path / "cdf.jpg"))
    assert (tmp_path / "cdf.jpg").exists()
    draw_curve({"training": [1, 2, 3], "testing": [2, 3, 4]}, "accuracy",
               str(tmp_path / "acc.jpg"))
    assert (tmp_path / "acc.jpg").exists()


def test_synthetic_faces_shapes():
    imgs, labels = synthetic_faces(num_ids=4, per_id=3, size=32)
    assert imgs.shape == (12, 32, 32, 1)
    assert imgs.min() >= 0 and imgs.max() <= 1
    assert set(labels.tolist()) == {0, 1, 2, 3}
