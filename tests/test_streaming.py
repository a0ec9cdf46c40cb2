"""Celeb1M-scale streaming data layer: ImageStoreWriter, sharded pair
batching, streaming pack, and the 8-device sharded-loader train path
(reference RecordIO flow, train_efm.py:135-136, 179)."""

import os
import tracemalloc

import jax
import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.data import (
    records as R,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.data.pairs import (
    build_positive_index,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.data.streaming import (
    ShardedPairBatcher,
    shard_bounds,
)


def _rand_store(tmp_path, n=64, size=8, n_ids=7, seed=0, name="mm"):
    rng = np.random.default_rng(seed)
    imgs = (rng.random((n, size, size, 1)) * 255).astype(np.uint8)
    labels = rng.integers(0, n_ids, n).astype(np.int64)
    d = str(tmp_path / name)
    R.save_image_store_mmap(d, imgs, labels)
    return d, imgs, labels


# ---------------------------------------------------------------- writer

def test_writer_roundtrip_matches_bulk(tmp_path):
    rng = np.random.default_rng(0)
    imgs = (rng.random((37, 6, 6, 1)) * 255).astype(np.uint8)
    labels = rng.integers(0, 5, 37)
    d = str(tmp_path / "w")
    with R.ImageStoreWriter(d, (6, 6, 1)) as w:
        for start in range(0, 37, 10):  # uneven chunks incl. final partial
            w.append(imgs[start:start + 10], labels[start:start + 10])
    i2, l2 = R.load_image_store_mmap(d)
    assert isinstance(i2, np.memmap)
    np.testing.assert_array_equal(np.asarray(i2), imgs)
    np.testing.assert_array_equal(l2, labels)


def test_writer_single_image_and_float_quantize(tmp_path):
    d = str(tmp_path / "w1")
    with R.ImageStoreWriter(d, (4, 4, 1)) as w:
        w.append(np.full((4, 4, 1), 0.5, np.float32), 3)
    i2, l2 = R.load_image_store_mmap(d)
    assert i2.shape == (1, 4, 4, 1)
    assert int(i2[0, 0, 0, 0]) in (127, 128)
    assert l2.tolist() == [3]


def test_writer_shape_mismatch_raises(tmp_path):
    with R.ImageStoreWriter(str(tmp_path / "w2"), (4, 4, 1)) as w:
        with pytest.raises(ValueError):
            w.append(np.zeros((1, 5, 4, 1), np.uint8), [0])


def test_writer_million_rows_flat_ram(tmp_path):
    """1M tiny images stream through the writer with O(chunk) Python-heap
    growth (VERDICT round-1 item 1: constant-RAM packer at Celeb1M row
    counts). 1M x 12x12 = 144 MB on disk; traced allocations must stay far
    below that."""
    n, chunk, side = 1_000_000, 10_000, 12
    d = str(tmp_path / "big")
    rng = np.random.default_rng(0)
    template = (rng.random((chunk, side, side, 1)) * 255).astype(np.uint8)
    labels = np.arange(chunk, dtype=np.int64)
    tracemalloc.start()
    with R.ImageStoreWriter(d, (side, side, 1)) as w:
        for _ in range(n // chunk):
            w.append(template, labels)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert w.count == n
    # labels accumulate (8 MB at 1M rows); images must not
    assert peak < 64 * 1024 * 1024, f"peak traced alloc {peak/1e6:.1f} MB"
    imgs, labs = R.load_image_store_mmap(d)
    assert imgs.shape == (n, side, side, 1)
    assert labs.shape == (n,)
    np.testing.assert_array_equal(np.asarray(imgs[:chunk]), template)
    np.testing.assert_array_equal(np.asarray(imgs[-chunk:]), template)


# --------------------------------------------------------- positive index

def test_build_positive_index_first_occurrence():
    labels = np.array([5, 2, 5, 0, 2, 2, 7])
    idx = build_positive_index(labels)
    assert idx[5] == 0 and idx[2] == 1 and idx[0] == 3 and idx[7] == 6
    assert idx[1] == -1 and idx[3] == -1  # absent labels

def test_build_positive_index_matches_loop_reference():
    rng = np.random.default_rng(3)
    labels = rng.integers(0, 50, 500)
    idx = build_positive_index(labels)
    ref = np.full(int(labels.max()) + 1, -1, np.int64)
    for i in range(labels.shape[0] - 1, -1, -1):
        ref[labels[i]] = i
    np.testing.assert_array_equal(idx, ref)


# ------------------------------------------------------------- sharding

def test_shard_bounds_partition():
    n, k = 103, 8
    spans = [shard_bounds(n, i, k) for i in range(k)]
    assert spans[0][0] == 0 and spans[-1][1] == n
    sizes = [b - a for a, b in spans]
    assert sum(sizes) == n and max(sizes) - min(sizes) <= 1
    for (a0, b0), (a1, b1) in zip(spans, spans[1:]):
        assert b0 == a1  # contiguous, disjoint


def test_sharded_batcher_pairs_and_coverage(tmp_path):
    d, imgs, labels = _rand_store(tmp_path, n=64, n_ids=7)
    pos_index = build_positive_index(labels)
    seen = set()
    for host in range(4):
        b = ShardedPairBatcher(d, 4, host_id=host, num_hosts=4, seed=host)
        rows = []
        for anc, pos, lab in b:
            assert anc.dtype == np.uint8 and pos.dtype == np.uint8
            for j in range(lab.shape[0]):
                # positive is the canonical first-seen row of the label
                np.testing.assert_array_equal(pos[j],
                                              imgs[pos_index[lab[j]]])
                # anchor is a real row with that label
                cand = np.nonzero(labels == lab[j])[0]
                assert any(np.array_equal(anc[j], imgs[c]) for c in cand)
            rows.append(lab)
        start, stop = shard_bounds(64, host, 4)
        assert len(b) == (stop - start) // 4
        seen.update(range(start, stop))
    assert seen == set(range(64))


def test_sharded_batcher_windowed_shuffle_covers_shard(tmp_path):
    d, imgs, labels = _rand_store(tmp_path, n=60, n_ids=60, seed=5, name="w")
    # n_ids=n → every label unique → anchors identify rows exactly
    b = ShardedPairBatcher(d, 5, shuffle=True, shuffle_window=16, seed=1)
    got = sorted(int(l) for _, _, lab in b for l in lab)
    assert got == sorted(labels.tolist())  # full epoch coverage, no dupes


def test_sharded_batcher_deterministic_by_seed(tmp_path):
    d, *_ = _rand_store(tmp_path, n=32, name="det")
    a = [lab.tolist() for _, _, lab in
         ShardedPairBatcher(d, 4, seed=9, shuffle_window=8)]
    b = [lab.tolist() for _, _, lab in
         ShardedPairBatcher(d, 4, seed=9, shuffle_window=8)]
    assert a == b


# ------------------------------------------------------ streaming pack CLI

def _write_image_tree(root, n_ids=4, per_id=5, size=10):
    import cv2

    rng = np.random.default_rng(0)
    for i in range(n_ids):
        cdir = os.path.join(root, f"id{i:03d}")
        os.makedirs(cdir)
        for j in range(per_id):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(cdir, f"{j}.png"), img)


def test_pack_dataset_streaming_matches_bulk(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        pack_dataset,
    )

    tree = str(tmp_path / "tree")
    os.makedirs(tree)
    _write_image_tree(tree)
    out_npz = str(tmp_path / "small.npz")
    pack_dataset.main([tree, out_npz, "--image-size", "8"])
    bulk_imgs, bulk_labels = R.load_image_store(out_npz)

    out_mm = str(tmp_path / "big")
    pack_dataset.main([tree, out_mm, "--image-size", "8", "--mmap",
                       "--workers", "3", "--train-frac", "0.5"])
    mm_imgs, mm_labels = R.load_image_store_mmap(out_mm)
    np.testing.assert_array_equal(np.asarray(mm_imgs), bulk_imgs)
    np.testing.assert_array_equal(mm_labels, bulk_labels)

    tr_i, tr_l = R.load_image_store_mmap(out_mm + "_train")
    te_i, te_l = R.load_image_store_mmap(out_mm + "_test")
    assert set(tr_l.tolist()) == {0, 1} and set(te_l.tolist()) == {2, 3}
    assert tr_i.shape[0] + te_i.shape[0] == bulk_imgs.shape[0]
    import json

    with open(os.path.join(out_mm, "classes.json")) as f:
        assert f and json.load(f)["classes"] == [f"id{i:03d}" for i in range(4)]


def test_train_backbone_cli_from_mmap_store(tmp_path):
    """`fx train_backbone --images <mmap dir>` trains end-to-end with the
    streaming loader (uint8 device-normalized batches)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
        synthetic_faces,
    )

    imgs, labels = synthetic_faces(num_ids=4, per_id=6, size=16, seed=0)
    d = str(tmp_path / "store")
    R.save_image_store_mmap(d, (imgs * 255).astype(np.uint8), labels)
    out = str(tmp_path / "run")
    state, history = train_backbone.main(
        ["--images", d, "--model", "lightcnn9", "--out-dir", out,
         "--epochs", "1", "--batch-size", "8", "--shuffle-window", "8"])
    assert len(history) == 1
    assert np.isfinite(history[0].train["loss"])


# -------------------------------------- 8-device sharded loader end-to-end

def test_sharded_loader_feeds_8dev_train_step(tmp_path):
    """8 per-host shard batchers assemble the global batch for the shard_map
    DP step; one step runs with finite loss and uint8 inputs normalize on
    device (VERDICT item 1 'done' criterion)."""
    import optax

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
        make_mesh,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        create_train_state,
        make_backbone_train_step,
        shard_map_step,
    )

    n_hosts = 8
    d, imgs, labels = _rand_store(tmp_path, n=128, size=16, n_ids=10,
                                  name="dp")
    per_host = 2
    batchers = [
        ShardedPairBatcher(d, per_host, host_id=h, num_hosts=n_hosts, seed=0)
        for h in range(n_hosts)
    ]
    parts = [next(iter(b)) for b in batchers]
    anc = np.concatenate([p[0] for p in parts])
    pos = np.concatenate([p[1] for p in parts])
    lab = np.concatenate([p[2] for p in parts])
    assert anc.dtype == np.uint8 and anc.shape[0] == n_hosts * per_host

    model = LightCNN9(num_classes=10)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               anc[:1].astype(np.float32) / 255.0)
    step = shard_map_step(
        make_backbone_train_step(model, tx, axis_name="data"),
        make_mesh(), has_state_out=True)
    new_state, metrics = step(state, anc, pos, lab)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_extract_features_from_mmap_store_flat_ram(tmp_path):
    """Celeb1M-scale extraction: a uint8 mmap store streams through the
    extractor per batch with no whole-array float materialization, and
    produces the same features as the float path."""
    import tracemalloc

    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.extract import (
        extract_features,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )

    rng = np.random.default_rng(0)
    # big enough that a whole-array float copy (16 MB) would trip the bound
    imgs = (rng.random((4096, 32, 32, 1)) * 255).astype(np.uint8)
    labels = rng.integers(0, 4, 4096)
    d = str(tmp_path / "xstore")
    R.save_image_store_mmap(d, imgs, labels)
    mm_imgs, mm_labels = R.load_image_store_mmap(d)

    model = LightCNN9(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    extract_features(model, variables, mm_imgs[:256], mm_labels[:256],
                     batch_size=128)  # warm compiles outside the trace
    tracemalloc.start()
    feats_mm, _, _ = extract_features(model, variables, mm_imgs, mm_labels,
                                      batch_size=128)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    feats_f32, _, _ = extract_features(
        model, variables, imgs[:256].astype(np.float32) / 255.0,
        labels[:256], batch_size=128)
    np.testing.assert_allclose(feats_mm[:256], feats_f32, rtol=1e-5,
                               atol=1e-6)
    # peak python-heap stays O(batch + features), under the 16 MB a
    # whole-dataset float copy would cost
    assert peak < 10 * 1024 * 1024, peak


def test_extract_features_cli_from_mmap_dir(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        extract_features as xf,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
        synthetic_faces,
    )

    imgs, labels = synthetic_faces(num_ids=4, per_id=4, size=16, seed=1)
    d = str(tmp_path / "xs")
    R.save_image_store_mmap(d, (imgs * 255).astype(np.uint8), labels)
    out = str(tmp_path / "ex")
    results = xf.main(["--train-images", d, "--model", "lightcnn9",
                       "--num-classes", "4", "--out-dir", out,
                       "--batch-size", "8"])
    feats, labs, _ = results["train"]
    assert feats.shape == (16, 256)
