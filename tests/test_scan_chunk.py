"""Scan-chunked training (link-latency amortization): K scanned steps must
produce EXACTLY the sequence of K per-dispatch steps (keys derive from
state.step, so determinism carries across the restructure)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    LightCNN9,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    create_train_state,
    make_backbone_train_step,
    make_scanned_step,
)


def _setup(n_batches=4, b=4):
    rng = np.random.default_rng(0)
    anc = rng.random((n_batches, b, 16, 16, 1)).astype(np.float32)
    pos = rng.random((n_batches, b, 16, 16, 1)).astype(np.float32)
    lab = rng.integers(0, 4, (n_batches, b)).astype(np.int32)
    model = LightCNN9(num_classes=4)
    # sgd: update is linear in grads, so cross-compilation f32 drift stays
    # tiny (adam's normalization amplifies it on near-zero gradients)
    tx = optax.sgd(0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               anc[0, :1])
    step = make_backbone_train_step(model, tx, mining_mode="random")
    return state, step, anc, pos, lab


def test_scanned_equals_sequential():
    state, step, anc, pos, lab = _setup()
    jstep = jax.jit(step)
    s_seq = state
    seq_losses = []
    for i in range(4):
        s_seq, m = jstep(s_seq, anc[i], pos[i], lab[i])
        seq_losses.append(float(m["loss"]))

    scanned = make_scanned_step(step)
    s_scan, metrics = scanned(state, anc, pos, lab)
    # separate compiles fuse differently -> f32 reassociation drift only
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses,
                               rtol=5e-4)
    assert metrics["pos_cos"].shape == (4, 4)  # [K, B]
    assert int(s_scan.step) == 4
    for p1, p2 in zip(jax.tree_util.tree_leaves(s_seq.params),
                      jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=5e-4, atol=2e-4)


def test_train_backbone_cli_scan_chunk(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )

    out = str(tmp_path / "sc")
    state, history = train_backbone.main([
        "--synthetic", "--synthetic-size", "16", "--model", "lightcnn9",
        "--scan-chunk", "4", "--epochs", "2", "--batch-size", "8",
        "--out-dir", out])
    assert len(history) == 2
    assert np.isfinite(history[0].train["loss"])
    # 256 synthetic rows / b=8 = 32 steps; 32 % 4 == 0 -> nothing dropped
    import os

    assert os.path.exists(os.path.join(out, "cosine_similarity.csv"))


def test_dp_scanned_equals_sequential_dp():
    """scan-chunk COMPOSED with shard_map DP: the scanned-in-shard_map step
    over the 8-device mesh equals K sequential DP dispatches."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
        make_mesh,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        shard_map_scanned_step,
        shard_map_step,
    )

    state, _, anc, pos, lab = _setup()
    mesh = make_mesh(jax.devices()[:8])
    # rebuild steps with the data axis
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )

    model = LightCNN9(num_classes=4)
    tx = optax.sgd(0.05)
    raw = make_backbone_train_step(model, tx, mining_mode="hard",
                                   axis_name="data")
    anc8 = np.repeat(anc, 2, axis=1)  # batch 8 = divisible by mesh
    pos8 = np.repeat(pos, 2, axis=1)
    lab8 = np.repeat(lab, 2, axis=1)

    seq = shard_map_step(raw, mesh, has_state_out=True)
    s_seq = state
    seq_losses = []
    for i in range(4):
        s_seq, m = seq(s_seq, anc8[i], pos8[i], lab8[i])
        seq_losses.append(float(m["loss"]))

    scanned = shard_map_scanned_step(raw, mesh)
    s_scan, metrics = scanned(state, anc8, pos8, lab8)
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses,
                               rtol=5e-4)
    assert metrics["pos_cos"].shape == (4, 8)
    for p1, p2 in zip(jax.tree_util.tree_leaves(s_seq.params),
                      jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=5e-4, atol=2e-4)


def test_train_backbone_cli_scan_chunk_with_dp(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )

    out = str(tmp_path / "dpsc")
    state, history = train_backbone.main([
        "--synthetic", "--synthetic-size", "16", "--model", "lightcnn9",
        "--scan-chunk", "4", "--data-parallel", "--epochs", "1",
        "--batch-size", "16", "--out-dir", out])
    assert np.isfinite(history[0].train["loss"])
