"""Class-parallel (tensor-parallel) softmax over a 2-D data x model mesh:
sharded CE/argmax oracles, and the full train step equal to single-device
math (the 78k-identity fc2 is the reference-scale motivation,
README.md:23-26; ctx_group ancestry mutli_gpu_v3.py:74-98)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.losses.sharded import (
    class_parallel_argmax,
    class_parallel_softmax_ce,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    LightCNN9,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
    make_2d_mesh,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    create_train_state,
    infer_class_parallel_specs,
    make_backbone_train_step,
    shard_map_step_2d,
)
from jax.sharding import PartitionSpec as P

C = 12  # global classes; shards of 3 over model=4


def _sharded_fn(fn, mesh, out_spec):
    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(None, "model"), P()),
        out_specs=out_spec, check_vma=True))


def test_sharded_ce_matches_optax():
    mesh = make_2d_mesh(model_size=4)
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, C)) * 3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, 8), jnp.int32)

    got = _sharded_fn(
        lambda lg, lb: class_parallel_softmax_ce(lg, lb, "model"),
        mesh, P())(logits, labels)
    want = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_sharded_ce_gradient_matches():
    mesh = make_2d_mesh(model_size=4)
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(4, C)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, 4), jnp.int32)

    grad_sharded = _sharded_fn(
        jax.grad(lambda lg, lb: class_parallel_softmax_ce(lg, lb, "model")),
        mesh, P(None, "model"))(logits, labels)
    grad_ref = jax.grad(
        lambda lg: optax.softmax_cross_entropy_with_integer_labels(
            lg, labels).mean())(logits)
    np.testing.assert_allclose(np.asarray(grad_sharded),
                               np.asarray(grad_ref), rtol=1e-5, atol=1e-6)


def test_sharded_argmax_matches_numpy():
    mesh = make_2d_mesh(model_size=4)
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(16, C)).astype(np.float32)
    logits[0] = 0.0  # all-ties row: must resolve to index 0
    got = _sharded_fn(
        lambda lg, _: class_parallel_argmax(lg, "model"), mesh,
        P())(jnp.asarray(logits), jnp.zeros((16,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), logits.argmax(-1))


class _TinyNet(__import__("flax").linen.Module):
    """Dropout/BN-free (logits, feat) net: deterministic across meshes, so
    cross-mesh equality is exact. Head named fc2 like the real models."""

    num_classes: int
    feature_dim: int = 8

    @__import__("flax").linen.compact
    def __call__(self, x, *, train: bool = False):
        import flax.linen as nn

        x = x.reshape((x.shape[0], -1))
        feat = nn.tanh(nn.Dense(self.feature_dim, name="fc1")(x))
        logits = nn.Dense(self.num_classes, name="fc2")(feat)
        return logits, feat


def test_class_parallel_train_step_matches_single_device():
    """Full joint step over a (2, 4) data x model mesh == one-device step on
    the global batch, to float tolerance: losses/acc AND the updated params
    (fc2 shards reassemble to the single-device update). Deterministic
    (hard) mining + a dropout-free net so the comparison is exact."""
    model_size, n_classes = 4, C
    mesh = make_2d_mesh(model_size=model_size)
    rng = np.random.default_rng(3)
    b = 8
    anc = jnp.asarray(rng.random((b, 6, 6, 1)), jnp.float32)
    pos = jnp.asarray(rng.random((b, 6, 6, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, n_classes, b), jnp.int32)

    tx = optax.sgd(0.1)  # sgd: update == -lr * grad, exact comparison
    global_model = _TinyNet(num_classes=n_classes)
    state = create_train_state(global_model, tx, jax.random.PRNGKey(0),
                               np.asarray(anc[:1]))

    ref_step = jax.jit(make_backbone_train_step(global_model, tx,
                                                mining_mode="hard"))
    ref_state, ref_m = ref_step(state, anc, pos, labels)

    local_model = _TinyNet(num_classes=n_classes // model_size)
    specs = infer_class_parallel_specs(state, n_classes, "model")
    cp_step = shard_map_step_2d(
        make_backbone_train_step(local_model, tx, mining_mode="hard",
                                 axis_name="data",
                                 class_axis_name="model"),
        mesh, specs, has_state_out=True)
    cp_state, cp_m = cp_step(state, anc, pos, labels)

    np.testing.assert_allclose(float(cp_m["id_loss"]),
                               float(ref_m["id_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(cp_m["tl_loss"]),
                               float(ref_m["tl_loss"]), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(float(cp_m["acc"]), float(ref_m["acc"]),
                               rtol=1e-6)
    # updated fc2 kernel: the sharded update reassembles the reference's
    got_fc2 = np.asarray(cp_state.params["fc2"]["kernel"])
    want_fc2 = np.asarray(ref_state.params["fc2"]["kernel"])
    np.testing.assert_allclose(got_fc2, want_fc2, rtol=1e-4, atol=1e-5)
    # a replicated backbone param also matches
    got_c1 = np.asarray(cp_state.params["fc1"]["kernel"])
    want_c1 = np.asarray(ref_state.params["fc1"]["kernel"])
    np.testing.assert_allclose(got_c1, want_c1, rtol=1e-4, atol=1e-5)


def test_infer_specs_only_touches_fc2():
    model = LightCNN9(num_classes=C)
    tx = optax.adam(1e-3)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               np.zeros((1, 16, 16, 1), np.float32))
    specs = infer_class_parallel_specs(state, C, "model")
    assert specs.params["fc2"]["kernel"] == P(None, "model")
    assert specs.params["fc2"]["bias"] == P("model")
    assert specs.params["conv1"]["kernel"] == P()
    # optimizer-state mirrors (adam mu/nu) are sharded too
    flat = jax.tree_util.tree_leaves_with_path(specs)
    sharded = ["/".join(str(getattr(p, "key", p)) for p in path)
               for path, s in flat if s == P(None, "model")]
    assert len(sharded) >= 3  # params + mu + nu


def test_train_backbone_cli_class_parallel(tmp_path):
    """`train_backbone --class-parallel 4` trains over the 2-D mesh (16
    synthetic identities / 4-way head shard x 2-way data)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )

    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        save_image_store,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.synthetic import (
        synthetic_faces,
    )

    imgs, labels = synthetic_faces(num_ids=4, per_id=8, size=16, seed=2)
    ev = str(tmp_path / "eval.npz")
    save_image_store(ev, (imgs * 255).astype(np.uint8), labels % 4)
    out = str(tmp_path / "cp")
    state, history = train_backbone.main([
        "--synthetic", "--synthetic-size", "16", "--model", "lightcnn9",
        "--class-parallel", "4", "--epochs", "1", "--batch-size", "8",
        "--eval-images", ev, "--out-dir", out])
    assert np.isfinite(history[0].train["loss"])
    assert np.isfinite(history[0].train["acc"])
    # class-parallel EVAL ran over the 2-D mesh too
    assert np.isfinite(history[0].valid["loss"])


def test_class_parallel_scanned_equals_sequential():
    """scan-chunk COMPOSED with the 2-D class-parallel mesh: K scanned
    steps inside one shard_map dispatch equal K sequential 2-D dispatches
    (state shardings carried through the scan)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        shard_map_scanned_step_2d,
    )

    model_size, n_classes, k, b = 4, C, 3, 8
    mesh = make_2d_mesh(model_size=model_size)
    rng = np.random.default_rng(4)
    anc = jnp.asarray(rng.random((k, b, 6, 6, 1)), jnp.float32)
    pos = jnp.asarray(rng.random((k, b, 6, 6, 1)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, n_classes, (k, b)), jnp.int32)

    tx = optax.sgd(0.1)
    state = create_train_state(_TinyNet(num_classes=n_classes), tx,
                               jax.random.PRNGKey(0), np.asarray(anc[0, :1]))
    local_model = _TinyNet(num_classes=n_classes // model_size)
    specs = infer_class_parallel_specs(state, n_classes, "model")
    raw = make_backbone_train_step(local_model, tx, mining_mode="hard",
                                   axis_name="data",
                                   class_axis_name="model")

    seq = shard_map_step_2d(raw, mesh, specs, has_state_out=True)
    s_seq = state
    seq_losses = []
    for i in range(k):
        s_seq, m = seq(s_seq, anc[i], pos[i], labels[i])
        seq_losses.append(float(m["loss"]))

    scanned = shard_map_scanned_step_2d(raw, mesh, specs)
    s_scan, metrics = scanned(state, anc, pos, labels)
    np.testing.assert_allclose(np.asarray(metrics["loss"]), seq_losses,
                               rtol=5e-4)
    assert metrics["pos_cos"].shape == (k, b)
    assert int(s_scan.step) == k
    for p1, p2 in zip(jax.tree_util.tree_leaves(s_seq.params),
                      jax.tree_util.tree_leaves(s_scan.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=5e-4, atol=1e-5)


def test_train_backbone_cli_class_parallel_scan_chunk(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.cli import (
        train_backbone,
    )

    out = str(tmp_path / "cpsc")
    state, history = train_backbone.main([
        "--synthetic", "--synthetic-size", "16", "--model", "lightcnn9",
        "--class-parallel", "4", "--scan-chunk", "2", "--mining",
        "semi_hard", "--epochs", "1", "--batch-size", "16",
        "--out-dir", out])
    assert np.isfinite(history[0].train["loss"])
