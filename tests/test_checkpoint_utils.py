"""Checkpoint/resume + observability utilities (SURVEY.md §5.1, §5.3-5.4:
capabilities the reference lacked — resume must actually restore state)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.models.heads import (
    LinearHead,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
    Checkpointer,
    create_train_state,
    make_head_train_step,
    resume_if_available,
    sgd_wd,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils.profiling import (
    MetricsWriter,
    StepTimer,
)


def _setup(tmp_path):
    rng = np.random.default_rng(0)
    anc = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, 8))
    model = LinearHead(out_dim=4)
    tx = sgd_wd(lr=0.1)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), anc)
    step = jax.jit(make_head_train_step(model, tx, margin=10.0))
    return state, step, (anc, pos, labels)


def test_checkpoint_roundtrip(tmp_path):
    state, step, batch = _setup(tmp_path)
    for _ in range(3):
        state, _ = step(state, *batch)
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(3, state, wait=True)
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = ck.restore(template)
    assert int(restored.step) == 3
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p1 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # optimizer state restored too (trace of opt_state leaves equal)
    o0 = jax.tree_util.tree_leaves(state.opt_state)
    o1 = jax.tree_util.tree_leaves(restored.opt_state)
    for a, b in zip(o0, o1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ck.close()


def test_resume_continues_identically(tmp_path):
    """Fake-failure recovery: train 2 steps, checkpoint, 'crash', restore,
    and verify the continuation matches an uninterrupted run."""
    state, step, batch = _setup(tmp_path)
    s = state
    for _ in range(2):
        s, _ = step(s, *batch)
    ck = Checkpointer(str(tmp_path / "ckpt"))
    ck.save(1, s, wait=True)  # epoch 1 done
    # uninterrupted run: 2 more steps
    s_cont = s
    for _ in range(2):
        s_cont, _ = step(s_cont, *batch)
    # crash + resume path
    fresh = _setup(tmp_path)[0]
    restored, epoch0 = resume_if_available(ck, fresh)
    assert epoch0 == 2
    for _ in range(2):
        restored, _ = step(restored, *batch)
    a = jax.tree_util.tree_leaves(s_cont.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    ck.close()


def test_resume_without_checkpoints(tmp_path):
    state, _, _ = _setup(tmp_path)
    ck = Checkpointer(str(tmp_path / "empty"))
    restored, epoch0 = resume_if_available(ck, state)
    assert epoch0 == 0
    assert restored is state
    ck.close()


def test_checkpointer_retention(tmp_path):
    state, step, batch = _setup(tmp_path)
    ck = Checkpointer(str(tmp_path / "ckpt"), max_to_keep=2)
    for e in range(4):
        state, _ = step(state, *batch)
        ck.save(e, state, wait=True)
    assert ck.latest_step() == 3
    steps = sorted(int(d) for d in os.listdir(str(tmp_path / "ckpt"))
                   if d.isdigit())
    assert len(steps) <= 2
    ck.close()


def test_step_timer_and_metrics_writer(tmp_path):
    t = StepTimer(batch_size=64, report_every=2)
    assert t.step() is None
    rate = t.step()
    assert rate is not None and rate > 0
    mw = MetricsWriter(str(tmp_path / "m.jsonl"))
    mw.write(step=1, loss=0.5)
    mw.write(step=2, loss=0.25)
    rows = mw.read_all()
    assert rows[1]["loss"] == 0.25


def test_profiler_trace_smoke(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.utils.profiling import (
        trace,
    )

    with trace(str(tmp_path / "trace")):
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    # trace directory exists and contains profiler output
    assert os.path.isdir(str(tmp_path / "trace"))


def test_projector_export_roundtrip(tmp_path):
    from improving_face_recognition_performance_using_triplet_loss_tpu.eval.projector import (
        export_projector,
        load_projector,
    )

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(12, 8)).astype(np.float32)
    labels = np.arange(12) % 3
    d = export_projector(emb, labels, str(tmp_path / "proj"),
                         names=["a", "b", "c"])
    vec, meta = load_projector(d)
    np.testing.assert_allclose(vec, emb, rtol=1e-4)
    assert meta[:4] == ["a", "b", "c", "a"]


def test_multislice_mesh_shape():
    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel.mesh import (
        make_multislice_mesh,
    )

    mesh = make_multislice_mesh(ici_size=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")


def test_nonfinite_loss_detection():
    """train_loop aborts with a clear error when the loss goes NaN."""
    import pytest

    from improving_face_recognition_performance_using_triplet_loss_tpu.train.loops import (
        NonFiniteLossError,
        train_loop,
    )

    def bad_step(state, a, p, l):
        return state, {"loss": jnp.asarray(float("nan")),
                       "pos_cos": jnp.zeros(2), "neg_cos": jnp.zeros(2)}

    batch = (np.zeros((2, 4)), np.zeros((2, 4)), np.zeros(2))
    with pytest.raises(NonFiniteLossError):
        train_loop(object(), bad_step, lambda: iter([batch]), epochs=1)


def test_preemption_guard_checkpoints_and_stops(tmp_path):
    """Simulated preemption: the loop checkpoints mid-training and stops;
    resume picks up from the last completed epoch."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        train_loop,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train.loops import (
        PreemptionGuard,
    )

    state, step, batch = _setup(tmp_path)
    ck = Checkpointer(str(tmp_path / "pre"))
    guard = PreemptionGuard(signals=())  # poll-only (no real signal needed)

    calls = {"n": 0}

    def counting_step(s, a, p, l):
        calls["n"] += 1
        if calls["n"] == 3:
            guard.requested = True  # "SIGTERM" arrives during batch 3
        return step(s, a, p, l)

    batches = lambda: iter([batch] * 5)
    out_state, history = train_loop(
        state, counting_step, batches, epochs=4, checkpointer=ck,
        preemption_guard=guard)
    assert calls["n"] == 3          # stopped right after the signal
    assert ck.latest_step() == 0    # saved as "epoch 0 complete"
    restored, epoch0 = resume_if_available(ck, state)
    assert epoch0 == 1
    assert int(restored.step) == 3  # optimizer steps preserved
    ck.close()
