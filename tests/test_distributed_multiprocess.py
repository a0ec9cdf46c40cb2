"""TRUE 2-process ``jax.distributed`` integration (VERDICT r2 item 4 /
SURVEY.md §5.8's last untested leg).

Two subprocesses on localhost, each with ONE CPU device, call
``jax.distributed.initialize`` through ``initialize_distributed``'s
explicit-args path, feed their own ``ShardedPairBatcher`` host shard, and
run the pmean'd shard_map head train step over the 2-device GLOBAL mesh
(tests/_dist_worker.py). Asserts:

- both processes see process_count == 2 and report IDENTICAL losses and
  final-parameter checksums (the psum path really synchronized them);
- the multi-process losses equal a single-process run on the globally
  assembled batch (concat of the per-host shards in process order) —
  the KVStore-'local' replacement produces single-worker math, the
  reference's 2-GPU contract (mutli_gpu_v3.py:150-162).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_PROC = 2
LOCAL_B = 8
STEPS = 2
IMG = (4, 4, 1)
N_ROWS = 64  # 32 rows/shard -> 4 local batches of 8


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    from improving_face_recognition_performance_using_triplet_loss_tpu.data.records import (
        ImageStoreWriter,
    )

    rng = np.random.default_rng(11)
    d = str(tmp_path_factory.mktemp("dist") / "store")
    imgs = (rng.random((N_ROWS, *IMG)) * 255).astype(np.uint8)
    labels = rng.integers(0, 6, N_ROWS)
    with ImageStoreWriter(d, IMG) as w:
        w.append(imgs, labels)
    return d


@pytest.fixture(scope="module")
def worker_results(store, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("dist_out")
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker sets platform via jax.config
    procs, outs = [], []
    for pid in range(N_PROC):
        out = str(out_dir / f"w{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_dist_worker.py"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", str(N_PROC), "--process-id", str(pid),
             "--store", store, "--out", out,
             "--batch-size", str(LOCAL_B), "--steps", str(STEPS)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    results = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        assert p.returncode == 0, f"worker {pid} failed:\n{stdout[-4000:]}"
        with open(out) as f:
            results.append(json.load(f))
    return results


def test_both_processes_ran_distributed(worker_results):
    assert [r["process_id"] for r in worker_results] == [0, 1]
    assert all(r["process_count"] == N_PROC for r in worker_results)


def test_processes_agree(worker_results):
    r0, r1 = worker_results
    np.testing.assert_allclose(r0["losses"], r1["losses"], rtol=1e-6)
    np.testing.assert_allclose(r0["param_checksum"], r1["param_checksum"],
                               rtol=1e-6)


def test_matches_single_process_global_batch(worker_results, store):
    """Single-process jit on the SAME global batches (host-0 rows ++ host-1
    rows, the mesh's process order) must produce the same loss sequence."""
    import jax

    from improving_face_recognition_performance_using_triplet_loss_tpu.data.streaming import (
        ShardedPairBatcher,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models.heads import (
        LinearHead,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        create_train_state,
        make_head_train_step,
        sgd_wd,
    )

    shards = [iter(ShardedPairBatcher(store, LOCAL_B, host_id=h,
                                      num_hosts=N_PROC, shuffle=False))
              for h in range(N_PROC)]
    d_in = int(np.prod(IMG))
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    state = create_train_state(model, tx, jax.random.PRNGKey(3),
                               np.zeros((2, d_in), np.float32))
    step = jax.jit(make_head_train_step(model, tx, mining_mode="semi_hard"))

    losses = []
    for _ in range(STEPS):
        parts = [next(it) for it in shards]
        anc = np.concatenate([p[0] for p in parts]).reshape(
            N_PROC * LOCAL_B, -1).astype(np.float32) / 255.0
        pos = np.concatenate([p[1] for p in parts]).reshape(
            N_PROC * LOCAL_B, -1).astype(np.float32) / 255.0
        lab = np.concatenate([p[2] for p in parts]).astype(np.int32)
        state, metrics = step(state, anc, pos, lab)
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(worker_results[0]["losses"], losses,
                               rtol=1e-5, atol=1e-7)
