"""Worker process for the 2-process ``jax.distributed`` integration test.

Launched by tests/test_distributed_multiprocess.py — NOT collected by
pytest. Each process owns one CPU device, calls
``initialize_distributed`` with explicit coordinator/process args
(parallel/distributed.py:15-37), feeds its OWN ``ShardedPairBatcher``
shard (per-host data path, data/streaming.py), and runs the psum'd
shard_map train step over the 2-device GLOBAL mesh. The reference's
mechanism this exercises end-to-end: KVStore-'local' gradient aggregation
across 2 workers (mutli_gpu_v3.py:150-162) — here jax.distributed +
``pmean`` over the global mesh, for real with process_count == 2.

Writes {losses, param_checksum, process_count} as JSON to --out.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-size", type=int, default=8,
                   help="LOCAL batch rows per process")
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)

    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel.distributed import (
        initialize_distributed,
        process_info,
    )

    ok = initialize_distributed(args.coordinator, args.num_processes,
                                args.process_id)
    assert ok, "initialize_distributed returned False with explicit args"
    pid, pcount = process_info()
    assert pcount == args.num_processes, (pid, pcount)
    assert len(jax.devices()) == args.num_processes  # 1 CPU device/process

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from improving_face_recognition_performance_using_triplet_loss_tpu.data.streaming import (
        ShardedPairBatcher,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models.heads import (
        LinearHead,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.parallel import (
        make_mesh,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.train import (
        HEAD_METRIC_KEYS,
        create_train_state,
        make_head_train_step,
        sgd_wd,
        shard_map_step,
    )

    # THIS process's shard of the store: rows [pid*n/P, (pid+1)*n/P)
    batcher = ShardedPairBatcher(args.store, args.batch_size,
                                 host_id=pid, num_hosts=pcount,
                                 shuffle=False)
    assert len(batcher) >= args.steps, "store too small for --steps"

    mesh = make_mesh()  # all GLOBAL devices: one per process
    data_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())

    d_in = int(np.prod(batcher.images.shape[1:]))
    model = LinearHead(out_dim=8)
    tx = sgd_wd(lr=0.05)
    # identical seed on every process -> identical replicated init
    state = create_train_state(model, tx, jax.random.PRNGKey(3),
                               np.zeros((2, d_in), np.float32))
    state = jax.device_put(jax.tree_util.tree_map(np.asarray, state), repl_sh)

    step = shard_map_step(
        make_head_train_step(model, tx, mining_mode="semi_hard",
                             axis_name="data"),
        mesh, has_state_out=True, metric_keys=HEAD_METRIC_KEYS)

    losses = []
    it = iter(batcher)
    for _ in range(args.steps):
        anc, pos, lab = next(it)
        anc = (anc.reshape(anc.shape[0], -1) / 255.0).astype(np.float32)
        pos = (pos.reshape(pos.shape[0], -1) / 255.0).astype(np.float32)
        # local shard rows -> one GLOBAL batch-sharded array per input
        g_anc = jax.make_array_from_process_local_data(data_sh, anc)
        g_pos = jax.make_array_from_process_local_data(data_sh, pos)
        g_lab = jax.make_array_from_process_local_data(
            data_sh, lab.astype(np.int32))
        state, metrics = step(state, g_anc, g_pos, g_lab)
        losses.append(float(metrics["loss"]))  # replicated -> addressable

    checksum = float(sum(
        float(jnp.sum(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(state.params)))
    with open(args.out, "w") as f:
        json.dump({"process_id": pid, "process_count": pcount,
                   "losses": losses, "param_checksum": checksum}, f)
    print(f"worker {pid}/{pcount} done: losses={losses}", flush=True)


if __name__ == "__main__":
    main()
