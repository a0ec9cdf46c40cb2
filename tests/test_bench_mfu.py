"""bench.py MFU-denominator hygiene (VERDICT r2 item 7).

The headline MFU divides throughput by FLOPs/image. The analytic constant
(`bench.FLOPS_PER_IMAGE`, from the tools/perf_layers.py table) must agree
with XLA's own cost analysis of the compiled forward within 10%, so the
figure cannot silently drift if the model changes.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_analytic_flops_matches_xla_cost_analysis():
    import bench

    measured = bench.measured_flops_per_image(batch_size=8)
    assert measured > 0
    ratio = measured / bench.FLOPS_PER_IMAGE
    assert 0.9 < ratio < 1.1, (
        f"bench.FLOPS_PER_IMAGE ({bench.FLOPS_PER_IMAGE:.3e}) disagrees "
        f"with XLA cost analysis ({measured:.3e}) by {ratio:.2f}x — update "
        "the constant (and the perf_layers table it came from)")


def test_compiled_flops_counts_a_matmul():
    import jax.numpy as jnp
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
        compiled_flops,
    )

    a = np.zeros((256, 512), np.float32)
    b = np.zeros((512, 128), np.float32)
    flops = compiled_flops(lambda a, b: a @ b, a, b)
    if flops is None:  # backend without cost analysis: helper must not lie
        return
    expect = 2 * 256 * 512 * 128
    assert 0.5 * expect <= flops <= 2 * expect


def test_bench_driver_survives_transient_backend_failures():
    """VERDICT r3 item 1: a transient backend-init failure must cost an
    attempt, not the round. Simulate two failed inits (worker exits
    non-zero) and assert the driver's third attempt lands a real number
    with the attempt log embedded in the emitted JSON."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    bench_path = Path(__file__).resolve().parents[1] / "bench.py"
    env = dict(
        os.environ,
        FACEJAX_BENCH_FAKE_FAIL="2",
        FACEJAX_BENCH_QUICK="1",
        FACEJAX_BENCH_BACKOFF="0",
        FACEJAX_BENCH_ATTEMPT_TIMEOUT="240",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, str(bench_path)], env=env, timeout=420,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] > 0, result
    attempts = result["attempts"]
    assert [a["attempt"] for a in attempts] == [1, 2, 3]
    assert attempts[0]["rc"] == 1 and attempts[1]["rc"] == 1
    assert attempts[2]["rc"] == 0
    assert result["platform"] == "cpu"
