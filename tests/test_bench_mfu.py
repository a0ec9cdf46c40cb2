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


def test_flagship_ladder_tables_match_models():
    """tools/perf_layers.py's LC29_128 / EFM342_64 roofline tables must be
    the REAL conv geometry: every (H, Cin, Cout, k) in the table (with
    res-block repeat counts expanded) equals the multiset of nn.Conv
    calls the model actually makes, plus the FusedStem row."""
    import flax.linen as nn
    import jax
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        EFMNet342,
        LightCNN29,
    )
    from tools.perf_layers import EFM342_64, LC29_128

    def model_geometry(model_cls, size):
        model = model_cls(num_classes=10)
        x = np.zeros((1, size, size, 1), np.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        calls = []

        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if isinstance(mod, nn.Conv) and context.method_name == "__call__":
                k = mod.variables["params"]["kernel"]
                calls.append((args[0].shape[1], int(k.shape[2]),
                              int(k.shape[3]), int(k.shape[0])))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, train=True,
                        mutable=["batch_stats"],
                        rngs={"dropout": jax.random.PRNGKey(1)})
        # the 5x5 stem is a FusedStem (raw params, not nn.Conv)
        grp = variables["params"]["group1" if model_cls is LightCNN29
                                  else "conv1"]
        stem = grp["conv"]["kernel"] if "conv" in grp else grp["kernel"]
        calls.append((size, int(stem.shape[2]), int(stem.shape[3]),
                      int(stem.shape[0])))
        return sorted(calls)

    for table, model_cls, size in [(LC29_128, LightCNN29, 128),
                                   (EFM342_64, EFMNet342, 64)]:
        expanded = sorted(
            (h, cin, cout, k)
            for (_, h, cin, cout, k, _, cnt) in table
            for _ in range(cnt))
        assert expanded == model_geometry(model_cls, size), \
            f"{model_cls.__name__} table drifted from the model"


def test_timed_scan_adaptive_window_amortizes_dispatch():
    """Regression pin for the round-4 ms=0.0 / absurd-TFLOPs rows: a
    microsecond-scale op timed at reps=1 reads as pure dispatch jitter;
    ``min_window_s`` must lengthen the scan until the device window is
    unambiguous, so the per-rep figure reflects the op, not the dispatch.
    """
    import jax.numpy as jnp

    from tools.perf_detect_breakdown import timed_scan

    x = jnp.ones((8, 8), jnp.float32)

    def tiny(a):
        return a + 1.0

    naive_ms, _ = timed_scan(tiny, 1, x)
    adaptive_ms, _ = timed_scan(tiny, 1, x, min_window_s=0.05)
    # the adaptive figure amortizes the per-dispatch cost over a long
    # scan; it must come in far below the single-dispatch reading and at
    # a magnitude a [8,8] add can plausibly take
    assert adaptive_ms <= naive_ms
    assert adaptive_ms < 1.0, (
        f"adaptive per-rep {adaptive_ms:.3f} ms — window growth did not "
        "amortize the dispatch cost")


def test_bench_driver_salvages_teardown_hang():
    """A worker that prints the measurement and then HANGS at interpreter
    teardown (a real plugin failure mode) must not cost the artifact:
    the driver salvages the JSON from the timed-out subprocess's partial
    stdout instead of burning every retry (round-4 review finding)."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    bench_path = Path(__file__).resolve().parents[1] / "bench.py"
    env = dict(
        os.environ,
        FACEJAX_BENCH_FAKE_HANG="1",
        FACEJAX_BENCH_QUICK="1",
        FACEJAX_BENCH_BACKOFF="0",
        FACEJAX_BENCH_ATTEMPT_TIMEOUT="120",
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [sys.executable, str(bench_path)], env=env, timeout=400,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["value"] > 0, result
    attempts = result["attempts"]
    assert len(attempts) == 1, attempts
    assert attempts[0]["rc"] == "timeout-salvaged", attempts
