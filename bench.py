"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): face-embedding extraction throughput on
LightCNN-9, embeddings/sec/chip, target >= 10,000/s on a TPU v5e chip.
``vs_baseline`` is value / 10_000.

Run on the real chip: ``python bench.py`` (honors JAX_PLATFORMS from env).
Extra diagnostics go to stderr; the single stdout line is the contract.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()

BASELINE_EMB_PER_SEC = 10_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# analytic conv+fc FLOPs per image at 128px (tools/perf_layers.py table);
# cross-checked at run time against XLA's cost analysis (see
# measured_flops_per_image) and in tests/test_bench_mfu.py
FLOPS_PER_IMAGE = 1.95e9
PEAK_BF16_TFLOPS = 197.0  # v5e nominal


def measured_flops_per_image(batch_size: int = 128) -> float:
    """FLOPs/image from XLA cost analysis of the single-batch forward —
    the mechanical MFU denominator (falls back to the analytic constant
    when the backend exposes no cost analysis)."""
    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
        l2_normalize,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
        compiled_flops,
    )

    model = LightCNN9(num_classes=1000, dtype=jnp.bfloat16)
    x = np.zeros((batch_size, 128, 128, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    def fwd(variables, x):
        _, feat = model.apply(variables, x, train=False)
        return l2_normalize(feat)

    total = compiled_flops(fwd, variables, x)
    if total is None:
        log("cost_analysis unavailable — using analytic FLOPS_PER_IMAGE")
        return FLOPS_PER_IMAGE
    per_image = total / batch_size
    ratio = per_image / FLOPS_PER_IMAGE
    log(f"XLA cost-analysis FLOPs/image: {per_image / 1e9:.3f} G "
        f"(analytic {FLOPS_PER_IMAGE / 1e9:.2f} G, ratio {ratio:.3f})")
    return per_image


def measure_mbu_pct(batch_size: int = 256, iters: int = 256):
    """Memory-bandwidth utilization of the network's genuinely HBM-BOUND
    layer against a MEASURED streaming-bandwidth ceiling on this chip.

    Per the round-3 roofline pass (tools/perf_layers.py): conv1 is
    MXU-structure-bound (K=25), the 3x3 convs are MXU-bound, the small
    late layers fit VMEM (their apparent GB/s is a residency artifact) —
    the bandwidth-bound layer is conv2a (1x1, 201 MB working set at
    B=256). mbu_pct = its achieved GB/s / the best rate any streaming
    kernel reaches here (~650 GB/s measured with a non-foldable abs
    kernel; v5e spec 819). Measured attainment is ~44% (52% when the 1x1
    is expressed as a reshaped matmul — tools-level probe): the early
    layers run at half the streaming roofline, i.e. the extraction
    ceiling is XLA's small-channel conv lowering, not the HBM itself
    (docs/DESIGN.md round-3 section). B=256 keeps the working set well
    above VMEM so HBM traffic is actually observed (VERDICT r2 item 1).
    Returns (mbu_pct, peak_gb_s).
    """
    from tools.perf_layers import _null_baseline, measure_hbm_peak_gbs

    # fixed dispatch+fetch cost is MEASURED, not assumed (the old 26 ms
    # constant was tunnel-specific and would skew both the streaming peak
    # and the conv timing on directly-attached hardware)
    fixed_s = _null_baseline(iters)
    peak = measure_hbm_peak_gbs(iters=iters, fixed_s=fixed_s)
    early = [(64, 48, 96, 1, False)]  # conv2a at the bench geometry
    total_bytes = 0.0
    total_s = 0.0
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.mfm import (
        mfm2,
    )

    for h, cin, cout, k, pool in early:
        key = jax.random.PRNGKey(h)
        x = jax.jit(lambda kk: jax.random.normal(
            kk, (batch_size, h, h, cin), jnp.bfloat16))(key)
        w = jax.jit(lambda kk: jax.random.normal(
            kk, (k, k, cin, cout), jnp.bfloat16) * 0.05)(
                jax.random.fold_in(key, 1))

        def make(length):
            @jax.jit
            def run(x, w):
                def body(acc, _):
                    w_dep = w + (acc * 1e-24).astype(jnp.bfloat16)
                    y = jax.lax.conv_general_dilated(
                        x, w_dep, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32)
                    y = mfm2(y.astype(jnp.bfloat16))
                    if pool:
                        y = jax.lax.reduce_window(
                            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                            (1, 2, 2, 1), "VALID")
                    return acc + y.sum(dtype=jnp.float32), None

                acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                      None, length=length)
                return acc
            return run

        # iters sized to dwarf the link's fixed dispatch cost, which is
        # additionally subtracted using the measured baseline above
        # (differencing drowned in per-dispatch jitter)
        run = make(iters)
        float(run(x, w))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, w))
            ts.append(time.perf_counter() - t0)
        total_s += max(min(ts) - fixed_s, 1e-9) / iters
        out_h = h // 2 if pool else h
        total_bytes += 2 * batch_size * (h * h * cin
                                         + out_h * out_h * (cout // 2))
    achieved = total_bytes / total_s / 1e9
    return achieved / peak * 100.0, peak


def bench_lightcnn9_extraction(batch_size: int = 128, n_batches: int = 256) -> float:
    """Time ``n_batches`` forward passes chained in ONE lax.scan program with
    a scalar fetch at the end. A host-side dispatch loop cannot be trusted
    here: on the tunneled device, block_until_ready returns before execution
    completes, so per-call timing under-counts; a single dispatch whose
    result value is fetched to host measures true device wall-clock.

    B=128 measured fastest on v5e (round-2 sweep: 22.9k @64, 30.6k @96,
    39.0k @128, 21.5k @160, 28.6k @192, 37.3k @256, 36.4k @512, 34.8k
    @1024 emb/s) — the batch axis tiles the 128-wide MXU exactly once."""
    import functools

    from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
        LightCNN9,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.distances import (
        l2_normalize,
    )

    model = LightCNN9(num_classes=1000, dtype=jnp.bfloat16)
    # generate inputs on device: avoids pushing ~1 GB through the host link
    xs = jax.jit(
        lambda k: jax.random.uniform(
            k, (n_batches, batch_size, 128, 128, 1), jnp.float32)
    )(jax.random.PRNGKey(1))
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, 128, 128, 1),
                                                           np.float32))

    @jax.jit
    def extract_all(variables, xs):
        def body(acc, x):
            _, feat = model.apply(variables, x, train=False)
            return acc + l2_normalize(feat).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
        return acc

    t0 = time.perf_counter()
    _ = float(extract_all(variables, xs))
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s; "
        f"devices={jax.devices()}")

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(extract_all(variables, xs))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return batch_size * n_batches / dt


def main():
    try:
        emb_per_sec = bench_lightcnn9_extraction()
    except Exception as e:  # report failure as a parseable zero
        log(f"bench failed: {type(e).__name__}: {e}")
        print(json.dumps({
            "metric": "lightcnn9_embeddings_per_sec_per_chip",
            "value": 0.0, "unit": "embeddings/s",
            "vs_baseline": 0.0, "error": str(e)[:200],
        }))
        return
    try:
        flops_per_image = measured_flops_per_image()
    except Exception as e:
        log(f"flops measurement failed ({e}); using analytic constant")
        flops_per_image = FLOPS_PER_IMAGE
    extra = {}
    try:
        mbu, peak_bw = measure_mbu_pct()
        extra = {"mbu_pct": round(mbu, 1),
                 "hbm_peak_gb_s": round(peak_bw, 1)}
        log(f"bound-layer MBU {mbu:.1f}% of measured {peak_bw:.0f} GB/s")
    except Exception as e:
        log(f"mbu measurement failed: {e}")
    print(json.dumps({
        "metric": "lightcnn9_embeddings_per_sec_per_chip",
        "value": round(emb_per_sec, 1),
        "unit": "embeddings/s",
        "vs_baseline": round(emb_per_sec / BASELINE_EMB_PER_SEC, 3),
        "mfu_pct": round(emb_per_sec * flops_per_image
                         / (PEAK_BF16_TFLOPS * 1e12) * 100, 1),
        "flops_per_image": round(flops_per_image / 1e9, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
