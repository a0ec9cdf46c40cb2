"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.json): face-embedding extraction throughput on
LightCNN-9, embeddings/sec/chip, target >= 10,000/s on a TPU v5e chip.
``vs_baseline`` is value / 10_000.

Run on the real chip: ``python bench.py`` (honors JAX_PLATFORMS from env).
Extra diagnostics go to stderr; the single stdout line is the contract.

Resilience (VERDICT r3 item 1): a transient backend-init failure
("Unable to initialize backend 'axon'" — a tunnel hiccup) wiped the
entire round-3 artifact because the old harness made ONE attempt. Now
``python bench.py`` is a thin driver that runs the measurement in a
fresh subprocess (``--worker``) with bounded retry + backoff — a failed
or hung backend init costs one attempt, not the round. The attempt log
is embedded in the emitted JSON.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Retry schedule: 5 attempts over ~3 minutes. A hung attempt (the axon
# plugin can hang at backend init while the tunnel is down, not just
# fail) is bounded by the per-attempt timeout.
BACKOFF_S = (0.0, 20.0, 40.0, 60.0, 60.0)
ATTEMPT_TIMEOUT_S = float(os.environ.get("FACEJAX_BENCH_ATTEMPT_TIMEOUT", 1800))

BASELINE_EMB_PER_SEC = 10_000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _import_jax():
    """Deferred + idempotent: the driver process must never touch jax —
    the axon TPU plugin can hang at *import*/plugin discovery while the
    tunnel is down, and the driver has to outlive exactly that failure
    mode. (Test processes that already configured jax pass through.)"""
    global jax, jnp, np
    if "jax" in globals():
        return
    # jax is PRE-IMPORTED at interpreter startup in this environment, so
    # the env var was already consumed — honor JAX_PLATFORMS by forcing
    # it through config.update before the first backend touch. This also
    # dodges the env-var path's intermittent hang at axon plugin
    # discovery while the TPU tunnel is down (even for =cpu).
    platforms = os.environ.get("JAX_PLATFORMS")
    import jax

    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass  # backend already initialized (module imported by tests)
    import jax.numpy as jnp
    import numpy as np

    from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
        enable_compilation_cache,
    )

    enable_compilation_cache()


# analytic conv+fc FLOPs per image at 128px (tools/perf_layers.py table);
# cross-checked at run time against XLA's cost analysis (see
# measured_flops_per_image) and in tests/test_bench_mfu.py
FLOPS_PER_IMAGE = 1.95e9
PEAK_BF16_TFLOPS = 197.0  # v5e nominal


def measured_flops_per_image(batch_size: int = 128) -> float:
    """FLOPs/image from XLA cost analysis of the single-batch forward —
    the mechanical MFU denominator (falls back to the analytic constant
    when the backend exposes no cost analysis)."""
    _import_jax()
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
    _import_jax()
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
    _import_jax()
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


def worker_main():
    """One measurement attempt. Emits the JSON line on success; exits
    non-zero on ANY failure (incl. backend init) so the driver retries."""
    fake_fail = int(os.environ.get("FACEJAX_BENCH_FAKE_FAIL", "0"))
    attempt = int(os.environ.get("FACEJAX_BENCH_ATTEMPT", "1"))
    if attempt <= fake_fail:  # retry-path test hook (tests/test_bench_mfu.py)
        log(f"FAKE_FAIL: simulated backend-init failure on attempt {attempt}")
        raise RuntimeError("Unable to initialize backend 'axon' (simulated)")
    _import_jax()
    quick = os.environ.get("FACEJAX_BENCH_QUICK") == "1"
    emb_per_sec = bench_lightcnn9_extraction(
        **({"batch_size": 8, "n_batches": 4} if quick else {}))
    try:
        flops_per_image = measured_flops_per_image(
            batch_size=8 if quick else 128)
    except Exception as e:
        log(f"flops measurement failed ({e}); using analytic constant")
        flops_per_image = FLOPS_PER_IMAGE
    extra = {}
    if not quick:
        try:
            mbu, peak_bw = measure_mbu_pct()
            extra = {"mbu_pct": round(mbu, 1),
                     "hbm_peak_gb_s": round(peak_bw, 1)}
            log(f"bound-layer MBU {mbu:.1f}% of measured {peak_bw:.0f} GB/s")
        except Exception as e:
            log(f"mbu measurement failed: {e}")
        # flagship MFU rows (VERDICT r4 item 8): the headline metric is
        # LightCNN9 for baseline continuity, but the flagship nets measure
        # higher (BASELINE.md round-4 table: LC29 40.3%, DeepFace 73.4%) —
        # surface the best defended number in the same JSON, measured
        # fresh by the same scan-chained methodology (tools/perf_extract)
        try:
            from tools.perf_extract import bench_model

            rows = {}
            for fname, fbatch in (("deepface", 256), ("lightcnn29", 128)):
                r = bench_model(fname, fbatch)
                rows[fname] = {"emb_per_sec": round(r["emb_per_sec"], 1),
                               "mfu_pct": r["mfu_pct"]}
                log(f"flagship {fname} B={fbatch}: "
                    f"{r['emb_per_sec']:.0f} emb/s, MFU {r['mfu_pct']}%")
            best = max(rows.values(), key=lambda v: v["mfu_pct"])
            extra["flagship_mfu_pct"] = best["mfu_pct"]
            extra["flagship_models"] = rows
        except Exception as e:
            log(f"flagship measurement failed: {e}")
    print(json.dumps({
        "metric": "lightcnn9_embeddings_per_sec_per_chip",
        "value": round(emb_per_sec, 1),
        "unit": "embeddings/s",
        "vs_baseline": round(emb_per_sec / BASELINE_EMB_PER_SEC, 3),
        "mfu_pct": round(emb_per_sec * flops_per_image
                         / (PEAK_BF16_TFLOPS * 1e12) * 100, 1),
        "flops_per_image": round(flops_per_image / 1e9, 3),
        "platform": jax.devices()[0].platform,
        **extra,
    }), flush=True)
    if os.environ.get("FACEJAX_BENCH_FAKE_HANG") == "1":
        # retry-path test hook: simulate the plugin hanging at interpreter
        # TEARDOWN, after the measurement was printed — the driver must
        # salvage the JSON from the timed-out worker's partial stdout
        log("FAKE_HANG: sleeping past the attempt timeout")
        time.sleep(3600)


def _parse_worker_json(stdout_text):
    """Last parseable JSON object line wins (compile logs may precede it)."""
    for line in reversed(stdout_text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def driver_main():
    """Run worker attempts in fresh subprocesses until one produces a
    non-zero measurement; emit its JSON + the attempt log. A fresh
    process per attempt guarantees a fresh backend init (jax caches a
    failed backend for the life of the process)."""
    backoff = BACKOFF_S
    if os.environ.get("FACEJAX_BENCH_BACKOFF") is not None:
        # override applies to the RETRY delays only — the first attempt
        # always starts immediately
        backoff = (0.0,) + tuple(float(os.environ["FACEJAX_BENCH_BACKOFF"])
                                 for _ in BACKOFF_S[1:])
    attempt_log = []
    result = None
    for i, delay in enumerate(backoff, start=1):
        if delay:
            log(f"bench attempt {i}/{len(backoff)}: sleeping {delay:.0f}s "
                "before retry")
            time.sleep(delay)
        env = dict(os.environ,
                   FACEJAX_BENCH_WORKER="1",
                   FACEJAX_BENCH_ATTEMPT=str(i))
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                env=env, stdout=subprocess.PIPE, stderr=sys.stderr,
                timeout=ATTEMPT_TIMEOUT_S, text=True)
            rc, out = proc.returncode, proc.stdout
        except subprocess.TimeoutExpired as e:
            # the hang can strike at TEARDOWN, after the measurement was
            # printed — salvage partial stdout exactly like the rc!=0
            # crash path below, or a real 30-min number is thrown away
            out = e.stdout or ""
            if isinstance(out, bytes):
                out = out.decode("utf-8", "replace")
            parsed = _parse_worker_json(out)
            secs = round(time.time() - t0, 1)
            if parsed is not None and parsed.get("value", 0.0) > 0.0:
                log(f"bench attempt {i}: valid JSON despite the worker "
                    "hanging at teardown — keeping it")
                attempt_log.append({"attempt": i, "rc": "timeout-salvaged",
                                    "secs": secs})
                result = parsed
                break
            attempt_log.append({"attempt": i, "rc": "timeout",
                                "secs": secs})
            log(f"bench attempt {i}: timed out after {ATTEMPT_TIMEOUT_S:.0f}s "
                "(hung backend init?)")
            continue
        entry = {"attempt": i, "rc": rc, "secs": round(time.time() - t0, 1)}
        # parse stdout regardless of rc: a worker that printed a valid
        # measurement and then crashed at interpreter teardown (plugin
        # atexit segfaults are a real accelerator failure mode) still
        # produced the number — don't throw it away and burn 4 retries
        parsed = _parse_worker_json(out)
        if parsed is not None and parsed.get("value", 0.0) > 0.0:
            if rc != 0:
                log(f"bench attempt {i}: valid JSON despite rc={rc} "
                    "(worker crashed after measuring) — keeping it")
            attempt_log.append(entry)
            result = parsed
            break
        entry["rc"] = rc if rc != 0 else "zero-value"
        attempt_log.append(entry)
        log(f"bench attempt {i} failed (rc={rc}); "
            f"{'no JSON' if parsed is None else 'value 0.0'}")
    if result is None:
        result = {
            "metric": "lightcnn9_embeddings_per_sec_per_chip",
            "value": 0.0, "unit": "embeddings/s", "vs_baseline": 0.0,
            "error": f"all {len(backoff)} attempts failed (see attempt_log)",
        }
    result["attempts"] = attempt_log
    print(json.dumps(result))


def main():
    if "--worker" in sys.argv or os.environ.get("FACEJAX_BENCH_WORKER") == "1":
        worker_main()
    else:
        driver_main()


if __name__ == "__main__":
    main()
