"""Per-layer timing of the LightCNN9 extraction path on the real chip —
the measurement step of the round-2 adversarial MFU pass (VERDICT item 7).

For each conv block (conv + MFM2 [+ pool]) this times a scan of iterations
at the bench batch size and reports achieved TFLOP/s and the HBM traffic
the layer implies at minimum (read input + write output once, bf16), so
compute-bound vs bandwidth-bound is readable per layer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.ops.mfm import (
    mfm,
    mfm_out_channels,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

B = int(os.environ.get("PL_BATCH", "256"))
ITERS = int(os.environ.get("PL_ITERS", "16"))

# (name, H, Cin, Cout, k, pool_after)  — LightCNN9 ladder at 128px input
LAYERS = [
    ("conv1", 128, 1, 96, 5, True),
    ("conv2a", 64, 48, 96, 1, False),
    ("conv2", 64, 48, 192, 3, True),
    ("conv3a", 32, 96, 192, 1, False),
    ("conv3", 32, 96, 384, 3, True),
    ("conv4a", 16, 192, 384, 1, False),
    ("conv4", 16, 192, 256, 3, False),
    ("conv5a", 16, 128, 256, 1, False),
    ("conv5", 16, 128, 256, 3, True),
]

# Flagship ladders (VERDICT r3 item 7): the two nets the reference
# actually ships. Entries are (name, H, Cin, Cout, k, pool_after, count)
# where count multiplies repeated res-block convs into the SUM. Channel
# arithmetic: efm3 narrows C -> 2C/3 after every conv, and
# EFMResBlock applies efm3 BEFORE conv_a too (Cin = 4f/9);
# geometry verified against an intercept dump of the real
# models (conv-by-conv shapes + XLA cost analysis)
# (models/lightcnn.py::LightCNN29 ladder 99/198/387/261,
# models/efm_symbol.py::EFMNet342 same ladder at 64px).
LC29_128 = [
    ("g1_conv5x5", 128, 1, 99, 5, True, 1),
    ("g2_res_a", 64, 44, 99, 3, False, 1),
    ("g2_res_b", 64, 66, 66, 3, False, 1),
    ("g2_pre1x1", 64, 66, 99, 1, False, 1),
    ("g2_conv3x3", 64, 66, 198, 3, True, 1),
    ("g3_res_a", 32, 88, 198, 3, False, 2),
    ("g3_res_b", 32, 132, 132, 3, False, 2),
    ("g3_pre1x1", 32, 132, 198, 1, False, 1),
    ("g3_conv3x3", 32, 132, 387, 3, True, 1),
    ("g4_res_a", 16, 172, 387, 3, False, 3),
    ("g4_res_b", 16, 258, 258, 3, False, 3),
    ("g4_pre1x1", 16, 258, 387, 1, False, 1),
    ("g4_conv3x3", 16, 258, 261, 3, True, 1),
    ("g5_res_a", 8, 116, 261, 3, False, 4),
    ("g5_res_b", 8, 174, 174, 3, False, 4),
    ("g5_pre1x1", 8, 174, 261, 1, False, 1),
    ("g5_conv3x3", 8, 174, 261, 3, True, 1),
]
EFM342_64 = [
    ("s1_conv5x5", 64, 1, 99, 5, True, 1),
    ("s2_res_a", 32, 44, 99, 3, False, 1),
    ("s2_res_b", 32, 66, 66, 3, False, 1),
    ("s2_conv1x1", 32, 66, 99, 1, False, 1),
    ("s2_conv3x3", 32, 66, 198, 3, True, 1),
    ("s3_res_a", 16, 88, 198, 3, False, 2),
    ("s3_res_b", 16, 132, 132, 3, False, 2),
    ("s3_conv1x1", 16, 132, 198, 1, False, 1),
    ("s3_conv3x3", 16, 132, 387, 3, True, 1),
    ("s4_res_a", 8, 172, 387, 3, False, 3),
    ("s4_res_b", 8, 258, 258, 3, False, 3),
    ("s4_conv1x1", 8, 258, 387, 1, False, 1),
    ("s4_conv3x3", 8, 258, 261, 3, True, 1),
    ("s5_res_a", 4, 116, 261, 3, False, 4),
    ("s5_res_b", 4, 174, 174, 3, False, 4),
    ("s5_conv1x1", 4, 174, 261, 1, False, 1),
    ("s5_conv3x3", 4, 174, 261, 3, True, 1),
]
LADDERS = {"lightcnn9": LAYERS, "lightcnn29": LC29_128,
           "efmnet342": EFM342_64}
# activation arity per ladder: LightCNN9 halves channels with classic MFM
# (all-even Cout); the flagship nets use the thesis 3-way EFM (C -> 2C/3,
# Cout divisible by 3 — 99/198/387/261 ladder)
LADDER_SLICES = {"lightcnn9": 2, "lightcnn29": 3, "efmnet342": 3}


def _null_baseline(iters: int = None) -> float:
    """Fixed cost of one dispatch+scalar-fetch through the (tunneled) link:
    a scan whose body is a trivial add. Subtracted from every block's total
    so per-iteration numbers reflect device compute, not link latency.
    MEASURED, never assumed — the constant differs wildly between the
    tunnel (~26 ms) and directly-attached hardware (~1 ms)."""
    if iters is None:
        iters = ITERS
    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def run(x):
        def body(acc, _):
            return acc + x.sum() * 1e-30, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=iters)
        return acc

    float(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_hbm_peak_gbs(mb: int = 128, iters: int = 256,
                         fixed_s: float | None = None) -> float:
    """MEASURED HBM bandwidth ceiling: a pure streaming kernel (x -> x*c,
    read + write of one large tensor per iteration) chained in a scan that
    carries the tensor (no hoisting possible). The roofline denominator —
    a datasheet number would let 'HBM-bound' stay an inference.

    The body must be NON-FOLDABLE: a linear body (t*c) gets reassociated
    by XLA into one multiply regardless of scan length (measured: "peak"
    then scales with iters, up to absurd 240 TB/s). abs() breaks the
    algebra, and iteration time verifiably scales with length. Measured
    on this chip (round 3): ~645-650 GB/s (79% of the 819 GB/s v5e
    spec). ``iters`` is sized so streaming work dwarfs the link's fixed
    dispatch cost, which is additionally MEASURED (``_null_baseline``)
    and subtracted — pass ``fixed_s`` to reuse an existing
    measurement."""
    n = mb * (1 << 20) // 2  # bf16 elements
    x = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.bfloat16))(
        jax.random.PRNGKey(0))

    @jax.jit
    def run(x):
        def body(t, _):
            return (jnp.abs(t) * jnp.bfloat16(0.9999)
                    + jnp.bfloat16(1e-6)), None
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y.sum(dtype=jnp.float32)

    if fixed_s is None:
        fixed_s = _null_baseline(iters)
    float(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    dt = max(min(ts) - fixed_s, 1e-9) / iters  # subtract measured dispatch
    return 2 * n * 2 / dt / 1e9  # read + write, bf16


# a block's measured window (scan total minus dispatch cost) must clear the
# tunnel's run-to-run jitter by a wide margin or per-iteration times read as
# zero; blocks faster than this rescale their scan length and re-measure
MIN_WINDOW_S = 0.05


def time_block(name, h, cin, cout, k, pool, fixed_s=0.0, ns=2):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, h, h, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(rng, 1),
                          (k, k, cin, cout), jnp.bfloat16) * 0.05
    bias = jnp.zeros((cout,), jnp.bfloat16)

    def make_run(iters):
        @jax.jit
        def run(x, w, bias):
            def body(acc, _):
                # weights depend on the carry (numerically negligible nudge)
                # so XLA cannot hoist the loop-invariant conv out of the scan
                # — without this, measured "TFLOPs" exceed chip peak by 7x
                w_dep = w + (acc * 1e-24).astype(jnp.bfloat16)
                y = jax.lax.conv_general_dilated(
                    x, w_dep, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                ) + bias.astype(jnp.float32)
                y = mfm(y.astype(jnp.bfloat16), num_slices=ns)
                if pool:
                    y = jax.lax.reduce_window(
                        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                        "VALID")
                return acc + y.sum(dtype=jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                                  length=iters)
            return acc

        return run

    def measure(iters):
        run = make_run(iters)
        _ = float(run(x, w, bias))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(x, w, bias))
            ts.append(time.perf_counter() - t0)
        return min(ts) - fixed_s

    iters = ITERS
    window = measure(iters)
    # fast blocks drown in dispatch jitter: lengthen the scan until the
    # device window itself is unambiguous (cap keeps the worst case ~1 min)
    while window < MIN_WINDOW_S and iters < 16384:
        grow = max(2, int(MIN_WINDOW_S / max(window, 1e-4) * 2))
        iters = min(iters * grow, 16384)
        window = measure(iters)
    dt = max(window, 1e-9) / iters

    flops = 2 * B * h * h * k * k * cin * cout
    out_h = h // 2 if pool else h
    bytes_min = 2 * B * (h * h * cin
                         + out_h * out_h * mfm_out_channels(cout, ns))
    return {
        "layer": name, "_dt_ms": dt * 1e3, "ms": round(dt * 1e3, 3),
        "tflops": round(flops / dt / 1e12, 1),
        "min_hbm_gb_s": round(bytes_min / dt / 1e9, 1),
        "flops_g": round(flops / 1e9, 2),
        "min_traffic_mb": round(bytes_min / 1e6, 1),
    }


PEAK_BF16_TFLOPS = 197.0  # v5e nominal (matmul-calibrated ~160 measured)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ladder", default="lightcnn9",
                    choices=sorted(LADDERS),
                    help="which net's conv geometry to profile "
                         "(lightcnn29 at 128px / efmnet342 at 64px are "
                         "the reference's shipped nets)")
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"ladder {args.ladder}, batch {B}, iters {ITERS}, "
          f"device {jax.devices()}", file=sys.stderr, flush=True)
    fixed_s = _null_baseline()
    print(f"null-scan fixed dispatch cost: {fixed_s * 1e3:.1f} ms "
          f"(subtracted from every block)", file=sys.stderr, flush=True)
    peak_bw = measure_hbm_peak_gbs()
    print(json.dumps({"hbm_peak_gb_s_measured": round(peak_bw, 1)}),
          flush=True)
    rows = []
    total_ms = 0.0
    ns = LADDER_SLICES[args.ladder]
    for cfg in LADDERS[args.ladder]:
        count = cfg[6] if len(cfg) > 6 else 1
        cfg = cfg[:6]
        r = time_block(*cfg, fixed_s=fixed_s, ns=ns)
        name, h, cin, cout, k, pool = cfg
        if count > 1:
            r["count"] = count
        # three-term roofline (ms): raw MXU peak; MXU derated by the
        # contraction-depth structure (K < 128 wastes systolic lanes —
        # the stem's K=25 problem, DESIGN.md); measured HBM streaming
        t_mxu = r["flops_g"] / PEAK_BF16_TFLOPS  # GFLOP/TFLOPS = ms
        k_util = min(1.0, (k * k * cin) / 128.0)
        t_struct = t_mxu / k_util
        t_hbm = r["min_traffic_mb"] / peak_bw     # MB/(GB/s) = ms
        terms = {"mxu": t_mxu, "mxu-kstruct": t_struct, "hbm": t_hbm}
        r["bound"] = max(terms, key=terms.get)
        # when the whole working set fits VMEM, the scan can keep tensors
        # resident and the benchmark cannot observe HBM traffic — flag it
        # (apparent GB/s above peak on small layers is this artifact)
        if r["min_traffic_mb"] < 128:  # v5e VMEM size: scan residency
            r["bound"] += "(fits-vmem)"
        dt_ms = max(r.pop("_dt_ms"), 1e-6)  # clock-granularity floor
        r["pct_bw_roofline"] = round(r["min_hbm_gb_s"] / peak_bw * 100, 1)
        r["pct_roofline"] = round(max(terms.values()) / dt_ms * 100, 1)
        rows.append(r)
        total_ms += dt_ms * count
        print(json.dumps(r), flush=True)
    hbm_rows = [r for r in rows if r["bound"] == "hbm"]
    summary = {
        "layer": "SUM(blocks)", "ms": round(total_ms, 3),
        "emb_per_sec_implied": round(B / total_ms * 1e3, 1),
        "hbm_bound_layers": [r["layer"] for r in hbm_rows],
        "hbm_bound_pct_bw_roofline": {
            r["layer"]: r["pct_bw_roofline"] for r in hbm_rows},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
