"""Per-layer BACKWARD roofline of the training path (VERDICT r3 item 3).

Round 3 measured train-step MFU flat at 22-24.5% and attributed it to the
backward filter-gradient convs "hitting the same small-channel ceiling" —
from a profiler trace, not a per-layer measurement. This tool gives the
backward pass the same treatment the forward got (tools/perf_layers.py):
for every conv of the LightCNN9 ladder it times, as separate programs,

  fwd   y  = conv(x, w)                      (the forward baseline)
  dx    dx = vjp wrt x                       (XLA: conv of dy with w^T)
  dw    dw = vjp wrt w                       (XLA: batch-contraction conv)
  dw-im2col  explicit patches^T @ dy matmul  (counter-experiment A)

each with FLOPs = 2*B*H*W*k^2*Cin*Cout and a three-term roofline
(raw MXU / structure-derated MXU / measured HBM streaming). The
structural derate differs per direction:

  fwd:  K = k^2*Cin   (contraction depth vs the 128-deep systolic axis)
  dx:   K = k^2*Cout, but OUTPUT lanes = Cin (the stem's Cin=1 makes dx
        structurally terrible — and irrelevant: conv1's dx is the data
        gradient, which training never needs; the tool reports it anyway)
  dw:   K = B*H*W (huge, fine); OUTPUT tile is [k^2*Cin, Cout] — M =
        k^2*Cin < 128 wastes output rows exactly like the forward's K
        problem, shifted one edge over.

Counter-experiment A reformulates dw as an explicit im2col matmul
(patches [BHW, k^2 Cin]^T @ dy [BHW, Cout]): same FLOPs, same structural
M, but the clean matmul lowering sidesteps whatever XLA's
grad-conv lowering adds on top. ops/conv_backward.py wires the winner
into the train step behind a flag; parity is pinned in
tests/test_train_steps.py.

    PL_BATCH=64 python tools/perf_backward.py           # train batch
    python tools/perf_backward.py --layers conv1,conv2  # subset
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

B = int(os.environ.get("PL_BATCH", "64"))
ITERS = int(os.environ.get("PL_ITERS", "16"))

from tools.perf_layers import (  # noqa: E402
    LADDERS,
    PEAK_BF16_TFLOPS,
    _null_baseline,
    measure_hbm_peak_gbs,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.ops.conv_backward import (  # noqa: E402
    filter_grad_im2col,
    input_grad,
)


def _conv(x, w):
    # plain bf16 conv, exactly what flax nn.Conv(dtype=bf16) emits in the
    # production models (the MXU accumulates f32 internally regardless);
    # no explicit preferred_element_type so the vjp keeps uniform dtypes
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _timed(fn, args, fixed_s):
    """Shared bench methodology (perf_detect_breakdown.timed_scan): ITERS
    reps chained in one carry-dependent scan, scalar fetch, min of 3,
    measured fixed dispatch cost subtracted. Returns SECONDS per rep."""
    from tools.perf_detect_breakdown import timed_scan

    ms, _ = timed_scan(fn, ITERS, *args, fixed_s=fixed_s,
                       min_window_s=0.05)
    return ms / 1e3


def measure_layer(name, h, cin, cout, k, _pool, fixed_s, peak_bw,
                  case_subset=None):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, h, h, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.fold_in(key, 1),
                          (k, k, cin, cout), jnp.bfloat16) * 0.05
    dy = jax.random.normal(jax.random.fold_in(key, 2),
                           (B, h, h, cout), jnp.bfloat16)

    def dx_fn(dy_, w_):
        _, vjp = jax.vjp(lambda xx: _conv(xx, w_), x)
        return vjp(dy_)[0]

    def dw_fn(dy_, x_):
        _, vjp = jax.vjp(lambda ww: _conv(x_, ww), w)
        return vjp(dy_)[0]

    flops = 2 * B * h * h * k * k * cin * cout
    rows = []

    def util(kdim, lanes):
        # MXU structural ceiling: contraction depth vs the 128-deep
        # systolic axis x output minor dim vs the 128 lanes
        return min(1.0, kdim / 128.0) * min(1.0, lanes / 128.0)

    cases = {
        # (timer, structural utilization ceiling, min HBM bytes)
        "fwd": (lambda: _timed(lambda xx, ww: _conv(xx, ww), (x, w),
                               fixed_s),
                util(k * k * cin, cout),
                2 * B * h * h * (cin + cout)),
        "dx": (lambda: _timed(dx_fn, (dy, w), fixed_s),
               util(k * k * cout, cin),
               2 * B * h * h * (cout + cin)),
        # dw contracts over B*H*W (>=128 always); M rows = k^2*Cin
        "dw": (lambda: _timed(dw_fn, (dy, x), fixed_s),
               util(128, cout) * min(1.0, k * k * cin / 128.0),
               2 * B * h * h * (cin + cout)),
        "dw-im2col": (lambda: _timed(
            lambda dy_, x_: filter_grad_im2col(x_, dy_, k, "SAME"),
            (dy, x), fixed_s),
            util(128, cout) * min(1.0, k * k * cin / 128.0),
            2 * B * h * h * (cin + cout)),
        # counter-experiment B1: does the accumulator dtype move the dw
        # matmul at all (measurement-only — production keeps f32)
        "dw-im2col-bf16acc": (lambda: _timed(
            lambda dy_, x_: filter_grad_im2col(x_, dy_, k, "SAME",
                                               preferred=jnp.bfloat16),
            (dy, x), fixed_s),
            util(128, cout) * min(1.0, k * k * cin / 128.0),
            2 * B * h * h * (cin + cout)),
        # counter-experiment B2: dx as the textbook explicit conv of dy
        # with the flipped IO-transposed kernel vs XLA's vjp lowering
        "dx-explicit": (lambda: _timed(
            lambda dy_, w_: input_grad(dy_, w_), (dy, w), fixed_s),
            util(k * k * cout, cin),
            2 * B * h * h * (cout + cin)),
    }
    for case, (timer, k_util, bytes_min) in cases.items():
        if case_subset and case not in case_subset:
            continue
        dt = timer()
        t_mxu = flops / PEAK_BF16_TFLOPS / 1e9  # ms
        t_struct = t_mxu / max(k_util, 1e-6)
        t_hbm = bytes_min / peak_bw / 1e6       # ms
        terms = {"mxu": t_mxu, "mxu-struct": t_struct, "hbm": t_hbm}
        bound = max(terms, key=terms.get)
        if bytes_min / 1e6 < 128:
            bound += "(fits-vmem)"
        rows.append({
            "layer": name, "case": case, "ms": round(dt * 1e3, 3),
            "tflops": round(flops / dt / 1e12, 1),
            "pct_roofline": round(max(terms.values()) / (dt * 1e3) * 100, 1),
            "bound": bound,
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="",
                    help="comma-separated subset of layer names")
    ap.add_argument("--ladder", default="lightcnn9", choices=sorted(LADDERS),
                    help="conv geometry table (same tables as perf_layers; "
                         "repeated res-block convs weight the totals by "
                         "their count)")
    ap.add_argument("--cases", default="",
                    help="comma-separated subset of cases (e.g. fwd,dx,dw "
                         "skips the slow im2col counter-experiments on the "
                         "big ladders)")
    args = ap.parse_args()
    enable_compilation_cache()
    print(f"batch {B}, iters {ITERS}, device {jax.devices()}",
          file=sys.stderr, flush=True)
    fixed_s = _null_baseline(ITERS)
    print(f"null-scan fixed dispatch cost: {fixed_s * 1e3:.1f} ms",
          file=sys.stderr, flush=True)
    peak_bw = measure_hbm_peak_gbs(fixed_s=_null_baseline(256))
    print(json.dumps({"hbm_peak_gb_s_measured": round(peak_bw, 1)}),
          flush=True)
    subset = set(args.layers.split(",")) if args.layers else None
    totals: dict[str, float] = {}
    for cfg in LADDERS[args.ladder]:
        count = cfg[6] if len(cfg) > 6 else 1
        cfg = cfg[:6]
        if subset and cfg[0] not in subset:
            continue
        case_subset = set(args.cases.split(",")) if args.cases else None
        for r in measure_layer(*cfg, fixed_s=fixed_s, peak_bw=peak_bw,
                               case_subset=case_subset):
            if count > 1:
                r["count"] = count
            print(json.dumps(r), flush=True)
            totals[r["case"]] = totals.get(r["case"], 0.0) + r["ms"] * count
    print(json.dumps({"totals_ms": {k: round(v, 3)
                                    for k, v in totals.items()}}),
          flush=True)


if __name__ == "__main__":
    main()
