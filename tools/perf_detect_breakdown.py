"""Per-stage on-chip cost breakdown of the fused MTCNN cascade.

VERDICT r2 item 2 asks where the 10.6 ms/img at 250px actually goes: the
stage forwards are a few hundred MFLOPs, so the suspicion is that the
SEQUENTIAL fixed-capacity NMS scans (10 x 128 per-scale iterations +
256 cross-scale + stage-2/3 passes, ops/boxes.py::nms_jax) dominate, not
the convs. Each component is timed with the bench.py methodology: K
repetitions chained in ONE lax.scan whose body depends on the carry (no
hoisting), scalar fetch, null-scan baseline subtracted.

    python tools/perf_detect_breakdown.py [--size 250] [--reps 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from improving_face_recognition_performance_using_triplet_loss_tpu.utils import (
    enable_compilation_cache,
)

enable_compilation_cache()


def timed_scan(fn, reps, *args, fixed_s: float = 0.0,
               min_window_s: float = 0.0):
    """Time fn chained `reps` times; body perturbs inputs by the carry so
    XLA cannot hoist it out of the scan. ``fixed_s`` is a measured
    per-dispatch fixed cost (tools/perf_layers.py::_null_baseline) to
    subtract from the total before dividing — the shared methodology for
    every tools/ benchmark (perf_backward, perf_nms_adversarial use this
    same function; perf_layers.time_block predates it).

    ``min_window_s`` > 0 makes the measurement adaptive: if the device
    window (scan total minus ``fixed_s``) is below it, the scan is
    lengthened and re-measured so fast ops don't drown in the tunnel's
    per-dispatch jitter (which reads as 0.0 ms / absurd TFLOPs)."""

    def make_run(length):
        @jax.jit
        def run(args):
            def body(acc, _):
                nudged = jax.tree_util.tree_map(
                    lambda a: (a + acc * 1e-20).astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, args)
                out = fn(*nudged)
                leaves = [jnp.sum(
                    jnp.where(jnp.isfinite(x.astype(jnp.float32)),
                              x.astype(jnp.float32), 0.0))
                    for x in jax.tree_util.tree_leaves(out)]
                return acc + sum(leaves) * 1e-20, None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), None, length=length)
            return acc

        return run

    def measure(length):
        run = make_run(length)
        t0 = time.perf_counter()
        _ = float(run(args))
        compile_s = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(args))
            best = min(best, time.perf_counter() - t0)
        return best - fixed_s, compile_s

    window, compile_s = measure(reps)
    while window < min_window_s and reps < 16384:
        grow = max(2, int(min_window_s / max(window, 1e-4) * 2))
        reps = min(reps * grow, 16384)
        window, _ = measure(reps)
    return max(window, 1e-9) / reps * 1e3, compile_s  # ms per rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=250)
    ap.add_argument("--reps", type=int, default=64)
    args = ap.parse_args()

    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.device_cascade import (
        crop_resize_boxes,
        make_device_cascade,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.device_pnet import (
        make_device_stage1,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.detect.pipeline import (
        MTCNNDetector,
        pyramid_scales,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.models.mtcnn import (
        onet_forward,
        pnet_forward,
        rnet_forward,
    )
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.boxes import (
        nms_jax,
    )

    print("devices:", jax.devices(), file=sys.stderr)
    h = w = args.size
    det = MTCNNDetector(seed=0)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 255, (h, w, 3)), jnp.float32)
    scales = pyramid_scales(h, w, 20, 0.709)
    print(f"{args.size}px, {len(scales)} pyramid scales", file=sys.stderr)

    ms_null, _ = timed_scan(lambda x: x * 1.0000001, args.reps, img)
    rows = [("null scan overhead", ms_null)]

    def sub(name, fn, *a):
        ms, comp = timed_scan(fn, args.reps, *a)
        rows.append((name, ms - ms_null))
        print(f"  {name}: {ms - ms_null:.3f} ms (compile {comp:.0f}s)",
              file=sys.stderr)

    # --- stage 1 convs ONLY: resize + PNet per scale, no decode/NMS
    def s1_convs(im):
        outs = []
        for scale in scales:
            hs = int(np.ceil(h * scale))
            ws = int(np.ceil(w * scale))
            x = jax.image.resize(im, (hs, ws, 3), method="linear")
            x = (x - 127.5) * 0.0078125
            prob, reg = pnet_forward(det.pnet_params,
                                     jnp.transpose(x, (1, 0, 2))[None])
            outs.append(jnp.sum(prob) + jnp.sum(reg))
        return sum(outs)

    sub("stage1 convs (resize+pnet, all scales)", s1_convs, img)

    # --- stage 1 complete (convs + decode + per-scale & cross-scale NMS)
    stage1 = make_device_stage1(det.pnet_params, h, w, threshold=0.3)
    sub("stage1 full", stage1, img)

    # --- NMS isolated at the cascade's shapes
    cand = jnp.asarray(
        np.concatenate([rng.uniform(0, args.size, (1280, 4)),
                        rng.uniform(0.3, 1.0, (1280, 1))], axis=1),
        jnp.float32)

    def nms_per_scale(c):
        # 10 independent [128, 5] passes, the per-scale structure
        return [nms_jax(c[i * 128:(i + 1) * 128], 0.5, "Union")
                for i in range(10)]

    sub("NMS 10 x [128] (per-scale shape)", nms_per_scale, cand)
    sub("NMS [1280]->256 (cross-scale shape)",
        lambda c: nms_jax(c, 0.7, "Union", max_out=256), cand)
    sub("NMS [256]->128 (stage2 shape)",
        lambda c: nms_jax(c[:256], 0.7, "Union", max_out=128), cand)

    # parallel fixed-point NMS at the same shapes (what the cascade uses)
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.boxes import (
        nms_mask_jax,
    )

    sub("maskNMS 10 x [128] (vmapped)",
        lambda c: jax.vmap(lambda b: nms_mask_jax(b, 0.5, "Union"))(
            c.reshape(10, 128, 5)), cand)
    sub("maskNMS [1280] (cross-scale)",
        lambda c: nms_mask_jax(c, 0.7, "Union"), cand)

    # one-dispatch Pallas NMS at the same shapes (round-5: the scan+while
    # dispatch overhead above was 62% of the fused frame)
    from improving_face_recognition_performance_using_triplet_loss_tpu.ops.pallas.nms_kernel import (
        nms_mask_pallas,
        nms_mask_pallas_batched,
    )

    sub("pallasNMS 10 x [128] (one grid call)",
        lambda c: nms_mask_pallas_batched(c.reshape(10, 128, 5), 0.5,
                                          "Union"), cand)
    sub("pallasNMS [1280] (cross-scale)",
        lambda c: nms_mask_pallas(c, 0.7, "Union"), cand)

    # --- crops + stage 2/3 forwards at capacity
    boxes = jnp.asarray(
        np.concatenate([rng.uniform(0, args.size - 48, (256, 2)),
                        rng.uniform(48, args.size, (256, 2))], axis=1),
        jnp.float32)
    sub("crop_resize 256 -> 24px", lambda im, b:
        crop_resize_boxes(im, b, 24), img, boxes)
    sub("crop_resize 64 -> 48px", lambda im, b:
        crop_resize_boxes(im, b[:64], 48), img, boxes)
    crops24 = jnp.asarray(rng.normal(size=(256, 24, 24, 3)), jnp.float32)
    crops48 = jnp.asarray(rng.normal(size=(64, 48, 48, 3)), jnp.float32)
    sub("rnet [256]", lambda x: rnet_forward(det.rnet_params, x), crops24)
    sub("onet [64]", lambda x: onet_forward(det.onet_params, x), crops48)

    # --- the whole cascade
    cascade = make_device_cascade(det.pnet_params, det.rnet_params,
                                  det.onet_params, h, w,
                                  thresholds=(0.3, 0.3, 0.3),
                                  use_pallas_nms=False)
    sub("FULL cascade (XLA maskNMS)", cascade, img)
    cascade_p = make_device_cascade(det.pnet_params, det.rnet_params,
                                    det.onet_params, h, w,
                                    thresholds=(0.3, 0.3, 0.3),
                                    use_pallas_nms=True)
    sub("FULL cascade (pallas NMS)", cascade_p, img)

    print(f"\n{args.size}px breakdown (ms on-chip, null-subtracted):")
    for name, ms in rows:
        print(f"  {name:42s} {ms:7.3f}")


if __name__ == "__main__":
    main()
