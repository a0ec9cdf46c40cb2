"""Cold-start of the PRODUCTION serving artifact on the real chip
(VERDICT r3 item 8's pending number): one StableHLO file serving N
streams against a runtime DeviceGallery — how long from "fresh process,
nothing warm" to the first identified frame?

The reference's deploy shape is symbol+params loaded by a serving
process (Feature.hpp:213-219); its cold start is an MXNet graph bind.
Ours is jax.export deserialize + first-dispatch XLA compile, so the
figure has two regimes:

  COMPILED — serialized PJRT executable (serve/aot.py::export_compiled):
          load is deserialize-only, no XLA compile anywhere.
  BUNDLE — StableHLO + shipped .xcache compilation-cache bundle
          (prime_cache_bundle): a machine that never compiled this
          program hits the cache on first dispatch.
  COLD  — bare StableHLO, empty persistent compilation cache: first
          dispatch pays the full XLA compile of the deserialized module.
  WARM  — the cache dir already holds this program (a prior process on
          this machine ran it): first dispatch is a cache hit.

Both matter in production (first-ever deploy vs process restart), so the
script measures both, each in its OWN fresh subprocess with model
imports poisoned — the same strictness as
tests/test_fused_pipeline.py::test_aot_multistream_dynamic_gallery_cold_start.

The parent process never imports jax (bench.py's retry-driver rule: a
subprocess owns every backend init), so a tunnel hiccup in one stage
can't wedge the driver.

    python tools/perf_aot_coldstart.py [--streams 16] [--frame-size 250 250]
        [--gallery-rows 100000] [--reps 16]

Output: one JSON line per regime plus a steady-state ms/frame row.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXPORT_STAGE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import jax
from improving_face_recognition_performance_using_triplet_loss_tpu.cli import export_aot
from improving_face_recognition_performance_using_triplet_loss_tpu.models import EFMNet342
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.device_gallery import DeviceGallery
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.export import export_params

work = {work!r}
streams, g_rows, fh, fw = {streams}, {g_rows}, {fh}, {fw}
dim = 342
model = EFMNet342(num_classes=8)
variables = model.init(jax.random.PRNGKey(0),
                       np.zeros((1, 64, 64, 1), np.float32))
export_dir = os.path.join(work, "export")
export_params(export_dir, variables["params"], model_name="efmnet342",
              feature_dim=dim, input_hw=(64, 64), input_channels=1)
t0 = time.perf_counter()
path = export_aot.main([
    "--export-dir", export_dir,
    "--dynamic-gallery-rows", str(g_rows),
    "--streams", str(streams),
    "--frame-size", str(fh), str(fw),
    "--embed-size", "64",
    "--compiled-out", os.path.join(work, "pipe_ms.pjrt"),
    "--out", os.path.join(work, "pipe_ms.shlo")])
export_s = time.perf_counter() - t0
rng = np.random.default_rng(0)
enrolled = rng.normal(size=(min(4096, g_rows), dim)).astype(np.float32)
dg = DeviceGallery.from_rows(enrolled, capacity=g_rows)
np.savez(os.path.join(work, "gal_state.npz"),
         gallery_n=np.asarray(dg.gallery_n), rows=int(dg.rows))
frames = (rng.random((streams, fh, fw, 3)) * 255).astype(np.float32)
np.save(os.path.join(work, "frames.npy"), frames)
print(json.dumps({{"stage": "export", "artifact": path,
                  "bytes": os.path.getsize(path), "export_s": export_s,
                  "platforms": json.load(open(path + ".json"))["platforms"]}}))
"""

SERVE_STAGE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
# the deploy claim: NO model code in the serving process
sys.modules['improving_face_recognition_performance_using_triplet_loss_tpu.models'] = None
sys.modules['improving_face_recognition_performance_using_triplet_loss_tpu.detect'] = None
import numpy as np
work = {work!r}
t0 = time.perf_counter()
if {compiled!r} == "compiled":
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.aot import load_compiled
    fn = load_compiled(os.path.join(work, "pipe_ms.pjrt"))
else:
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.aot import load_pipeline
    # cold/warm measure the bare-StableHLO regimes: the .xcache bundle (if
    # primed) must only help the "bundle" regime
    fn = load_pipeline(os.path.join(work, "pipe_ms.shlo"),
                       use_cache_bundle={use_bundle})
load_s = time.perf_counter() - t0
z = np.load(os.path.join(work, "gal_state.npz"))
gal, rows = z["gallery_n"], np.int32(z["rows"])
frames = np.load(os.path.join(work, "frames.npy"))
t1 = time.perf_counter()
out = fn(frames, gal, rows)
idx = np.asarray(out["index"])
first_s = time.perf_counter() - t1
import jax
gal_d = jax.device_put(gal)
frames_d = jax.device_put(frames)
jax.block_until_ready(fn(frames_d, gal_d, rows))
t2 = time.perf_counter()
for _ in range({reps}):
    out = fn(frames_d, gal_d, rows)
jax.block_until_ready(out["index"])
steady_ms = (time.perf_counter() - t2) / {reps} * 1e3
print(json.dumps({{"regime": {regime!r}, "load_s": round(load_s, 3),
                  "first_dispatch_s": round(first_s, 3),
                  "cold_start_s": round(load_s + first_s, 3),
                  "steady_ms_per_dispatch": round(steady_ms, 3),
                  "ms_per_frame": round(steady_ms / {streams}, 4),
                  "index0": int(idx[0])}}))
"""


def run_stage(code, env, timeout):
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=timeout, env=env, cwd=REPO)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"stage failed rc={r.returncode}")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--frame-size", type=int, nargs=2, default=(250, 250),
                    metavar=("H", "W"))
    ap.add_argument("--gallery-rows", type=int, default=100_000)
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-stage seconds (tunnel compiles are slow)")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="aot_coldstart_")
    cache = os.path.join(work, "xla_cache")
    os.makedirs(cache, exist_ok=True)
    base_env = {**os.environ, "JAX_COMPILATION_CACHE_DIR": cache,
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "1.0"}
    fh, fw = args.frame_size
    try:
        exp = run_stage(
            EXPORT_STAGE.format(repo=REPO, work=work, streams=args.streams,
                                g_rows=args.gallery_rows, fh=fh, fw=fw),
            base_env, args.timeout)
        exp.update(streams=args.streams, frame=[fh, fw],
                   gallery_rows=args.gallery_rows)
        print(json.dumps(exp))
        # prime the shippable .xcache bundle through the deploy path (its
        # own subprocess tree, its own cache dir = the bundle itself)
        prime_code = (
            "import sys; sys.path.insert(0, {repo!r});\n"
            "from improving_face_recognition_performance_using_triplet_loss_tpu"
            ".serve.aot import prime_cache_bundle;\n"
            "import json, os, time; t0 = time.perf_counter();\n"
            "b = prime_cache_bundle(os.path.join({work!r}, 'pipe_ms.shlo'));\n"
            "print(json.dumps({{'stage': 'prime_bundle',"
            " 'prime_s': round(time.perf_counter() - t0, 1),"
            " 'entries': len(os.listdir(b))}}))"
        ).format(repo=REPO, work=work)
        print(json.dumps(run_stage(prime_code, dict(os.environ),
                                   args.timeout)))
        # "compiled" and "bundle" each get their own EMPTY cache: they must
        # reach the first identified frame without this machine ever having
        # compiled the program (the truly-AOT artifacts, VERDICT r4 item 2);
        # then the StableHLO cold/warm pair shares the persistent cache as
        # before (bundle auto-install disabled there so cold stays cold).
        for regime, kind in (("compiled", "compiled"), ("bundle", "shlo"),
                             ("cold", "shlo"), ("warm", "shlo")):
            env = base_env
            if regime in ("compiled", "bundle"):
                ccache = os.path.join(work, f"xla_cache_{regime}")
                os.makedirs(ccache, exist_ok=True)
                env = {**base_env, "JAX_COMPILATION_CACHE_DIR": ccache,
                       "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5"}
            row = run_stage(
                SERVE_STAGE.format(repo=REPO, work=work, regime=regime,
                                   reps=args.reps, streams=args.streams,
                                   compiled=kind,
                                   use_bundle=(regime == "bundle")),
                env, args.timeout)
            if regime in ("compiled", "bundle"):
                row["xla_cache_entries_written"] = len(os.listdir(ccache))
            print(json.dumps(row))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
