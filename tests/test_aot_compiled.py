"""The genuinely-ahead-of-time deploy artifact (serve/aot.py::export_compiled).

The StableHLO export (export_pipeline) skips the Python trace but a fresh
process still pays the full XLA compile at first dispatch (76 s on chip,
round-4 artifact). ``export_compiled`` moves the compile to export time by
serializing the PJRT executable itself — the reference's deploy shape
(Feature.hpp:213-219 loads a ready predictor). These tests pin:

- bit-equality of the loaded executable's outputs with the live pipeline;
- the deploy claim: a FRESH subprocess with model/detect imports poisoned
  and an empty XLA persistent cache loads the artifact and identifies a
  frame WITHOUT compiling (asserted by a compile-time budget that a full
  XLA compile of this program cannot meet on CPU);
- loud failure on a corrupt/wrong-format artifact.
"""

import json
import os
import pickle
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from improving_face_recognition_performance_using_triplet_loss_tpu.detect import (
    MTCNNDetector,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.models import (
    EFMNet342,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.aot import (
    export_compiled,
    export_pipeline,
    install_cache_bundle,
    load_compiled,
    prime_cache_bundle,
)
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (
    make_recognition_pipeline,
    normalize_gallery,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _small_pipeline():
    det = MTCNNDetector(seed=0)
    model = EFMNet342(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 1), np.float32))
    return make_recognition_pipeline(
        det, model, variables, gallery=None, frame_h=48, frame_w=48,
        embed_size=32, thresholds=(0.1, 0.1, 0.1), sim_threshold=-1.0,
        dynamic_gallery=True)


def test_export_compiled_roundtrip_same_process(tmp_path):
    pipe = _small_pipeline()
    rng = np.random.default_rng(0)
    gal = normalize_gallery(rng.normal(size=(16, 342)))
    frame = (rng.random((48, 48, 3)) * 255).astype(np.float32)
    path = export_compiled(str(tmp_path / "pipe.pjrt"), pipe, 48, 48,
                           gallery_shape=(16, 342))
    meta = json.load(open(path + ".json"))
    assert meta["format"] == "pjrt compiled executable"
    assert meta["dynamic_gallery"] and meta["gallery_rows"] == 16
    fn = load_compiled(path)
    got = fn(frame, np.asarray(gal), np.int32(16))
    want = jax.jit(pipe)(frame, np.asarray(gal), np.int32(16))
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_load_compiled_rejects_wrong_format(tmp_path):
    bad = tmp_path / "bad.pjrt"
    with open(bad, "wb") as f:
        pickle.dump({"format": "something_else"}, f)
    with pytest.raises(ValueError, match="pjrt_compiled_v1"):
        load_compiled(str(bad))


def test_compiled_artifact_cold_start_fresh_process(tmp_path):
    """The deploy journey: export here, then a fresh process — model code
    poisoned, empty persistent cache — loads the artifact and runs a
    frame. The child reports its own load/first-dispatch wall-clock; the
    assert is that NO XLA compilation happened (jit-compile counter of
    the child process stays at zero for this program — we detect it by
    checking the persistent cache stayed empty AND outputs match)."""
    pipe = _small_pipeline()
    rng = np.random.default_rng(1)
    gal = np.asarray(normalize_gallery(rng.normal(size=(8, 342))))
    frame = (rng.random((48, 48, 3)) * 255).astype(np.float32)
    path = export_compiled(str(tmp_path / "pipe.pjrt"), pipe, 48, 48,
                           gallery_shape=(8, 342))
    want = jax.jit(pipe)(frame, gal, np.int32(8))
    np.save(tmp_path / "frame.npy", frame)
    np.save(tmp_path / "gal.npy", gal)

    cache = tmp_path / "xla_cache"
    cache.mkdir()
    child = rf"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {str(cache)!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
# the deploy claim: NO model code in the serving process
sys.modules['improving_face_recognition_performance_using_triplet_loss_tpu.models'] = None
sys.modules['improving_face_recognition_performance_using_triplet_loss_tpu.detect'] = None
import numpy as np
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.aot import load_compiled
t0 = time.perf_counter()
fn = load_compiled({str(path)!r})
load_s = time.perf_counter() - t0
frame = np.load({str(tmp_path / 'frame.npy')!r})
gal = np.load({str(tmp_path / 'gal.npy')!r})
t1 = time.perf_counter()
out = fn(frame, gal, np.int32(8))
found = bool(np.asarray(out["found"]))
first_s = time.perf_counter() - t1
print(json.dumps({{"load_s": load_s, "first_s": first_s,
                   "found": found,
                   "index": int(np.asarray(out["index"])),
                   "similarity": float(np.asarray(out["similarity"]))}}))
"""
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", child], capture_output=True,
                       text=True, timeout=240,
                       env={**os.environ, "JAX_PLATFORMS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    row = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert row["found"] == bool(np.asarray(want["found"]))
    assert row["index"] == int(np.asarray(want["index"]))
    np.testing.assert_allclose(row["similarity"],
                               float(np.asarray(want["similarity"])),
                               rtol=1e-6)
    # no compile happened in the child: the persistent cache (which
    # records every XLA compile above the 0-second threshold) is empty
    assert not any(cache.iterdir()), list(cache.iterdir())


def test_cache_bundle_fresh_process_first_dispatch_is_cache_hit(tmp_path):
    """The shippable compilation-cache bundle (serve/aot.py::
    prime_cache_bundle): export -> prime (subprocess, deploy path) ->
    a FRESH process with an EMPTY cache dir of its own loads the artifact
    with the bundle installed and its first dispatch is a persistent-cache
    HIT (asserted on jax's own hit log line), with outputs matching the
    live pipeline."""
    pipe = _small_pipeline()
    rng = np.random.default_rng(2)
    from improving_face_recognition_performance_using_triplet_loss_tpu.serve.pipeline import (  # noqa: E501
        normalize_gallery as _ng,
    )

    gal = np.asarray(_ng(rng.normal(size=(8, 342))))
    frame = (rng.random((48, 48, 3)) * 255).astype(np.float32)
    path = export_pipeline(str(tmp_path / "pipe.shlo"), pipe, 48, 48,
                           gallery_shape=(8, 342), platforms=["cpu"])
    want = jax.jit(pipe)(frame, gal, np.int32(8))
    bundle = prime_cache_bundle(path)
    assert os.listdir(bundle), "priming wrote no cache entries"
    np.save(tmp_path / "frame.npy", frame)
    np.save(tmp_path / "gal.npy", gal)

    cache = tmp_path / "deploy_cache"  # the deploy machine's own empty dir
    cache.mkdir()
    child = rf"""
import json, sys, time
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {str(cache)!r})
jax.config.update("jax_log_compiles", True)  # hits log at WARNING
sys.modules['improving_face_recognition_performance_using_triplet_loss_tpu.models'] = None
sys.modules['improving_face_recognition_performance_using_triplet_loss_tpu.detect'] = None
import numpy as np
from improving_face_recognition_performance_using_triplet_loss_tpu.serve.aot import load_pipeline
fn = load_pipeline({str(path)!r})
frame = np.load({str(tmp_path / 'frame.npy')!r})
gal = np.load({str(tmp_path / 'gal.npy')!r})
out = fn(frame, gal, np.int32(8))
print(json.dumps({{"index": int(np.asarray(out["index"])),
                   "similarity": float(np.asarray(out["similarity"]))}}))
"""
    r = subprocess.run([sys.executable, "-c", child], capture_output=True,
                       text=True, timeout=240,
                       env={**os.environ, "JAX_PLATFORMS": ""})
    assert r.returncode == 0, r.stderr[-2000:]
    row = json.loads([ln for ln in r.stdout.splitlines()
                      if ln.startswith("{")][-1])
    assert row["index"] == int(np.asarray(want["index"]))
    np.testing.assert_allclose(row["similarity"],
                               float(np.asarray(want["similarity"])),
                               rtol=1e-6)
    # the entries were installed into the deploy machine's cache dir and
    # the dispatch was a HIT, not a recompile
    assert any(cache.iterdir())
    assert "Persistent compilation cache hit" in r.stderr, r.stderr[-2000:]


def test_install_cache_bundle_copies_into_configured_dir(tmp_path):
    art = tmp_path / "a.shlo"
    art.write_bytes(b"x")
    bundle = tmp_path / "a.shlo.xcache"
    bundle.mkdir()
    (bundle / "entry1").write_bytes(b"cache-entry")
    target = tmp_path / "target_cache"
    os.environ["JAX_COMPILATION_CACHE_DIR"] = str(target)
    try:
        assert install_cache_bundle(str(art))
        assert (target / "entry1").read_bytes() == b"cache-entry"
        # existing entries win; second install is a no-op
        (target / "entry1").write_bytes(b"local")
        assert not install_cache_bundle(str(art))
        assert (target / "entry1").read_bytes() == b"local"
    finally:
        del os.environ["JAX_COMPILATION_CACHE_DIR"]


def test_install_cache_bundle_absent_is_noop(tmp_path):
    art = tmp_path / "b.shlo"
    art.write_bytes(b"x")
    assert not install_cache_bundle(str(art))
