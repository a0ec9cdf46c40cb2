"""Ahead-of-time pipeline export: serialize the fused recognition pipeline
to a StableHLO artifact that later processes LOAD AND RUN without
retracing or recompiling Python model code.

The reference's deployment story is exactly this shape: training exports a
symbol graph + params that the C++ serving process loads and executes
(Feature.hpp:163-205) — the net's Python definition never ships. Here
``export_pipeline`` captures the WHOLE fused program (MTCNN cascade +
crop + embedding net + gallery matmul) via jax.export; ``load_pipeline``
deserializes and calls it. Cold tracing+compilation of the 250px pipeline
costs minutes through the dev tunnel; the serialized artifact skips the
trace entirely (XLA compile of the deserialized module is cached like any
jit).

The artifact pins the export platform (cpu/tpu) and the frame shape. The
gallery ships one of two ways: BAKED at export time (the default —
re-export on enrollment changes), or as a RUNTIME ARGUMENT
(``gallery_shape=(G, D)`` with a ``dynamic_gallery=True`` pipeline): one
artifact serves every state of the identity DB, enrollments never touch
the artifact, and million-row galleries avoid the constant-serialization
stall (BASELINE.md "Production-scale galleries").
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np


def _pipeline_specs(frame_h: int, frame_w: int, streams: int,
                    gallery_shape, gallery_dtype):
    shape = ((streams, frame_h, frame_w, 3) if streams
             else (frame_h, frame_w, 3))
    specs = [jax.ShapeDtypeStruct(shape, np.float32)]
    if gallery_shape is not None:
        specs.append(jax.ShapeDtypeStruct(tuple(gallery_shape),
                                          gallery_dtype))
        specs.append(jax.ShapeDtypeStruct((), np.int32))
    return specs


def export_pipeline(out_path: str, pipeline, frame_h: int, frame_w: int,
                    *, streams: int = 0, gallery_shape=None,
                    gallery_dtype=np.float32, platforms=None) -> str:
    """Serialize a pipeline fn (from make_recognition_pipeline /
    make_multiface_pipeline) for frames of [frame_h, frame_w, 3] f32.

    ``streams > 0`` exports a multi-stream pipeline
    (make_multistream_pipeline) at a FIXED stream count: the artifact's
    call signature becomes [streams, frame_h, frame_w, 3] — one deployed
    stream count per artifact, matching the one-compile-per-N contract.

    ``gallery_shape=(G, D)`` exports a ``dynamic_gallery=True`` pipeline:
    the artifact's call signature becomes ``fn(frame, gallery_n, rows)`` —
    the L2-NORMALIZED ``[G, D]`` f32 gallery
    (serve/pipeline.py::normalize_gallery) plus the scalar int32 count of
    ENROLLED rows. Rows >= ``rows`` are masked out of the argmax, so
    padding contents never win a match regardless of sim_threshold;
    re-export only when the gallery outgrows G, never on enrollment.
    ``gallery_dtype=jnp.bfloat16`` (or ``jnp.int8``, 127-scale) bakes a
    half- (quarter-) bandwidth gallery operand into the artifact — pass
    matching-dtype rows at call time, see normalize_gallery incl. its
    int8 caveats."""
    from jax.export import export as jexport

    specs = _pipeline_specs(frame_h, frame_w, streams, gallery_shape,
                            gallery_dtype)
    exported = jexport(jax.jit(pipeline), platforms=platforms)(*specs)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    meta = {"frame_h": frame_h, "frame_w": frame_w,
            "platforms": list(exported.platforms),
            "format": "jax.export StableHLO"}
    if streams:
        meta["streams"] = streams
    if gallery_shape is not None:
        meta["gallery_rows"] = int(gallery_shape[0])
        meta["gallery_dim"] = int(gallery_shape[1])
        meta["gallery_dtype"] = np.dtype(gallery_dtype).name
        meta["dynamic_gallery"] = True
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return out_path


def load_pipeline(path: str):
    """Deserialize an exported pipeline; returns fn(frame) -> outputs dict
    (fn(frame, gallery_n, rows) for dynamic-gallery artifacts — check the
    sidecar .json's ``dynamic_gallery``). No access to the original Python
    model/weights is needed."""
    from jax.export import deserialize

    with open(path, "rb") as f:
        exported = deserialize(bytearray(f.read()))

    def fn(*args):
        return exported.call(*args)

    return fn


def export_compiled(out_path: str, pipeline, frame_h: int, frame_w: int,
                    *, streams: int = 0, gallery_shape=None,
                    gallery_dtype=np.float32) -> str:
    """Serialize the COMPILED PJRT executable — a genuinely ahead-of-time
    deploy artifact.

    ``export_pipeline``'s StableHLO skips the Python trace but the first
    dispatch in a fresh process still pays the full XLA compile (76 s for
    the 250px multistream pipeline on chip, round-4 artifact
    aot_coldstart.log). This is the reference's actual deploy shape —
    Feature.hpp:213-219 loads a READY predictor in milliseconds — so here
    the XLA compile itself moves to export time:
    ``jit(pipeline).lower(specs).compile()`` on the CURRENT backend, then
    ``jax.experimental.serialize_executable`` pickles the PJRT
    executable + arg trees. ``load_compiled`` reconstructs a callable
    whose first dispatch is just transfer + execute.

    The artifact is pinned to the backend it was compiled for (platform +
    platform_version recorded in the .json sidecar; loading on a
    different PJRT runtime fails loudly). Artifacts are trusted input —
    the payload is a pickle, same trust model as .params files.
    """
    from jax.experimental.serialize_executable import serialize

    specs = _pipeline_specs(frame_h, frame_w, streams, gallery_shape,
                            gallery_dtype)
    compiled = jax.jit(pipeline).lower(*specs).compile()
    blob, in_tree, out_tree = serialize(compiled)
    # number of devices this executable addresses (1 for a plain jit) —
    # load must pass exactly this many execution_devices, or a host with
    # a different device count (e.g. the 8-device CPU test mesh) fails
    # execute_sharded with a shard-count mismatch
    n_exec_devices = len(compiled.runtime_executable().local_devices())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump({"format": "pjrt_compiled_v1", "exec": blob,
                     "in_tree": in_tree, "out_tree": out_tree,
                     "num_devices": n_exec_devices}, f)
    backend = jax.devices()[0].client
    meta = {"frame_h": frame_h, "frame_w": frame_w,
            "format": "pjrt compiled executable",
            "platform": backend.platform,
            "platform_version": backend.platform_version,
            "jax_version": jax.__version__}
    if streams:
        meta["streams"] = streams
    if gallery_shape is not None:
        meta["gallery_rows"] = int(gallery_shape[0])
        meta["gallery_dim"] = int(gallery_shape[1])
        meta["gallery_dtype"] = np.dtype(gallery_dtype).name
        meta["dynamic_gallery"] = True
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=2)
    return out_path


def load_compiled(path: str):
    """Load an ``export_compiled`` artifact: returns the ready-to-call
    ``jax.stages.Compiled`` — NO tracing, NO XLA compile, first dispatch
    is transfer + execute. Must run on the same PJRT platform the
    artifact was compiled for (see the .json sidecar)."""
    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("format") != "pjrt_compiled_v1":
        raise ValueError(f"{path}: not a pjrt_compiled_v1 artifact")
    nd = payload.get("num_devices", 1)
    devices = jax.devices()[:nd]
    if len(devices) < nd:
        raise ValueError(
            f"{path}: executable addresses {nd} device(s) but this "
            f"process has only {len(devices)}")
    return deserialize_and_load(payload["exec"], payload["in_tree"],
                                payload["out_tree"],
                                execution_devices=devices)


def export_extract(out_path: str, model, batch_size: int, height: int,
                   width: int, channels: int = 1, *, normalize: bool = True,
                   platforms=None) -> str:
    """Serialize the batched extraction graph (variables stay ARGUMENTS, so
    one artifact serves every checkpoint of the architecture: load it, feed
    weights straight from a weights.npz). The TPU-side sibling of the C++
    NativeEmbedder for bulk extraction without model code."""
    from jax.export import export as jexport

    from ..extract import make_extract_fn

    fn = make_extract_fn(model, normalize=normalize)
    var_spec = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           np.zeros((1, height, width, channels),
                                    np.float32)))
    img_spec = jax.ShapeDtypeStruct((batch_size, height, width, channels),
                                    np.float32)
    exported = jexport(fn, platforms=platforms)(var_spec, img_spec)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    with open(out_path + ".json", "w") as f:
        json.dump({"batch_size": batch_size, "height": height,
                   "width": width, "channels": channels,
                   "normalize": normalize,
                   "platforms": list(exported.platforms)}, f, indent=2)
    return out_path


def load_extract(path: str):
    """Returns fn(variables, images) -> (logits, features)."""
    from jax.export import deserialize

    with open(path, "rb") as f:
        exported = deserialize(bytearray(f.read()))

    def fn(variables, images):
        return exported.call(variables, images)

    return fn
