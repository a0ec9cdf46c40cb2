"""Live-recognition serving demo (reference C++ runtime flow, SURVEY.md §3.4).

Spins up the RecognitionService with a real embedding model (exported or
random-init), enrolls synthetic identities through the registration state
machine, pushes a stream of frames through the SPSC drop-stale queue from a
producer thread, and identifies the freshest frames — the full
camera -> queue -> embed(TPU) -> AVX-match -> identity-store loop in one
process.
"""

from __future__ import annotations

import argparse
import threading
import time

import numpy as np

from . import _common


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export-dir", help="exported model (serve/export.py); "
                                        "random init if omitted")
    p.add_argument("--model", default="efmnet342",
                   choices=["lightcnn29", "efmnet342", "lightcnn9"])
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--store", default="/tmp/facejax_demo.fjdb")
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--identities", type=int, default=4)
    p.add_argument("--frames", type=int, default=24)
    p.add_argument("--sim-threshold", type=float, default=0.6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--video", help="video source: a file path (CI fixture) "
                                   "or camera index — replaces the "
                                   "synthetic frame stream "
                                   "(StreamLoop, CameraSettings.h:21)")
    p.add_argument("--register-name", default="live_person",
                   help="with --video: enroll this name from the first "
                        "--register-frames frames")
    p.add_argument("--register-frames", type=int, default=4,
                   help="0 (with --person-db) skips stream enrollment and "
                        "identifies against the DB only")
    p.add_argument("--person-db",
                   help="with --dynamic-gallery: a PersonStore sqlite DB "
                        "(cli.identify enroll-person) served through "
                        "PersonGalleryService — the stream is identified "
                        "against EVERY person in the DB (names resolved "
                        "per match), and --register-name enrollments are "
                        "written through to it (the reference runtime's "
                        "load-DB-then-identify flow, Feature.hpp:189-205)")
    p.add_argument("--gallery-dtype", choices=_common.GALLERY_DTYPE_NAMES,
                   default="f32",
                   help="with --dynamic-gallery: HBM storage dtype of the "
                        "gallery rows (bf16 halves / int8 quarters the "
                        "bandwidth-bound match bytes at production scale)")
    p.add_argument("--fps-cap", type=float, default=30.0,
                   help="with --video file sources: max producer fps")
    p.add_argument("--detect", action="store_true",
                   help="with --video: frames are full SCENES — run the "
                        "fused detect->crop->embed->match pipeline "
                        "(serve/pipeline.py, ONE XLA program per frame) "
                        "instead of embedding whole frames")
    p.add_argument("--frame-size", type=int, nargs=2, default=(128, 128),
                   metavar=("H", "W"), help="with --detect: scene size")
    p.add_argument("--det-thresholds", type=float, nargs=3,
                   default=(0.6, 0.7, 0.7),
                   help="with --detect: cascade thresholds (random-weight "
                        "demos need permissive values)")
    p.add_argument("--max-faces", type=int, default=1,
                   help="with --detect: identify the top-K faces per frame "
                        "(K>1 uses make_multiface_pipeline — every face "
                        "embedded+matched in the same XLA program)")
    p.add_argument("--native-mtcnn", metavar="NPZ",
                   help="with --video --detect --native: run detection "
                        "with the native C++ cascade (export_mtcnn npz) — "
                        "the complete live loop (camera -> detect -> crop "
                        "-> embed -> match -> register) then has zero "
                        "JAX/Python compute, the reference app's exact "
                        "process shape")
    p.add_argument("--native", action="store_true",
                   help="embed with the native C++ forward instead of JAX "
                        "(requires --export-dir). The queue, state machine, "
                        "matcher, and store are already native, so the "
                        "whole loop then runs without JAX — the reference's "
                        "single-process runtime (Feature.hpp:163-205)")
    p.add_argument("--streams", type=int, default=0,
                   help="throughput mode: identify the best face in N "
                        "same-shape camera streams per dispatch (vmapped "
                        "fused pipeline, serve/pipeline.py::"
                        "make_multistream_pipeline); prints frames/s")
    p.add_argument("--int8", action="store_true",
                   help="with --native: int8 quantized convs")
    p.add_argument("--dynamic-gallery", action="store_true",
                   help="with --video --detect (or --streams): the gallery "
                        "is a RUNTIME argument of the fused pipeline "
                        "(enrollments grow the row count, never retrace) "
                        "and the pipeline compiles at STARTUP instead of "
                        "mid-stream — identification runs from frame 1 "
                        "against the rows enrolled so far (the production "
                        "serving shape; see BASELINE.md 'Production-scale "
                        "galleries')")
    return p


def _make_embed_fn(args, model, variables):
    """JAX extract by default; the native C++ forward under --native."""
    import numpy as np

    if args.native:
        if not args.export_dir:
            raise SystemExit("--native needs --export-dir (the native "
                             "forward reads weights.npz)")
        from ..serve.native import NativeEmbedder

        emb = NativeEmbedder(args.export_dir, quantized=args.int8)

        def embed_fn(frames):
            frames = np.asarray(frames, np.float32)
            return np.stack([emb.extract(f[..., 0]) for f in frames])

        return embed_fn

    from ..extract import make_extract_fn

    extract = make_extract_fn(model, normalize=True)

    def embed_fn(frames):
        _, feat = extract(variables, np.asarray(frames, np.float32))
        return np.asarray(feat)

    return embed_fn


def _video_native_detect_main(args, model):
    """--video --detect --native [--native-mtcnn]: the reference app's
    exact process shape — camera thread -> drop-stale queue -> C++ MTCNN
    -> crop -> C++ embed -> C++ store match/register, zero JAX and zero
    Python compute in the loop (MTCNN.hpp + Feature.hpp + LFQueue.hpp +
    CameraSettings.h composed, SURVEY §3.4)."""
    import os
    import time

    import numpy as np

    from ..detect.align import crop_face, select_main_face
    from ..serve.native import NativeEmbedder, NativeMtcnn
    from ..serve.recognition import RecognitionService
    from ..serve.video import VideoProducer

    if not (args.export_dir and args.native_mtcnn):
        raise SystemExit("--video --detect --native needs --export-dir "
                         "and --native-mtcnn")
    fh, fw = args.frame_size
    shape = (fh, fw, 3)
    if os.path.exists(args.store):
        os.remove(args.store)
    source = (int(args.video) if args.video.isdigit() else args.video)
    th = tuple(args.det_thresholds)
    with NativeMtcnn(args.native_mtcnn, quantized=args.int8) as det, \
            NativeEmbedder(args.export_dir, quantized=args.int8) as emb, \
            RecognitionService(
                lambda f: np.zeros((len(f), emb.feature_dim), np.float32),
                args.store, emb.feature_dim,
                sim_threshold=args.sim_threshold, frame_shape=shape) as svc:
        size = int(((emb.manifest or {}).get("input") or {})
                   .get("height", args.image_size))
        n_reg = 0
        results = []

        def face_fv(frame255):
            boxes, _ = det.detect(frame255, thresholds=th)
            if boxes.shape[0] == 0:
                return None
            sel = select_main_face(boxes, frame255.shape)
            crop = crop_face(frame255.astype(np.float32), sel[0],
                             image_size=size, margin=args.mtcnn_margin
                             if hasattr(args, "mtcnn_margin") else 0)
            gray = (0.299 * crop[..., 0] + 0.587 * crop[..., 1]
                    + 0.114 * crop[..., 2]).astype(np.float32) / 255.0
            return emb.extract(gray)

        with VideoProducer(source, svc, fps_cap=args.fps_cap) as producer:
            while True:
                got = svc.queue.consume(int(np.prod(shape)),
                                        remove_old=n_reg
                                        >= args.register_frames)
                if got is None:
                    if producer.finished.is_set():
                        break
                    time.sleep(0.001)
                    continue
                flat, seq = got
                frame255 = flat.reshape(shape) * 255.0
                fv = face_fv(frame255)
                if fv is None:
                    continue
                if n_reg < args.register_frames:
                    svc.store.register(args.register_name, fv)
                    n_reg += 1
                    if n_reg == args.register_frames:
                        print(f"registered '{args.register_name}' from "
                              f"{n_reg} natively detected faces")
                    continue
                name, sim = svc.store.match(fv, args.sim_threshold)
                results.append((seq, name, sim))
                print(f"frame {seq:4d}: {name or '<unknown>'} "
                      f"(sim {sim:+.3f}) [native]")
        matched = sum(1 for _, n, _ in results if n == args.register_name)
        print(f"identified {matched}/{len(results)} streamed frames as "
              f"'{args.register_name}' (fully native loop)")
        return results


def _video_detect_main(args, model, variables):
    """--video --detect: full-scene frames through the FUSED TPU pipeline
    (detect -> largest-centered crop -> embed -> gallery match compiled
    into one XLA program per frame, serve/pipeline.py) — the reference's
    whole per-frame loop (SURVEY §3.4) in a single dispatch. Registration
    crops come from the host cascade; identification runs fused."""
    import os
    import time

    import jax.numpy as jnp
    import numpy as np

    from ..detect.align import crop_face, select_main_face
    from ..detect.pipeline import MTCNNDetector
    from ..extract import make_extract_fn
    from ..serve.pipeline import (make_multiface_pipeline,
                                  make_recognition_pipeline)
    from ..serve.recognition import RecognitionService
    from ..serve.video import VideoProducer

    fh, fw = args.frame_size
    shape = (fh, fw, 3)
    detector = MTCNNDetector(seed=args.seed)
    extract = make_extract_fn(model, normalize=True)

    def embed_crop(gray01):
        _, feat = extract(variables, np.asarray(gray01, np.float32)[None])
        return np.asarray(feat)[0]

    if os.path.exists(args.store):
        os.remove(args.store)
    source = (int(args.video) if args.video.isdigit() else args.video)
    import contextlib

    with RecognitionService(lambda f: np.zeros((len(f), model.feature_dim),
                                               np.float32),
                            args.store, model.feature_dim,
                            sim_threshold=args.sim_threshold,
                            frame_shape=shape) as svc, \
            contextlib.ExitStack() as stack:
        reg_feats: list[np.ndarray] = []
        results = []
        pipeline = None
        maker = (make_recognition_pipeline if args.max_faces <= 1
                 else make_multiface_pipeline)
        extra = ({} if args.max_faces <= 1
                 else {"max_faces": args.max_faces})
        gsvc = reg_pid = None
        if args.dynamic_gallery:
            # production shape: gallery as a runtime argument — compile +
            # warm ONCE at startup, enrollments are O(row) device scatters
            # into the HBM-resident gallery (serve/device_gallery.py)
            import jax as _jax

            from ..serve.device_gallery import DeviceGallery

            pipeline = maker(
                detector, model, variables, None, dynamic_gallery=True,
                frame_h=fh, frame_w=fw, embed_size=args.image_size,
                thresholds=tuple(args.det_thresholds),
                sim_threshold=args.sim_threshold, **extra)
            if args.person_db:
                # identify against EVERY person in the durable DB; sized
                # so stream enrollments never grow the gallery shape
                # (growth would retrace mid-stream)
                from ..serve.gallery_service import PersonGalleryService
                from ..serve.person_store import PersonStore

                pstore = stack.enter_context(
                    PersonStore(args.person_db, model.feature_dim))
                n_valid = pstore.valid_faces()[1].shape[0]
                gsvc = PersonGalleryService(
                    pstore, capacity=max(n_valid + args.register_frames, 1),
                    dtype=_common.gallery_dtype(args.gallery_dtype))
                dg = gsvc  # same (gallery_n, rows_arg) contract
                print(f"person-db: {n_valid} faces across "
                      f"{len(pstore.persons())} persons in HBM")
            else:
                dg = DeviceGallery(model.feature_dim,
                                   capacity=max(args.register_frames, 1),
                                   dtype=_common.gallery_dtype(args.gallery_dtype))
            _jax.block_until_ready(pipeline(
                jnp.zeros(shape, jnp.float32), dg.gallery_n, dg.rows_arg))
        with VideoProducer(source, svc, fps_cap=args.fps_cap) as producer:
            while True:
                registering = len(reg_feats) < args.register_frames
                got = svc.queue.consume(int(np.prod(shape)),
                                        remove_old=not registering)
                if got is None:
                    if producer.finished.is_set():
                        break
                    time.sleep(0.001)
                    continue
                flat, seq = got
                frame255 = flat.reshape(shape) * 255.0
                if len(reg_feats) < args.register_frames:
                    # host-cascade registration crop (RegImageAcq phase)
                    boxes, _ = detector.detect(
                        frame255, thresholds=tuple(args.det_thresholds))
                    if boxes.shape[0] > 0:
                        det = select_main_face(boxes, frame255.shape)
                        crop = crop_face(frame255.astype(np.float32),
                                         det[0], image_size=args.image_size,
                                         margin=16)
                        gray = crop.mean(-1, keepdims=True) / 255.0
                        fv = embed_crop(gray)
                        reg_feats.append(fv)
                        svc.store.register(args.register_name, fv)
                        if gsvc is not None:
                            # write-through: durable DB row + device
                            # scatter (serve/gallery_service.py)
                            from ..serve.person_store import Person

                            if reg_pid is None:
                                reg_pid = gsvc.enroll(
                                    Person(name=args.register_name), [fv])
                            else:
                                gsvc.add_face(reg_pid, fv)
                        elif args.dynamic_gallery:
                            # enroll into the device-resident gallery: one
                            # row scatter, zero retrace (pipeline already
                            # compiled)
                            dg.add(fv)
                        if len(reg_feats) == args.register_frames:
                            print(f"registered '{args.register_name}' from "
                                  f"{len(reg_feats)} detected faces")
                            if not args.dynamic_gallery:
                                pipeline = maker(
                                    detector, model, variables,
                                    np.stack(reg_feats), frame_h=fh,
                                    frame_w=fw, embed_size=args.image_size,
                                    thresholds=tuple(args.det_thresholds),
                                    sim_threshold=args.sim_threshold,
                                    **extra)
                                import jax as _jax

                                # warm the jit cache before the drop-stale
                                # stream
                                _jax.block_until_ready(
                                    pipeline(jnp.zeros(shape, jnp.float32)))
                    if not args.dynamic_gallery:
                        continue
                    # dynamic gallery: fall through — identification runs
                    # from frame 1 against the rows enrolled so far (an
                    # empty gallery is fully masked -> <unknown>)
                frame_dev = jnp.asarray(frame255, jnp.float32)
                raw = (pipeline(frame_dev, dg.gallery_n, dg.rows_arg)
                       if args.dynamic_gallery else pipeline(frame_dev))
                out = {k: np.asarray(v) for k, v in raw.items()}

                def _name(ix):
                    # the pipeline already applied sim_threshold (ix = -1
                    # below it); with a person DB resolve the row to the
                    # owning person, else it is the single enrolled name
                    if int(ix) < 0:
                        return None
                    if gsvc is not None:
                        res = gsvc.resolve(int(ix), 1.0, sim_th=-2.0)
                        return res.person.name if res.person else None
                    return args.register_name

                if args.max_faces <= 1:
                    name = _name(out["index"])
                    results.append((seq, name, float(out["similarity"])))
                    print(f"frame {seq:4d}: {name or '<unknown>'} "
                          f"(sim {float(out['similarity']):+.3f}, "
                          f"found={bool(out['found'])}, "
                          f"cap_dropped={int(out['cap_dropped'])})")
                else:
                    # per-face results (the reference identifies every
                    # detected face per frame)
                    faces = [(_name(ix), float(sm))
                             for fnd, ix, sm in zip(out["found"],
                                                    out["indices"],
                                                    out["similarities"])
                             if bool(fnd)]
                    best = max(faces, key=lambda x: x[1],
                               default=(None, -2.0))
                    results.append((seq, best[0], best[1]))
                    print(f"frame {seq:4d}: {len(faces)} face(s) "
                          + ", ".join(f"{n or '<unknown>'}({s:+.2f})"
                                      for n, s in faces))
        if gsvc is not None:
            # multi-person mode: any resolved DB identity counts
            matched = sum(1 for _, n, _ in results if n is not None)
            print(f"identified {matched}/{len(results)} streamed frames "
                  f"against the person DB (fused pipeline)")
        else:
            matched = sum(1 for _, n, _ in results
                          if n == args.register_name)
            print(f"identified {matched}/{len(results)} streamed frames "
                  f"as '{args.register_name}' (fused pipeline)")
        return results


def _video_main(args, model, variables):
    """--video flow matching the reference runtime: acquire registration
    frames first (RegImageAcq), enroll via the state machine, then identify
    the remaining stream."""
    import os
    import time

    import numpy as np

    from ..serve.recognition import RecognitionService
    from ..serve.video import VideoProducer

    embed_fn = _make_embed_fn(args, model, variables)

    if os.path.exists(args.store):
        os.remove(args.store)
    source = (int(args.video) if args.video.isdigit() else args.video)
    shape = (args.image_size, args.image_size, 1)
    # warm the jit cache BEFORE the stream starts: the first embed compiles
    # for seconds, and a drop-stale queue would discard the whole fixture
    # (both batch shapes: per-frame identify and the registration batch)
    embed_fn(np.zeros((1,) + shape, np.float32))
    embed_fn(np.zeros((args.register_frames,) + shape, np.float32))
    with RecognitionService(embed_fn, args.store, model.feature_dim,
                            sim_threshold=args.sim_threshold,
                            frame_shape=shape) as svc:
        reg_frames: list[np.ndarray] = []
        results = []
        with VideoProducer(source, svc, fps_cap=args.fps_cap) as producer:
            while True:
                got = svc.queue.consume(int(np.prod(shape)),
                                        remove_old=True)
                if got is None:
                    if producer.finished.is_set():
                        break
                    time.sleep(0.001)
                    continue
                flat, seq = got
                frame = flat.reshape(shape)
                if len(reg_frames) < args.register_frames:
                    reg_frames.append(frame)
                    if len(reg_frames) == args.register_frames:
                        stored = svc.register(args.register_name,
                                              np.stack(reg_frames))
                        print(f"registered '{args.register_name}' from "
                              f"{args.register_frames} frames "
                              f"({stored} features)")
                    continue
                emb = np.asarray(embed_fn(frame[None]))[0]
                name, sim = svc.store.match(emb, args.sim_threshold)
                results.append((seq, name, sim))
                print(f"frame {seq:4d}: {name or '<unknown>'} "
                      f"(sim {sim:+.3f})")
        matched = sum(1 for _, n, _ in results if n == args.register_name)
        print(f"identified {matched}/{len(results)} streamed frames as "
              f"'{args.register_name}'")
        return results


def _streams_main(args, model, variables):
    """Multi-camera throughput mode: one vmapped fused pipeline dispatch
    identifies the best face of all N streams (the batch analogue of the
    reference's per-camera StreamLoop process, CameraSettings.h:21)."""
    import jax
    import jax.numpy as jnp

    from ..detect.pipeline import MTCNNDetector
    from ..serve.pipeline import make_multistream_pipeline

    fh, fw = args.frame_size
    det = MTCNNDetector(seed=args.seed)
    rng = np.random.default_rng(args.seed + 1)
    gallery = rng.normal(size=(max(args.identities, 1),
                               model.feature_dim)).astype(np.float32)
    if args.dynamic_gallery:
        # production combination: throughput mode with the gallery as a
        # runtime argument — enrollments are O(row) DeviceGallery scatters,
        # the N-stream program never retraces
        from ..serve.device_gallery import DeviceGallery

        base = make_multistream_pipeline(
            det, model, variables, None, dynamic_gallery=True,
            frame_h=fh, frame_w=fw, embed_size=args.image_size,
            thresholds=tuple(args.det_thresholds),
            sim_threshold=args.sim_threshold)
        dg = DeviceGallery(model.feature_dim, initial=gallery,
                           capacity=max(args.identities, 1),
                           dtype=_common.gallery_dtype(args.gallery_dtype))
        pipe = lambda f: base(f, dg.gallery_n, dg.rows_arg)  # noqa: E731
    else:
        pipe = make_multistream_pipeline(
            det, model, variables, gallery, frame_h=fh, frame_w=fw,
            embed_size=args.image_size,
            thresholds=tuple(args.det_thresholds),
            sim_threshold=args.sim_threshold)
    frames = jnp.asarray(
        rng.uniform(0, 255, (args.streams, fh, fw, 3)), jnp.float32)
    t0 = time.perf_counter()
    out = jax.tree_util.tree_map(
        lambda x: x.block_until_ready(), pipe(frames))
    print(f"compile+first batch: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    steps = max(args.frames // args.streams, 1)
    for _ in range(steps):
        out = jax.tree_util.tree_map(
            lambda x: x.block_until_ready(), pipe(frames))
    dt = time.perf_counter() - t0
    found = np.asarray(out["found"])
    sims = np.asarray(out["similarity"])
    for i in range(args.streams):
        state = (f"match idx={int(np.asarray(out['index'])[i])} "
                 f"sim {sims[i]:+.3f}" if found[i] else "no face")
        print(f"stream {i:3d}: {state}")
    fps = args.streams * steps / dt
    print(f"{args.streams} streams x {steps} dispatches: "
          f"{fps:,.0f} frames/s ({fh}x{fw}px)")
    return int(found.sum()), args.streams


def main(argv=None):
    args = build_parser().parse_args(argv)
    import os

    import jax

    from .train_backbone import _model_by_name
    from ..data.synthetic import synthetic_faces
    from ..serve.export import load_exported_params
    from ..serve.recognition import RecognitionService
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    if os.path.exists(args.store):
        os.remove(args.store)

    if args.export_dir:
        params, batch_stats, manifest = load_exported_params(args.export_dir)
        model = _model_by_name(manifest.get("model", args.model),
                               args.num_classes, bf16=True)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
    else:
        model = _model_by_name(args.model, args.num_classes, bf16=False)
        variables = model.init(
            jax.random.PRNGKey(args.seed),
            np.zeros((1, args.image_size, args.image_size, 1), np.float32))
        print("note: random-init model (pipeline demo; pass --export-dir "
              "for a trained one)")
    if args.dynamic_gallery and not (args.streams or (
            args.video and args.detect and not args.native)):
        raise SystemExit("--dynamic-gallery applies to the fused TPU "
                         "pipelines only (use with --video --detect, or "
                         "with --streams; not --native)")
    if args.person_db and not (args.dynamic_gallery and args.video
                               and args.detect and not args.streams):
        raise SystemExit("--person-db needs the dynamic-gallery streaming "
                         "pipeline (--video --detect --dynamic-gallery, "
                         "without --streams)")
    if args.gallery_dtype != "f32" and not args.dynamic_gallery:
        raise SystemExit("--gallery-dtype applies to the dynamic-gallery "
                         "pipelines (use with --dynamic-gallery)")
    if args.register_frames == 0 and not args.dynamic_gallery:
        raise SystemExit("--register-frames 0 (identify-only) needs "
                         "--dynamic-gallery (the baked-gallery pipeline "
                         "compiles FROM the registration features)")
    if args.streams:
        return _streams_main(args, model, variables)
    if args.video and args.detect and args.native:
        return _video_native_detect_main(args, model)
    if args.video and args.detect:
        return _video_detect_main(args, model, variables)
    if args.video:
        return _video_main(args, model, variables)
    embed_fn = _make_embed_fn(args, model, variables)

    shape = (args.image_size, args.image_size, 1)
    images, labels = synthetic_faces(num_ids=args.identities, per_id=6,
                                     size=args.image_size, seed=args.seed)
    with RecognitionService(embed_fn, args.store, model.feature_dim,
                            sim_threshold=args.sim_threshold,
                            frame_shape=shape) as svc:
        # enrollment through the state machine
        for ident in range(args.identities):
            frames = images[labels == ident][:4]
            stored = svc.register(f"person_{ident}", frames)
            print(f"enrolled person_{ident}: {stored} representative "
                  f"feature(s); store size {len(svc.store)}")

        # camera thread: stream frames of random identities
        rng = np.random.default_rng(args.seed + 1)
        truth = {}
        stop = threading.Event()

        def camera():
            for seq in range(args.frames):
                ident = int(rng.integers(0, args.identities))
                pool = images[labels == ident]
                truth[seq] = ident
                svc.push_frame(pool[int(rng.integers(0, len(pool)))], seq=seq)
                time.sleep(0.002)
            stop.set()

        t = threading.Thread(target=camera)
        t.start()
        correct = 0
        seen = 0
        while True:
            res = svc.identify_latest()
            if res is None:
                if stop.is_set():
                    break  # producer done and queue drained
                time.sleep(0.001)
                continue
            name, sim, seq = res
            expected = f"person_{truth[seq]}"
            ok = name == expected
            correct += int(ok)
            seen += 1
            print(f"frame {seq:3d}: {name or '<unknown>'} (sim {sim:+.3f}) "
                  f"expected {expected} {'OK' if ok else 'MISS'}")
        t.join()
        print(f"identified {correct}/{seen} sampled frames correctly "
              f"(drop-stale queue skips backlog by design)")
        return correct, seen


if __name__ == "__main__":
    main()
