"""MTCNN pyramid cascade (reference detect_face.py:279-399, MTCNN.hpp:993).

Stage structure and numeric conventions follow the reference exactly:
image pyramid with factor 0.709 from 12/minsize down to 12px, PNet heatmap
decode + per-scale NMS 0.5 + cross-scale NMS 0.7 + box regression + square,
RNet on 24x24 crops (threshold[1], NMS 0.7, bbreg, square), ONet on 48x48
crops (threshold[2], landmark decode, bbreg, NMS-Min 0.7). The (x, y)
transposition dance of the TF version (detect_face.py:309-312) is preserved
so converted-Caffe det*.npy weights remain drop-in compatible.

XLA-vs-dynamic-shapes design (SURVEY.md §7 hard parts): the pyramid scale
set is static per image size, so each PNet scale is one cached jit
compilation — the reference's C++ runtime does the same bucketing with its
per-scale predictor pool (MTCNN.hpp:81-172 ``PreLoadPNetPool``). RNet/ONet
batch crops are padded to power-of-two capacities, bounding compile count.
Variable-count box bookkeeping (NMS, regression, clipping) stays in numpy —
it is O(boxes) host work, identical to the reference's post-processing, and
keeps the device graphs static.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mtcnn as nets
from ..ops.boxes import bbreg, generate_bounding_box, nms, pad, rerec


def imresample(img: np.ndarray, sz: tuple[int, int]) -> np.ndarray:
    """cv2 INTER_AREA resample, exactly the reference's imresample
    (detect_face.py:746-748)."""
    import cv2

    return cv2.resize(img, (sz[1], sz[0]), interpolation=cv2.INTER_AREA)


def pyramid_scales(h: int, w: int, minsize: int, factor: float) -> list[float]:
    """Scale pyramid (detect_face.py:287-300)."""
    minl = min(h, w)
    m = 12.0 / minsize
    minl = minl * m
    scales = []
    count = 0
    while minl >= 12:
        scales.append(m * (factor ** count))
        minl = minl * factor
        count += 1
    return scales


def _next_pow2(n: int) -> int:
    return 1 << max(int(math.ceil(math.log2(max(n, 1)))), 0)


class MTCNNDetector:
    """Three-stage cascade with cached per-shape jit compilations."""

    def __init__(self, pnet_params=None, rnet_params=None, onet_params=None,
                 seed: int = 0):
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        self.pnet_params = pnet_params or nets.init_pnet_params(k1)
        self.rnet_params = rnet_params or nets.init_rnet_params(k2)
        self.onet_params = onet_params or nets.init_onet_params(k3)
        self._pnet = jax.jit(nets.pnet_forward)
        self._rnet = jax.jit(nets.rnet_forward)
        self._onet = jax.jit(nets.onet_forward)
        self._device_stage1: dict = {}

    @classmethod
    def from_npy(cls, det1: str, det2: str, det3: str) -> "MTCNNDetector":
        return cls(nets.load_npy_params(det1), nets.load_npy_params(det2),
                   nets.load_npy_params(det3))

    # stage helpers -------------------------------------------------------

    def _run_pnet(self, img: np.ndarray, scale: float, threshold: float):
        h, w = img.shape[:2]
        hs = int(np.ceil(h * scale))
        ws = int(np.ceil(w * scale))
        im_data = (imresample(img, (hs, ws)) - 127.5) * 0.0078125
        # transpose to the TF-caffe orientation (detect_face.py:308-312)
        img_y = np.transpose(im_data[None], (0, 2, 1, 3))
        prob, reg = self._pnet(self.pnet_params, jnp.asarray(img_y,
                                                             jnp.float32))
        out0 = np.transpose(np.asarray(reg), (0, 2, 1, 3))
        out1 = np.transpose(np.asarray(prob), (0, 2, 1, 3))
        boxes, _ = generate_bounding_box(out1[0, :, :, 1].copy(),
                                         out0[0].copy(), scale, threshold)
        pick = nms(boxes.copy(), 0.5, "Union")
        return boxes[pick] if boxes.size and pick.size else np.empty((0, 9))

    def _crops(self, img: np.ndarray, total_boxes: np.ndarray, size: int):
        """Build padded square crops (detect_face.py:340-348,368-376)."""
        h, w = img.shape[:2]
        dy, edy, dx, edx, y, ey, x, ex, tmpw, tmph = pad(total_boxes.copy(),
                                                         w, h)
        numbox = total_boxes.shape[0]
        tempimg = np.zeros((numbox, size, size, 3), np.float32)
        for k in range(numbox):
            tmp = np.zeros((int(tmph[k]), int(tmpw[k]), 3))
            tmp[dy[k] - 1:edy[k], dx[k] - 1:edx[k], :] = (
                img[y[k] - 1:ey[k], x[k] - 1:ex[k], :])
            if tmp.shape[0] > 0 and tmp.shape[1] > 0:
                tempimg[k] = imresample(tmp, (size, size))
        tempimg = (tempimg - 127.5) * 0.0078125
        # (x, y) transpose for weight compatibility (detect_face.py:349)
        return np.transpose(tempimg, (0, 2, 1, 3))

    def _run_batched(self, fn, params, crops: np.ndarray):
        """Pad the crop batch to a power-of-two capacity (bounded compiles)."""
        n = crops.shape[0]
        cap = _next_pow2(n)
        if cap != n:
            crops = np.concatenate(
                [crops, np.zeros((cap - n,) + crops.shape[1:],
                                 crops.dtype)], 0)
        outs = fn(params, jnp.asarray(crops))
        return tuple(np.asarray(o)[:n] for o in outs)

    # full cascade --------------------------------------------------------

    def detect(self, img: np.ndarray, minsize: int = 20,
               thresholds: Sequence[float] = (0.6, 0.7, 0.7),
               factor: float = 0.709, device_pyramid: bool = False):
        """Returns (boxes [N, 5], points [10, N]) — the reference's outputs
        (x1 y1 x2 y2 score; landmarks as 5 xs then 5 ys).

        ``device_pyramid=True`` runs the whole stage-1 pyramid as ONE fused
        device program (detect/device_pnet.py) — one dispatch instead of one
        per scale; bilinear device resize instead of INTER_AREA (documented
        deviation)."""
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        h, w = img.shape[:2]
        total_boxes = np.empty((0, 9))
        points = np.empty((10, 0))

        if device_pyramid:
            from .device_pnet import make_device_stage1

            key = (h, w, minsize, factor, thresholds[0])
            if key not in self._device_stage1:
                self._device_stage1[key] = make_device_stage1(
                    self.pnet_params, h, w, minsize=minsize, factor=factor,
                    threshold=thresholds[0])
            out = np.asarray(self._device_stage1[key](
                jnp.asarray(img, jnp.float32)))
            total_boxes = out[np.isfinite(out[:, 4])].astype(np.float64)
        else:
            # stage 1: PNet over the pyramid (host path, reference-exact)
            for scale in pyramid_scales(h, w, minsize, factor):
                boxes = self._run_pnet(img, scale, thresholds[0])
                if boxes.size:
                    total_boxes = np.append(total_boxes, boxes, axis=0)
            if total_boxes.shape[0] > 0:
                pick = nms(total_boxes.copy(), 0.7, "Union")
                total_boxes = total_boxes[pick]

        if total_boxes.shape[0] > 0:
            regw = total_boxes[:, 2] - total_boxes[:, 0]
            regh = total_boxes[:, 3] - total_boxes[:, 1]
            qq1 = total_boxes[:, 0] + total_boxes[:, 5] * regw
            qq2 = total_boxes[:, 1] + total_boxes[:, 6] * regh
            qq3 = total_boxes[:, 2] + total_boxes[:, 7] * regw
            qq4 = total_boxes[:, 3] + total_boxes[:, 8] * regh
            total_boxes = np.transpose(np.vstack([qq1, qq2, qq3, qq4,
                                                  total_boxes[:, 4]]))
            total_boxes = rerec(total_boxes.copy())
            total_boxes[:, 0:4] = np.fix(total_boxes[:, 0:4]).astype(np.int32)

        # stage 2: RNet
        if total_boxes.shape[0] > 0:
            crops = self._crops(img, total_boxes, 24)
            prob, reg = self._run_batched(self._rnet, self.rnet_params, crops)
            score = prob[:, 1]
            ipass = score > thresholds[1]
            total_boxes = np.hstack([total_boxes[ipass, 0:4],
                                     score[ipass, None]])
            mv = reg[ipass].T
            if total_boxes.shape[0] > 0:
                pick = nms(total_boxes, 0.7, "Union")
                total_boxes = total_boxes[pick]
                total_boxes = bbreg(total_boxes.copy(), np.transpose(mv[:, pick]))
                total_boxes = rerec(total_boxes.copy())

        # stage 3: ONet
        if total_boxes.shape[0] > 0:
            total_boxes = np.fix(total_boxes).astype(np.int32).astype(np.float64)
            crops = self._crops(img, total_boxes, 48)
            prob, reg, lmk = self._run_batched(self._onet, self.onet_params,
                                               crops)
            score = prob[:, 1]
            pts = lmk.T
            ipass = score > thresholds[2]
            pts = pts[:, ipass]
            total_boxes = np.hstack([total_boxes[ipass, 0:4],
                                     score[ipass, None]])
            mv = reg[ipass].T
            bw = total_boxes[:, 2] - total_boxes[:, 0] + 1
            bh = total_boxes[:, 3] - total_boxes[:, 1] + 1
            pts = pts.copy()
            pts[0:5, :] = (np.tile(bw, (5, 1)) * pts[0:5, :]
                           + np.tile(total_boxes[:, 0], (5, 1)) - 1)
            pts[5:10, :] = (np.tile(bh, (5, 1)) * pts[5:10, :]
                            + np.tile(total_boxes[:, 1], (5, 1)) - 1)
            points = pts
            if total_boxes.shape[0] > 0:
                total_boxes = bbreg(total_boxes.copy(), np.transpose(mv))
                pick = nms(total_boxes.copy(), 0.7, "Min")
                total_boxes = total_boxes[pick]
                points = points[:, pick]

        return total_boxes, points


@functools.lru_cache(maxsize=1)
def _default_detector() -> MTCNNDetector:
    return MTCNNDetector()


def detect_faces(img: np.ndarray, minsize: int = 20,
                 thresholds: Sequence[float] = (0.6, 0.7, 0.7),
                 factor: float = 0.709, detector: MTCNNDetector | None = None):
    """Functional wrapper (reference detect_face signature)."""
    det = detector or _default_detector()
    return det.detect(img, minsize, thresholds, factor)
