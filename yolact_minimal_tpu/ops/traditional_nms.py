"""Traditional (greedy, per-class) NMS via the native C++ kernel.

Host-side path mirroring the reference's `--traditional_nms` option
(/root/reference/utils/output_utils.py:84-123 driving the Cython kernel):
per class, score-threshold filter, pixel-scale the boxes (the kernel uses
the +1 pixel area convention), run greedy suppression, then keep the global
top `max_detections` by score across classes. The C++ library is built on
demand from native/ via make and bound with ctypes.
"""
from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                       'native')
_LIB: Optional[ctypes.CDLL] = None


def _load_library() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    lib_path = osp.join(_NATIVE_DIR, 'libyolact_native.so')
    sources = [osp.join(_NATIVE_DIR, f) for f in ('nms.cc', 'Makefile')]
    stale = (not osp.exists(lib_path) or
             any(osp.exists(s) and osp.getmtime(s) > osp.getmtime(lib_path)
                 for s in sources))
    if stale:
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(lib_path)
    lib.greedy_nms.restype = ctypes.c_int
    lib.greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
    _LIB = lib
    return lib


def greedy_nms(boxes: np.ndarray, scores: np.ndarray,
               iou_thresh: float) -> np.ndarray:
    """Kept indices (descending score) for pixel-scale xyxy boxes [N, 4]."""
    lib = _load_library()
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = boxes.shape[0]
    keep = np.empty(n, dtype=np.int32)
    count = lib.greedy_nms(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, float(iou_thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:count].copy()


def traditional_nms(boxes: np.ndarray, coefs: np.ndarray, scores: np.ndarray,
                    img_size: int, score_thre: float, iou_thre: float,
                    max_detections: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-class greedy NMS over decoded predictions.

    Args:
      boxes: [A, 4] normalized xyxy; coefs [A, 32]; scores [C-1, A].
    Returns (boxes, coefs, class_ids, scores) capped at max_detections.
    """
    num_classes = scores.shape[0]
    pix_boxes = boxes * img_size

    idx_all, cls_all, scr_all = [], [], []
    for c in range(num_classes):
        cls_scores = scores[c]
        mask = cls_scores > score_thre
        if not mask.any():
            continue
        cand = np.nonzero(mask)[0]
        keep = greedy_nms(pix_boxes[cand], cls_scores[cand], iou_thre)
        idx_all.append(cand[keep])
        cls_all.append(np.full(len(keep), c, np.int32))
        scr_all.append(cls_scores[cand][keep])

    if not idx_all:
        return (np.zeros((0, 4), np.float32), np.zeros((0, coefs.shape[1]),
                np.float32), np.zeros(0, np.int32), np.zeros(0, np.float32))

    idx = np.concatenate(idx_all)
    cls = np.concatenate(cls_all)
    scr = np.concatenate(scr_all)
    order = np.argsort(-scr, kind='stable')[:max_detections]
    return boxes[idx[order]], coefs[idx[order]], cls[order], scr[order]
