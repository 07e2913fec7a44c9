"""Core box geometry ops (TPU-native, pure jax.numpy).

Functional equivalents of the reference geometry layer
(/root/reference/utils/box_utils.py) redesigned for fixed shapes and XLA:
every op is batched/vmappable, avoids data-dependent shapes, and keeps the
exact numeric conventions of the reference (SSD variances 0.1/0.2, +0.5
anchor centering, IoU without +1 area convention).
"""
from __future__ import annotations

import math
from functools import partial
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

# SSD-style box-encoding variances (reference box_utils.py:105).
VARIANCES = (0.1, 0.2)


def box_iou(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two sets of xyxy boxes.

    Accepts [..., A, 4] and [..., B, 4] with matching leading dims and
    returns [..., A, B]. Mirrors reference box_utils.py:8-37 (no +1 area).
    """
    a = box_a[..., :, None, :]
    b = box_b[..., None, :, :]
    max_xy = jnp.minimum(a[..., 2:], b[..., 2:])
    min_xy = jnp.maximum(a[..., :2], b[..., :2])
    inter = jnp.clip(max_xy - min_xy, 0.0)
    inter_area = inter[..., 0] * inter[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter_area / (area_a + area_b - inter_area)


def make_anchors(img_size: int, aspect_ratios, scales) -> np.ndarray:
    """Dense grid anchors over the 5 FPN levels (strides 8..128).

    Returns a float32 numpy array [num_anchors, 4] in normalized
    (cx, cy, w, h). Matches reference box_utils.py:86-101 + yolact.py:111-114:
    feature sizes are ceil(img_size / stride); centers offset by +0.5;
    one scale and len(aspect_ratios) anchors per location, iterating
    rows (j) then cols (i), ratios innermost.
    """
    out = []
    for stride, scale in zip((8, 16, 32, 64, 128), scales):
        size = math.ceil(img_size / stride)
        for j, i in product(range(size), range(size)):
            x = (i + 0.5) / size
            y = (j + 0.5) / size
            for ar in aspect_ratios:
                r = math.sqrt(ar)
                w = scale * r / img_size
                h = scale / r / img_size
                out.append((x, y, w, h))
    return np.array(out, dtype=np.float32)


def encode(matched: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode matched gt boxes (xyxy) against anchors (cxcywh) into SSD
    offsets. Mirrors reference box_utils.py:104-114."""
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - anchors[..., :2]
    g_cxcy = g_cxcy / (VARIANCES[0] * anchors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / anchors[..., 2:]
    g_wh = jnp.log(jnp.maximum(g_wh, 1e-12)) / VARIANCES[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(offsets: jnp.ndarray, anchors: jnp.ndarray, clip: bool = True) -> jnp.ndarray:
    """Decode predicted SSD offsets back into normalized xyxy boxes.

    Mirrors the inline decode in reference output_utils.py:148-153
    (including the final clip to [0, 1] used by the torch path).
    """
    cxcy = anchors[..., :2] + offsets[..., :2] * VARIANCES[0] * anchors[..., 2:]
    wh = anchors[..., 2:] * jnp.exp(offsets[..., 2:] * VARIANCES[1])
    x1y1 = cxcy - wh / 2
    x2y2 = wh + x1y1
    boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    if clip:
        boxes = jnp.clip(boxes, 0.0, 1.0)
    return boxes


def sanitize_coordinates(x1, x2, img_size, padding: int = 0):
    """Scale normalized coords to pixels, order them, clamp to the image.

    Mirrors reference box_utils.py:117-132.
    """
    x1 = x1 * img_size
    x2 = x2 * img_size
    lo = jnp.minimum(x1, x2)
    hi = jnp.maximum(x1, x2)
    lo = jnp.clip(lo - padding, 0.0)
    hi = jnp.minimum(hi + padding, img_size)
    return lo, hi


def crop(masks: jnp.ndarray, boxes: jnp.ndarray, padding: int = 1) -> jnp.ndarray:
    """Zero out mask regions outside each box. masks [h, w, n]; boxes
    [n, 4] normalized xyxy. Mirrors reference box_utils.py:147-168."""
    h, w, _ = masks.shape
    x1, x2 = sanitize_coordinates(boxes[:, 0], boxes[:, 2], w, padding)
    y1, y2 = sanitize_coordinates(boxes[:, 1], boxes[:, 3], h, padding)
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 0)
    keep = ((rows >= x1[None, None, :]) & (rows < x2[None, None, :]) &
            (cols >= y1[None, None, :]) & (cols < y2[None, None, :]))
    return masks * keep.astype(masks.dtype)


def mask_iou(mask1: jnp.ndarray, mask2: jnp.ndarray) -> jnp.ndarray:
    """IoU between flattened binary masks [N1, HW] x [N2, HW] -> [N1, N2].

    The intersection is a matmul (MXU-friendly). Mirrors reference
    box_utils.py:189-200.
    """
    intersection = jnp.matmul(mask1, mask2.T, preferred_element_type=jnp.float32)
    area1 = jnp.sum(mask1, axis=1)[:, None]
    area2 = jnp.sum(mask2, axis=1)[None, :]
    union = area1 + area2 - intersection
    return intersection / union


# ---------------------------------------------------------------------------
# numpy twins (used by the host-side deploy/export drivers, mirroring the
# reference's numpy twin postprocessing layer, output_utils.py:46-81).
# ---------------------------------------------------------------------------

def box_iou_numpy(box_a: np.ndarray, box_b: np.ndarray) -> np.ndarray:
    a = box_a[..., :, None, :]
    b = box_b[..., None, :, :]
    max_xy = np.minimum(a[..., 2:], b[..., 2:])
    min_xy = np.maximum(a[..., :2], b[..., :2])
    inter = np.clip(max_xy - min_xy, 0.0, None)
    inter_area = inter[..., 0] * inter[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter_area / (area_a + area_b - inter_area)


def sanitize_coordinates_numpy(x1, x2, img_size, padding: int = 0):
    x1 = x1 * img_size
    x2 = x2 * img_size
    lo = np.minimum(x1, x2)
    hi = np.maximum(x1, x2)
    lo = np.clip(lo - padding, 0.0, None)
    hi = np.minimum(hi + padding, img_size)
    return lo, hi


def crop_numpy(masks: np.ndarray, boxes: np.ndarray, padding: int = 1) -> np.ndarray:
    h, w, _ = masks.shape
    x1, x2 = sanitize_coordinates_numpy(boxes[:, 0], boxes[:, 2], w, padding)
    y1, y2 = sanitize_coordinates_numpy(boxes[:, 1], boxes[:, 3], h, padding)
    rows = np.arange(w, dtype=np.float32)[None, :, None]
    cols = np.arange(h, dtype=np.float32)[:, None, None]
    keep = ((rows >= x1[None, None, :]) & (rows < x2[None, None, :]) &
            (cols >= y1[None, None, :]) & (cols < y2[None, None, :]))
    return masks * keep.astype(masks.dtype)


def decode_numpy(offsets: np.ndarray, anchors: np.ndarray, clip: bool = True) -> np.ndarray:
    cxcy = anchors[..., :2] + offsets[..., :2] * VARIANCES[0] * anchors[..., 2:]
    wh = anchors[..., 2:] * np.exp(offsets[..., 2:] * VARIANCES[1])
    x1y1 = cxcy - wh / 2
    x2y2 = wh + x1y1
    boxes = np.concatenate([x1y1, x2y2], axis=-1)
    if clip:
        boxes = np.clip(boxes, 0.0, 1.0)
    return boxes
