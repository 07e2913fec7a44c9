"""Host-side image augmentation pipeline (cv2 + numpy).

Behavioral rebuild of /root/reference/utils/augmentations.py: photometric
distortion (brightness/contrast/HSV saturation+hue), random mirror, random
crop with a bounded retry loop, pad-to-square with random placement,
multi-scale resize to a random multiple of 32 in [256, 768], fit to train
size, box clipping and small-box removal, and mean/std normalization with
BGR->RGB. Runs on the host (not the hot path); every function takes an
explicit `random.Random` so loader workers are independently seeded (the
reference instead warns against numpy RNG in torch workers, coco.py:12).

Returns None on degenerate augmentations; the batcher repairs the batch by
repeating valid samples (the reference's None-collate protocol, coco.py:14-28).
"""
from __future__ import annotations

import random
from typing import Optional, Tuple

import cv2
import numpy as np

from yolact_minimal_tpu.config import NORM_MEAN, NORM_STD


def photometric_distort(img: np.ndarray, rnd: random.Random) -> np.ndarray:
    """Brightness/contrast jitter then HSV saturation/hue jitter
    (reference augmentations.py:38-77)."""
    if rnd.randint(0, 1):
        img = np.clip(img + rnd.uniform(-32, 32), 0.0, 255.0)
    if rnd.randint(0, 1):
        img = np.clip(img * rnd.uniform(0.7, 1.3), 0.0, 255.0)

    hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV)
    hsv[:, :, 1] *= rnd.uniform(0.7, 1.3)
    hue = hsv[:, :, 0] + rnd.uniform(-15.0, 15.0)
    hue = np.where(hue > 360.0, hue - 360.0, hue)
    hue = np.where(hue < 0.0, hue + 360.0, hue)
    hsv[:, :, 0] = hue
    img = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)
    return np.clip(img, 0.0, 255.0)


def random_mirror(img, masks, boxes, rnd: random.Random):
    if rnd.randint(0, 1):
        width = img.shape[1]
        img = img[:, ::-1]
        masks = masks[:, :, ::-1]
        x1 = width - boxes[:, 2]
        x2 = width - boxes[:, 0]
        boxes = boxes.copy()
        boxes[:, 0], boxes[:, 2] = x1, x2
    return img, masks, boxes


def _crop_once(img, masks, boxes, labels, crop_h, crop_w, rnd,
               keep_ratio=0.3, max_tries=1000):
    """Random crop keeping boxes that retain > keep_ratio of their area
    (reference augmentations.py:80-124). Returns None after max_tries."""
    ori_h, ori_w = img.shape[:2]
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for _ in range(max_tries):
        x0 = rnd.randint(0, ori_w - crop_w)
        y0 = rnd.randint(0, ori_h - crop_h)
        ix1 = np.maximum(boxes[:, 0], x0)
        iy1 = np.maximum(boxes[:, 1], y0)
        ix2 = np.minimum(boxes[:, 2], x0 + crop_w)
        iy2 = np.minimum(boxes[:, 3], y0 + crop_h)
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        keep = (inter / areas) > keep_ratio
        if keep.any():
            new_boxes = np.stack([ix1, iy1, ix2, iy2], axis=1)[keep]
            new_boxes[:, [0, 2]] -= x0
            new_boxes[:, [1, 3]] -= y0
            return (img[y0:y0 + crop_h, x0:x0 + crop_w],
                    masks[keep][:, y0:y0 + crop_h, x0:x0 + crop_w],
                    new_boxes.astype(np.float32), labels[keep])
    return None


def random_crop(img, masks, boxes, labels, rnd: random.Random,
                crop_ratio=(0.6, 1.0)):
    if rnd.randint(0, 1):
        return img, masks, boxes, labels
    ori_h, ori_w = img.shape[:2]
    crop_h = int(rnd.uniform(*crop_ratio) * ori_h)
    crop_w = int(rnd.uniform(*crop_ratio) * ori_w)
    return _crop_once(img, masks, boxes, labels, crop_h, crop_w, rnd) or (None,) * 4


def pad_to_square_train(img, masks, boxes, rnd: random.Random):
    h, w = img.shape[:2]
    if h == w:
        return img, masks, boxes
    size = max(h, w)
    out = np.empty((size, size, 3), np.float32)
    out[:] = NORM_MEAN
    pad_masks = np.zeros((masks.shape[0], size, size), np.float32)
    boxes = boxes.copy()
    if h < w:
        y0 = rnd.randint(0, w - h)
        out[y0:y0 + h] = img
        pad_masks[:, y0:y0 + h] = masks
        boxes[:, [1, 3]] += y0
    else:
        x0 = rnd.randint(0, h - w)
        out[:, x0:x0 + w] = img
        pad_masks[:, :, x0:x0 + w] = masks
        boxes[:, [0, 2]] += x0
    return out, pad_masks, boxes


def pad_to_square_eval(img: np.ndarray) -> np.ndarray:
    """Top-left placement, mean padding (reference augmentations.py:163-165)."""
    h, w = img.shape[:2]
    if h == w:
        return img
    size = max(h, w)
    out = np.empty((size, size, 3), np.float32)
    out[:] = NORM_MEAN
    out[:h, :w] = img
    return out


def multi_scale_resize(img, masks, boxes, rnd: random.Random,
                       resize_range=(8, 24)):
    """Resize the square image to a random multiple of 32
    (reference augmentations.py:168-187)."""
    ori = img.shape[0]
    new = rnd.randint(*resize_range) * 32
    img = cv2.resize(img, (new, new))
    boxes = boxes * (new / ori)
    m = cv2.resize(masks.transpose(1, 2, 0), (new, new))
    masks = m[:, :, None].transpose(2, 0, 1) if m.ndim == 2 else m.transpose(2, 0, 1)
    return img, masks, boxes


def fit_to_size(img, masks, boxes, labels, train_size, rnd: random.Random):
    """Pad (random placement) or crop so the square image matches train_size
    (reference to_train_size, augmentations.py:192-209)."""
    size = img.shape[0]
    if size == train_size:
        return img, masks, boxes, labels
    if size < train_size:
        out = np.empty((train_size, train_size, 3), np.float32)
        out[:] = NORM_MEAN
        pad_masks = np.zeros((masks.shape[0], train_size, train_size), np.float32)
        y0 = rnd.randint(0, train_size - size)
        x0 = rnd.randint(0, train_size - size)
        out[y0:y0 + size, x0:x0 + size] = img
        pad_masks[:, y0:y0 + size, x0:x0 + size] = masks
        boxes = boxes.copy()
        boxes[:, [1, 3]] += y0
        boxes[:, [0, 2]] += x0
        return out, pad_masks, boxes, labels
    return _crop_once(img, masks, boxes, labels, train_size, train_size, rnd) \
        or (None,) * 4


def normalize_to_rgb(img: np.ndarray) -> np.ndarray:
    """(img - mean) / std, BGR -> RGB; stays HWC (NHWC model layout)."""
    img = (img - NORM_MEAN) / NORM_STD
    return np.ascontiguousarray(img[:, :, ::-1])


def train_aug(img, masks, boxes, labels, train_size: int,
              rnd: random.Random) -> Optional[Tuple]:
    """Full training pipeline (reference train_aug, augmentations.py:230-252).
    Returns (img HWC RGB normalized, masks [N,S,S], boxes [N,4] in 0..1,
    labels [N]) or None."""
    img = img.astype(np.float32)
    img = photometric_distort(img, rnd)
    img, masks, boxes = random_mirror(img, masks, boxes.astype(np.float32), rnd)
    img, masks, boxes, labels = random_crop(img, masks, boxes, labels, rnd)
    if img is None:
        return None
    img, masks, boxes = pad_to_square_train(img, masks, boxes, rnd)
    img, masks, boxes = multi_scale_resize(img, masks, boxes, rnd)
    img, masks, boxes, labels = fit_to_size(img, masks, boxes, labels, train_size, rnd)
    if img is None:
        return None

    h, w = img.shape[:2]
    boxes[:, [0, 2]] = np.clip(boxes[:, [0, 2]], 0, w - 1)
    boxes[:, [1, 3]] = np.clip(boxes[:, [1, 3]], 0, h - 1)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    keep = areas > 20
    boxes, masks, labels = boxes[keep], masks[keep], labels[keep]
    if boxes.shape[0] == 0:
        return None

    boxes[:, [0, 2]] /= w
    boxes[:, [1, 3]] /= h
    return normalize_to_rgb(img), masks, boxes, labels


def val_aug(img: np.ndarray, val_size: int) -> np.ndarray:
    """Eval-time preprocessing (reference val_aug, augmentations.py:219-227)."""
    img = img.astype(np.float32)
    img = pad_to_square_eval(img)
    img = cv2.resize(img, (val_size, val_size))
    return normalize_to_rgb(img)
