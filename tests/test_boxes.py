"""Golden-value tests for the geometry layer, checked against the reference
implementation (/root/reference/utils/box_utils.py) loaded as a read-only
torch oracle."""
import importlib.util

import numpy as np
import pytest

import jax.numpy as jnp

from yolact_minimal_tpu.ops import boxes as B


def _load_reference_box_utils():
    spec = importlib.util.spec_from_file_location(
        'ref_box_utils', '/root/reference/utils/box_utils.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_box_utils()


def rand_boxes(rng, n):
    """Random well-formed xyxy boxes in [0, 1]."""
    xy1 = rng.uniform(0, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.2, size=(n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)


def test_box_iou_matches_reference(rng):
    import torch
    a, b = rand_boxes(rng, 13), rand_boxes(rng, 7)
    ours = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    theirs = REF.box_iou(torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_box_iou_identity(rng):
    a = rand_boxes(rng, 5)
    iou = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)


def test_box_iou_batched(rng):
    a = np.stack([rand_boxes(rng, 6), rand_boxes(rng, 6)])
    b = np.stack([rand_boxes(rng, 9), rand_boxes(rng, 9)])
    batched = np.asarray(B.box_iou(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        single = np.asarray(B.box_iou(jnp.asarray(a[i]), jnp.asarray(b[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_make_anchors_matches_reference():
    class _Cfg:
        img_size = 544
        aspect_ratios = [1, 1 / 2, 2]

    ours = B.make_anchors(544, (1, 1 / 2, 2), (24, 48, 96, 192, 384))
    ref_flat = []
    import math
    for stride, scale in zip((8, 16, 32, 64, 128), (24, 48, 96, 192, 384)):
        size = math.ceil(544 / stride)
        ref_flat += REF.make_anchors(_Cfg, size, size, scale)
    theirs = np.array(ref_flat, dtype=np.float32).reshape(-1, 4)
    assert ours.shape == theirs.shape == (18525, 4)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


def test_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(B.make_anchors(544, (1, 0.5, 2), (24, 48, 96, 192, 384)))
    gt = rand_boxes(rng, 18525)
    off = B.encode(jnp.asarray(gt), anchors)
    back = B.decode(off, anchors, clip=False)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-3, atol=1e-5)


def test_encode_matches_reference(rng):
    import torch
    anchors = B.make_anchors(544, (1, 0.5, 2), (24, 48, 96, 192, 384))[:50]
    gt = rand_boxes(rng, 50)
    ours = np.asarray(B.encode(jnp.asarray(gt), jnp.asarray(anchors)))
    theirs = REF.encode(torch.tensor(gt), torch.tensor(anchors)).numpy()
    # XLA and torch differ in f32 log rounding; 1e-3 relative is parity here.
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_crop_matches_reference(rng):
    import torch
    masks = rng.uniform(size=(34, 34, 6)).astype(np.float32)
    boxes = rand_boxes(rng, 6)
    ours = np.asarray(B.crop(jnp.asarray(masks), jnp.asarray(boxes)))
    theirs = REF.crop(torch.tensor(masks), torch.tensor(boxes)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    # numpy twin agrees too
    np.testing.assert_allclose(B.crop_numpy(masks, boxes), theirs, atol=1e-6)


def test_mask_iou_matches_reference(rng):
    import torch
    m1 = (rng.uniform(size=(4, 64)) > 0.5).astype(np.float32)
    m2 = (rng.uniform(size=(3, 64)) > 0.5).astype(np.float32)
    ours = np.asarray(B.mask_iou(jnp.asarray(m1), jnp.asarray(m2)))
    theirs = REF.mask_iou(torch.tensor(m1), torch.tensor(m2)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
