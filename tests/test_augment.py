"""Augmentation invariants (behavioral spec from reference
utils/augmentations.py)."""
import random

import numpy as np

from yolact_minimal_tpu.data import augment as A
from yolact_minimal_tpu.config import NORM_MEAN, NORM_STD


def _sample(rng, h=120, w=160, n=3):
    img = rng.randint(0, 255, size=(h, w, 3)).astype(np.float32)
    masks = np.zeros((n, h, w), np.float32)
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        x1, y1 = rng.randint(0, w - 40), rng.randint(0, h - 40)
        bw, bh = rng.randint(20, 40), rng.randint(20, 40)
        masks[i, y1:y1 + bh, x1:x1 + bw] = 1
        boxes[i] = [x1, y1, x1 + bw, y1 + bh]
    labels = rng.randint(0, 4, size=n).astype(np.int32)
    return img, masks, boxes, labels


def test_mirror_flips_boxes_consistently(rng):
    img, masks, boxes, _ = _sample(rng)

    class AlwaysFlip(random.Random):
        def randint(self, a, b):
            return 1
    img2, masks2, boxes2 = A.random_mirror(img, masks, boxes.copy(), AlwaysFlip())
    w = img.shape[1]
    np.testing.assert_allclose(boxes2[:, 0], w - boxes[:, 2])
    np.testing.assert_allclose(boxes2[:, 2], w - boxes[:, 0])
    np.testing.assert_array_equal(np.asarray(img2[:, ::-1]), img)
    # boxes still well-formed
    assert (boxes2[:, 2] > boxes2[:, 0]).all()


def test_pad_to_square_train_keeps_mask_box_alignment(rng):
    rnd = random.Random(0)
    img, masks, boxes, _ = _sample(rng, h=100, w=160)
    img2, masks2, boxes2 = A.pad_to_square_train(img, masks, boxes.copy(), rnd)
    assert img2.shape[0] == img2.shape[1] == 160
    # each mask's bounding box must still match its box
    for i in range(len(boxes2)):
        ys, xs = np.nonzero(masks2[i])
        np.testing.assert_allclose(
            [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], boxes2[i], atol=1)


def test_eval_pad_is_topleft_mean(rng):
    img = rng.randint(0, 255, size=(100, 160, 3)).astype(np.float32)
    out = A.pad_to_square_eval(img)
    assert out.shape == (160, 160, 3)
    np.testing.assert_array_equal(out[:100, :160], img)
    np.testing.assert_allclose(out[100:, :],
                               np.broadcast_to(NORM_MEAN, (60, 160, 3)))


def test_normalize_to_rgb(rng):
    img = rng.randint(0, 255, size=(8, 8, 3)).astype(np.float32)
    out = A.normalize_to_rgb(img)
    # channel order reversed, normalized
    np.testing.assert_allclose(out[..., 0], (img[..., 2] - NORM_MEAN[2]) / NORM_STD[2],
                               rtol=1e-5)


def test_train_aug_outputs_well_formed(rng):
    rnd = random.Random(3)
    ok = 0
    for _ in range(10):
        img, masks, boxes, labels = _sample(rng, h=200, w=260, n=4)
        out = A.train_aug(img, masks, boxes, labels, 128, rnd)
        if out is None:
            continue
        ok += 1
        im, ms, bx, lb = out
        assert im.shape == (128, 128, 3)
        assert ms.shape[1:] == (128, 128)
        assert bx.min() >= 0 and bx.max() <= 1
        assert (bx[:, 2] > bx[:, 0]).all() and (bx[:, 3] > bx[:, 1]).all()
        assert len(lb) == len(bx) == len(ms)
    assert ok >= 5, f'too many failed augmentations: {ok}/10'
