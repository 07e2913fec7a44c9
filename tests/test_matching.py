"""Parity tests for the fixed-shape matcher against the reference matcher
(/root/reference/utils/box_utils.py match) run as a torch oracle."""
import importlib.util

import numpy as np

import jax.numpy as jnp

from yolact_minimal_tpu.ops import boxes as B
from yolact_minimal_tpu.ops.matching import match, match_single


def _ref():
    spec = importlib.util.spec_from_file_location(
        'ref_box_utils', '/root/reference/utils/box_utils.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _ref()


class _Cfg:
    pos_iou_thre = 0.5
    neg_iou_thre = 0.4


def _rand_case(rng, num_gt, img_size=160):
    anchors = B.make_anchors(img_size, (1, 0.5, 2),
                             tuple(int(img_size / 544 * s) for s in (24, 48, 96, 192, 384)))
    xy1 = rng.uniform(0, 0.7, size=(num_gt, 2))
    wh = rng.uniform(0.1, 0.3, size=(num_gt, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)
    labels = rng.randint(0, 80, size=num_gt).astype(np.int32)
    return anchors, boxes, labels


def test_match_single_parity(rng):
    import torch
    for trial in range(5):
        num_gt = rng.randint(1, 12)
        anchors, boxes, labels = _rand_case(rng, num_gt)

        ref_off, ref_conf, ref_gtbox, ref_i = REF.match(
            _Cfg, torch.tensor(boxes), torch.tensor(anchors), torch.tensor(labels.astype(np.int64)))

        pad = 16 - num_gt
        boxes_p = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
        labels_p = np.concatenate([labels, np.zeros(pad, np.int32)])
        valid = np.concatenate([np.ones(num_gt, bool), np.zeros(pad, bool)])

        res = match_single(jnp.asarray(boxes_p), jnp.asarray(labels_p),
                           jnp.asarray(valid), jnp.asarray(anchors), 0.5, 0.4)

        np.testing.assert_array_equal(np.asarray(res.conf_gt), ref_conf.numpy())
        np.testing.assert_array_equal(np.asarray(res.anchor_max_i), ref_i.numpy())
        np.testing.assert_allclose(np.asarray(res.anchor_max_gt), ref_gtbox.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.offsets), ref_off.numpy(),
                                   rtol=1e-3, atol=1e-4)


def test_match_force_match_conflict():
    """Two gts whose best anchor is the same: the later gt must win, like the
    reference's sequential overwrite (box_utils.py:72-73)."""
    import torch
    anchors = B.make_anchors(160, (1.0,), (24, 48, 96, 192, 384))
    # Two nearly identical far-off boxes forced onto the same best anchor.
    boxes = np.array([[0.1, 0.1, 0.2, 0.2],
                      [0.1, 0.1, 0.2001, 0.2001]], dtype=np.float32)
    labels = np.array([3, 7], dtype=np.int32)

    ref_off, ref_conf, _, ref_i = REF.match(
        _Cfg, torch.tensor(boxes), torch.tensor(anchors),
        torch.tensor(labels.astype(np.int64)))
    res = match_single(jnp.asarray(boxes), jnp.asarray(labels),
                       jnp.ones(2, bool), jnp.asarray(anchors), 0.5, 0.4)
    np.testing.assert_array_equal(np.asarray(res.conf_gt), ref_conf.numpy())
    np.testing.assert_array_equal(np.asarray(res.anchor_max_i), ref_i.numpy())


def test_match_batched_shapes(rng):
    anchors, boxes, labels = _rand_case(rng, 8)
    bb = np.stack([boxes, boxes])
    ll = np.stack([labels, labels])
    vv = np.ones((2, 8), bool)
    res = match(jnp.asarray(bb), jnp.asarray(ll), jnp.asarray(vv),
                jnp.asarray(anchors), 0.5, 0.4)
    a = anchors.shape[0]
    assert res.offsets.shape == (2, a, 4)
    assert res.conf_gt.shape == (2, a)
    # identical images -> identical matches
    np.testing.assert_array_equal(np.asarray(res.conf_gt[0]), np.asarray(res.conf_gt[1]))
