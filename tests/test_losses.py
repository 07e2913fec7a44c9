"""Loss parity tests: our fixed-shape losses vs the reference loss methods
(/root/reference/modules/yolact.py:205-313) invoked as unbound torch oracles
on identical random inputs."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops import boxes as B
from yolact_minimal_tpu.ops import losses as L
from yolact_minimal_tpu.ops.matching import match

sys.path.insert(0, '/root/reference')


class _Cfg:
    num_classes = 11
    pos_iou_thre = 0.5
    neg_iou_thre = 0.4
    conf_alpha = 1.0
    bbox_alpha = 1.5
    mask_alpha = 6.125
    semantic_alpha = 1.0
    masks_to_train = 100


def _ref_yolact():
    from modules.yolact import Yolact
    return Yolact


class _FakeSelf:
    """Carries just the attrs the reference loss methods touch."""
    def __init__(self, cfg):
        self.cfg = cfg


def _make_batch(rng, b=2, g=5, a=900, c=11, ph=32, pw=32, img=128):
    anchors = B.make_anchors(img, (1, 0.5, 2),
                             tuple(int(img / 544 * s) for s in (24, 48, 96, 192, 384)))
    anchors = anchors[rng.choice(len(anchors), a, replace=False)].astype(np.float32)

    xy1 = rng.uniform(0, 0.6, size=(b, g, 2))
    wh = rng.uniform(0.15, 0.35, size=(b, g, 2))
    boxes = np.concatenate([xy1, xy1 + wh], axis=2).astype(np.float32)
    labels = rng.randint(0, c - 1, size=(b, g)).astype(np.int32)

    class_p = rng.normal(size=(b, a, c)).astype(np.float32)
    box_p = rng.normal(scale=0.3, size=(b, a, 4)).astype(np.float32)
    coef_p = np.tanh(rng.normal(size=(b, a, 32))).astype(np.float32)
    proto_p = rng.normal(size=(b, ph, pw, 32)).astype(np.float32)

    masks_full = (rng.uniform(size=(b, g, img, img)) > 0.7).astype(np.float32)
    return anchors, boxes, labels, class_p, box_p, coef_p, proto_p, masks_full


def _torch_match_all(cfg, boxes, labels, anchors):
    import torch
    from utils.box_utils import match as ref_match
    offs, confs, gtboxes, gtis = [], [], [], []
    for i in range(boxes.shape[0]):
        o, cgt, agt, ai = ref_match(cfg, torch.tensor(boxes[i]),
                                    torch.tensor(anchors),
                                    torch.tensor(labels[i].astype(np.int64)))
        offs.append(o); confs.append(cgt); gtboxes.append(agt); gtis.append(ai)
    return (torch.stack(offs), torch.stack(confs),
            torch.stack(gtboxes), torch.stack(gtis))


def test_category_and_box_loss_parity(rng):
    import torch
    cfg = _Cfg()
    anchors, boxes, labels, class_p, box_p, coef_p, proto_p, _ = _make_batch(rng)
    RefYolact = _ref_yolact()
    fake = _FakeSelf(cfg)

    t_off, t_conf, _, _ = _torch_match_all(cfg, boxes, labels, anchors)
    pos_t = t_conf > 0
    ref_c = RefYolact.category_loss(fake, torch.tensor(class_p), t_conf, pos_t).item()
    ref_b = RefYolact.box_loss(fake, torch.tensor(box_p), t_off, pos_t).item()

    m = match(jnp.asarray(boxes), jnp.asarray(labels),
              jnp.ones(labels.shape, bool), jnp.asarray(anchors), 0.5, 0.4)
    ours_c = float(L.category_loss(jnp.asarray(class_p), m.conf_gt, cfg.conf_alpha))
    ours_b = float(L.box_loss(jnp.asarray(box_p), m.offsets, m.conf_gt > 0,
                              cfg.bbox_alpha))
    assert ref_c == pytest.approx(ours_c, rel=1e-4)
    assert ref_b == pytest.approx(ours_b, rel=1e-3)


def test_lincomb_mask_loss_parity(rng):
    """With <= masks_to_train positives there is no random subsample, so the
    losses must agree exactly (up to downsample binarization parity)."""
    import torch
    import torch.nn.functional as F
    cfg = _Cfg()
    anchors, boxes, labels, class_p, box_p, coef_p, proto_p, masks_full = _make_batch(rng)
    RefYolact = _ref_yolact()
    fake = _FakeSelf(cfg)

    t_off, t_conf, t_gtbox, t_gti = _torch_match_all(cfg, boxes, labels, anchors)
    pos_t = t_conf > 0

    # reference wants NHWC proto and a list of full-res gt masks
    ref_m = RefYolact.lincomb_mask_loss(
        fake, pos_t, t_gti, torch.tensor(coef_p), torch.tensor(proto_p),
        [torch.tensor(m) for m in masks_full], t_gtbox).item()

    ph, pw = proto_p.shape[1:3]
    ds = F.interpolate(torch.tensor(masks_full).reshape(-1, 1, *masks_full.shape[2:]),
                       (ph, pw), mode='bilinear', align_corners=False)
    masks_proto = (ds.reshape(*masks_full.shape[:2], ph, pw).numpy() > 0.5).astype(np.float32)

    m = match(jnp.asarray(boxes), jnp.asarray(labels),
              jnp.ones(labels.shape, bool), jnp.asarray(anchors), 0.5, 0.4)
    ours_m = float(L.lincomb_mask_loss(
        m.conf_gt > 0, m.anchor_max_i, jnp.asarray(coef_p), jnp.asarray(proto_p),
        jnp.asarray(masks_proto), m.anchor_max_gt, jax.random.PRNGKey(0),
        cfg.mask_alpha, cfg.masks_to_train))
    assert ref_m == pytest.approx(ours_m, rel=1e-3)


def test_semantic_seg_loss_parity(rng):
    import torch
    import torch.nn.functional as F
    cfg = _Cfg()
    b, g, img, c = 2, 5, 128, 11
    sh = sw = 16
    seg_p = rng.normal(size=(b, sh, sw, c - 1)).astype(np.float32)
    labels = rng.randint(0, c - 1, size=(b, g)).astype(np.int32)
    masks_full = (rng.uniform(size=(b, g, img, img)) > 0.7).astype(np.float32)
    RefYolact = _ref_yolact()
    fake = _FakeSelf(cfg)

    seg_p_nchw = torch.tensor(np.transpose(seg_p, (0, 3, 1, 2)))
    ref_s = RefYolact.semantic_seg_loss(
        fake, seg_p_nchw, [torch.tensor(m) for m in masks_full],
        [torch.tensor(l.astype(np.int64)) for l in labels]).item()

    ds = F.interpolate(torch.tensor(masks_full).reshape(-1, 1, img, img),
                       (sh, sw), mode='bilinear', align_corners=False)
    masks_seg = (ds.reshape(b, g, sh, sw).numpy() > 0.5).astype(np.float32)

    ours_s = float(L.semantic_seg_loss(
        jnp.asarray(seg_p), jnp.asarray(masks_seg), jnp.asarray(labels),
        jnp.ones((b, g), bool), cfg.semantic_alpha))
    assert ref_s == pytest.approx(ours_s, rel=1e-4)


def test_padded_gt_invariance(rng):
    """Adding padded (invalid) gt rows must not change any loss."""
    cfg = _Cfg()
    anchors, boxes, labels, class_p, box_p, coef_p, proto_p, masks_full = _make_batch(rng)
    b, g = labels.shape
    ph, pw = proto_p.shape[1:3]

    import torch
    import torch.nn.functional as F
    ds = F.interpolate(torch.tensor(masks_full).reshape(-1, 1, *masks_full.shape[2:]),
                       (ph, pw), mode='bilinear', align_corners=False)
    masks_proto = (ds.reshape(b, g, ph, pw).numpy() > 0.5).astype(np.float32)

    def loss_of(bb, ll, vv, mm):
        m = match(jnp.asarray(bb), jnp.asarray(ll), jnp.asarray(vv),
                  jnp.asarray(anchors), 0.5, 0.4)
        pos = m.conf_gt > 0
        c = L.category_loss(jnp.asarray(class_p), m.conf_gt, cfg.conf_alpha)
        bx = L.box_loss(jnp.asarray(box_p), m.offsets, pos, cfg.bbox_alpha)
        mk = L.lincomb_mask_loss(pos, m.anchor_max_i, jnp.asarray(coef_p),
                                 jnp.asarray(proto_p), jnp.asarray(mm),
                                 m.anchor_max_gt, jax.random.PRNGKey(0),
                                 cfg.mask_alpha, cfg.masks_to_train)
        return float(c), float(bx), float(mk)

    base = loss_of(boxes, labels, np.ones((b, g), bool), masks_proto)

    pad = 4
    boxes_p = np.concatenate([boxes, rng.uniform(size=(b, pad, 4)).astype(np.float32)], 1)
    labels_p = np.concatenate([labels, np.zeros((b, pad), np.int32)], 1)
    valid_p = np.concatenate([np.ones((b, g), bool), np.zeros((b, pad), bool)], 1)
    masks_p = np.concatenate([masks_proto, np.zeros((b, pad, ph, pw), np.float32)], 1)
    padded = loss_of(boxes_p, labels_p, valid_p, masks_p)

    np.testing.assert_allclose(base, padded, rtol=1e-5)
