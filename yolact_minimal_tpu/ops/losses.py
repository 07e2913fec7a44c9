"""YOLACT losses as pure fixed-shape functions.

TPU-native rebuild of the reference loss block
(/root/reference/modules/yolact.py:166-313). Every ragged construct in the
reference — boolean-mask gathers in OHEM, per-image Python loops and random
subsampling in the lincomb mask loss, the per-object scatter loop in the
semantic-seg loss — becomes a fixed-shape masked computation so the whole
training step is one jitted XLA graph:

  * OHEM keeps the reference's sort-based rank threshold (already
    shape-stable) with validity masks instead of boolean indexing;
  * the lincomb mask loss selects up to `masks_to_train` positives per image
    via top-k over random priorities (exactly "all if <=K else a uniform
    random subset of K"), then computes a dense [ph, pw, K] masked BCE;
  * the semantic-seg target is a scatter-max over the class axis.

Ground-truth masks arrive already downsampled + binarized at prototype and
seg resolutions (the data pipeline applies the same bilinear
align_corners=False downsample the reference does in-loss at
yolact.py:247-251, 302-304).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops.boxes import crop
from yolact_minimal_tpu.ops.matching import MatchResult, match


class LossBreakdown(NamedTuple):
    loss_c: jnp.ndarray
    loss_b: jnp.ndarray
    loss_m: jnp.ndarray
    loss_s: jnp.ndarray

    @property
    def total(self):
        return self.loss_c + self.loss_b + self.loss_m + self.loss_s


def _log_clamped(x):
    """log(x) clamped at -100 (torch binary_cross_entropy semantics) with a
    SAFE gradient at x == 0. crop() zeroes mask_p exactly outside the gt box,
    and a naive `maximum(log(x), -100)` there yields grad 0 * inf = NaN,
    which poisons the whole parameter tree after one update."""
    safe = jnp.log(jnp.maximum(x, 1e-30))
    return jnp.where(x > 0, jnp.maximum(safe, -100.0), -100.0)


def category_loss(class_p: jnp.ndarray, conf_gt: jnp.ndarray,
                  conf_alpha: float, np_ratio: int = 3) -> jnp.ndarray:
    """Softmax CE with OHEM hard-negative mining, neg:pos = 3:1
    (reference yolact.py:205-232)."""
    b, a, c = class_p.shape
    pos = conf_gt > 0
    neutral = conf_gt < 0

    # Background "hardness": log-sum-exp minus background logit.
    mark = jax.nn.logsumexp(class_p, axis=-1) - class_p[..., 0]   # [B, A]
    mark = jnp.where(pos | neutral, 0.0, mark)

    order = jnp.argsort(-mark, axis=1)
    rank = jnp.argsort(order, axis=1)
    num_pos = jnp.sum(pos, axis=1, keepdims=True)
    num_neg = jnp.clip(np_ratio * num_pos, max=a - 1)
    neg = (rank < num_neg) & ~pos & ~neutral

    target = jnp.clip(conf_gt, 0)                                  # neutral -> bg (masked out anyway)
    logp = jax.nn.log_softmax(class_p, axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    ce_sum = jnp.sum(jnp.where(pos | neg, ce, 0.0))
    return conf_alpha * ce_sum / jnp.maximum(jnp.sum(num_pos), 1)


def box_loss(box_p: jnp.ndarray, offsets_gt: jnp.ndarray, pos: jnp.ndarray,
             bbox_alpha: float) -> jnp.ndarray:
    """Smooth-L1 on encoded offsets, positives only (reference yolact.py:234-239)."""
    diff = jnp.abs(box_p - offsets_gt)
    sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    loss = jnp.sum(jnp.where(pos[..., None], sl1, 0.0))
    return bbox_alpha * loss / jnp.maximum(jnp.sum(pos), 1)


def _lincomb_single(proto, coef_p, pos, anchor_max_i, anchor_max_gt,
                    masks_proto, rng, masks_to_train):
    """Per-image lincomb mask loss numerator (reference yolact.py:245-289).
    Returns the image's summed, area-normalized loss (pre global scaling)."""
    ph, pw = proto.shape[0], proto.shape[1]

    # Select up to masks_to_train positives: random priorities + top_k gives
    # "all positives if <= K, else a uniform random K-subset" — matching the
    # reference randperm subsample (yolact.py:261-267).
    priority = jnp.where(pos, jax.random.uniform(rng, pos.shape), -jnp.inf)
    _, sel = jax.lax.top_k(priority, min(masks_to_train, pos.shape[0]))   # [K]
    sel_valid = pos[sel]                                           # [K]

    sel_coef = coef_p[sel]                                         # [K, 32]
    sel_box = anchor_max_gt[sel]                                   # [K, 4]
    sel_gt_i = anchor_max_i[sel]                                   # [K]
    mask_gt = jnp.transpose(masks_proto[sel_gt_i], (1, 2, 0))      # [ph, pw, K]
    mask_gt = mask_gt.astype(jnp.float32)                          # uint8 on the wire

    mask_p = jax.nn.sigmoid(
        jnp.matmul(proto, sel_coef.T, preferred_element_type=jnp.float32))
    mask_p = crop(mask_p, sel_box)                                 # zeros outside box
    bce = -(mask_gt * _log_clamped(mask_p) +
            (1.0 - mask_gt) * _log_clamped(1.0 - mask_p))

    area = ((sel_box[:, 2] - sel_box[:, 0]) *
            (sel_box[:, 3] - sel_box[:, 1]))
    per_pos = jnp.sum(bce, axis=(0, 1)) / jnp.maximum(area, 1e-10)
    per_pos = jnp.where(sel_valid, per_pos, 0.0)

    # If we subsampled, rescale like the reference (yolact.py:286-287).
    old_num_pos = jnp.sum(pos)
    num_used = jnp.minimum(old_num_pos, masks_to_train)
    scale = jnp.where(old_num_pos > num_used,
                      old_num_pos / jnp.maximum(num_used, 1), 1.0)
    return jnp.sum(per_pos) * scale


def lincomb_mask_loss(pos, anchor_max_i, coef_p, proto_p, masks_proto, anchor_max_gt,
                      rng, mask_alpha: float, masks_to_train: int) -> jnp.ndarray:
    """Batched lincomb mask loss (reference yolact.py:241-291)."""
    b = coef_p.shape[0]
    ph, pw = proto_p.shape[1], proto_p.shape[2]
    rngs = jax.random.split(rng, b)
    per_img = jax.vmap(_lincomb_single, in_axes=(0, 0, 0, 0, 0, 0, 0, None))(
        proto_p, coef_p, pos, anchor_max_i, anchor_max_gt, masks_proto,
        rngs, masks_to_train)
    total_pos = jnp.maximum(jnp.sum(pos), 1)
    return mask_alpha * jnp.sum(per_img) / ph / pw / total_pos


def semantic_seg_loss(seg_p, masks_seg, labels_gt, gt_valid,
                      semantic_alpha: float) -> jnp.ndarray:
    """Auxiliary semantic-seg loss (reference yolact.py:293-313). seg_p is
    NHWC [B, sh, sw, C-1]; the target is a per-class max over gt masks."""
    b, sh, sw, c = seg_p.shape

    def build_target(masks, labels, valid):
        masks = masks.astype(jnp.float32)          # uint8 on the wire
        m = masks * valid[:, None, None].astype(masks.dtype)
        return jnp.zeros((c, sh, sw), masks.dtype).at[labels].max(m)

    seg_gt = jax.vmap(build_target)(masks_seg, labels_gt, gt_valid)  # [B, C-1, sh, sw]
    seg_gt = jnp.transpose(seg_gt, (0, 2, 3, 1))                     # NHWC

    x = seg_p
    bce = jnp.maximum(x, 0.0) - x * seg_gt + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return semantic_alpha * jnp.sum(bce) / sh / sw / b


def compute_loss(cfg, outputs, gt, anchors, rng) -> LossBreakdown:
    """Full loss over a batch (reference compute_loss, yolact.py:166-203).

    Args:
      outputs: (class_p, box_p, coef_p, proto_p, seg_p) from Yolact train fwd.
      gt: dict with 'boxes' [B,G,4], 'labels' [B,G], 'valid' [B,G],
          'masks_proto' [B,G,ph,pw], 'masks_seg' [B,G,sh,sw].
      anchors: [A, 4] cxcywh.
      rng: PRNG key for the mask-loss subsample.
    """
    class_p, box_p, coef_p, proto_p, seg_p = outputs
    m: MatchResult = match(gt['boxes'], gt['labels'], gt['valid'], anchors,
                           cfg.pos_iou_thre, cfg.neg_iou_thre)
    pos = m.conf_gt > 0
    loss_c = category_loss(class_p, m.conf_gt, cfg.conf_alpha)
    loss_b = box_loss(box_p, m.offsets, pos, cfg.bbox_alpha)
    loss_m = lincomb_mask_loss(pos, m.anchor_max_i, coef_p, proto_p,
                               gt['masks_proto'], m.anchor_max_gt, rng,
                               cfg.mask_alpha, cfg.masks_to_train)
    loss_s = semantic_seg_loss(seg_p, gt['masks_seg'], gt['labels'],
                               gt['valid'], cfg.semantic_alpha)
    return LossBreakdown(loss_c, loss_b, loss_m, loss_s)
