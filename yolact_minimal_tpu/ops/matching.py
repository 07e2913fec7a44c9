"""Anchor-to-ground-truth matching (fixed shape, vmapped over the batch).

TPU-native redesign of the reference per-image matcher
(/root/reference/utils/box_utils.py:57-83, called in a Python loop at
yolact.py:181-185). Here ground truth arrives padded to a static MAX_GT with
a validity mask, and the whole batch is matched by one vectorized graph.

Semantics replicated exactly:
  * per-anchor best gt by IoU;
  * force-match: for each gt, its best anchor gets IoU := 2 and gt index := j
    (later gts overwrite earlier ones on conflict, like the reference's
    sequential loop at box_utils.py:72-73);
  * thresholds: conf = class+1 if IoU >= pos_thre, -1 (neutral) if
    neg_thre <= IoU < pos_thre, 0 (background) if IoU < neg_thre;
  * offsets = SSD encode of the matched gt box against the anchor.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops.boxes import box_iou, encode


class MatchResult(NamedTuple):
    offsets: jnp.ndarray      # [..., A, 4] encoded regression targets
    conf_gt: jnp.ndarray      # [..., A] int32: >0 fg class, 0 bg, -1 neutral
    anchor_max_gt: jnp.ndarray  # [..., A, 4] matched gt box per anchor (xyxy)
    anchor_max_i: jnp.ndarray   # [..., A] int32 index of matched gt


def match_single(boxes_gt: jnp.ndarray, labels_gt: jnp.ndarray,
                 gt_valid: jnp.ndarray, anchors: jnp.ndarray,
                 pos_thre: float, neg_thre: float) -> MatchResult:
    """Match one image's padded gt against all anchors.

    Args:
      boxes_gt: [G, 4] xyxy in [0, 1], padded rows arbitrary.
      labels_gt: [G] int32 0-based class ids.
      gt_valid: [G] bool validity of each gt row.
      anchors: [A, 4] cxcywh.
      pos_thre/neg_thre: IoU thresholds (cfg.pos_iou_thre/neg_iou_thre).
    """
    num_gt = boxes_gt.shape[0]
    decoded = jnp.concatenate(
        [anchors[:, :2] - anchors[:, 2:] / 2,
         anchors[:, :2] + anchors[:, 2:] / 2], axis=1)

    overlaps = box_iou(boxes_gt, decoded)                  # [G, A]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    gt_max_i = jnp.argmax(overlaps, axis=1)                # [G] best anchor per gt
    anchor_max = jnp.max(overlaps, axis=0)                 # [A]
    anchor_max_i = jnp.argmax(overlaps, axis=0)            # [A]

    # Force-match each gt's best anchor. The reference loops j in order so a
    # later gt overwrites an earlier one that picked the same anchor; we
    # replicate that with a max over the gt index of claimants per anchor.
    gt_ids = jnp.arange(num_gt, dtype=jnp.int32)
    claims = (gt_max_i[:, None] ==
              jnp.arange(anchors.shape[0], dtype=jnp.int32)[None, :])   # [G, A]
    claims = claims & gt_valid[:, None]
    claimant = jnp.max(jnp.where(claims, gt_ids[:, None], -1), axis=0)  # [A]
    forced = claimant >= 0

    anchor_max = jnp.where(forced, 2.0, anchor_max)
    anchor_max_i = jnp.where(forced, claimant, anchor_max_i).astype(jnp.int32)

    anchor_max_gt = boxes_gt[anchor_max_i]                 # [A, 4]
    conf = labels_gt[anchor_max_i].astype(jnp.int32) + 1
    conf = jnp.where(anchor_max < pos_thre, -1, conf)
    conf = jnp.where(anchor_max < neg_thre, 0, conf)

    offsets = encode(anchor_max_gt, anchors)
    return MatchResult(offsets, conf, anchor_max_gt, anchor_max_i)


def match(boxes_gt: jnp.ndarray, labels_gt: jnp.ndarray, gt_valid: jnp.ndarray,
          anchors: jnp.ndarray, pos_thre: float, neg_thre: float) -> MatchResult:
    """Batched matcher: boxes_gt [B, G, 4], labels_gt [B, G], gt_valid [B, G]."""
    return jax.vmap(match_single, in_axes=(0, 0, 0, None, None, None))(
        boxes_gt, labels_gt, gt_valid, anchors, pos_thre, neg_thre)
