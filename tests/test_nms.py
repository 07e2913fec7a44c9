"""Fixed-shape fast-NMS parity against the reference torch fast_nms
(reimplemented inline from its published semantics as an oracle via the
reference's own numpy twin — output_utils.py:46-81 — which needs no Cython)."""
import numpy as np

import jax.numpy as jnp

from yolact_minimal_tpu.ops import boxes as B
from yolact_minimal_tpu.ops.nms import assemble_masks, detect_postprocess, fast_nms


class _Cfg:
    nms_score_thre = 0.05
    nms_iou_thre = 0.5
    top_k = 200
    max_detections = 100


def _reference_fast_nms_numpy(box_thre, coef_thre, class_thre, cfg):
    """Oracle: the reference algorithm on dynamically filtered inputs
    (mirrors output_utils.py:46-81 semantics)."""
    idx = np.argsort(-class_thre, axis=1, kind='stable')
    class_sorted = -np.sort(-class_thre, axis=1, kind='stable')
    idx = idx[:, :cfg.top_k]
    class_sorted = class_sorted[:, :cfg.top_k]
    num_classes, num_dets = idx.shape
    boxes = box_thre[idx.reshape(-1), :].reshape(num_classes, num_dets, 4)
    coefs = coef_thre[idx.reshape(-1), :].reshape(num_classes, num_dets, -1)
    iou = B.box_iou_numpy(boxes, boxes)
    iou = np.triu(iou, k=1)
    iou_max = np.max(iou, axis=1)
    keep = iou_max <= cfg.nms_iou_thre
    class_ids = np.tile(np.arange(num_classes)[:, None], (1, num_dets))
    class_ids, boxes, coefs, scores = (class_ids[keep], boxes[keep],
                                       coefs[keep], class_sorted[keep])
    order = np.argsort(-scores, kind='stable')[:cfg.max_detections]
    return boxes[order], coefs[order], class_ids[order], scores[order]


def _rand_preds(rng, num_anchors=600, num_classes=11):
    class_p = rng.dirichlet(np.ones(num_classes) * 0.1, size=num_anchors).astype(np.float32)
    anchors = B.make_anchors(160, (1, 0.5, 2),
                             tuple(int(160 / 544 * s) for s in (24, 48, 96, 192, 384)))
    anchors = anchors[rng.choice(len(anchors), num_anchors, replace=False)]
    box_p = rng.normal(scale=0.5, size=(num_anchors, 4)).astype(np.float32)
    coef_p = np.tanh(rng.normal(size=(num_anchors, 32))).astype(np.float32)
    return class_p, box_p, coef_p, anchors.astype(np.float32)


def test_fast_nms_parity(rng):
    cfg = _Cfg()
    class_p, box_p, coef_p, anchors = _rand_preds(rng)

    dets = detect_postprocess(jnp.asarray(class_p), jnp.asarray(box_p),
                              jnp.asarray(coef_p), jnp.asarray(anchors),
                              cfg.nms_score_thre, cfg.nms_iou_thre,
                              cfg.top_k, cfg.max_detections)
    n_valid = int(np.asarray(dets.valid).sum())
    ours_scores = np.asarray(dets.scores)[:n_valid]
    ours_boxes = np.asarray(dets.boxes)[:n_valid]
    ours_ids = np.asarray(dets.ids)[:n_valid]

    # Oracle path: dynamic filter first, like the reference nms().
    scores_all = class_p[:, 1:].T
    keep = scores_all.max(axis=0) > cfg.nms_score_thre
    decoded = np.asarray(B.decode(jnp.asarray(box_p), jnp.asarray(anchors), clip=True))
    rb, rc, rids, rsc = _reference_fast_nms_numpy(
        decoded[keep], coef_p[keep], scores_all[:, keep], cfg)

    assert n_valid == len(rsc)
    np.testing.assert_allclose(np.sort(ours_scores), np.sort(rsc), atol=1e-6)
    # Compare as sets ordered by score (ties may reorder across impls).
    order_o = np.lexsort((ours_ids, -ours_scores))
    order_r = np.lexsort((rids, -rsc))
    np.testing.assert_array_equal(ours_ids[order_o], rids[order_r])
    np.testing.assert_allclose(ours_boxes[order_o], rb[order_r], atol=1e-5)


def test_fast_nms_empty(rng):
    """All scores below threshold -> zero valid detections, fixed shape."""
    cfg = _Cfg()
    class_p, box_p, coef_p, anchors = _rand_preds(rng, num_anchors=100)
    class_p = np.full_like(class_p, 1e-4)
    class_p[:, 0] = 1.0  # everything background
    dets = detect_postprocess(jnp.asarray(class_p), jnp.asarray(box_p),
                              jnp.asarray(coef_p), jnp.asarray(anchors),
                              cfg.nms_score_thre, cfg.nms_iou_thre,
                              cfg.top_k, cfg.max_detections)
    assert dets.boxes.shape == (cfg.max_detections, 4)
    assert int(np.asarray(dets.valid).sum()) == 0


def test_assemble_masks_shapes(rng):
    cfg = _Cfg()
    class_p, box_p, coef_p, anchors = _rand_preds(rng, num_anchors=200)
    dets = detect_postprocess(jnp.asarray(class_p), jnp.asarray(box_p),
                              jnp.asarray(coef_p), jnp.asarray(anchors),
                              cfg.nms_score_thre, cfg.nms_iou_thre,
                              cfg.top_k, cfg.max_detections)
    proto = jnp.asarray(rng.normal(size=(40, 40, 32)).astype(np.float32))
    masks = assemble_masks(proto, dets)
    assert masks.shape == (40, 40, cfg.max_detections)
    # invalid slots are zeroed
    invalid = ~np.asarray(dets.valid)
    assert np.all(np.asarray(masks)[:, :, invalid] == 0)
