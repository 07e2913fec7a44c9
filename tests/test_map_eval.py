"""Vectorized prep_metrics greedy matching vs a direct port of the
reference's triple loop (common_utils.py:185-216): identical pushes and AP
on randomized detections, including tie and no-gt edge cases."""
import numpy as np

from yolact_minimal_tpu.utils.map_eval import (IOU_THRESHOLDS, APDataObject,
                                               calc_map, make_ap_data,
                                               prep_metrics)

NUM_CLASSES = 6


def _oracle_prep(ap_data, ids_p, scores_p, box_iou, mask_iou, gt_classes):
    """Straight port of the reference loop (common_utils.py:185-216),
    operating on precomputed IoU matrices."""
    ids_p = [int(i) for i in ids_p]
    gt_classes = [int(c) for c in gt_classes]
    for _class in set(ids_p + gt_classes):
        num_gt = gt_classes.count(_class)
        for ti, thre in enumerate(IOU_THRESHOLDS):
            for kind, iou in (('box', box_iou), ('mask', mask_iou)):
                ap_obj = ap_data[kind][ti][_class]
                ap_obj.add_gt_positives(num_gt)
                used = [False] * len(gt_classes)
                for i, pc in enumerate(ids_p):
                    if pc != _class:
                        continue
                    best, best_j = thre, -1
                    for j, gc in enumerate(gt_classes):
                        if used[j] or gc != _class:
                            continue
                        if iou[i, j] > best:
                            best, best_j = iou[i, j], j
                    if best_j >= 0:
                        used[best_j] = True
                        ap_obj.push(float(scores_p[i]), True)
                    else:
                        ap_obj.push(float(scores_p[i]), False)


def _random_case(rng, n_pred, n_gt, img=64, quantize=False):
    ids_p = rng.randint(0, NUM_CLASSES, size=n_pred)
    scores_p = np.sort(rng.uniform(size=n_pred))[::-1].astype(np.float32)
    boxes_p = np.zeros((n_pred, 4), np.float32)
    xy = rng.uniform(0, img * 0.6, size=(n_pred, 2))
    wh = rng.uniform(4, img * 0.5, size=(n_pred, 2))
    boxes_p[:, :2], boxes_p[:, 2:] = xy, xy + wh
    if quantize:   # force exact IoU ties
        boxes_p = np.round(boxes_p / 8) * 8
    masks_p = rng.rand(n_pred, img, img) > 0.6
    gt_classes = rng.randint(0, NUM_CLASSES, size=n_gt)
    gt_boxes = np.zeros((n_gt, 4), np.float32)
    xy = rng.uniform(0, 0.6, size=(n_gt, 2))
    wh = rng.uniform(0.1, 0.4, size=(n_gt, 2))
    gt_boxes[:, :2], gt_boxes[:, 2:] = xy, np.minimum(xy + wh, 1.0)
    if quantize:
        gt_boxes = np.round(gt_boxes * 8) / 8
    gt_masks = rng.rand(n_gt, img, img) > 0.6
    return ids_p, scores_p, boxes_p, masks_p, gt_boxes, gt_classes, gt_masks, img


def _flatten(ap_data):
    out = []
    for kind in ('box', 'mask'):
        for ti in range(len(IOU_THRESHOLDS)):
            for c in range(NUM_CLASSES):
                o = ap_data[kind][ti][c]
                out.append((o.num_gt_positives, tuple(o.data_points)))
    return out


def test_vectorized_matches_reference_loop(rng):
    for trial in range(8):
        n_pred, n_gt = rng.randint(0, 25), rng.randint(0, 10)
        case = _random_case(rng, n_pred, n_gt, quantize=trial % 2 == 0)
        ids_p, scores_p, boxes_p, masks_p, gt_boxes, gt_classes, gt_masks, img = case

        ours = make_ap_data(NUM_CLASSES)
        prep_metrics(ours, ids_p, scores_p, boxes_p, masks_p,
                     gt_boxes, gt_classes, gt_masks, img, img)

        # oracle on the same IoU matrices (recomputed identically)
        gb = gt_boxes * img
        gtm = gt_masks.reshape(n_gt, img * img).astype(np.float32)
        pm = masks_p.reshape(n_pred, img * img).astype(np.float32)
        inter_m = pm @ gtm.T
        union_m = pm.sum(1)[:, None] + gtm.sum(1)[None, :] - inter_m
        mask_iou = np.where(union_m > 0, inter_m / np.maximum(union_m, 1e-9), 0.0)
        bp = boxes_p.astype(np.float32)
        ix1 = np.maximum(bp[:, None, 0], gb[None, :, 0])
        iy1 = np.maximum(bp[:, None, 1], gb[None, :, 1])
        ix2 = np.minimum(bp[:, None, 2], gb[None, :, 2])
        iy2 = np.minimum(bp[:, None, 3], gb[None, :, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        area_p = (bp[:, 2] - bp[:, 0]) * (bp[:, 3] - bp[:, 1])
        area_g = (gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1])
        box_iou = inter / np.maximum(area_p[:, None] + area_g[None, :] - inter,
                                     1e-9)
        ref = make_ap_data(NUM_CLASSES)
        _oracle_prep(ref, ids_p, scores_p, box_iou, mask_iou, gt_classes)

        assert _flatten(ours) == _flatten(ref), f'trial {trial} diverged'
        t_ours = calc_map(ours, NUM_CLASSES)
        t_ref = calc_map(ref, NUM_CLASSES)
        assert t_ours[1] == t_ref[1] and t_ours[2] == t_ref[2]
