"""Native C++ greedy NMS vs a pure-python oracle with the reference's
conventions (+1 pixel areas, suppression at IoU >= threshold; see
/root/reference/cython_nms.pyx:24-74)."""
import numpy as np
import pytest

from yolact_minimal_tpu.ops.traditional_nms import greedy_nms, traditional_nms


def _oracle_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind='stable')
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[oi + 1:]:
            if suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                suppressed[j] = True
    return np.array(keep)


def test_greedy_nms_matches_oracle(rng):
    for _ in range(5):
        n = rng.randint(5, 80)
        xy1 = rng.uniform(0, 400, size=(n, 2))
        wh = rng.uniform(20, 150, size=(n, 2))
        boxes = np.concatenate([xy1, xy1 + wh], 1).astype(np.float32)
        scores = rng.uniform(size=n).astype(np.float32)
        ours = greedy_nms(boxes, scores, 0.5)
        ref = _oracle_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(ours, ref)


def test_greedy_nms_suppresses_duplicates():
    boxes = np.array([[10, 10, 100, 100], [12, 12, 102, 102],
                      [300, 300, 400, 400]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(keep, [0, 2])


def test_traditional_nms_full_path(rng):
    a, c = 200, 6
    boxes = np.concatenate([rng.uniform(0, 0.7, (a, 2)),
                            rng.uniform(0.05, 0.25, (a, 2))], 1)
    boxes[:, 2:] += boxes[:, :2]
    boxes = boxes.astype(np.float32)
    coefs = rng.normal(size=(a, 32)).astype(np.float32)
    scores = rng.dirichlet(np.ones(c) * 0.1, size=a).T.astype(np.float32)
    b, cf, ids, sc = traditional_nms(boxes, coefs, scores, 544, 0.05, 0.5, 100)
    assert len(b) == len(cf) == len(ids) == len(sc) <= 100
    assert (np.diff(sc) <= 1e-6).all()   # sorted descending
    assert ids.max() < c


@pytest.mark.slow
def test_detector_traditional_dispatch(rng):
    """--traditional_nms wiring: Detector must dispatch to the C++ greedy
    path and its padded slate must roughly agree with fast-NMS on the same
    crafted predictions (reference output_utils.py:126-134 dispatch)."""
    import jax
    import jax.numpy as jnp
    from yolact_minimal_tpu.config import get_config
    from yolact_minimal_tpu.models.yolact import Yolact
    from yolact_minimal_tpu.ops.boxes import decode
    from yolact_minimal_tpu.ops.nms import (assemble_masks,
                                            detect_postprocess_batch)
    from yolact_minimal_tpu.pipeline import Detector

    img = 128
    cfg = get_config('res50_custom', mode='val', img_size=img,
                     traditional_nms=True)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img, img, 3), jnp.float32),
                           train=False)
    det = Detector(cfg, variables)
    a = det.anchors.shape[0]

    # craft predictions: 3 confident, spatially separated detections
    class_p = np.full((1, a, cfg.num_classes), 1e-4, np.float32)
    class_p[..., 0] = 0.9
    hot = [10, a // 2, a - 20]
    for k, anchor_idx in enumerate(hot):
        class_p[0, anchor_idx, :] = 1e-4
        class_p[0, anchor_idx, k + 1] = 0.95
    box_p = np.zeros((1, a, 4), np.float32)          # offsets 0 -> anchor box
    coef_p = rng.normal(size=(1, a, 32)).astype(np.float32)
    proto = rng.uniform(size=(1, img // 4, img // 4, 32)).astype(np.float32)

    # monkeypatch the device half with the crafted raw outputs
    boxes_dec = decode(jnp.asarray(box_p), det.anchors, clip=True)
    det._infer_raw = lambda imgs: (jnp.asarray(class_p), boxes_dec,
                                   jnp.asarray(coef_p), jnp.asarray(proto))

    dets, masks_proto, proto_out = det(jnp.zeros((1, img, img, 3)))
    valid = np.asarray(dets.valid[0])
    assert valid.any(), 'traditional path produced no detections'

    # fast-NMS on the same predictions
    fast = detect_postprocess_batch(
        jnp.asarray(class_p), jnp.asarray(box_p), jnp.asarray(coef_p),
        det.anchors, cfg.nms_score_thre, cfg.nms_iou_thre, cfg.top_k,
        cfg.max_detections)
    fvalid = np.asarray(fast.valid[0])

    def top3(d, v):
        order = np.argsort(-np.asarray(d.scores[0])[v])[:3]
        return (np.asarray(d.ids[0])[v][order],
                np.asarray(d.boxes[0])[v][order])
    t_ids, t_boxes = top3(dets, valid)
    f_ids, f_boxes = top3(fast, fvalid)
    np.testing.assert_array_equal(np.sort(t_ids), np.sort(f_ids))
    np.testing.assert_allclose(np.sort(t_boxes, 0), np.sort(f_boxes, 0),
                               atol=1e-3)

    # the host tail must accept the numpy slate unchanged
    det0 = type(dets)(*(x[0] for x in dets))
    ids, scores, boxes_px, masks = det.postprocess_host(
        det0, masks_proto[0], img, img, visual_thre=0.5)
    assert len(ids) >= 3 and masks.shape[1:] == (img, img)
