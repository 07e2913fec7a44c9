"""Native C++ greedy NMS vs a pure-python oracle with the reference's
conventions (+1 pixel areas, suppression at IoU >= threshold; see
/root/reference/cython_nms.pyx:24-74)."""
import numpy as np

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
