"""First-party COCO-protocol evaluator tests with hand-computable cases."""
import json

import numpy as np
import pytest

from yolact_minimal_tpu.data.coco_io import COCO
from yolact_minimal_tpu.utils.cocoeval import COCOEvaluator


def _gt(tmp_path, anns, num_images=2, size=100):
    data = {
        'images': [{'id': i + 1, 'height': size, 'width': size,
                    'file_name': f'{i}.jpg'} for i in range(num_images)],
        'annotations': [dict(id=j + 1, iscrowd=0,
                             area=a['bbox'][2] * a['bbox'][3], **a)
                        for j, a in enumerate(anns)],
        'categories': [{'id': 1, 'name': 'a'}, {'id': 2, 'name': 'b'}],
    }
    p = tmp_path / 'gt.json'
    with open(p, 'w') as f:
        json.dump(data, f)
    return COCO(str(p))


def test_perfect_detections_ap1(tmp_path):
    gt = _gt(tmp_path, [
        dict(image_id=1, category_id=1, bbox=[10, 10, 30, 30], segmentation=[]),
        dict(image_id=2, category_id=1, bbox=[40, 40, 20, 25], segmentation=[]),
    ])
    dets = [dict(image_id=1, category_id=1, bbox=[10, 10, 30, 30], score=0.9),
            dict(image_id=2, category_id=1, bbox=[40, 40, 20, 25], score=0.8)]
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    assert stats[0] == pytest.approx(1.0)   # AP
    assert stats[1] == pytest.approx(1.0)   # AP50
    assert stats[8] == pytest.approx(1.0)   # AR100


def test_false_positive_halves_precision(tmp_path):
    gt = _gt(tmp_path, [
        dict(image_id=1, category_id=1, bbox=[10, 10, 30, 30], segmentation=[]),
    ])
    # one perfect det (higher score) + one pure FP (lower score)
    dets = [dict(image_id=1, category_id=1, bbox=[10, 10, 30, 30], score=0.9),
            dict(image_id=2, category_id=1, bbox=[0, 0, 10, 10], score=0.5)]
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    # recall hits 1.0 at the first det, so interpolated AP stays 1.0
    assert stats[0] == pytest.approx(1.0)

    # FP scored higher than the TP: precision at recall 1.0 is 1/2
    dets[1]['score'] = 0.95
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    assert stats[0] == pytest.approx(0.5, abs=0.01)


def test_localization_threshold(tmp_path):
    """A det with IoU ~0.6 counts at thresholds 0.5-0.6 only -> AP ~3/10."""
    gt = _gt(tmp_path, [
        dict(image_id=1, category_id=1, bbox=[0, 0, 60, 10], segmentation=[]),
    ])
    # overlap 40x10 vs union (60+40-40)x10=60x10 -> wait: det [20,0,40,10]:
    # inter x in [20,60) = 40 wide -> IoU = 400/(600+400-400) = 0.666
    dets = [dict(image_id=1, category_id=1, bbox=[20, 0, 40, 10], score=0.9)]
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    # passes thresholds .50, .55, .60, .65 -> 4/10
    assert stats[0] == pytest.approx(0.4, abs=0.01)


def test_crowd_gt_is_ignore_region(tmp_path):
    gt = _gt(tmp_path, [
        dict(image_id=1, category_id=1, bbox=[10, 10, 30, 30], segmentation=[]),
    ])
    # add a crowd region; a det inside it must be ignored, not a FP
    crowd = dict(id=99, image_id=1, category_id=1, bbox=[60, 60, 30, 30],
                 segmentation=[], iscrowd=1, area=900)
    gt.dataset['annotations'].append(crowd)
    gt.anns[99] = crowd
    gt.imgToAnns[1].append(crowd)

    dets = [dict(image_id=1, category_id=1, bbox=[10, 10, 30, 30], score=0.9),
            dict(image_id=1, category_id=1, bbox=[62, 62, 27, 27], score=0.95)]
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    assert stats[0] == pytest.approx(1.0)


def test_area_ranges(tmp_path):
    gt = _gt(tmp_path, [
        dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20], segmentation=[]),   # small (400)
        dict(image_id=1, category_id=1, bbox=[40, 40, 50, 50], segmentation=[]),   # medium (2500)
    ])
    dets = [dict(image_id=1, category_id=1, bbox=[10, 10, 20, 20], score=0.9)]
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    assert stats[3] == pytest.approx(1.0)   # AP small: matched
    assert stats[4] == pytest.approx(0.0)   # AP medium: missed
