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


def test_full_protocol_golden(tmp_path):
    """Hand-derived 12-number golden for a combined scenario (crowd ignore +
    area-range ignores + localization thresholds + maxDets), pinning the full
    COCO summary exactly. pycocotools is not installable in this environment,
    so the expected values are derived by hand below, following the published
    protocol (pycocotools cocoeval.py: evaluateImg/accumulate/summarize);
    every number is a closed-form fraction.

    Scenario (images 200x200):
      cat1 gts: g1 img1 [0,0,20,20]   area 400  -> small
                g2 img1 [100,100,50,50] iscrowd=1 (ignore region)
                g3 img2 [0,0,40,40]    area 1600 -> medium
      cat2 gts: g4 img1 [0,100,100,100] area 10000 -> large
      cat1 dets: d1 img1 [0,0,20,16]    s=.90  IoU(g1)=.8, det area 320 (small)
                 d2 img1 [110,110,30,30] s=.85 inside crowd -> ignored, all thrs
                 d3 img2 [0,0,40,20]    s=.70  IoU(g3)=.5, det area 800 (small)
                 d4 img2 [100,100,10,10] s=.60 pure FP, det area 100 (small)
      cat2 dets: d5 img1 [0,100,100,90] s=.95  IoU(g4)=.9, det area 9000 (MEDIUM)

    Derivation highlights:
      cat1 all:  thr .50: TP d1, TP d3, FP d4          -> AP 1.0,    R 1.0
                 thr .55-.80 (6): TP d1, FP d3, FP d4  -> AP 51/101, R .5
                   (rc plateaus at .5; 101-pt interp gives 51 points of 1.0)
                 thr .85-.95 (3): no TP                -> AP 0,      R 0
                 => AP_cat1 = (1 + 6*51/101)/10, AR_cat1 = .4 (any maxDets)
      cat2 all:  TP for thr<=.90 (9 thrs), FP at .95   => AP .9, AR .9
      small:  only g1 counts (g3 out of range -> d3's match is ignored at .50,
              but d3 becomes an in-range FP once unmatched at thr>.50);
              cat2 has no small gt -> excluded        => APs = ARs = 7/10
      medium: only g3 counts; every det except d3@.50 is ignored (matched to
              out-of-range g1, or unmatched+out-of-range)  => APm = ARm = 1/10
      large:  only g4; d5 matched -> TP thr<=.90; at .95 unmatched d5 (area
              9000 = medium) is out-of-range -> ignored, not FP => APl/ARl = .9
    """
    gt = _gt(tmp_path, [
        dict(image_id=1, category_id=1, bbox=[0, 0, 20, 20], segmentation=[]),
        dict(image_id=2, category_id=1, bbox=[0, 0, 40, 40], segmentation=[]),
        dict(image_id=1, category_id=2, bbox=[0, 100, 100, 100], segmentation=[]),
    ], size=200)
    crowd = dict(id=99, image_id=1, category_id=1, bbox=[100, 100, 50, 50],
                 segmentation=[], iscrowd=1, area=2500)
    gt.dataset['annotations'].append(crowd)
    gt.anns[99] = crowd
    gt.imgToAnns[1].append(crowd)

    dets = [
        dict(image_id=1, category_id=1, bbox=[0, 0, 20, 16], score=0.90),
        dict(image_id=1, category_id=1, bbox=[110, 110, 30, 30], score=0.85),
        dict(image_id=2, category_id=1, bbox=[0, 0, 40, 20], score=0.70),
        dict(image_id=2, category_id=1, bbox=[100, 100, 10, 10], score=0.60),
        dict(image_id=1, category_id=2, bbox=[0, 100, 100, 90], score=0.95),
    ]
    expected = [
        (1 + 6 * 51 / 101 + 9) / 20,   # AP   = .65149
        1.0,                           # AP50
        (51 / 101 + 1) / 2,            # AP75 = .75248
        0.7,                           # APs
        0.1,                           # APm
        0.9,                           # APl
        0.65, 0.65, 0.65,              # AR1 / AR10 / AR100
        0.7, 0.1, 0.9,                 # ARs / ARm / ARl
    ]
    e = COCOEvaluator(gt, dets, 'bbox')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    np.testing.assert_allclose(stats, expected, atol=1e-9)

    # segm cross-check: exact rectangular masks of the same boxes must
    # reproduce the identical 12 numbers through the RLE/mask-IoU path
    from yolact_minimal_tpu.data.coco_io import mask_to_rle

    def rect_rle(bbox):
        x, y, w, h = bbox
        m = np.zeros((200, 200), np.uint8)
        m[y:y + h, x:x + w] = 1
        return mask_to_rle(m)

    for a in gt.dataset['annotations']:
        a['segmentation'] = rect_rle(a['bbox'])
    for d in dets:
        d['segmentation'] = rect_rle(d['bbox'])
    e = COCOEvaluator(gt, dets, 'segm')
    e.evaluate(); e.accumulate()
    stats = e.summarize(quiet=True)
    np.testing.assert_allclose(stats, expected, atol=1e-9)


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
