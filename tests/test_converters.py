"""Converter tests: labelme->COCO roundtrip through our dataset reader, and
RLE codec self-consistency (plus cross-check against pycocotools if present)."""
import json
import os.path as osp

import numpy as np

from yolact_minimal_tpu.data.coco_io import (COCO, mask_to_rle,
                                             rle_decode_counts,
                                             rle_encode_counts, rle_to_mask)
from yolact_minimal_tpu.data.converters import labelme_to_coco, mask_to_bbox


def test_rle_roundtrip(rng):
    for _ in range(10):
        h, w = rng.randint(5, 60), rng.randint(5, 60)
        mask = (rng.uniform(size=(h, w)) > 0.6).astype(np.uint8)
        rle = mask_to_rle(mask)
        back = rle_to_mask(rle)
        np.testing.assert_array_equal(mask, back)


def test_rle_counts_codec(rng):
    for _ in range(20):
        counts = rng.randint(0, 10000, size=rng.randint(1, 50)).tolist()
        assert rle_decode_counts(rle_encode_counts(counts)) == counts


def test_rle_matches_pycocotools_if_available(rng):
    try:
        import pycocotools.mask as pm
    except ImportError:
        import pytest
        pytest.skip('pycocotools not installed')
    mask = (rng.uniform(size=(37, 53)) > 0.5).astype(np.uint8)
    ours = mask_to_rle(mask)
    theirs = pm.encode(np.asfortranarray(mask))
    assert ours['counts'] == theirs['counts'].decode('ascii')


def test_mask_to_bbox():
    m = np.zeros((20, 30), np.uint8)
    m[5:10, 7:15] = 1
    assert mask_to_bbox(m) == [7, 5, 7, 4]


def test_labelme_to_coco_roundtrip(tmp_path):
    # two labelme files: a polygon and a rectangle
    for i, shapes in enumerate([
        [dict(label='dog', shape_type='polygon',
              points=[[10, 10], [60, 12], [55, 70], [12, 65]])],
        [dict(label='person', shape_type='rectangle',
              points=[[20, 20], [80, 90]])],
    ]):
        with open(tmp_path / f'img{i}.json', 'w') as f:
            json.dump(dict(imageHeight=100, imageWidth=120, shapes=shapes), f)
    with open(tmp_path / 'labels.txt', 'w') as f:
        f.write('background\ndog\nperson\n')

    out = labelme_to_coco(str(tmp_path), str(tmp_path / 'labels.txt'))
    assert osp.exists(out)

    coco = COCO(out)
    assert len(coco.imgs) == 2
    assert len(coco.anns) == 2
    cats = {c['name']: c['id'] for c in coco.dataset['categories']}
    assert cats == {'background': 0, 'dog': 1, 'person': 2}
    # the polygon annotation rasterizes back to a mask
    ann = coco.loadAnns(coco.getAnnIds(list(coco.imgs)[0]))[0]
    mask = coco.annToMask(ann)
    assert mask.sum() > 100
    x, y, w, h = ann['bbox']
    assert w > 0 and h > 0
