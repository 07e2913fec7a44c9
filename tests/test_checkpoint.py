"""Checkpoint filename-contract and roundtrip tests (reference
common_utils.py:41-63, train.py:51-53)."""
import os

import numpy as np

from yolact_minimal_tpu.config import cfg_name_from_weight
from yolact_minimal_tpu.utils.checkpoint import (load_checkpoint, save_best,
                                                 save_checkpoint, save_latest,
                                                 step_from_name)


def _vars(rng):
    return {'params': {'layer': {'kernel': rng.rand(3, 3).astype(np.float32)}},
            'batch_stats': {'bn': {'mean': rng.rand(3).astype(np.float32)}}}


def test_roundtrip(tmp_path, rng):
    v = _vars(rng)
    path = str(tmp_path / 'x.ckpt')
    save_checkpoint(path, v)
    back = load_checkpoint(path)
    np.testing.assert_array_equal(back['params']['layer']['kernel'],
                                  v['params']['layer']['kernel'])


def test_best_keeps_one_and_compares_map(tmp_path, rng):
    wd = str(tmp_path)
    v = _vars(rng)
    p1 = save_best(v, 10.5, 'res50_coco', 100, weight_dir=wd)
    assert p1 and os.path.exists(p1)
    # worse mAP -> not saved
    assert save_best(v, 9.0, 'res50_coco', 200, weight_dir=wd) is None
    assert os.path.exists(p1)
    # better mAP -> replaces
    p2 = save_best(v, 11.25, 'res50_coco', 300, weight_dir=wd)
    assert p2 and os.path.exists(p2) and not os.path.exists(p1)
    assert len(os.listdir(wd)) == 1


def test_latest_keeps_one(tmp_path, rng):
    wd = str(tmp_path)
    v = _vars(rng)
    p1 = save_latest(v, 'res50_coco', 100, weight_dir=wd)
    p2 = save_latest(v, 'res50_coco', 200, weight_dir=wd)
    assert not os.path.exists(p1) and os.path.exists(p2)


def test_filename_metadata_parsing():
    assert step_from_name('weights/best_30.5_res101_coco_392000.ckpt') == 392000
    assert step_from_name('latest_res50_custom_25.ckpt') == 25
    assert cfg_name_from_weight('weights/best_30.5_res101_coco_392000.ckpt') \
        == 'res101_coco'
    assert cfg_name_from_weight('weights/best_28.8_res50_coco_800000.pth') \
        == 'res50_coco'
    assert cfg_name_from_weight('latest_swin_tiny_coco_100.ckpt') == 'swin_tiny_coco'
