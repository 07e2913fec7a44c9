"""End-to-end evaluate() flow on a stub detector: perfect 'detections'
derived from the gt must score ~100 mAP; empty detections score 0."""
import numpy as np
import pytest

import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.data.coco import COCODetection
from yolact_minimal_tpu.data.synthetic import generate_dataset
from yolact_minimal_tpu.ops.nms import Detections

IMG = 256


class StubDetector:
    """Returns gt-derived detections for whatever image it's shown."""

    def __init__(self, cfg, dataset, perfect=True):
        self.cfg = cfg
        self.ds = dataset
        self.perfect = perfect
        self._i = 0

    def __call__(self, images):
        b = images.shape[0]   # evaluate() batches and pads the tail
        d = self.cfg.max_detections
        ph = pw = self.cfg.img_size // 4
        boxes = np.zeros((b, d, 4), np.float32)
        scores = np.zeros((b, d), np.float32)
        ids = np.zeros((b, d), np.int32)
        valid = np.zeros((b, d), bool)
        masks_proto = np.zeros((b, ph, pw, d), np.float32)
        for row in range(b):
            item = self.ds.get_val(min(self._i + row, len(self.ds) - 1))
            if self.perfect:
                n = len(item['labels'])
                boxes[row, :n] = item['boxes']
                scores[row, :n] = 0.9
                ids[row, :n] = item['labels']
                valid[row, :n] = True
                # proto-res masks resampled from gt (square fixture images)
                import cv2
                for j in range(n):
                    m = cv2.resize(item['masks'][j].astype(np.float32),
                                   (pw, ph), interpolation=cv2.INTER_LINEAR)
                    masks_proto[row, :, :, j] = (m > 0.5)
        self._i += b
        dets = Detections(jnp.asarray(ids), jnp.asarray(scores),
                          jnp.asarray(boxes), jnp.zeros((b, d, 32)),
                          jnp.asarray(valid))
        return dets, jnp.asarray(masks_proto), None

    def postprocess_host(self, dets, masks_proto, h, w, visual_thre=None):
        from yolact_minimal_tpu.pipeline import Detector
        return Detector.postprocess_host(self, dets, masks_proto, h, w,
                                         visual_thre)


@pytest.fixture(scope='module')
def val_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp('eval_synth')
    img_dir, ann = generate_dataset(str(root), num_images=6, img_size=IMG,
                                    num_classes=4, seed=11)
    cfg = get_config('res50_custom', mode='val', img_size=IMG,
                     val_imgs=img_dir, val_ann=ann,
                     train_imgs=img_dir, train_ann=ann, val_num=6)
    return cfg, COCODetection(cfg, mode='val')


def test_perfect_detections_score_high(val_setup):
    cfg, ds = val_setup
    from eval import evaluate
    det = StubDetector(cfg, COCODetection(cfg, mode='val'), perfect=True)
    table, box_row, mask_row = evaluate(det, cfg, max_images=6)
    assert box_row[1] > 95     # box mAP@all ~100
    assert mask_row[1] > 80    # mask mAP suffers only proto-res resampling


def test_empty_detections_score_zero(val_setup):
    cfg, ds = val_setup
    from eval import evaluate
    det = StubDetector(cfg, COCODetection(cfg, mode='val'), perfect=False)
    table, box_row, mask_row = evaluate(det, cfg, max_images=6)
    assert box_row[1] == 0.0
    assert mask_row[1] == 0.0
