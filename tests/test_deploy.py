"""AOT export/deploy tests: artifact roundtrip parity and numpy-twin
postprocess parity against the on-device path."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.deploy import export_model, load_exported
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops import boxes as B
from yolact_minimal_tpu.ops.nms import detect_postprocess
from yolact_minimal_tpu.ops.nms_numpy import (after_nms_numpy,
                                              detect_postprocess_numpy)

IMG = 128


@pytest.fixture(scope='module')
def exported(tmp_path_factory):
    cfg = get_config('res50_coco', mode='val', img_size=IMG)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
    path = str(tmp_path_factory.mktemp('export') / 'model.jexport')
    export_model(cfg, variables, path, check_parity=True)  # asserts parity
    return cfg, path


def test_export_roundtrip(exported, rng):
    cfg, path = exported
    call, meta, anchors = load_exported(path)
    assert meta['name'] == 'res50_coco'
    assert meta['img_size'] == IMG
    img = rng.rand(1, IMG, IMG, 3).astype(np.float32)
    class_p, box_p, coef_p, proto = call(img)
    from yolact_minimal_tpu.models.yolact import num_anchors
    a = num_anchors(IMG)
    assert class_p.shape == (1, a, 81)
    assert anchors.shape == (a, 4)
    np.testing.assert_allclose(np.asarray(class_p).sum(-1), 1.0, atol=1e-4)


def test_batched_export_matches_per_image(exported, tmp_path, rng):
    """A batch>1 artifact (the deploy-throughput path, VERDICT r04 #7) must
    produce per-element outputs identical to the batch=1 artifact."""
    cfg, path1 = exported
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                           train=False)
    path3 = str(tmp_path / 'model_b3.jexport')
    export_model(cfg, variables, path3, check_parity=True, batch=3)

    call1, meta1, _ = load_exported(path1)
    call3, meta3, _ = load_exported(path3)
    assert meta1.get('batch', 1) == 1 and meta3['batch'] == 3
    imgs = rng.rand(3, IMG, IMG, 3).astype(np.float32)
    outs3 = [np.asarray(o) for o in call3(imgs)]
    for j in range(3):
        outs1 = [np.asarray(o) for o in call1(imgs[j:j + 1])]
        for a, b in zip(outs1, outs3):
            np.testing.assert_allclose(a[0], b[j], atol=1e-5)


def test_numpy_postprocess_matches_device(exported, rng):
    """The numpy-twin postprocess must agree with the on-device fixed-shape
    postprocess on the exported outputs."""
    cfg, path = exported
    call, meta, anchors = load_exported(path)
    img = rng.rand(1, IMG, IMG, 3).astype(np.float32)
    class_p, box_p, coef_p, proto = [np.asarray(o) for o in call(img)]

    nb, nc, nids, nsc = detect_postprocess_numpy(
        class_p[0], box_p[0], coef_p[0], anchors, cfg.nms_score_thre,
        cfg.nms_iou_thre, cfg.top_k, cfg.max_detections)

    dets = detect_postprocess(jnp.asarray(class_p[0]), jnp.asarray(box_p[0]),
                              jnp.asarray(coef_p[0]), jnp.asarray(anchors),
                              cfg.nms_score_thre, cfg.nms_iou_thre,
                              cfg.top_k, cfg.max_detections)
    n_valid = int(np.asarray(dets.valid).sum())
    if nb is None:
        assert n_valid == 0
        return
    assert n_valid == len(nsc)
    np.testing.assert_allclose(np.sort(np.asarray(dets.scores)[:n_valid]),
                               np.sort(nsc), atol=1e-5)

    ids, scores, boxes_pix, masks = after_nms_numpy(
        nids, nsc, nb, nc, proto[0], 100, 160, visual_thre=None)
    assert masks.shape[1:] == (100, 160)
    assert boxes_pix.dtype == np.int32
