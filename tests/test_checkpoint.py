"""Checkpoint filename-contract and roundtrip tests (reference
common_utils.py:41-63, train.py:51-53)."""
import os

import pytest

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


@pytest.mark.slow
def test_detector_accepts_stats_free_checkpoint(rng):
    """Swin checkpoints carry batch_stats=None (LayerNorm-only backbone);
    the Detector must normalize that to an empty collection — flax apply
    rejects None collections (regression: swin detect CLI crashed at
    img_size 544 with ApplyScopeInvalidVariablesTypeError)."""
    import jax
    import jax.numpy as jnp

    from yolact_minimal_tpu.config import get_config
    from yolact_minimal_tpu.models.yolact import Yolact
    from yolact_minimal_tpu.pipeline import Detector

    cfg = get_config('swin_tiny_custom', mode='val', img_size=64)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    # the on-disk swin layout: params only, batch_stats explicitly None
    det = Detector(cfg, {'params': variables['params'], 'batch_stats': None})
    dets, masks_proto, proto = det(
        jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32)))
    assert np.isfinite(np.asarray(dets.scores)).all()


@pytest.mark.slow
def test_opt_state_roundtrip_and_fast_forward(tmp_path):
    """latest checkpoints carry optimizer state; resume restores momentum and
    the LR-schedule position exactly, and legacy weights-only checkpoints get
    their schedule counts fast-forwarded to the filename step."""
    import jax
    import jax.numpy as jnp

    from yolact_minimal_tpu.config import get_config
    from yolact_minimal_tpu.train_state import (create_train_state,
                                                fast_forward_schedule,
                                                make_anchors_for,
                                                make_train_step,
                                                opt_state_to_payload,
                                                restore_opt_state)

    img = 64
    cfg = get_config('res50_custom', mode='train', img_size=img, max_gt=2,
                     train_bs=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, make_anchors_for(cfg))
    rng = np.random.RandomState(0)
    batch = dict(
        image=rng.rand(2, img, img, 3).astype(np.float32),
        boxes=np.tile(np.array([0.1, 0.1, 0.5, 0.5], np.float32), (2, 2, 1)),
        labels=np.ones((2, 2), np.int32),
        valid=np.ones((2, 2), bool),
        masks_proto=np.ones((2, 2, img // 4, img // 4), np.float32),
        masks_seg=np.ones((2, 2, img // 8, img // 8), np.float32),
    )
    state, _ = step_fn(state, batch, jax.random.PRNGKey(1))

    payload = {'params': jax.device_get(state.params),
               'batch_stats': jax.device_get(state.batch_stats),
               'opt_state': opt_state_to_payload(state.opt_state),
               'step': int(state.step)}
    path = save_latest(payload, 'res50_custom', int(state.step),
                       weight_dir=str(tmp_path))
    back = load_checkpoint(path)

    fresh = create_train_state(cfg, jax.random.PRNGKey(0),
                               variables={'params': back['params'],
                                          'batch_stats': back['batch_stats']},
                               step=back['step'])
    restored = restore_opt_state(fresh, back['opt_state'])
    orig_leaves = jax.tree.leaves(jax.device_get(state.opt_state))
    rest_leaves = jax.tree.leaves(jax.device_get(restored.opt_state))
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # legacy path: no payload -> counts fast-forwarded to the parsed step
    ff = fast_forward_schedule(fresh, 12345)
    import flax.serialization as fser
    counts = []
    def walk(d):
        for k, v in d.items():
            if k == 'count':
                counts.append(int(v))
            elif isinstance(v, dict):
                walk(v)
    walk(fser.to_state_dict(ff.opt_state))
    assert counts and all(c == 12345 for c in counts)


def test_load_weights_auto_drops_none_collections(tmp_path, rng):
    """Swin train payloads carry batch_stats=None (LayerNorm-only backbone);
    inference loads must not pass a None collection into flax apply."""
    from yolact_minimal_tpu.utils.checkpoint import load_weights_auto
    payload = {'params': {'layer': {'kernel': rng.rand(3, 3).astype(np.float32)}},
               'batch_stats': None, 'opt_state': None, 'step': 30}
    path = str(tmp_path / 'latest_swin_tiny_custom_30.ckpt')
    save_checkpoint(path, payload)
    v = load_weights_auto(path, include_semantic=False)
    assert 'batch_stats' not in v and 'opt_state' not in v and 'step' not in v
    assert set(v) == {'params'}
