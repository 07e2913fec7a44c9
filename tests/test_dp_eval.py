"""Data-parallel inference consistency: a Detector on an 8-device mesh must
produce the same detection slates as a single-device Detector on the same
global batch (the eval-side counterpart of the DP train-step test in
test_train_step.py; the reference evaluates on one GPU only, eval.py:30)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.parallel.mesh import make_mesh
from yolact_minimal_tpu.pipeline import Detector


def test_dp_detector_matches_single_device(rng):
    cfg = get_config('res50_custom', mode='val', img_size=64)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    images = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))

    single = Detector(cfg, variables)
    dets_1, masks_1, _ = jax.device_get(single(images))

    mesh = make_mesh(8)
    dp = Detector(cfg, variables, mesh=mesh)
    dets_8, masks_8, _ = jax.device_get(dp(images))

    np.testing.assert_array_equal(dets_1.ids, dets_8.ids)
    np.testing.assert_array_equal(dets_1.valid, dets_8.valid)
    np.testing.assert_allclose(dets_1.scores, dets_8.scores, atol=1e-6)
    np.testing.assert_allclose(dets_1.boxes, dets_8.boxes, atol=1e-6)
    np.testing.assert_allclose(masks_1, masks_8, atol=1e-5)


def test_dp_detector_rejects_indivisible_batch(rng):
    cfg = get_config('res50_custom', mode='val', img_size=64)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    dp = Detector(cfg, variables, mesh=make_mesh(8))
    images = jnp.zeros((6, 64, 64, 3), jnp.float32)
    with pytest.raises(ValueError, match='not divisible'):
        dp(images)


def test_dp_traditional_nms_matches_single_device(rng):
    """--traditional_nms + --data_parallel: the raw forward shards over the
    mesh (it used to silently run single-device); detection slates must match
    the unsharded path exactly — the greedy host tail is deterministic."""
    from yolact_minimal_tpu.ops.traditional_nms import _load_library
    try:
        _load_library()
    except Exception:
        pytest.skip('native NMS library unavailable')
    cfg = get_config('res50_custom', mode='val', img_size=64,
                     traditional_nms=True)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    images = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))

    dets_1, masks_1, _ = Detector(cfg, variables)(images)
    dets_8, masks_8, _ = Detector(cfg, variables, mesh=make_mesh(8))(images)

    np.testing.assert_array_equal(dets_1.ids, dets_8.ids)
    np.testing.assert_array_equal(dets_1.valid, dets_8.valid)
    np.testing.assert_allclose(dets_1.scores, dets_8.scores, atol=1e-6)
    np.testing.assert_allclose(dets_1.boxes, dets_8.boxes, atol=1e-6)
    np.testing.assert_allclose(masks_1, masks_8, atol=1e-5)


def test_dp_detector_keeps_fused_window_attn(rng):
    """The fused window attention shard_maps over the data axis (interpret
    mode on this CPU mesh): a swin Detector over an 8-device mesh with the
    kernel forced ON must produce the same slates as the single-device
    fused Detector — DP eval keeps the Pallas fast path (round-4 'off'
    guard removed)."""
    cfg = get_config('swin_tiny_custom', mode='val', img_size=64,
                     nms_score_thre=0.002, fused_window_attn='on')
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    images = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))

    dets_1, masks_1, _ = Detector(cfg, variables)(images)
    dets_8, masks_8, _ = Detector(cfg, variables, mesh=make_mesh(8))(images)

    np.testing.assert_array_equal(dets_1.ids, dets_8.ids)
    np.testing.assert_array_equal(dets_1.valid, dets_8.valid)
    np.testing.assert_allclose(dets_1.scores, dets_8.scores, atol=1e-6)
    np.testing.assert_allclose(dets_1.boxes, dets_8.boxes, atol=1e-6)
    np.testing.assert_allclose(masks_1, masks_8, atol=1e-5)
