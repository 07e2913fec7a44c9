"""Follow-up to _swin_detect_attrib: the full swin detect (82.8 ms
sustained) exceeds forward (55.7 chained) by ~27 ms, yet the identical
postprocess costs res50 ~10 ms. Time (a) postprocess+masks alone on real
forward outputs, (b) the whole detect chained in-jit, (c) res50's forward
chained for symmetry. If (a) is ~10 ms and (b) ~66 ms, the gap is
per-dispatch/scheduling, not graph cost."""
import copy
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops.boxes import make_anchors
from yolact_minimal_tpu.ops.nms import detect_postprocess_batch
from yolact_minimal_tpu.ops.nms import (assemble_masks,
                                         finalize_masks_fixed)

IMG, B = 544, 16

cfg = get_config('swin_tiny_coco', mode='val', img_size=IMG,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
with jax.default_device(jax.devices('cpu')[0]):
    cfg_i = copy.copy(cfg)
    cfg_i.fused_window_attn = 'off'
    variables = Yolact(cfg=cfg_i, train_mode=False).init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        train=False)
variables = jax.device_put(variables, jax.devices()[0])

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))
anchors = jnp.asarray(make_anchors(cfg.img_size, cfg.aspect_ratios,
                                   cfg.scales))


def timed(label, one, x, k=4, n=3):
    @jax.jit
    def chain(x0):
        x = x0
        for _ in range(k):
            y = one(x)
            leaves = jax.tree_util.tree_leaves(y)
            fb = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            x = x + (fb * 1e-30).astype(x.dtype)
        return y

    y = chain(x)
    jax.device_get(jnp.asarray(jax.tree_util.tree_leaves(y)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = chain(x)
    jax.device_get(jnp.asarray(jax.tree_util.tree_leaves(y)[0]).reshape(-1)[0])
    per = (time.perf_counter() - t0) / (n * k)
    print(f'{label}: {per*1e3:.3f} ms', flush=True)
    return per


# real forward outputs as the postprocess input
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
class_p, box_p, coef_p, proto = jax.device_put(fwd(variables, img))


def post_only(cp):
    dets = detect_postprocess_batch(
        cp, box_p, coef_p, anchors, cfg.nms_score_thre, cfg.nms_iou_thre,
        cfg.top_k, cfg.max_detections, getattr(cfg, 'nms_pre_topk', 1024))
    masks_p = jax.vmap(functools.partial(assemble_masks, do_crop=True)
                       )(proto, dets)
    masks = jax.vmap(lambda m: finalize_masks_fixed(m, IMG))(masks_p)
    return dets.boxes, dets.scores, masks


timed('postprocess+masks only (given outputs)', post_only, class_p)


def detect_full(x):
    cp, bp, co, pr = model.apply(variables, x, train=False)
    dets = detect_postprocess_batch(
        cp, bp, co, anchors, cfg.nms_score_thre, cfg.nms_iou_thre,
        cfg.top_k, cfg.max_detections, getattr(cfg, 'nms_pre_topk', 1024))
    masks_p = jax.vmap(functools.partial(assemble_masks, do_crop=True)
                       )(pr, dets)
    masks = jax.vmap(lambda m: finalize_masks_fixed(m, IMG))(masks_p)
    return dets.boxes, dets.scores, masks


timed('full detect chained in-jit', detect_full, img, k=4, n=3)
