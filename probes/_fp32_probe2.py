"""fp32@544 train-step kill, round 2: model fwd+grad passes; bisect the
loss pipeline. Grad through each loss component separately.

Usage: python _fp32_probe2.py [--start N]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument('--start', type=int, default=0)
args = p.parse_args()

B, S = 8, 544

print('devices:', jax.devices(), flush=True)
t0 = time.time()
print('sanity:', float(jax.device_get(
    jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256))))),
    f'{time.time() - t0:.1f}s', flush=True)

_n = 0


def run(name, fn, *xs):
    global _n
    _n += 1
    if _n <= args.start:
        print(f'probe {_n} {name}: SKIPPED', flush=True)
        return
    t0 = time.time()
    print(f'probe {_n} {name}: compile+run...', flush=True)
    out = jax.jit(fn)(*xs)
    leaf = jax.tree.leaves(out)[0]
    val = float(jax.device_get(jnp.asarray(leaf).reshape(-1)[0]
                               .astype(jnp.float32)))
    print(f'probe {_n} {name}: OK ({time.time() - t0:.1f}s, val={val:.4f})',
          flush=True)


rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops import losses as L
from yolact_minimal_tpu.ops.matching import match
from yolact_minimal_tpu.train_state import make_anchors_for

cfg = get_config('res50_coco', mode='train', img_size=S, train_bs=B,
                 max_gt=16, compute_dtype='float32')
anchors = jnp.asarray(make_anchors_for(cfg))
g = cfg.max_gt
gt = dict(
    boxes=jnp.asarray(np.tile(np.array([0.1, 0.1, 0.5, 0.5], np.float32),
                              (B, g, 1))),
    labels=jnp.asarray(np.ones((B, g), np.int32)),
    valid=jnp.asarray(np.ones((B, g), bool)),
    masks_proto=jnp.asarray((rng.rand(B, g, S // 4, S // 4) > 0.5)
                            .astype(np.float32)),
    masks_seg=jnp.asarray((rng.rand(B, g, S // 8, S // 8) > 0.5)
                          .astype(np.float32)))

model = Yolact(cfg=cfg, train_mode=True)
vfull = model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)},
                   jnp.zeros((1, S, S, 3), jnp.float32), train=True)
key = jax.random.PRNGKey(3)


def outputs_of(params, x):
    outs, _ = model.apply(
        {'params': params, 'batch_stats': vfull['batch_stats']}, x,
        train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)})
    return outs


# 1: matching alone (fwd)
run('match_only', lambda: match(gt['boxes'], gt['labels'], gt['valid'],
                                anchors, cfg.pos_iou_thre, cfg.neg_iou_thre))


def grad_through(loss_pick):
    def f(params):
        class_p, box_p, coef_p, proto_p, seg_p = outputs_of(params, img)
        m = match(gt['boxes'], gt['labels'], gt['valid'], anchors,
                  cfg.pos_iou_thre, cfg.neg_iou_thre)
        pos = m.conf_gt > 0
        return loss_pick(class_p, box_p, coef_p, proto_p, seg_p, m, pos)
    return jax.grad(f)


# 2: OHEM category loss
run('grad_category', grad_through(
    lambda cp, bp, co, pr, sg, m, pos:
    L.category_loss(cp, m.conf_gt, cfg.conf_alpha)), vfull['params'])
# 3: box loss
run('grad_box', grad_through(
    lambda cp, bp, co, pr, sg, m, pos:
    L.box_loss(bp, m.offsets, pos, cfg.bbox_alpha)), vfull['params'])
# 4: lincomb mask loss
run('grad_lincomb', grad_through(
    lambda cp, bp, co, pr, sg, m, pos:
    L.lincomb_mask_loss(pos, m.anchor_max_i, co, pr, gt['masks_proto'],
                        m.anchor_max_gt, key, cfg.mask_alpha,
                        cfg.masks_to_train)), vfull['params'])
# 5: semantic loss
run('grad_semantic', grad_through(
    lambda cp, bp, co, pr, sg, m, pos:
    L.semantic_seg_loss(sg, gt['masks_seg'], gt['labels'], gt['valid'],
                        cfg.semantic_alpha)), vfull['params'])
# 6: all four summed (= compute_loss)
run('grad_all_losses', grad_through(
    lambda cp, bp, co, pr, sg, m, pos:
    L.category_loss(cp, m.conf_gt, cfg.conf_alpha)
    + L.box_loss(bp, m.offsets, pos, cfg.bbox_alpha)
    + L.lincomb_mask_loss(pos, m.anchor_max_i, co, pr, gt['masks_proto'],
                          m.anchor_max_gt, key, cfg.mask_alpha,
                          cfg.masks_to_train)
    + L.semantic_seg_loss(sg, gt['masks_seg'], gt['labels'], gt['valid'],
                          cfg.semantic_alpha)), vfull['params'])
print('ALL PROBES PASSED', flush=True)
