"""fp32@544 kill, round 3: individual loss grads pass, their SUM kills.
Hypothesis: HBM exhaustion (fp32 doubles residuals vs the working bf16).
(a) compile WITHOUT executing and print the compiler's memory analysis;
(b) run the combined grad at batch 4; (c) batch 8 with remat.

Usage: python _fp32_probe3.py [--start N]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

p = argparse.ArgumentParser()
p.add_argument('--start', type=int, default=0)
args = p.parse_args()

S = 544
print('devices:', jax.devices(), flush=True)
t0 = time.time()
print('sanity:', float(jax.device_get(
    jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256))))),
    f'{time.time() - t0:.1f}s', flush=True)

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops import losses as L
from yolact_minimal_tpu.ops.matching import match
from yolact_minimal_tpu.train_state import make_anchors_for

rng = np.random.RandomState(0)
key = jax.random.PRNGKey(3)


def build(B, remat=False):
    cfg = get_config('res50_coco', mode='train', img_size=S, train_bs=B,
                     max_gt=16, compute_dtype='float32', remat=remat)
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
    img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))

    def f(params):
        outs, _ = model.apply(
            {'params': params, 'batch_stats': vfull['batch_stats']}, img,
            train=True, mutable=['batch_stats'],
            rngs={'dropout': jax.random.PRNGKey(2)})
        class_p, box_p, coef_p, proto_p, seg_p = outs
        m = match(gt['boxes'], gt['labels'], gt['valid'], anchors,
                  cfg.pos_iou_thre, cfg.neg_iou_thre)
        pos = m.conf_gt > 0
        return (L.category_loss(class_p, m.conf_gt, cfg.conf_alpha)
                + L.box_loss(box_p, m.offsets, pos, cfg.bbox_alpha)
                + L.lincomb_mask_loss(pos, m.anchor_max_i, coef_p, proto_p,
                                      gt['masks_proto'], m.anchor_max_gt, key,
                                      cfg.mask_alpha, cfg.masks_to_train)
                + L.semantic_seg_loss(seg_p, gt['masks_seg'], gt['labels'],
                                      gt['valid'], cfg.semantic_alpha))
    return jax.grad(f), vfull['params']


_n = 0


def gate(name):
    global _n
    _n += 1
    skip = _n <= args.start
    print(f'probe {_n} {name}: {"SKIPPED" if skip else "..."}', flush=True)
    return not skip


if gate('compile_b8_memory_analysis'):
    t0 = time.time()
    gfn, params = build(8)
    compiled = jax.jit(gfn).lower(params).compile()
    ma = compiled.memory_analysis()
    print(f'  compiled in {time.time()-t0:.0f}s; memory analysis: {ma}',
          flush=True)

if gate('run_b4'):
    gfn, params = build(4)
    t0 = time.time()
    out = jax.jit(gfn)(params)
    v = float(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0]))
    print(f'  b4 OK ({time.time()-t0:.0f}s, val={v:.4f})', flush=True)

if gate('run_b8_remat'):
    gfn, params = build(8, remat=True)
    t0 = time.time()
    out = jax.jit(gfn)(params)
    v = float(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0]))
    print(f'  b8+remat OK ({time.time()-t0:.0f}s, val={v:.4f})', flush=True)

print('DONE', flush=True)
