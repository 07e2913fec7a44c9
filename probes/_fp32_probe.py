"""Bisect the fp32 res50 train-step worker kill at img_size 544
(bf16 at 544 and fp32 at 256 both run; the fp32@544 step reliably kills
the worker). Smallest-first sub-graphs; rerun with --start N after a kill.

Usage: python _fp32_probe.py [--start N]
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
from yolact_minimal_tpu.models.resnet import ResNet
from yolact_minimal_tpu.models.yolact import Yolact

cfg = get_config('res50_coco', mode='train', img_size=S, train_bs=B,
                 max_gt=16, compute_dtype='float32')

# 1: fp32 backbone forward
bb = ResNet(layers=(3, 4, 6, 3), dtype=jnp.float32)
vbb = bb.init(jax.random.PRNGKey(0), img[:1], train=False)


def bb_fwd(v, x):
    return sum(jnp.sum(o.astype(jnp.float32)) for o in
               bb.apply(v, x, train=False))

run('fp32_backbone_fwd', bb_fwd, vbb, img)

# 2: fp32 backbone grad (train=False: no BN stat mutation)
run('fp32_backbone_grad',
    lambda v, x: jax.grad(lambda vv: bb_fwd(vv, x))(v), vbb, img)

# 3: full fp32 Yolact train-mode forward (BN mutation + semantic head)
model = Yolact(cfg=cfg, train_mode=True)
vfull = model.init({'params': jax.random.PRNGKey(0),
                    'dropout': jax.random.PRNGKey(1)},
                   jnp.zeros((1, S, S, 3), jnp.float32), train=True)


def yolact_fwd(params, x):
    outs, _ = model.apply(
        {'params': params, 'batch_stats': vfull['batch_stats']}, x,
        train=True, mutable=['batch_stats'],
        rngs={'dropout': jax.random.PRNGKey(2)})
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

run('fp32_yolact_fwd_train', yolact_fwd, vfull['params'], img)

# 4: grad of the full model (no loss pipeline)
run('fp32_yolact_grad',
    lambda p, x: jax.grad(lambda pp: yolact_fwd(pp, x))(p),
    vfull['params'], img)

# 5: the full train step (known kill)
from yolact_minimal_tpu.train_state import (create_train_state,
                                            make_anchors_for, make_train_step)

state = create_train_state(cfg, jax.random.PRNGKey(0))
step_fn = make_train_step(cfg, make_anchors_for(cfg))
g = cfg.max_gt
batch = dict(
    image=np.asarray(img),
    boxes=np.tile(np.array([0.1, 0.1, 0.5, 0.5], np.float32), (B, g, 1)),
    labels=np.ones((B, g), np.int32),
    valid=np.ones((B, g), bool),
    masks_proto=(rng.rand(B, g, S // 4, S // 4) > 0.5).astype(np.float32),
    masks_seg=(rng.rand(B, g, S // 8, S // 8) > 0.5).astype(np.float32))


def full_step(s, b):
    s2, losses = step_fn(s, b, jax.random.PRNGKey(1))
    return losses.total

_n += 1
print(f'probe {_n} fp32_full_train_step: compile+run...', flush=True)
if _n > args.start:
    t0 = time.time()
    val = float(jax.device_get(full_step(state, batch)))
    print(f'probe {_n} fp32_full_train_step: OK ({time.time() - t0:.1f}s, '
          f'val={val:.4f})', flush=True)
print('ALL PROBES PASSED', flush=True)
