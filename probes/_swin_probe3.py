"""Validate the reshape-based PatchMerging fix at the previously-fatal
544px shapes: merge alone at 136 -> stage0 -> full backbone 544 -> full
Yolact swin detect graph at 544.

Usage: python _swin_probe3.py [--start N]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models import swin as S

p = argparse.ArgumentParser()
p.add_argument('--start', type=int, default=0)
args = p.parse_args()
DTYPE = jnp.bfloat16
B = 16

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
    val = float(jax.device_get(leaf.reshape(-1)[0].astype(jnp.float32)))
    print(f'probe {_n} {name}: OK ({time.time() - t0:.1f}s, val={val:.4f})',
          flush=True)


rng = np.random.RandomState(0)
x136 = jnp.asarray(rng.rand(B, 136, 136, 96).astype(np.float32)).astype(DTYPE)

pm = S.PatchMerging(96, dtype=DTYPE)
vpm = pm.init(jax.random.PRNGKey(2), x136[:1])
run('patch_merge136(reshape)', lambda v, x: pm.apply(v, x), vpm, x136)

st = S.SwinStage(96, 2, 3, (0.0, 0.0), True, dtype=DTYPE)
vs_st = st.init(jax.random.PRNGKey(0), x136[:1], train=False)
run('stage0_136', lambda v, x: st.apply(v, x, train=False), vs_st, x136)

x544 = jnp.asarray(rng.rand(B, 544, 544, 3).astype(np.float32))
bb = S.SwinTiny(dtype=DTYPE)
vs_bb = bb.init(jax.random.PRNGKey(0), x544[:1], train=False)
run('full_backbone544', lambda v, x: bb.apply(v, x, train=False), vs_bb, x544)

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector

cfg = get_config('swin_tiny_coco', mode='val', img_size=544,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 544, 544, 3), jnp.float32), train=False)
det = Detector(cfg, variables)
run('full_detect544', lambda x: det._infer_fixed(det.variables, x, 544), x544)
print('ALL PROBES PASSED', flush=True)
