"""Stage-0 bisection: single blocks pass at 544 shapes, stage0
(block0 + block1 + PatchMerging) kills the worker. Which combination?

Usage: python _swin_probe2.py [--start N] [--batch B]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models import swin as S

p = argparse.ArgumentParser()
p.add_argument('--start', type=int, default=0)
p.add_argument('--batch', type=int, default=16)
args = p.parse_args()
DTYPE = jnp.bfloat16
B = args.batch

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
H = 136
x136 = jnp.asarray(rng.rand(B, H, H, 96).astype(np.float32)).astype(DTYPE)

blk0 = S.SwinBlock(96, 3, shift=0, drop_path_rate=0.0, dtype=DTYPE)
v0 = blk0.init(jax.random.PRNGKey(0), x136[:1])
blk1 = S.SwinBlock(96, 3, shift=3, drop_path_rate=0.0, dtype=DTYPE)
v1 = blk1.init(jax.random.PRNGKey(1), x136[:1])
pm = S.PatchMerging(96, dtype=DTYPE)
vpm = pm.init(jax.random.PRNGKey(2), x136[:1])

# 1: merge alone at 136
run('patch_merge136', lambda v, x: pm.apply(v, x), vpm, x136)
# 2: two blocks chained, no merge
run('blk0+blk1', lambda a, b, x: blk1.apply(b, blk0.apply(a, x)), v0, v1, x136)
# 3: one block + merge
run('blk1+merge', lambda b, m, x: pm.apply(m, blk1.apply(b, x)), v1, vpm, x136)
# 4: W-MSA block + merge
run('blk0+merge', lambda a, m, x: pm.apply(m, blk0.apply(a, x)), v0, vpm, x136)
# 5: full stage0 (known kill as SwinStage; reconstructed by hand here)
run('blk0+blk1+merge',
    lambda a, b, m, x: pm.apply(m, blk1.apply(b, blk0.apply(a, x))),
    v0, v1, vpm, x136)
print('ALL PROBES PASSED', flush=True)
