"""Progressive swin sub-graph probe to localize the TPU worker kill at 544px.

Every swin graph at 544px input (fwd or train) kills this environment's TPU
worker, while 512px and below run fine (r03 sweep: 810/450/365/225 img/s at
256/384/448/512). This probe runs the 544-shaped sub-graphs smallest-first
in ONE process, printing after each — the last "OK" line localizes the
faulting construct. After a kill the worker needs 10-25 min; rerun with the
passed probes skipped via --start N.

Usage: python _swin_probe.py [--start N] [--dtype bf16|fp32] [--batch B]
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from yolact_minimal_tpu.models import swin as S

p = argparse.ArgumentParser()
p.add_argument('--start', type=int, default=0, help='skip probes < N')
p.add_argument('--dtype', default='bf16', choices=['bf16', 'fp32'])
p.add_argument('--batch', type=int, default=16)
args = p.parse_args()
DTYPE = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32
B = args.batch

print('devices:', jax.devices(), flush=True)
t0 = time.time()
print('sanity matmul:',
      float(jax.device_get(jnp.sum(jnp.ones((256, 256)) @ jnp.ones((256, 256))))),
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
# 544px -> patch embed 136x136 -> pad to 140 -> 20x20=400 windows of 7x7
H = 136
HP = 140
x136 = jnp.asarray(rng.rand(B, H, H, 96).astype(np.float32)).astype(DTYPE)
x140 = jnp.asarray(rng.rand(B, HP, HP, 96).astype(np.float32)).astype(DTYPE)
nw = (HP // 7) ** 2
win = jnp.asarray(rng.rand(B * nw, 49, 96).astype(np.float32)).astype(DTYPE)

# 1: bare pad 136->140 (the 544-specific shape change vs 512px=128, no pad)
run('pad136->140', lambda x: jnp.pad(x, ((0, 0), (0, 4), (0, 4), (0, 0))), x136)
# 2: roll (shifted windows)
run('roll140', lambda x: jnp.roll(x, (-3, -3), axis=(1, 2)), x140)
# 3: window partition reshape/transpose at 140
run('partition140', lambda x: S.window_partition(x, 7), x140)
# 4: partition + reverse round trip
run('part+rev140',
    lambda x: S.window_reverse(S.window_partition(x, 7), 7, HP, HP), x140)
# 5: the attention einsum chain alone at the 544 window count
def attn_core(w):
    q = w.reshape(B * nw, 49, 3, 32)
    a = jnp.einsum('bnhd,bmhd->bhnm', q * 0.17, q,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(a, axis=-1).astype(w.dtype)
    return jnp.einsum('bhnm,bmhd->bnhd', a, q,
                      preferred_element_type=jnp.float32)
run('attn_core(6400win)', attn_core, win)
# 6: one full W-MSA block at 136 (pad+partition+attention+reverse+mlp)
blk = S.SwinBlock(96, 3, shift=0, drop_path_rate=0.0, dtype=DTYPE)
vs_blk = blk.init(jax.random.PRNGKey(0), x136[:1])
run('wmsa_block136', lambda v, x: blk.apply(v, x), vs_blk, x136)
# 7: one shifted block at 136 (adds roll + static mask add)
sblk = S.SwinBlock(96, 3, shift=3, drop_path_rate=0.0, dtype=DTYPE)
vs_sblk = sblk.init(jax.random.PRNGKey(0), x136[:1])
run('swmsa_block136', lambda v, x: sblk.apply(v, x), vs_sblk, x136)
# 8: patch embed from the raw 544 image
x544 = jnp.asarray(rng.rand(B, 544, 544, 3).astype(np.float32))
pe = nn.Conv(96, (4, 4), strides=(4, 4), padding='VALID', dtype=DTYPE)
vs_pe = pe.init(jax.random.PRNGKey(0), x544[:1])
run('patch_embed544', lambda v, x: pe.apply(v, x), vs_pe, x544)
# 9: stage0 (2 blocks + merge)
st = S.SwinStage(96, 2, 3, (0.0, 0.0), True, dtype=DTYPE)
vs_st = st.init(jax.random.PRNGKey(0), x136[:1], train=False)
run('stage0_136', lambda v, x: st.apply(v, x, train=False), vs_st, x136)
# 10: full backbone at 544
bb = S.SwinTiny(dtype=DTYPE)
vs_bb = bb.init(jax.random.PRNGKey(0), x544[:1], train=False)
run('full_backbone544', lambda v, x: bb.apply(v, x, train=False), vs_bb, x544)
print('ALL PROBES PASSED', flush=True)
