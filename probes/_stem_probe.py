"""Micro-experiments attributing res50 detect time: forward-only vs full
detect, and the MLPerf-style 2x2 space-to-depth stem reformulation of the
7x7/s2 first conv (channel packing 3 -> 12 for better MXU tiling).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def timed(fn, *xs, n=20):
    out = fn(*xs)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    # data-dependent perturbation: no two dispatches identical
    leaf0 = jax.tree.leaves(out)[0]
    pert = jax.jit(lambda x, s: x + (s.reshape(-1)[0] * 0).astype(x.dtype))
    xs = (pert(xs[0], leaf0),) + xs[1:]
    out = fn(*xs)
    t0 = time.perf_counter()
    for _ in range(n):
        xs = (pert(xs[0], jax.tree.leaves(out)[0]),) + xs[1:]
        out = fn(*xs)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / n


B, S = 16, 544
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))

# --- 1. full detect vs forward-only ---
from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector

cfg = get_config('res50_coco', mode='val', img_size=S,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, 3), jnp.float32), train=False)
det = Detector(cfg, variables)

t_full = timed(lambda x: det.detect_fixed(x, S), img)
print(f'full detect:   {t_full*1e3:.2f} ms/batch  {B/t_full:.1f} img/s', flush=True)

fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
t_fwd = timed(fwd, img)
print(f'forward only:  {t_fwd*1e3:.2f} ms/batch  {B/t_fwd:.1f} img/s', flush=True)

# backbone only
from yolact_minimal_tpu.models.resnet import ResNet
bb = ResNet(layers=(3, 4, 6, 3), dtype=jnp.bfloat16)
vbb = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), train=False)
bbf = jax.jit(lambda x: bb.apply(vbb, x, train=False))
t_bb = timed(bbf, img)
print(f'backbone only: {t_bb*1e3:.2f} ms/batch  {B/t_bb:.1f} img/s', flush=True)

# --- 2. stem: 7x7/s2 conv vs 2x2 space-to-depth + 4x4/s1 conv ---
stem = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
               use_bias=False, dtype=jnp.bfloat16)
vs = stem.init(jax.random.PRNGKey(0), img[:1])
f_stem = jax.jit(lambda x: stem.apply(vs, x))
t_stem = timed(f_stem, img)
print(f'stem 7x7/s2:   {t_stem*1e3:.3f} ms/batch', flush=True)


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


stem2 = nn.Conv(64, (4, 4), strides=(1, 1), padding=((1, 2), (1, 2)),
                use_bias=False, dtype=jnp.bfloat16)
vs2 = stem2.init(jax.random.PRNGKey(0), s2d(img[:1]))
f_stem2 = jax.jit(lambda x: stem2.apply(vs2, s2d(x)))
t_stem2 = timed(f_stem2, img)
print(f'stem s2d 4x4:  {t_stem2*1e3:.3f} ms/batch (incl. in-graph s2d pack)', flush=True)

# stem + maxpool (the full high-res prefix)
f_pre = jax.jit(lambda x: nn.max_pool(nn.relu(stem.apply(vs, x)), (3, 3),
                                      strides=(2, 2), padding=((1, 1), (1, 1))))
t_pre = timed(f_pre, img)
print(f'stem+pool:     {t_pre*1e3:.3f} ms/batch', flush=True)
