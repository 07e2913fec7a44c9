"""Bisect the swin-only +22 ms wall-vs-device-compute gap per sustained
dispatch. Sustained perturb-loop wall times (ONE final drain) for graphs of
increasing scope, each compared to its chained in-jit device time."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models import swin as S
from yolact_minimal_tpu.models.resnet import ResNet

B = 16
DT = jnp.bfloat16
rng = np.random.RandomState(0)
x544 = jnp.asarray(rng.rand(B, 544, 544, 3).astype(np.float32))


def sustained(label, fn, x, n=16):
    f = jax.jit(fn)

    @jax.jit
    def perturb(x, leaf):
        return x + (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(x.dtype)

    y = f(x)
    leaf = jax.tree_util.tree_leaves(y)[0]
    xi = perturb(x, leaf)
    y = f(xi)
    leaf = jax.tree_util.tree_leaves(y)[0]
    jax.device_get(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        xi = perturb(xi, leaf)
        y = f(xi)
        leaf = jax.tree_util.tree_leaves(y)[0]
    jax.device_get(jnp.asarray(leaf).reshape(-1)[0])
    per = (time.perf_counter() - t0) / n
    print(f'{label}: sustained {per*1e3:.2f} ms', flush=True)
    return per


def chained(label, fn, x, k=6, n=3):
    @jax.jit
    def chain(x0):
        x = x0
        for _ in range(k):
            y = fn(x)
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
    print(f'{label}: chained   {per*1e3:.2f} ms', flush=True)
    return per


# (a) full swin backbone, fused
bb = S.SwinTiny(dtype=DT, fused_attn=True)
vbb = bb.init(jax.random.PRNGKey(0), x544[:1], train=False)
bb_fn = lambda x: bb.apply(vbb, x, train=False)
chained('swin backbone fused', bb_fn, x544, k=4)
sustained('swin backbone fused', bb_fn, x544)

# (b) patch embed + stage0 only
class Stage0(S.nn.Module):
    @S.nn.compact
    def __call__(self, x):
        x = S.nn.Conv(96, (4, 4), strides=(4, 4), padding='VALID', dtype=DT,
                      name='patch_embed')(x)
        x = S.nn.LayerNorm(epsilon=1e-5, dtype=DT, name='patch_norm')(x)
        x_out, x = S.SwinStage(dim=96, depth=2, num_heads=3,
                               drop_path_rates=(0.0, 0.0), downsample=True,
                               dtype=DT, fused_attn=True, name='stage0')(x)
        return x

s0 = Stage0()
vs0 = s0.init(jax.random.PRNGKey(0), x544[:1])
s0_fn = lambda x: s0.apply(vs0, x)
chained('patch+stage0 fused', s0_fn, x544, k=6)
sustained('patch+stage0 fused', s0_fn, x544)

# (c) res50 backbone for family comparison
rn = ResNet(layers=(3, 4, 6, 3), dtype=DT)
vrn = rn.init(jax.random.PRNGKey(0), x544[:1], train=False)
rn_fn = lambda x: rn.apply(vrn, x, train=False)
chained('res50 backbone', rn_fn, x544, k=4)
sustained('res50 backbone', rn_fn, x544)
