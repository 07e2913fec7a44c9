"""Fused (Pallas) vs einsum (XLA) window attention on the TPU, at the
swin-544 stage geometries, plus the full SwinTiny backbone both ways.
Chained timing per docs/ARCHITECTURE.md: feedback sum(y)*1e-30 keeps every
output leaf live (DCE-safe) and the chain unfoldable."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models import swin as S
from yolact_minimal_tpu.ops.window_attention import (_attention_pallas,
                                                     _attention_xla)

B = 16
DT = jnp.bfloat16
rng = np.random.RandomState(0)


def timed(label, one, x, k=12, n=4):
    @jax.jit
    def chain(x0):
        x = x0
        for _ in range(k):
            y = one(x)
            fb = (jnp.sum(y.astype(jnp.float32)) * 1e-30).astype(x.dtype)
            x = x + fb
        return y

    y = chain(x)
    jax.device_get(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = chain(x)
    jax.device_get(jnp.asarray(y).reshape(-1)[0])
    per = (time.perf_counter() - t0) / (n * k)
    print(f'{label}: {per*1e3:.3f} ms', flush=True)
    return per


# stage geometries at img 544 (feature 136 -> padded 140, then /2 per stage)
# (heads, dim, hp_padded, n_windows_img)
STAGES = [(3, 96, 140), (6, 192, 70), (12, 384, 35), (24, 768, 21)]

for heads, dim, hp in STAGES:
    nw = (hp // 7) ** 2
    bnw = B * nw
    qkv = jnp.asarray(rng.rand(bnw, 49, 3 * dim).astype(np.float32)).astype(DT)
    bias = jnp.asarray(rng.rand(heads, 49, 49).astype(np.float32) * 0.1).astype(DT)
    region = jnp.asarray(S.shifted_window_regions(hp, hp).astype(np.int32))

    timed(f'stage h{heads:<2} XLA    unmasked [{bnw},49,{3*dim}]',
          lambda q, hh=heads: _attention_xla(q, bias, None, hh), qkv)
    timed(f'stage h{heads:<2} pallas unmasked',
          lambda q, hh=heads: _attention_pallas(q, bias, None, hh), qkv)
    timed(f'stage h{heads:<2} XLA    masked  ',
          lambda q, hh=heads, r=region: _attention_xla(q, bias, r, hh), qkv)
    timed(f'stage h{heads:<2} pallas masked  ',
          lambda q, hh=heads, r=region: _attention_pallas(q, bias, r, hh), qkv)

# full backbone, both paths
x544 = jnp.asarray(rng.rand(B, 544, 544, 3).astype(np.float32))
for fused in (False, True):
    bb = S.SwinTiny(dtype=DT, fused_attn=fused)
    vbb = bb.init(jax.random.PRNGKey(0), x544[:1], train=False)

    def bb_all(x, bb=bb, vbb=vbb):
        outs = bb.apply(vbb, x, train=False)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)[None]

    timed(f'SwinTiny @544 b16 fused={fused}', bb_all, x544, k=4, n=3)
