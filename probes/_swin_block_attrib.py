"""Round-5 swin block-piece attribution at 544/b16 bf16: how much of each
SwinBlock is HBM-pass-bound XLA work around the fused attention kernel?
Times, at stage-0 and stage-2 geometries: LN, MLP half-block
(LN2+fc1+gelu+fc2+residual), qkv projection, output projection, the fused
attention kernel alone, a whole SwinBlock, and each full stage. Chained
timing per docs/ARCHITECTURE.md (feedback term sum(y)*1e-30)."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models import swin as S
from yolact_minimal_tpu.utils.compile_cache import enable

enable()
B = 16
DT = jnp.bfloat16
rng = np.random.RandomState(0)


def timed(label, one, x, k=4, n=6):
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


# (H, C, heads, depth) per stage at img 544
GEOS = [(136, 96, 3, 2), (68, 192, 6, 2), (34, 384, 12, 6), (17, 768, 24, 2)]

for hi, (H, C, heads, depth) in enumerate(GEOS):
    x = jnp.asarray(rng.rand(B, H, H, C).astype(np.float32)).astype(DT)
    print(f'--- stage{hi}: [{B},{H},{H},{C}] heads={heads} ---')

    ln = S.nn.LayerNorm(epsilon=1e-5, dtype=DT)
    vln = ln.init(jax.random.PRNGKey(0), x[:1])
    timed('  LN', lambda t: ln.apply(vln, t), x)

    mlp = S.Mlp(C, 4 * C, dtype=DT)
    vmlp = mlp.init(jax.random.PRNGKey(0), x[:1])
    timed('  MLP half-block (LN+fc1+gelu+fc2+res)',
          lambda t: t + mlp.apply(vmlp, ln.apply(vln, t)), x)

    dq = S.nn.Dense(3 * C, dtype=DT)
    vdq = dq.init(jax.random.PRNGKey(0), x[:1])
    timed('  qkv proj [B,H,W,C]->3C', lambda t: dq.apply(vdq, t), x)

    dp = S.nn.Dense(C, dtype=DT)
    vdp = dp.init(jax.random.PRNGKey(0), x[:1])
    timed('  out proj', lambda t: dp.apply(vdp, t), x)

    blk = S.SwinBlock(C, heads, shift=0, drop_path_rate=0.0, dtype=DT,
                      fused_attn=True)
    vblk = blk.init(jax.random.PRNGKey(0), x[:1])
    timed('  SwinBlock unshifted (fused attn)',
          lambda t: blk.apply(vblk, t), x)
    blk_s = S.SwinBlock(C, heads, shift=3, drop_path_rate=0.0, dtype=DT,
                        fused_attn=True)
    vblk_s = blk_s.init(jax.random.PRNGKey(0), x[:1])
    timed('  SwinBlock shifted  (fused attn)',
          lambda t: blk_s.apply(vblk_s, t), x)

    stage = S.SwinStage(C, depth, heads, tuple([0.0] * depth),
                        downsample=hi < 3, dtype=DT,
                        fused_attn=hi < 3)
    vst = stage.init(jax.random.PRNGKey(0), x[:1])
    timed(f'  full stage (depth {depth} + merge)',
          lambda t: stage.apply(vst, t)[1], x)
