"""Swin-544 time attribution: chained per-piece timings at stage-0 shapes
(the dominant stage). Feedback term is sum(y)*1e-30 so no output element
is dead (DCE-safe) and the chain cannot be algebraically folded."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models import swin as S

B = 16
H, HP = 136, 140
NW = (HP // 7) ** 2          # 400 windows
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x136 = jnp.asarray(rng.rand(B, H, H, 96).astype(np.float32)).astype(DT)
win = jnp.asarray(rng.rand(B * NW, 49, 96).astype(np.float32)).astype(DT)


def timed(label, one, x, k=12, n=4, flops=None):
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
    extra = f'  {flops/per/1e12:.1f} TF/s' if flops else ''
    print(f'{label}: {per*1e3:.3f} ms{extra}', flush=True)
    return per


# pieces at stage-0 (dim 96, heads 3) 544 shapes
ln = S.nn.LayerNorm(epsilon=1e-5, dtype=DT)
vln = ln.init(jax.random.PRNGKey(0), x136[:1])
timed('LayerNorm [16,136,136,96]', lambda x: ln.apply(vln, x), x136)

timed('pad+roll+partition+reverse+unpad', lambda x: S.window_reverse(
    S.window_partition(
        jnp.roll(jnp.pad(x, ((0, 0), (0, 4), (0, 4), (0, 0))), (-3, -3),
                 axis=(1, 2)), 7), 7, HP, HP)[:, :H, :H, :], x136)

attn = S.WindowAttention(96, 3, dtype=DT)
vattn = attn.init(jax.random.PRNGKey(0), win[:NW], None)
att_flops = (2 * B * NW * 49 * 96 * (3 * 96)      # qkv dense
             + 2 * 2 * B * NW * 3 * 49 * 49 * 32   # qk + av
             + 2 * B * NW * 49 * 96 * 96)          # proj dense
timed('WindowAttention [6400,49,96]', lambda w: attn.apply(vattn, w, None),
      win, flops=att_flops)

mlp = S.Mlp(96, 384, dtype=DT)
vmlp = mlp.init(jax.random.PRNGKey(0), win[:1])
mlp_flops = 2 * 2 * B * NW * 49 * 96 * 384
timed('Mlp 96->384->96 [6400,49,96]', lambda w: mlp.apply(vmlp, w), win,
      flops=mlp_flops)

blk = S.SwinBlock(96, 3, shift=3, drop_path_rate=0.0, dtype=DT)
vblk = blk.init(jax.random.PRNGKey(0), x136[:1])
timed('full SW-MSA block @136', lambda x: blk.apply(vblk, x), x136)

# the attention einsum pair alone (no dense projections)
q0 = jnp.asarray(rng.rand(B * NW, 49, 3, 32).astype(np.float32)).astype(DT)
ein_flops = 2 * 2 * B * NW * 3 * 49 * 49 * 32


def attn_core(q):
    a = jnp.einsum('bnhd,bmhd->bhnm', q * 0.17, q,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(a, axis=-1).astype(q.dtype)
    return jnp.einsum('bhnm,bmhd->bnhd', a, q,
                      preferred_element_type=jnp.float32).astype(q.dtype)

timed('attn einsum pair+softmax', attn_core, q0, flops=ein_flops)

# full backbone for scale
bb = S.SwinTiny(dtype=DT)
x544 = jnp.asarray(rng.rand(B, 544, 544, 3).astype(np.float32))
vbb = bb.init(jax.random.PRNGKey(0), x544[:1], train=False)
def bb_all(x):
    # reduce over EVERY output so no stage is dead code in the chain
    outs = bb.apply(vbb, x, train=False)
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)[None]

timed('SwinTiny backbone @544 (sum-reduced)', bb_all, x544, k=4, n=3)
