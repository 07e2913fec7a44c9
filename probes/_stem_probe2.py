"""Why is the res50 stem conv 5.8 ms/batch (2% of peak)? Decompose."""
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def timed(fn, *xs, n=20):
    out = fn(*xs)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    pert = jax.jit(lambda x, s: x + (s.reshape(-1)[0] * 0).astype(x.dtype))
    xs = (pert(xs[0], jax.tree.leaves(out)[0]),) + xs[1:]
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
img_bf = img.astype(jnp.bfloat16)


def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


packed = jax.jit(s2d)(img_bf)          # [16, 272, 272, 12] bf16, pre-staged
packed16 = jnp.pad(packed, ((0, 0), (0, 0), (0, 0), (0, 4)))   # 12 -> 16 ch

t = timed(jax.jit(s2d), img_bf)
print(f's2d pack alone:        {t*1e3:.3f} ms', flush=True)

t = timed(jax.jit(lambda x: x.astype(jnp.bfloat16)), img)
print(f'fp32->bf16 cast alone: {t*1e3:.3f} ms', flush=True)

def conv(ch_out, k, s, pad):
    c = nn.Conv(ch_out, (k, k), strides=(s, s), padding=pad, use_bias=False,
                dtype=jnp.bfloat16)
    return c

# 4x4/s1 conv on the PRE-packed 12ch input (pack excluded)
c12 = conv(64, 4, 1, ((1, 2), (1, 2)))
v12 = c12.init(jax.random.PRNGKey(0), packed[:1])
t = timed(jax.jit(lambda x: c12.apply(v12, x)), packed)
print(f'4x4s1 conv 12ch->64:   {t*1e3:.3f} ms', flush=True)

# same but 16 input channels (sublane-aligned-ish)
c16 = conv(64, 4, 1, ((1, 2), (1, 2)))
v16 = c16.init(jax.random.PRNGKey(0), packed16[:1])
t = timed(jax.jit(lambda x: c16.apply(v16, x)), packed16)
print(f'4x4s1 conv 16ch->64:   {t*1e3:.3f} ms', flush=True)

# well-shaped reference point: 3x3s1 64->64 at 272^2
x64 = jnp.asarray(rng.rand(B, 272, 272, 64).astype(np.float32)).astype(jnp.bfloat16)
c64 = conv(64, 3, 1, ((1, 1), (1, 1)))
v64 = c64.init(jax.random.PRNGKey(0), x64[:1])
t = timed(jax.jit(lambda x: c64.apply(v64, x)), x64)
flops = B * 272 * 272 * 64 * 64 * 9 * 2
print(f'3x3s1 conv 64ch->64:   {t*1e3:.3f} ms  ({flops/t/1e12:.1f} TF/s)', flush=True)

# im2col matmul formulation of the packed stem: patches [B*272*272, 192] @ [192, 64]
w = jnp.asarray(rng.rand(4 * 4 * 12, 64).astype(np.float32)).astype(jnp.bfloat16)

def im2col_stem(x, w):
    p = jax.lax.conv_general_dilated_patches(
        x, (4, 4), (1, 1), ((1, 2), (1, 2)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.dot_general(p, w, (((3,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

t = timed(jax.jit(im2col_stem), packed, w)
print(f'im2col stem matmul:    {t*1e3:.3f} ms', flush=True)

# original 7x7s2 on bf16-pre-cast input (is the fp32 input the problem?)
c7 = conv(64, 7, 2, ((3, 3), (3, 3)))
v7 = c7.init(jax.random.PRNGKey(0), img_bf[:1])
t = timed(jax.jit(lambda x: c7.apply(v7, x)), img_bf)
print(f'7x7s2 conv bf16 input: {t*1e3:.3f} ms', flush=True)

# channel-padded original: 3 -> 8 input channels, 7x7s2
img8 = jnp.pad(img_bf, ((0, 0), (0, 0), (0, 0), (0, 5)))
c8 = conv(64, 7, 2, ((3, 3), (3, 3)))
v8 = c8.init(jax.random.PRNGKey(0), img8[:1])
t = timed(jax.jit(lambda x: c8.apply(v8, x)), img8)
print(f'7x7s2 conv 8ch input:  {t*1e3:.3f} ms', flush=True)
