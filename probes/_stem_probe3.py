"""Per-op true device cost via K-chained ops inside ONE jit (amortizes the
tunnel's per-dispatch RPC overhead that swamps single-op micro-benches:
a bare elementwise cast 'measured' 5.2 ms standalone)."""
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

B, S, K = 16, 544, 30
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32)).astype(jnp.bfloat16)


def timed_chain(label, one, x0, flops_per=None, bytes_per=None, k=K, n=5):
    """Time K data-dependent repetitions of `one` inside a single jit."""
    @jax.jit
    def chain(x):
        for i in range(k):
            y = one(x)
            # feed a zero-valued scalar of y back into x so iterations chain
            x = x + (y.reshape(-1)[0].astype(jnp.float32) * 1e-30).astype(x.dtype)
        return y

    y = chain(img)
    jax.device_get(y.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = chain(img)
    jax.device_get(y.reshape(-1)[0])
    per = (time.perf_counter() - t0) / (n * k)
    extra = ''
    if flops_per:
        extra += f'  {flops_per/per/1e12:.1f} TF/s'
    if bytes_per:
        extra += f'  {bytes_per/per/1e9:.0f} GB/s'
    print(f'{label}: {per*1e3:.3f} ms/op{extra}', flush=True)
    return per


# pure HBM op: s2d pack (28 MB in + 28 MB out, bf16)
def s2d(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)

timed_chain('s2d pack', lambda x: s2d(x).reshape(B, S, S, 3) * 1.0, img,
            bytes_per=4 * B * S * S * 3 * 2)

# the stem conv, 7x7/s2 3->64
c7 = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
             use_bias=False, dtype=jnp.bfloat16)
v7 = c7.init(jax.random.PRNGKey(0), img[:1])
st_flops = B * 272 * 272 * 64 * 7 * 7 * 3 * 2


def stem_op(x):
    y = c7.apply(v7, x)
    return y

timed_chain('7x7s2 stem', stem_op, img, flops_per=st_flops)

# packed stem: s2d + 4x4s1 12->64
c4 = nn.Conv(64, (4, 4), strides=(1, 1), padding=((1, 2), (1, 2)),
             use_bias=False, dtype=jnp.bfloat16)
v4 = c4.init(jax.random.PRNGKey(0), s2d(img[:1]))
s2d_flops = B * 272 * 272 * 64 * 4 * 4 * 12 * 2
timed_chain('s2d+4x4s1 stem', lambda x: c4.apply(v4, s2d(x)), img,
            flops_per=s2d_flops)

# well-shaped conv reference: 3x3 64->64 at 272^2
x64 = jnp.asarray(rng.rand(B, 272, 272, 64).astype(np.float32)).astype(jnp.bfloat16)
c33 = nn.Conv(64, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
              use_bias=False, dtype=jnp.bfloat16)
v33 = c33.init(jax.random.PRNGKey(0), x64[:1])
f33 = B * 272 * 272 * 64 * 64 * 9 * 2


def conv33(x):
    return c33.apply(v33, x)

@jax.jit
def chain33(x):
    for i in range(K):
        y = conv33(x)
        x = x + (y[0, 0, 0, 0].astype(jnp.float32) * 1e-30).astype(x.dtype)
    return y

y = chain33(x64); jax.device_get(y.reshape(-1)[0])
t0 = time.perf_counter()
for _ in range(5):
    y = chain33(x64)
jax.device_get(y.reshape(-1)[0])
per = (time.perf_counter() - t0) / (5 * K)
print(f'3x3 64->64 conv: {per*1e3:.3f} ms/op  {f33/per/1e12:.1f} TF/s', flush=True)
