"""Does an executable containing Mosaic custom calls pay per-DISPATCH
overhead on the tunneled axon backend? The fused swin detect graph times
60.5 ms chained in-jit but 82.8 ms dispatched in a sustained loop, while
the pure-XLA variant shows no such gap. Here: a matmul chain with 0, 1 or
10 trivial Pallas calls, timed both ways."""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

N = 2048
x0 = jnp.asarray(np.random.RandomState(0).rand(N, N).astype(np.float32))
w = jnp.asarray(np.random.RandomState(1).rand(N, N).astype(np.float32))


def pallas_relu(x):
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.maximum(x_ref[...], 0.0)
    return pl.pallas_call(
        kern,
        grid=(N // 256,),
        in_specs=[pl.BlockSpec((256, N), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((256, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
    )(x)


def body(x, n_pallas):
    for i in range(10):
        x = x @ w * 1e-4
        if i < n_pallas:
            x = pallas_relu(x)
    return x


for n_pallas in (0, 1, 10):
    f = jax.jit(lambda x, n=n_pallas: body(x, n))

    # chained: K executions inside ONE dispatch
    @jax.jit
    def chain(x, n=n_pallas):
        for _ in range(6):
            x = body(x, n)
        return x

    y = chain(x0)
    jax.device_get(y[0, 0])
    t0 = time.perf_counter()
    for _ in range(4):
        y = chain(y * 1e-30 + x0)
    jax.device_get(y[0, 0])
    per_chain = (time.perf_counter() - t0) / (4 * 6)

    # sustained: one dispatch per execution, data-dependent
    y = f(x0)
    jax.device_get(y[0, 0])
    t0 = time.perf_counter()
    for _ in range(24):
        y = f(y * 1e-30 + x0)
    jax.device_get(y[0, 0])
    per_disp = (time.perf_counter() - t0) / 24
    print(f'n_pallas={n_pallas}: chained {per_chain*1e3:.3f} ms, '
          f'dispatched {per_disp*1e3:.3f} ms, '
          f'gap {(per_disp-per_chain)*1e3:+.3f} ms', flush=True)
