"""Which constructs of the fused attention half-block does this target's
Mosaic accept? Each candidate runs in its own tiny pallas_call; prints
PASS/FAIL with the first 600 chars of the compiler error.

Run: python probes/_mosaic_ops_probe.py
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

G, N, C, F, H = 4, 49, 96, 288, 3


def check(name, kern, ins, out_shape):
    try:
        got = pl.pallas_call(
            kern,
            grid=(1,),
            in_specs=[pl.BlockSpec(x.shape, lambda i, _n=x.ndim: (0,) * _n)
                      for x in ins],
            out_specs=pl.BlockSpec(out_shape.shape,
                                   lambda i, _n=len(out_shape.shape): (0,) * _n),
            out_shape=out_shape,
        )(*ins)
        jax.block_until_ready(got)
        print(f'{name}: PASS', flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace('\n', ' | ')[:600]
        print(f'{name}: FAIL {type(e).__name__}: {msg}', flush=True)
        return False


rng = np.random.RandomState(0)
x3 = jnp.asarray(rng.randn(G, N, C).astype(np.float32)).astype(jnp.bfloat16)
w = jnp.asarray(rng.randn(C, F).astype(np.float32)).astype(jnp.bfloat16)
b3 = jnp.asarray(rng.randn(1, 1, F).astype(np.float32))


def k_rank3_dot(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


check('rank3xrank2 dot_general', k_rank3_dot, [x3, w],
      jax.ShapeDtypeStruct((G, N, F), jnp.bfloat16))


def k_reshape_dot(x_ref, w_ref, o_ref):
    x2 = x_ref[...].reshape(G * N, C)
    y = jax.lax.dot_general(x2, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[...] = y.reshape(G, N, F).astype(o_ref.dtype)


check('reshape(G*N,C) + rank2 dot', k_reshape_dot, [x3, w],
      jax.ShapeDtypeStruct((G, N, F), jnp.bfloat16))


def k_bias_broadcast(x_ref, b_ref, o_ref):
    y = jnp.zeros((G, N, F), jnp.float32) + b_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


check('[1,1,F] broadcast add', k_bias_broadcast, [x3, b3],
      jax.ShapeDtypeStruct((G, N, F), jnp.bfloat16))


def k_lane_concat(x_ref, o_ref):
    parts = [x_ref[:, :, h * 32:(h + 1) * 32] for h in range(H)]
    o_ref[...] = jnp.concatenate(parts, axis=-1)


check('lane-axis concat of 32-lane slices', k_lane_concat, [x3],
      jax.ShapeDtypeStruct((G, N, C), jnp.bfloat16))


def k_batched_dot(x_ref, o_ref):
    q = x_ref[:, :, :32]
    k = x_ref[:, :, 32:64]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = s.astype(o_ref.dtype)


check('batched rank3 qk dot (control, known-good)', k_batched_dot, [x3],
      jax.ShapeDtypeStruct((G, N, N), jnp.bfloat16))
