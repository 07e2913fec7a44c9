"""Fused swin MLP half-block (Pallas) vs the XLA oracle: forward parity at
every stage width, gradient flow through the custom_vjp, and SPMD
(shard_map) parity over the data mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops.swin_mlp import _mlp_xla, mlp_block_fused


def _params(c, seed=0):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(c).astype(np.float32) * 0.1 + 1.0),
            jnp.asarray(rng.randn(c).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(c, 4 * c).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(4 * c).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(4 * c, c).astype(np.float32) * 0.05),
            jnp.asarray(rng.randn(c).astype(np.float32) * 0.05))


@pytest.mark.parametrize('c,rows', [(96, 1024), (192, 512), (384, 1156),
                                    (768, 168)])
def test_fused_matches_xla(c, rows):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(rows, c).astype(np.float32))
    p = _params(c)
    ref = _mlp_xla(x, *p)
    out = mlp_block_fused(x, *p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_xla_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(512, 96).astype(np.float32)).astype(jnp.bfloat16)
    p = _params(96)
    ref = _mlp_xla(x, *p).astype(jnp.float32)
    out = mlp_block_fused(x, *p).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_grad_matches_xla_grad():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(256, 96).astype(np.float32))
    p = _params(96)

    gf = jax.grad(lambda *a: jnp.sum(mlp_block_fused(*a) ** 2),
                  argnums=(0, 3))(x, *p)
    gx = jax.grad(lambda *a: jnp.sum(_mlp_xla(*a) ** 2),
                  argnums=(0, 3))(x, *p)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_spmd_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolact_minimal_tpu.ops.window_attention import set_spmd_mesh
    from yolact_minimal_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(8 * 289, 96).astype(np.float32))
    p = _params(96)
    ref = mlp_block_fused(x, *p)

    mesh = make_mesh(8)
    xs = jax.device_put(x, NamedSharding(mesh, P('data')))
    set_spmd_mesh(mesh)
    try:
        out = jax.jit(mlp_block_fused)(xs, *p)
    finally:
        set_spmd_mesh(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
