"""Fused (Pallas) window attention vs the XLA oracle: forward parity at
every swin stage geometry, masked + unmasked, both dtypes, and gradient
flow through the custom_vjp (backward = XLA recompute)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models.swin import shifted_window_regions
from yolact_minimal_tpu.ops.window_attention import (_attention_xla,
                                                     window_attention_fused)

N = 49


def _mk(bnw, c, dtype, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(bnw, N, 3 * c).astype(np.float32)).astype(dtype)


def _bias(heads, dtype, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(heads, N, N).astype(np.float32) * 0.1).astype(dtype)


# (heads, dim, hp) — the four swin-tiny stage geometries at img_size 224
STAGES = [(3, 96, 56), (6, 192, 28), (12, 384, 14), (24, 768, 7)]


@pytest.mark.parametrize('heads,c,hp', STAGES)
@pytest.mark.parametrize('masked', [False, True])
def test_fused_matches_xla(heads, c, hp, masked):
    nw = (hp // 7) ** 2 if hp >= 7 else 1
    b = 2
    qkv = _mk(b * nw, c, jnp.float32)
    bias = _bias(heads, jnp.float32)
    region = (jnp.asarray(shifted_window_regions(hp, hp).astype(np.int32))
              if masked else None)
    ref = _attention_xla(qkv, bias, region, heads)
    out = window_attention_fused(qkv, bias, region, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_matches_xla_bf16():
    heads, c, hp = 3, 96, 56
    nw = (hp // 7) ** 2
    qkv = _mk(nw, c, jnp.bfloat16)
    bias = _bias(heads, jnp.bfloat16)
    region = jnp.asarray(shifted_window_regions(hp, hp).astype(np.int32))
    ref = _attention_xla(qkv, bias, region, heads).astype(jnp.float32)
    out = window_attention_fused(qkv, bias, region, heads).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_grad_matches_xla_grad():
    heads, c = 3, 96
    nw = 16
    qkv = _mk(nw, c, jnp.float32)
    bias = _bias(heads, jnp.float32)

    def loss_fused(qkv, bias):
        return jnp.sum(window_attention_fused(qkv, bias, None, heads) ** 2)

    def loss_xla(qkv, bias):
        return jnp.sum(_attention_xla(qkv, bias, None, heads) ** 2)

    gf_q, gf_b = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    gx_q, gx_b = jax.grad(loss_xla, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gf_q), np.asarray(gx_q),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_b), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('masked', [False, True])
def test_fused_spmd_matches_single_device(masked):
    """With a data mesh declared, the fused kernel runs under shard_map on
    the batch axis (per-device Pallas dispatch); outputs must equal the
    single-device kernel on the same global batch, sharded input or not."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolact_minimal_tpu.ops.window_attention import set_spmd_mesh
    from yolact_minimal_tpu.parallel.mesh import make_mesh

    heads, c, hp = 3, 96, 28
    nw = (hp // 7) ** 2
    b = 8
    qkv = _mk(b * nw, c, jnp.float32)
    bias = _bias(heads, jnp.float32)
    region = (jnp.asarray(shifted_window_regions(hp, hp).astype(np.int32))
              if masked else None)
    ref = window_attention_fused(qkv, bias, region, heads)

    mesh = make_mesh(8)
    qkv_sharded = jax.device_put(qkv, NamedSharding(mesh, P('data')))
    set_spmd_mesh(mesh)
    try:
        out = jax.jit(window_attention_fused, static_argnums=(3,))(
            qkv_sharded, bias, region, heads)
    finally:
        set_spmd_mesh(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _mk_block(bnw, c, heads, dtype, masked, hp):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(bnw, N, c).astype(np.float32)).astype(dtype)
    wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.05)
    bqkv = jnp.asarray(rng.randn(3 * c).astype(np.float32) * 0.05)
    wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05)
    bproj = jnp.asarray(rng.randn(c).astype(np.float32) * 0.05)
    bias = _bias(heads, dtype)
    region = (jnp.asarray(shifted_window_regions(hp, hp).astype(np.int32))
              if masked else None)
    return x, wqkv, bqkv, bias, region, wproj, bproj


@pytest.mark.parametrize('heads,c,hp', STAGES[:3])
@pytest.mark.parametrize('masked', [False, True])
def test_block_fused_matches_xla(heads, c, hp, masked):
    """The whole-half-block kernel (qkv proj + attention + out proj in one
    pass) vs its XLA oracle at the swin stage geometries."""
    from yolact_minimal_tpu.ops.window_attention import (
        _block_xla, window_attention_block_fused)
    nw = (hp // 7) ** 2 if hp >= 7 else 1
    args = _mk_block(2 * nw, c, heads, jnp.float32, masked, hp)
    ref = _block_xla(*args, heads)
    out = window_attention_block_fused(*args, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_block_fused_grad_matches_xla_grad():
    from yolact_minimal_tpu.ops.window_attention import (
        _block_xla, window_attention_block_fused)
    heads, c, hp = 3, 96, 28
    nw = (hp // 7) ** 2
    x, wqkv, bqkv, bias, region, wproj, bproj = _mk_block(
        nw, c, heads, jnp.float32, True, hp)

    def loss(fn, x, wqkv, wproj):
        return jnp.sum(fn(x, wqkv, bqkv, bias, region, wproj, bproj,
                          heads) ** 2)

    gf = jax.grad(lambda *a: loss(window_attention_block_fused, *a),
                  argnums=(0, 1, 2))(x, wqkv, wproj)
    gx = jax.grad(lambda *a: loss(_block_xla, *a),
                  argnums=(0, 1, 2))(x, wqkv, wproj)
    for f, r in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_block_fused_spmd_matches_single_device():
    """Under a data mesh the block kernel shard_maps over the batch-major
    leading dim; outputs must equal the single-device call."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolact_minimal_tpu.ops.window_attention import (
        set_spmd_mesh, window_attention_block_fused)
    from yolact_minimal_tpu.parallel.mesh import make_mesh

    heads, c, hp = 3, 96, 28
    nw = (hp // 7) ** 2
    b = 8
    args = _mk_block(b * nw, c, heads, jnp.float32, True, hp)
    ref = window_attention_block_fused(*args, heads)

    mesh = make_mesh(8)
    x_sharded = jax.device_put(args[0], NamedSharding(mesh, P('data')))
    set_spmd_mesh(mesh)
    try:
        out = jax.jit(window_attention_block_fused, static_argnums=(7,))(
            x_sharded, *args[1:], heads)
    finally:
        set_spmd_mesh(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('variant', ['kernel', 'block'])
def test_swin_block_fused_matches_unfused(variant):
    """Whole SwinBlock (shifted, so the mask path is exercised) with the
    fused attention kernel / the fused half-block kernel vs plain XLA must
    agree — including loading the same param tree into all three."""
    from yolact_minimal_tpu.models.swin import SwinBlock
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 28, 28, 96).astype(np.float32))
    blk = SwinBlock(96, 3, shift=3, drop_path_rate=0.0)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)
    out = SwinBlock(96, 3, shift=3, drop_path_rate=0.0,
                    fused_attn=(variant == 'kernel'),
                    fused_attn_block=(variant == 'block'),
                    fused_mlp=True).apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
