"""Fused whole-SwinBlock kernel (ops/swin_block.py) vs the unfused module:
forward parity shifted/unshifted, WITH window padding (the rowmask path that
reproduces pad-after-norm semantics), gradient flow, and bf16."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models.swin import SwinBlock


def _run(h, w, c, heads, shift, dtype=jnp.float32):
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32)).astype(dtype)
    blk = SwinBlock(c, heads, shift=shift, drop_path_rate=0.0, dtype=dtype)
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)
    out = SwinBlock(c, heads, shift=shift, drop_path_rate=0.0, dtype=dtype,
                    fused_whole=True).apply(v, x)
    return np.asarray(out, np.float32), np.asarray(ref, np.float32)


# The whole-block kernel is a validated OPT-IN (the default per-stage policy
# composes the attention + MLP half-block kernels; see docs/ARCHITECTURE.md),
# so only the padded-shifted parity + bf16 cases stay in the quick tier; the
# redundant geometries and the 20 s grad check ride the slow tier.
@pytest.mark.slow
@pytest.mark.parametrize('shift', [0, 3])
def test_whole_fused_no_padding(shift):
    out, ref = _run(28, 28, 96, 3, shift)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('shift', [0, 3])
def test_whole_fused_with_padding(shift):
    """30x26 pads to 35x28 — boundary windows mix real and padding tokens,
    so this pins the rowmask (pad-after-norm) semantics exactly."""
    out, ref = _run(30, 26, 96, 3, shift)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_whole_fused_stage1_geometry():
    out, ref = _run(14, 14, 192, 6, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_whole_fused_bf16():
    out, ref = _run(30, 26, 96, 3, 3, dtype=jnp.bfloat16)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


@pytest.mark.slow
def test_whole_fused_grads_match():
    """custom_vjp backward (XLA-oracle recompute) must match the unfused
    module's grads through a whole padded, shifted block."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 16, 16, 96).astype(np.float32))
    blk_ref = SwinBlock(96, 3, shift=3, drop_path_rate=0.0)
    v = blk_ref.init(jax.random.PRNGKey(0), x)
    blk_fused = SwinBlock(96, 3, shift=3, drop_path_rate=0.0,
                          fused_whole=True)

    def loss(blk, params, x):
        return jnp.sum(blk.apply(params, x) ** 2)

    g_ref = jax.grad(lambda p, x: loss(blk_ref, p, x), argnums=(0, 1))(v, x)
    g_fus = jax.grad(lambda p, x: loss(blk_fused, p, x), argnums=(0, 1))(v, x)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fus)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
