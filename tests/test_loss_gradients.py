"""Gradient-safety regression tests: all four losses must have finite grads
even when crop() zeroes mask probabilities exactly (the 0*inf NaN path)."""
import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops import losses as L


def test_lincomb_grads_finite_with_cropped_zeros(rng):
    b, a, g, ph, pw = 1, 50, 4, 16, 16
    pos = jnp.asarray(rng.uniform(size=(b, a)) > 0.7)
    anchor_max_i = jnp.asarray(rng.randint(0, g, size=(b, a)).astype(np.int32))
    # boxes covering a small sub-region -> crop zeroes most of the mask
    boxes = jnp.tile(jnp.asarray([[0.3, 0.3, 0.5, 0.5]], jnp.float32), (b, a, 1))
    coef = jnp.asarray(np.tanh(rng.normal(size=(b, a, 32))).astype(np.float32))
    proto = jnp.asarray(rng.normal(size=(b, ph, pw, 32)).astype(np.float32))
    masks = jnp.asarray((rng.uniform(size=(b, g, ph, pw)) > 0.5).astype(np.float32))

    def f(coef, proto):
        return L.lincomb_mask_loss(pos, anchor_max_i, coef, proto, masks,
                                   boxes, jax.random.PRNGKey(0), 6.125, 100)

    loss = float(f(coef, proto))
    assert np.isfinite(loss)
    gc, gp = jax.grad(f, argnums=(0, 1))(coef, proto)
    assert bool(jnp.all(jnp.isfinite(gc))), 'coef grads not finite'
    assert bool(jnp.all(jnp.isfinite(gp))), 'proto grads not finite'


def test_log_clamped_values_and_grads():
    x = jnp.asarray([0.0, 1e-45, 1e-20, 0.5, 1.0])
    y = L._log_clamped(x)
    assert float(y[0]) == -100.0
    assert float(y[3]) == np.log(0.5).astype(np.float32)
    g = jax.vmap(jax.grad(lambda v: L._log_clamped(v)))(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    np.testing.assert_allclose(float(g[3]), 2.0, rtol=1e-5)
    assert float(g[0]) == 0.0
