"""Parity of the fused Pallas mask-finalize kernel against the XLA path
(assemble_masks + finalize_masks_fixed) it replaces."""
import functools

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops.nms import (Detections, assemble_masks,
                                        finalize_masks_fixed)
from yolact_minimal_tpu.ops.pallas_masks import fused_mask_finalize


def _random_slate(rng, b=2, ph=32, d=24):
    proto = rng.normal(size=(b, ph, ph, 32)).astype(np.float32)
    coefs = np.tanh(rng.normal(size=(b, d, 32))).astype(np.float32)
    xy1 = rng.uniform(0, 0.6, size=(b, d, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.4, size=(b, d, 2)).astype(np.float32)
    boxes = np.concatenate([xy1, np.clip(xy1 + wh, 0, 1)], axis=2)
    valid = rng.rand(b, d) > 0.3
    return (jnp.asarray(proto), jnp.asarray(coefs), jnp.asarray(boxes),
            jnp.asarray(valid))


def _xla_reference(proto, coefs, boxes, valid, out_size, do_crop=True):
    dets = Detections(ids=jnp.zeros(valid.shape, jnp.int32),
                      scores=jnp.ones(valid.shape, jnp.float32),
                      boxes=boxes, coefs=coefs, valid=valid)
    mp = jax.vmap(functools.partial(assemble_masks, do_crop=do_crop))(proto, dets)
    return jax.vmap(lambda m: finalize_masks_fixed(m, out_size))(mp)


def test_fused_finalize_matches_xla(rng):
    proto, coefs, boxes, valid = _random_slate(rng)
    out_size = 4 * proto.shape[1]
    ref = np.asarray(_xla_reference(proto, coefs, boxes, valid, out_size))
    got = np.asarray(fused_mask_finalize(proto, coefs, boxes, valid,
                                         out_size, True, True)).astype(bool)
    assert got.shape == ref.shape == (2, 24, out_size, out_size)
    # bool-exact away from the knife-edge; tolerate <0.01% boundary pixels
    # sitting within float-reassociation distance of the 0.5 threshold
    mismatch = (got != ref).mean()
    assert mismatch < 1e-4, f'mask mismatch fraction {mismatch}'
    assert ref.any()  # non-degenerate fixture


def test_fused_finalize_no_crop(rng):
    proto, coefs, boxes, valid = _random_slate(rng, b=1, ph=16, d=8)
    out_size = 4 * proto.shape[1]
    ref = np.asarray(_xla_reference(proto, coefs, boxes, valid, out_size,
                                    do_crop=False))
    got = np.asarray(fused_mask_finalize(proto, coefs, boxes, valid,
                                         out_size, False, True)).astype(bool)
    mismatch = (got != ref).mean()
    assert mismatch < 1e-4, f'mask mismatch fraction {mismatch}'


def test_fused_finalize_invalid_all_zero(rng):
    proto, coefs, boxes, _ = _random_slate(rng, b=1, ph=16, d=8)
    valid = jnp.zeros((1, 8), bool)
    got = np.asarray(fused_mask_finalize(proto, coefs, boxes, valid,
                                         64, True, True))
    assert not got.any()
