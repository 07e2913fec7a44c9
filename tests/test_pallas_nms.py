"""Pallas suppression kernel parity vs the XLA formulation (interpret mode
on CPU)."""
import numpy as np

import jax.numpy as jnp

from yolact_minimal_tpu.ops.nms import _plane_iou
from yolact_minimal_tpu.ops.pallas_nms import suppression_iou_max


def _xla_iou_max(x1, y1, x2, y2, valid):
    iou = _plane_iou(x1, y1, x2, y2)
    iou = jnp.where(valid[:, None, :] & valid[:, :, None], iou, 0.0)
    iou = jnp.triu(iou, k=1)
    return jnp.max(iou, axis=1)


def test_suppression_kernel_parity(rng):
    c, k = 8, 128
    xy1 = rng.uniform(0, 0.7, size=(2, c, k)).astype(np.float32)
    wh = rng.uniform(0.05, 0.3, size=(2, c, k)).astype(np.float32)
    x1, y1 = jnp.asarray(xy1[0]), jnp.asarray(xy1[1])
    x2, y2 = x1 + wh[0], y1 + wh[1]
    valid = jnp.asarray(rng.uniform(size=(c, k)) > 0.2)

    ours = suppression_iou_max(x1, y1, x2, y2, valid, interpret=True)
    ref = _xla_iou_max(x1, y1, x2, y2, valid)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_suppression_kernel_all_invalid(rng):
    c, k = 4, 64
    x1 = jnp.asarray(rng.rand(c, k).astype(np.float32))
    out = suppression_iou_max(x1, x1, x1 + 0.1, x1 + 0.1,
                              jnp.zeros((c, k), bool), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
