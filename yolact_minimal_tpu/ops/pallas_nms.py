"""Pallas TPU kernel: per-class triangular IoU-max suppression.

The fast-NMS core (reference output_utils.py:21-26) computes, for each class,
the max IoU of every candidate against all higher-scored candidates and keeps
those below the threshold. The XLA formulation materializes the [C, K, K]
IoU tensor in HBM; this kernel tiles 8 classes per grid step and forms their
[8, K, K] IoU block entirely in VMEM — the only HBM traffic is the
coordinate planes in and the [C, K] max out.

Numerically identical to ops/nms.py's XLA path (validated in interpret mode
on CPU and by the NMS parity suite with YOLACT_PALLAS_NMS=1). Off by default;
enable via YOLACT_PALLAS_NMS=1 (see measured A/B notes in docs/ARCHITECTURE).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLASS_TILE = 8   # sublane-aligned classes per grid step


def _suppression_kernel(x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, out_ref):
    """Refs are [CLASS_TILE, K] planes in VMEM; out [CLASS_TILE, K] max-IoU
    against earlier (higher-scored) same-class candidates."""
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    vf = valid_ref[:]                    # float 0/1 validity

    k = x1.shape[-1]
    ix1 = jnp.maximum(x1[:, :, None], x1[:, None, :])
    iy1 = jnp.maximum(y1[:, :, None], y1[:, None, :])
    ix2 = jnp.minimum(x2[:, :, None], x2[:, None, :])
    iy2 = jnp.minimum(y2[:, :, None], y2[:, None, :])
    inter = jnp.clip(ix2 - ix1, 0.0) * jnp.clip(iy2 - iy1, 0.0)
    area = (x2 - x1) * (y2 - y1)
    union = area[:, :, None] + area[:, None, :] - inter
    iou = inter / union

    # rank-3 boolean &/where crashes the Mosaic compiler here; an equivalent
    # float-product mask compiles (and where() also zeroes NaN from 0/0).
    pair = vf[:, :, None] * vf[:, None, :]
    iou = jnp.where(pair > 0.5, iou, 0.0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    iou = jnp.where((rows < cols)[None], iou, 0.0)   # j (row) earlier than i
    out_ref[:] = jnp.max(iou, axis=1)


def suppression_iou_max(x1, y1, x2, y2, valid, interpret: bool = False):
    """[C, K] coordinate planes + validity -> [C, K] max IoU vs
    higher-scored same-class candidates. C is padded to a multiple of
    CLASS_TILE internally; vmap over a leading batch axis is supported."""
    c, k = x1.shape
    pad = (-c) % CLASS_TILE
    if pad:
        padf = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        x1, y1, x2, y2 = padf(x1), padf(y1), padf(x2), padf(y2)
        valid = jnp.pad(valid, ((0, pad), (0, 0)))
    cp = c + pad

    spec = pl.BlockSpec((CLASS_TILE, k), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _suppression_kernel,
        grid=(cp // CLASS_TILE,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((cp, k), x1.dtype),
        interpret=interpret,
    )(x1, y1, x2, y2, valid.astype(x1.dtype))
    return out[:c]
