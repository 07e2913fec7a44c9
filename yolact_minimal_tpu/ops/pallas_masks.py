"""Fused detect-mask finalization as a Pallas TPU kernel.

Replaces the XLA pair `assemble_masks` + `finalize_masks_fixed`
(ops/nms.py — the after_nms analog of reference output_utils.py:217-228)
for the fixed-size detect path with ONE kernel that, per image and per
output row band, performs

    lincomb   sigmoid(coefs @ proto^T)         (MXU, fp32)
    crop      zero outside the detection box   (VPU iota compares)
    upsample  exact 4x bilinear, align_corners=False
    binarize  > 0.5 -> bool

entirely in VMEM. The XLA path materializes the proto-resolution masks
[B, ph, pw, D] plus a [B, D, 4*ph, pw] fp32 row-upsampled intermediate in
HBM (~0.6 GB/batch16 at 544px); here the only HBM traffic is the proto in
and the packed bool masks out.

Mosaic layout strategy (this target rejects reshapes that move data across
the (sublane, lane) tiling — e.g. collapsing [32, 10, 136] to [32, 1360]):
the whole pipeline runs in a FLAT lane space. Proto columns are zero-padded
to a 128-multiple lane width W, rows are concatenated along lanes, and then

  * the band slice is a lane slice at a 128-aligned offset,
  * the lincomb is one [D, 32] @ [32, rows*W] MXU matmul (no reshape),
  * crop coordinates come from lane_index % W (column) and / W (row),
  * the 2-tap row phases are W-aligned lane-block shifts,
  * the row interleave is a concat of W-aligned lane chunks,
  * the column upsample+interleave is one [D*band, W] @ [W, S] matmul
    against the exact `ops.resize._interp_matrix(pw, S, False)` transpose
    (so column numerics are the interp matrix by construction), and
  * the only reshapes are 128-aligned lane splits and multiple-of-8
    major<->sublane merges, all of which Mosaic supports.

Row-phase weights: output row 4i+j samples input coordinate i+(j-1.5)/4, a
2-tap mix of rows (i-1, i) for j<2 and (i, i+1) for j>=2; edge rows
replicate via the +-1 edge padding, which equals the clamped interp matrix.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolact_minimal_tpu.ops.boxes import sanitize_coordinates
from yolact_minimal_tpu.ops.resize import _interp_matrix

_PH_W = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125), (0.625, 0.375))

# Output rows per grid step: 32 -> 8 proto rows per band, keeping the band's
# fp32 column-matmul result [D*32, S] at ~7 MB of VMEM (D=100, S=544), and
# the band's lane offset (band * 8 * W) 128-aligned for any 128-multiple W.
_BAND_OUT = 32


def _kernel(proto_ref, coefs_ref, planes_ref, valid_ref, wcol_ref, out_ref,
            *, ph: int, pw: int, d: int, lanew: int):
    rows_in = _BAND_OUT // 4
    chunk = (rows_in + 2) * lanew
    band = pl.program_id(1)

    # Flat [32, (rows_in+2)*W] halo window; offset is a multiple of 4*W.
    ppf = proto_ref[0, :, pl.ds(band * (rows_in * lanew), chunk)]

    # Lincomb on the MXU.
    m = jax.nn.sigmoid(jnp.dot(coefs_ref[0], ppf,
                               preferred_element_type=jnp.float32))

    # Crop + validity in flat lane coordinates. lane % W is the column,
    # lane / W the local padded row; halo rows carry the coordinate of the
    # edge row they replicate. (Float-product mask: rank-3 bool ops crash
    # this target's Mosaic; integer iota: it rejects float tpu.iota.)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    col_ids = (lane % lanew).astype(jnp.float32)
    row_ids = jnp.clip(lane // lanew + (band * rows_in - 1),
                       0, ph - 1).astype(jnp.float32)
    pb = planes_ref[0]                                       # [D, 4]
    keep = ((col_ids >= pb[:, 0:1]).astype(m.dtype) *
            (col_ids < pb[:, 1:2]).astype(m.dtype) *
            (row_ids >= pb[:, 2:3]).astype(m.dtype) *
            (row_ids < pb[:, 3:4]).astype(m.dtype))
    m = m * keep * valid_ref[0]

    # 2-tap row phases as W-aligned lane-block shifts of the flat band.
    prev = m[:, :rows_in * lanew]
    cur = m[:, lanew:(rows_in + 1) * lanew]
    nxt = m[:, 2 * lanew:]
    phases = [w0 * (prev if j < 2 else cur) + w1 * (cur if j < 2 else nxt)
              for j, (w0, w1) in enumerate(_PH_W)]

    # Interleave output rows: aligned lane-chunk concat in 4i+j order.
    rows = [p[:, k * lanew:(k + 1) * lanew]
            for k in range(rows_in) for p in phases]
    rv = jnp.concatenate(rows, axis=1)                       # [D, band*W]

    # Column upsample + interleave as one matmul, then binarize.
    rv = rv.reshape(d, _BAND_OUT, lanew).reshape(d * _BAND_OUT, lanew)
    up = jnp.dot(rv, wcol_ref[:], preferred_element_type=jnp.float32)
    # uint8 0/1 output: a bool out ref is materialized as s32 by Mosaic
    # (4 bytes/pixel -> 4x the HBM write traffic of the packed masks).
    out_ref[0] = (up.reshape(d, _BAND_OUT, wcol_ref.shape[1])
                  > 0.5).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def fused_mask_finalize(proto: jnp.ndarray, coefs: jnp.ndarray,
                        boxes: jnp.ndarray, valid: jnp.ndarray,
                        out_size: int, do_crop: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """sigmoid(proto @ coefs^T) -> crop -> 4x bilinear -> (>0.5), batched.

    Args:
      proto:  [B, ph, pw, 32] prototype maps (any float dtype; used as fp32).
      coefs:  [B, D, 32] mask coefficients of the detection slate.
      boxes:  [B, D, 4] normalized xyxy detection boxes.
      valid:  [B, D] bool slate validity.
      out_size: output edge S; must equal 4*ph (the P3 stride-4 contract).
      do_crop: False skips the box crop (cfg.no_crop).

    Returns [B, D, S, S] uint8 0/1 masks — elementwise identical to
    `finalize_masks_fixed(assemble_masks(...))` on the same inputs (which
    returns bool; uint8 here because Mosaic materializes bool outputs as
    s32, quadrupling the HBM write).
    """
    b, ph, pw, nc = proto.shape
    d = coefs.shape[1]
    rows_in = _BAND_OUT // 4
    if out_size != 4 * ph or ph % rows_in or nc != 32 or pw > 256:
        raise ValueError(f'unsupported shapes: proto {proto.shape}, '
                         f'out_size {out_size}')
    lanew = 128 if pw <= 128 else 256

    # [B, 32, (ph+2)*W]: rows edge-padded +-1 (row-phase halo), columns
    # zero-padded to the lane width, then flattened along lanes.
    protot = jnp.transpose(proto.astype(jnp.float32), (0, 3, 1, 2))
    protot = jnp.pad(protot, ((0, 0), (0, 0), (1, 1), (0, 0)), mode='edge')
    protot = jnp.pad(protot, ((0, 0), (0, 0), (0, 0), (0, lanew - pw)))
    protot = protot.reshape(b, nc, (ph + 2) * lanew)

    if do_crop:
        x1, x2 = sanitize_coordinates(boxes[..., 0], boxes[..., 2], pw,
                                      padding=1)
        y1, y2 = sanitize_coordinates(boxes[..., 1], boxes[..., 3], ph,
                                      padding=1)
    else:
        zeros = jnp.zeros(boxes.shape[:2], jnp.float32)
        x1, x2 = zeros, zeros + pw
        y1, y2 = zeros, zeros + ph
    planes = jnp.stack([x1, x2, y1, y2], axis=2)            # [B, D, 4]
    validf = valid.astype(jnp.float32)[:, :, None]          # [B, D, 1]

    wcol = np.zeros((lanew, out_size), np.float32)
    wcol[:pw] = _interp_matrix(pw, out_size, align_corners=False).T
    wcol = jnp.asarray(wcol)

    kernel = functools.partial(_kernel, ph=ph, pw=pw, d=d, lanew=lanew)
    return pl.pallas_call(
        kernel,
        grid=(b, (4 * ph) // _BAND_OUT),
        in_specs=[
            pl.BlockSpec((1, nc, (ph + 2) * lanew), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, nc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((lanew, out_size), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, _BAND_OUT, out_size),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, 4 * ph, out_size), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(protot, coefs.astype(jnp.float32), planes, validf, wcol)
