"""Fused shifted-window attention — Pallas TPU kernel.

Computes, per window,  softmax(q k^T * scale + rel_bias [+ shift_mask]) v
for all heads of a block of G windows entirely in VMEM. The plain-XLA
lowering of this op (reference semantics:
/root/reference/modules/swin_transformer.py:131-200) materializes the
[B*nW, H, N, N] score tensor in HBM around the softmax and dispatches the
(N=49, D=32) matmuls as tens of thousands of tiny batched MXU ops; the
kernel keeps scores on-chip and amortizes per-op overhead over G windows
per grid step.

The shift mask enters the kernel as a precomputed [nW, N, N] f32 additive
-100 mask built from the [nW, N] int32 *region ids* of the shifted-window
partition (reference BasicLayer:368-387 builds these as `img_mask`). It is
at most ~4 MB at the 544 geometries and is streamed per window block; a
rank-2 region input would pin the block's leading dim to a multiple of 8,
which nW=100 (544 stage 2) cannot satisfy.

Training runs through ``jax.custom_vjp``: forward uses the kernel, backward
recomputes via the equivalent XLA formulation's VJP (flash-style recompute —
no [*, N, N] residuals are ever stored).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -100.0  # reference mask fill value (swin_transformer.py:385)

# Trace-time SPMD context. pallas_call has no GSPMD partitioning rule, but
# the window-attention batch axis (B*nW, batch-major) is embarrassingly
# parallel: with a mesh declared here, the kernel call is wrapped in
# jax.shard_map over the 1-D 'data' axis so every device runs the fused
# kernel on its local batch rows — DP train/eval keep the fast path instead
# of falling back to the XLA einsum formulation (round-4 guards removed).
_SPMD_MESH = None


def set_spmd_mesh(mesh) -> None:
    """Declare the data mesh for subsequently TRACED graphs (None to clear).
    Read at trace time only; single-device meshes are treated as None."""
    global _SPMD_MESH
    _SPMD_MESH = mesh if (mesh is not None and mesh.devices.size > 1) else None


# Per-block VMEM budget for the qkv input block. Empirical: 2.5e6 picked
# G=80 at the 544 stage-1 geometry and overflowed the 16 MB scoped-vmem
# limit by 4% (the compiler keeps double-buffered qkv/out blocks PLUS the
# unrolled per-head score/prob temporaries live); 1.2e6 -> G=50 leaves
# ~40% headroom at every stage geometry.
_QKV_BLOCK_BYTES = 1.2e6


def _pick_block(n_windows_img: int, n: int, c3: int, itemsize: int) -> int:
    """Largest divisor of the per-image window count whose qkv block fits
    the VMEM budget (the qkv block dominates; with Mosaic's double
    buffering the working set is ~2x it plus the [G, N, N] f32 score
    scratch)."""
    cap = max(1, int(_QKV_BLOCK_BYTES / (n * c3 * itemsize)))
    best = 1
    for g in range(1, min(cap, n_windows_img) + 1):
        if n_windows_img % g == 0:
            best = g
    return best


def _kernel(qkv_ref, bias_ref, madd_ref, out_ref, *, heads, head_dim,
            scale, masked):
    qkv = qkv_ref[...]
    c = heads * head_dim
    if masked:
        madd = madd_ref[...]                                  # [G, N, N] f32
    for h in range(heads):
        lo = h * head_dim
        q = qkv[:, :, lo:lo + head_dim] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, :, c + lo:c + lo + head_dim]
        v = qkv[:, :, 2 * c + lo:2 * c + lo + head_dim]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None].astype(jnp.float32)
        if masked:
            s = s + madd
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        out_ref[:, :, lo:lo + head_dim] = o.astype(out_ref.dtype)


def _attention_xla(qkv, bias, region, heads):
    """Reference XLA formulation (identical math to models/swin.py r03's
    inline einsum path); used for the custom_vjp backward recompute and as
    the numerical oracle in tests."""
    bnw, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    q = qkv[..., :c].reshape(bnw, n, heads, hd)
    k = qkv[..., c:2 * c].reshape(bnw, n, heads, hd)
    v = qkv[..., 2 * c:].reshape(bnw, n, heads, hd)
    attn = jnp.einsum('bnhd,bmhd->bhnm', q * (hd ** -0.5), k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if region is not None:
        nw = region.shape[0]
        madd = jnp.where(region[:, :, None] != region[:, None, :],
                         jnp.float32(_NEG), jnp.float32(0.0))
        attn = attn.reshape(bnw // nw, nw, heads, n, n)
        attn = attn + madd[None, :, None]
        attn = attn.reshape(bnw, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                     preferred_element_type=jnp.float32).astype(qkv.dtype)
    return out.reshape(bnw, n, c)


def _attention_pallas(qkv, bias, region, heads, interpret=False):
    bnw, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // heads
    masked = region is not None
    if masked:
        # Additive mask materialized OUTSIDE the kernel at [nW, N, N] f32
        # (tiny: <=4 MB at the largest 544 geometry, folded by XLA). A
        # rank-2 region-id input would force a (G, N) block whose leading
        # dim must be a multiple of 8 — unsatisfiable when nW has no such
        # divisor (e.g. nW=100 at 544 stage 2). A rank-3 input only
        # constrains the LAST TWO dims (N, N), which are always full-size.
        madd = jnp.where(region[:, :, None] != region[:, None, :],
                         jnp.float32(_NEG), jnp.float32(0.0))
    else:
        # dummy input keeps the kernel signature uniform; never read
        madd = jnp.zeros((1, n, n), jnp.float32)
    kern = functools.partial(_kernel, heads=heads, head_dim=hd,
                             scale=hd ** -0.5, masked=masked)

    def call(qkv, bias, madd):
        # Local shapes: under shard_map the leading (batch-major) dim is
        # the per-device slice — always a whole number of images. The block
        # size g is derived from LOCAL quantities: for masked blocks it
        # divides the per-image window count nw (which divides the local
        # batch-window count), for unmasked blocks the local count itself.
        bnw_l = qkv.shape[0]
        nw = region.shape[0] if masked else bnw_l
        g = _pick_block(nw, n, c3, jnp.dtype(qkv.dtype).itemsize)
        if masked:
            madd_block = (g, n, n)
            madd_index = lambda i: (i % (nw // g), 0, 0)
        else:
            madd_block = (1, n, n)
            madd_index = lambda i: (0, 0, 0)
        return pl.pallas_call(
            kern,
            grid=(bnw_l // g,),
            in_specs=[
                pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0)),
                pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0)),
                pl.BlockSpec(madd_block, madd_index),
            ],
            out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bnw_l, n, c), qkv.dtype),
            interpret=interpret,
        )(qkv, bias, madd)

    if _SPMD_MESH is not None:
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            call, mesh=_SPMD_MESH,
            in_specs=(P('data'), P(), P()), out_specs=P('data'),
            check_vma=False)(qkv, bias, madd)
    return call(qkv, bias, madd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def window_attention_fused(qkv, bias, region, heads):
    """softmax(qk^T/sqrt(d) + bias [+ region mask]) v, fused on TPU.

    Args:
      qkv: [B*nW, N, 3C] packed projections (compute dtype).
      bias: [H, N, N] relative-position bias, already cast to compute dtype.
      region: [nW, N] int32 shifted-window region ids, or None (no shift).
      heads: head count H (C = H * head_dim).
    Returns: [B*nW, N, C].
    """
    interpret = jax.default_backend() == 'cpu'
    return _attention_pallas(qkv, bias, region, heads, interpret=interpret)


def _fused_fwd(qkv, bias, region, heads):
    return window_attention_fused(qkv, bias, region, heads), (qkv, bias,
                                                              region)


def _fused_bwd(heads, res, grad):
    qkv, bias, region = res
    # flash-style backward: recompute scores/softmax in the VJP of the XLA
    # formulation instead of storing [*, N, N] residuals
    _, vjp = jax.vjp(lambda a, b: _attention_xla(a, b, region, heads),
                     qkv, bias)
    d_qkv, d_bias = vjp(grad)
    return d_qkv, d_bias, None


window_attention_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Fused attention HALF-BLOCK: qkv projection + attention + output projection
# in one VMEM pass. Relative to window_attention_fused this removes the HBM
# round trip of the 3C-wide qkv tensor (written by the XLA Dense, re-read by
# the kernel) and of the attention output (written by the kernel, re-read by
# the XLA proj Dense) — six C-wide HBM passes per block at the cost of
# holding the [C, 3C] and [C, C] weights in VMEM (<=1.2 MB at stage 2).
# ---------------------------------------------------------------------------

def _pick_block_whole(n_windows_img: int, n: int, c: int, heads: int,
                      itemsize: int) -> int:
    """Block size for the half-block kernel: same [N, 3C]-per-window
    accounting as _pick_block (the in-kernel qkv value replaces the old
    kernel's qkv input block byte-for-byte), so the proven 1.2 MB budget
    carries over; the [C, 3C]/[C, C] weights add a grid-constant <=1.5 MB
    (stage 2) on top, well inside the measured ~40% headroom."""
    return _pick_block(n_windows_img, n, 3 * c, itemsize)


def _lane_pad(v, to):
    """Zero-pad the minor (lane) dim to `to` — MXU-free (a <128-lane
    contraction occupies a full 128-lane pass regardless), and required:
    this target's Mosaic crashes on NON-batched rank-3 dot_generals whose
    contraction dim is not a multiple of 128 (probes/_mosaic_ops_probe.py;
    the batched qk/pv dots with 32/49-dim contractions are fine)."""
    if v.shape[-1] == to:
        return v
    pad = jnp.zeros(v.shape[:-1] + (to - v.shape[-1],), v.dtype)
    return jnp.concatenate([v, pad], axis=-1)


def _block_kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, madd_ref, wproj_ref,
                  bproj_ref, out_ref, *, heads, head_dim, scale, masked,
                  c_pad):
    g, n, c = x_ref.shape
    x = _lane_pad(x_ref[...], c_pad)                      # [G, N, Cp]
    qkv = jax.lax.dot_general(x, wqkv_ref[...], (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...]).astype(x.dtype)           # [G, N, 3C]
    if masked:
        madd = madd_ref[...]                              # [G, N, N] f32
    outs = []
    for h in range(heads):
        lo = h * head_dim
        q = qkv[:, :, lo:lo + head_dim] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, :, c + lo:c + lo + head_dim]
        v = qkv[:, :, 2 * c + lo:2 * c + lo + head_dim]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None].astype(jnp.float32)
        if masked:
            s = s + madd
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(x.dtype))
    o = _lane_pad(jnp.concatenate(outs, axis=-1), c_pad)  # [G, N, Cp]
    y = jax.lax.dot_general(o, wproj_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out_ref[...] = (y + bproj_ref[...]).astype(out_ref.dtype)


def _block_xla(x, wqkv, bqkv, bias, region, wproj, bproj, heads):
    """XLA oracle with the kernel's exact numerics (f32-accumulated
    projections, bias added in f32); backward recompute target and the
    numerical reference in tests."""
    qkv = (jnp.dot(x, wqkv, preferred_element_type=jnp.float32)
           + bqkv).astype(x.dtype)
    out = _attention_xla(qkv, bias, region, heads)
    y = jnp.dot(out, wproj, preferred_element_type=jnp.float32) + bproj
    return y.astype(x.dtype)


def _block_pallas(x, wqkv, bqkv, bias, region, wproj, bproj, heads,
                  interpret=False):
    bnw, n, c = x.shape
    hd = c // heads
    masked = region is not None
    if masked:
        madd = jnp.where(region[:, :, None] != region[:, None, :],
                         jnp.float32(_NEG), jnp.float32(0.0))
    else:
        madd = jnp.zeros((1, n, n), jnp.float32)
    c_pad = -(-c // 128) * 128
    kern = functools.partial(_block_kernel, heads=heads, head_dim=hd,
                             scale=hd ** -0.5, masked=masked, c_pad=c_pad)
    # weights enter at f32 (flax param dtype) — cast to compute dtype, zero-
    # pad the contraction rows to the in-kernel lane-padded width, and shape
    # biases as broadcast-ready rank-3 rows, all outside the kernel
    wqkv_c = jnp.zeros((c_pad, 3 * c), x.dtype).at[:c].set(
        wqkv.astype(x.dtype))
    bqkv_c = bqkv.astype(jnp.float32).reshape(1, 1, 3 * c)
    wproj_c = jnp.zeros((c_pad, c), x.dtype).at[:c].set(wproj.astype(x.dtype))
    bproj_c = bproj.astype(jnp.float32).reshape(1, 1, c)

    def call(x, wqkv_c, bqkv_c, bias, madd, wproj_c, bproj_c):
        bnw_l = x.shape[0]
        nw = region.shape[0] if masked else bnw_l
        g = _pick_block_whole(nw, n, c, heads, jnp.dtype(x.dtype).itemsize)
        if masked:
            madd_block = (g, n, n)
            madd_index = lambda i: (i % (nw // g), 0, 0)
        else:
            madd_block = (1, n, n)
            madd_index = lambda i: (0, 0, 0)
        full = lambda i: (0, 0)
        full3 = lambda i: (0, 0, 0)
        return pl.pallas_call(
            kern,
            grid=(bnw_l // g,),
            in_specs=[
                pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
                pl.BlockSpec((c_pad, 3 * c), full),
                pl.BlockSpec((1, 1, 3 * c), full3),
                pl.BlockSpec((heads, n, n), full3),
                pl.BlockSpec(madd_block, madd_index),
                pl.BlockSpec((c_pad, c), full),
                pl.BlockSpec((1, 1, c), full3),
            ],
            out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bnw_l, n, c), x.dtype),
            interpret=interpret,
        )(x, wqkv_c, bqkv_c, bias, madd, wproj_c, bproj_c)

    if _SPMD_MESH is not None:
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            call, mesh=_SPMD_MESH,
            in_specs=(P('data'), P(), P(), P(), P(), P(), P()),
            out_specs=P('data'), check_vma=False)(
                x, wqkv_c, bqkv_c, bias, madd, wproj_c, bproj_c)
    return call(x, wqkv_c, bqkv_c, bias, madd, wproj_c, bproj_c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def window_attention_block_fused(x, wqkv, bqkv, bias, region, wproj, bproj,
                                 heads):
    """proj(softmax(qk^T/sqrt(d) + bias [+ region mask]) v) with
    qkv = x @ wqkv + bqkv, all fused on TPU.

    Args:
      x: [B*nW, N, C] windowed post-LN activations (compute dtype).
      wqkv, bqkv: [C, 3C], [3C] packed qkv projection params (f32).
      bias: [H, N, N] relative-position bias, cast to compute dtype.
      region: [nW, N] int32 shifted-window region ids, or None (no shift).
      wproj, bproj: [C, C], [C] output projection params (f32).
      heads: head count H (C = H * head_dim).
    Returns: [B*nW, N, C] in x.dtype.
    """
    interpret = jax.default_backend() == 'cpu'
    return _block_pallas(x, wqkv, bqkv, bias, region, wproj, bproj, heads,
                         interpret=interpret)


def _block_fwd(x, wqkv, bqkv, bias, region, wproj, bproj, heads):
    out = window_attention_block_fused(x, wqkv, bqkv, bias, region, wproj,
                                       bproj, heads)
    return out, (x, wqkv, bqkv, bias, region, wproj, bproj)


def _block_bwd(heads, res, grad):
    x, wqkv, bqkv, bias, region, wproj, bproj = res
    _, vjp = jax.vjp(
        lambda x_, wq, bq, bi, wp, bp: _block_xla(x_, wq, bq, bi, region,
                                                  wp, bp, heads),
        x, wqkv, bqkv, bias, wproj, bproj)
    d_x, d_wqkv, d_bqkv, d_bias, d_wproj, d_bproj = vjp(grad)
    return d_x, d_wqkv, d_bqkv, d_bias, None, d_wproj, d_bproj


window_attention_block_fused.defvjp(_block_fwd, _block_bwd)
