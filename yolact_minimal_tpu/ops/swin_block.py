"""Fused whole SwinBlock — Pallas TPU kernel.

Computes BOTH halves of a SwinBlock (reference swin_transformer.py:203-289)
for a block of G windows entirely in VMEM:

    h = x + proj(attn(qkv(LN1(x) * rowmask)))
    y = h + fc2(gelu(fc1(LN2(h))))

where x is the PRE-norm activations in windowed layout [B*nW, N, C] (the
caller applies pad + roll + window_partition to the raw NHWC tensor — pure
data movement XLA fuses into one copy) and `rowmask` zeroes the LN1 output
on padding rows, reproducing the reference's pad-AFTER-norm semantics
exactly: a padded token enters attention with value 0, so its qkv is the
projection bias, exactly as in the reference where zeros are padded after
norm1 and then projected.

Relative to the round-5 half-block kernels (attention half + MLP half as
two Pallas passes with LN1, the residual add and the window reverse/crop in
XLA between them), this removes every remaining intermediate HBM round trip:
per block the tensor is read once and written once — ~6 C-wide HBM passes
total including the partition/reverse copies, vs ~12 for the two-kernel
form.

The MLP math matches ops/swin_mlp.py (f32 LN/stats, erf-exact gelu via the
A&S 7.1.26 approximation); the attention math matches
ops/window_attention.py's half-block kernel, including the in-VMEM zero-pad
of <128-multiple contraction lanes that this target's Mosaic requires for
non-batched rank-3 dot_generals (probes/_mosaic_ops_probe.py).

Training runs through jax.custom_vjp: forward uses the kernel, backward
recomputes via the XLA oracle's VJP — no [*, N, N] score planes or 4C-wide
hiddens are ever stored. Under a multi-device data mesh the call shard_maps
over the batch-major window dim (set_spmd_mesh in ops/window_attention.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from yolact_minimal_tpu.ops import window_attention as _wa
from yolact_minimal_tpu.ops.swin_mlp import _erf_f32

_EPS = 1e-5


def _pick_block(n_windows_img: int, n: int, c: int) -> int:
    """Largest divisor of the per-image window count whose f32 [G, N, 4C]
    hidden (the widest in-kernel temporary) stays under the same 1.2 MB
    budget the attention kernels use."""
    per_win = n * 4 * c * 4
    cap = max(1, int(1.2e6 / per_win))
    best = 1
    for g in range(1, min(cap, n_windows_img) + 1):
        if n_windows_img % g == 0:
            best = g
    return best


def _ln_f32(xf, scale, bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + _EPS) * scale + bias


def _gelu_f32(hf):
    return hf * 0.5 * (1.0 + _erf_f32(hf * jnp.float32(0.7071067811865476)))


def _kernel(x_ref, rm_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
            madd_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, k1_ref,
            b1_ref, k2_ref, b2_ref, out_ref, *, heads, head_dim, scale,
            masked, padded, c_pad):
    x = x_ref[...]                                        # [G, N, C]
    c = heads * head_dim
    xf = x.astype(jnp.float32)
    xn = _ln_f32(xf, ln1s_ref[...], ln1b_ref[...])
    if padded:
        xn = xn * rm_ref[...]                             # [G, N, 1] f32
    xn = _wa._lane_pad(xn.astype(x.dtype), c_pad)
    qkv = jax.lax.dot_general(xn, wqkv_ref[...], (((2,), (0,)), ((), ())),
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
    o = _wa._lane_pad(jnp.concatenate(outs, axis=-1), c_pad)
    y = jax.lax.dot_general(o, wproj_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h_res = xf + y + bproj_ref[...]                       # [G, N, C] f32

    hn = _wa._lane_pad(_ln_f32(h_res, ln2s_ref[...],
                               ln2b_ref[...]).astype(x.dtype), c_pad)
    u = jax.lax.dot_general(hn, k1_ref[...], (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    u = _gelu_f32(u + b1_ref[...]).astype(x.dtype)        # [G, N, 4C]
    u = _wa._lane_pad(u, -(-4 * c // 128) * 128)
    y2 = jax.lax.dot_general(u, k2_ref[...], (((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out_ref[...] = (h_res + y2 + b2_ref[...]).astype(out_ref.dtype)


def _block_xla(x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region, wproj,
               bproj, ln2_s, ln2_b, k1, b1, k2, b2, heads):
    """XLA oracle with the kernel's exact numerics; backward recompute
    target and the numerical reference in tests."""
    xf = x.astype(jnp.float32)
    xn = _ln_f32(xf, ln1_s, ln1_b)
    if rowmask is not None:
        nw = rowmask.shape[0]
        xn = (xn.reshape(x.shape[0] // nw, nw, *x.shape[1:])
              * rowmask[None, :, :, None]).reshape(xn.shape)
    xn = xn.astype(x.dtype)
    qkv = (jnp.dot(xn, wqkv.astype(x.dtype),
                   preferred_element_type=jnp.float32) + bqkv).astype(x.dtype)
    att = _wa._attention_xla(qkv, bias, region, heads)
    y = jnp.dot(att, wproj.astype(x.dtype),
                preferred_element_type=jnp.float32)
    h = xf + y + bproj
    hn = _ln_f32(h, ln2_s, ln2_b).astype(x.dtype)
    u = (jnp.dot(hn, k1.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b1)
    u = _gelu_f32(u).astype(x.dtype)
    y2 = jnp.dot(u, k2.astype(x.dtype), preferred_element_type=jnp.float32)
    return (h + y2 + b2).astype(x.dtype)


def _block_pallas(x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region, wproj,
                  bproj, ln2_s, ln2_b, k1, b1, k2, b2, heads,
                  interpret=False):
    bnw, n, c = x.shape
    hd = c // heads
    hidden = k1.shape[1]
    masked = region is not None
    padded = rowmask is not None
    c_pad = -(-c // 128) * 128
    h_pad = -(-hidden // 128) * 128
    if masked:
        madd = jnp.where(region[:, :, None] != region[:, None, :],
                         jnp.float32(_wa._NEG), jnp.float32(0.0))
    else:
        madd = jnp.zeros((1, n, n), jnp.float32)
    rm = (rowmask.astype(jnp.float32).reshape(-1, n, 1) if padded
          else jnp.ones((1, n, 1), jnp.float32))
    kern = functools.partial(_kernel, heads=heads, head_dim=hd,
                             scale=hd ** -0.5, masked=masked, padded=padded,
                             c_pad=c_pad)
    dt = x.dtype
    row = lambda v, w: v.astype(jnp.float32).reshape(1, 1, w)
    ws = dict(
        ln1s=ln1_s.astype(jnp.float32).reshape(1, 1, c),
        ln1b=ln1_b.astype(jnp.float32).reshape(1, 1, c),
        wqkv=jnp.zeros((c_pad, 3 * c), dt).at[:c].set(wqkv.astype(dt)),
        bqkv=row(bqkv, 3 * c),
        wproj=jnp.zeros((c_pad, c), dt).at[:c].set(wproj.astype(dt)),
        bproj=row(bproj, c),
        ln2s=ln2_s.astype(jnp.float32).reshape(1, 1, c),
        ln2b=ln2_b.astype(jnp.float32).reshape(1, 1, c),
        k1=jnp.zeros((c_pad, hidden), dt).at[:c].set(k1.astype(dt)),
        b1=row(b1, hidden),
        k2=jnp.zeros((h_pad, c), dt).at[:hidden].set(k2.astype(dt)),
        b2=row(b2, c),
    )
    bias_c = bias.astype(dt)

    def call(x, rm, madd, bias_c, ln1s, ln1b, wqkv, bqkv, wproj, bproj,
             ln2s, ln2b, k1, b1, k2, b2):
        bnw_l = x.shape[0]
        nw = (region.shape[0] if masked
              else (rowmask.shape[0] if padded else bnw_l))
        g = _pick_block(nw, n, c)
        if masked:
            madd_block, madd_index = (g, n, n), lambda i: (i % (nw // g), 0, 0)
        else:
            madd_block, madd_index = (1, n, n), lambda i: (0, 0, 0)
        if padded:
            rm_block, rm_index = (g, n, 1), lambda i: (i % (nw // g), 0, 0)
        else:
            rm_block, rm_index = (1, n, 1), lambda i: (0, 0, 0)
        full3 = lambda i: (0, 0, 0)
        full2 = lambda i: (0, 0)
        return pl.pallas_call(
            kern,
            grid=(bnw_l // g,),
            in_specs=[
                pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
                pl.BlockSpec(rm_block, rm_index),
                pl.BlockSpec((1, 1, c), full3),
                pl.BlockSpec((1, 1, c), full3),
                pl.BlockSpec((c_pad, 3 * c), full2),
                pl.BlockSpec((1, 1, 3 * c), full3),
                pl.BlockSpec((heads, n, n), full3),
                pl.BlockSpec(madd_block, madd_index),
                pl.BlockSpec((c_pad, c), full2),
                pl.BlockSpec((1, 1, c), full3),
                pl.BlockSpec((1, 1, c), full3),
                pl.BlockSpec((1, 1, c), full3),
                pl.BlockSpec((c_pad, hidden), full2),
                pl.BlockSpec((1, 1, hidden), full3),
                pl.BlockSpec((h_pad, c), full2),
                pl.BlockSpec((1, 1, c), full3),
            ],
            out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((bnw_l, n, c), dt),
            interpret=interpret,
        )(x, rm, ln1s, ln1b, wqkv, bqkv, bias_c, madd, wproj, bproj,
          ln2s, ln2b, k1, b1, k2, b2)

    operands = (x, rm, madd, bias_c, ws['ln1s'], ws['ln1b'], ws['wqkv'],
                ws['bqkv'], ws['wproj'], ws['bproj'], ws['ln2s'], ws['ln2b'],
                ws['k1'], ws['b1'], ws['k2'], ws['b2'])
    mesh = _wa._SPMD_MESH
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(P('data'),) + (P(),) * 15,
            out_specs=P('data'), check_vma=False)(*operands)
    return call(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(16,))
def swin_block_fused(x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region,
                     wproj, bproj, ln2_s, ln2_b, k1, b1, k2, b2, heads):
    """Whole SwinBlock on windowed rows, fused on TPU.

    Args:
      x: [B*nW, N, C] PRE-norm windowed activations (compute dtype); the
        caller applies pad/roll/window_partition.
      rowmask: [nW, N] f32 1/0 validity of each windowed row (0 = padding),
        or None when the feature map needed no padding. Static per geometry.
      ln1_s, ln1_b / ln2_s, ln2_b: [C] LayerNorm params (f32).
      wqkv, bqkv: [C, 3C], [3C]; wproj, bproj: [C, C], [C] (f32).
      bias: [H, N, N] relative-position bias (compute dtype).
      region: [nW, N] int32 shifted-window region ids, or None.
      k1, b1: [C, 4C], [4C]; k2, b2: [4C, C], [C] MLP params (f32).
      heads: head count H.
    Returns: [B*nW, N, C] = both halves of the block, in x.dtype.
    """
    interpret = jax.default_backend() == 'cpu'
    return _block_pallas(x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region,
                         wproj, bproj, ln2_s, ln2_b, k1, b1, k2, b2, heads,
                         interpret=interpret)


def _fwd(x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region, wproj, bproj,
         ln2_s, ln2_b, k1, b1, k2, b2, heads):
    out = swin_block_fused(x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias,
                           region, wproj, bproj, ln2_s, ln2_b, k1, b1, k2,
                           b2, heads)
    return out, (x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region, wproj,
                 bproj, ln2_s, ln2_b, k1, b1, k2, b2)


def _bwd(heads, res, grad):
    (x, rowmask, ln1_s, ln1_b, wqkv, bqkv, bias, region, wproj, bproj,
     ln2_s, ln2_b, k1, b1, k2, b2) = res
    _, vjp = jax.vjp(
        lambda x_, l1s, l1b, wq, bq, bi, wp, bp, l2s, l2b, k1_, b1_, k2_, b2_:
        _block_xla(x_, rowmask, l1s, l1b, wq, bq, bi, region, wp, bp, l2s,
                   l2b, k1_, b1_, k2_, b2_, heads),
        x, ln1_s, ln1_b, wqkv, bqkv, bias, wproj, bproj, ln2_s, ln2_b,
        k1, b1, k2, b2)
    (d_x, d_l1s, d_l1b, d_wqkv, d_bqkv, d_bias, d_wproj, d_bproj, d_l2s,
     d_l2b, d_k1, d_b1, d_k2, d_b2) = vjp(grad)
    return (d_x, None, d_l1s, d_l1b, d_wqkv, d_bqkv, d_bias, None, d_wproj,
            d_bproj, d_l2s, d_l2b, d_k1, d_b1, d_k2, d_b2)


swin_block_fused.defvjp(_fwd, _bwd)
