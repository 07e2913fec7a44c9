"""Fused swin MLP half-block — Pallas TPU kernel.

Computes  y = x + fc2(gelu(fc1(LayerNorm(x))))  for the trailing half of a
SwinBlock (reference swin_transformer.py:283-289: `x + drop_path(mlp(norm2(x)))`
with stochastic depth inactive) in one VMEM pass over row blocks.

Why: the plain XLA lowering round-trips HBM ~14 activation-sizes per block
(LN read/write, fc1 read + 4C-wide write, gelu, fc2 4C-read + write,
residual), and at the swin-544 stage-0 geometry those passes run at a
measured ~100-200 GB/s effective — the isolated MLP half-block costs 7.1 ms
of an 8.6 ms block (probes/_swin_block_attrib.py, round 5). The kernel
reads x once and writes y once; the 4C-wide hidden activations never leave
VMEM.

Everything is rank-2: the caller flattens [B, H, W, C] -> [B*H*W, C] (a
layout-preserving collapse of major axes) so the kernel is plain row-blocked
matmuls — none of Mosaic's sublane-merge restrictions apply. Under a
multi-device data mesh the rows are batch-major, so the same shard_map
treatment as the fused window attention applies (set_spmd_mesh in
ops/window_attention.py is honored here too).

Training runs through jax.custom_vjp: forward uses the kernel, backward
recomputes via the XLA formulation's VJP (no 4C-wide residuals stored).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from yolact_minimal_tpu.ops import window_attention as _wa

# Per-block VMEM budget for the f32 hidden [rows, 4C] scratch. Empirical:
# 4e6 picked 1088 rows at the 544 stage-1 geometry and overflowed the 16 MB
# scoped-vmem limit by 17% — Mosaic keeps ~5-6x the scratch live across the
# gelu's f32 temporaries plus the double-buffered x/y blocks. 1.5e6 leaves
# >2x headroom at every stage geometry.
_HIDDEN_BLOCK_BYTES = 1.5e6


def _pick_rows(n_rows: int, hidden: int) -> int:
    """Largest divisor of n_rows that is a multiple of 8 and keeps the f32
    [rows, hidden] scratch under budget (falls back to n_rows if no
    multiple-of-8 divisor exists)."""
    cap = max(8, int(_HIDDEN_BLOCK_BYTES / (hidden * 4)))
    best = None
    for r in range(8, min(cap, n_rows) + 1, 8):
        if n_rows % r == 0:
            best = r
    return best or n_rows


def _erf_f32(x):
    """erf for the kernel: Mosaic has no erf primitive, so use the
    Abramowitz & Stegun 7.1.26 rational approximation (|error| <= 1.5e-7,
    below f32 test tolerances and far below bf16 resolution); exp IS
    supported."""
    p = jnp.float32(0.3275911)
    a1 = jnp.float32(0.254829592)
    a2 = jnp.float32(-0.284496736)
    a3 = jnp.float32(1.421413741)
    a4 = jnp.float32(-1.453152027)
    a5 = jnp.float32(1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
               * jnp.exp(-ax * ax))
    return jnp.where(x < 0, -y, y)


def _kernel(x_ref, lns_ref, lnb_ref, k1_ref, b1_ref, k2_ref, b2_ref,
            out_ref, *, eps):
    x = x_ref[...]                                   # [R, C] compute dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * lns_ref[...] + lnb_ref[...]).astype(x.dtype)
    h = jax.lax.dot_general(xn, k1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = (h + b1_ref[...]).astype(x.dtype)
    # exact (erf) gelu in f32, matching jax.nn.gelu(approximate=False) on
    # the XLA path (reference uses torch nn.GELU, also erf-exact)
    hf = h.astype(jnp.float32)
    h = (hf * 0.5 * (1.0 + _erf_f32(hf * jnp.float32(0.7071067811865476)))
         ).astype(x.dtype)
    y = jax.lax.dot_general(h, k2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b2_ref[...]
    out_ref[...] = (x.astype(jnp.float32) + y).astype(out_ref.dtype)


def _mlp_xla(x, ln_scale, ln_bias, k1, b1, k2, b2, eps=1e-5):
    """XLA oracle (identical math to the unfused SwinBlock tail); backward
    recompute target and test reference."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * ln_scale + ln_bias).astype(x.dtype)
    h = (jnp.dot(xn, k1.astype(x.dtype),
                 preferred_element_type=jnp.float32) + b1).astype(x.dtype)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    y = jnp.dot(h, k2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2
    return (x.astype(jnp.float32) + y).astype(x.dtype)


def _mlp_pallas(x, ln_scale, ln_bias, k1, b1, k2, b2, interpret=False):
    n_rows, c = x.shape
    hidden = k1.shape[1]
    kern = functools.partial(_kernel, eps=1e-5)
    # params enter at f32 (flax param dtype); biases as [1, n] rows so every
    # operand is rank-2
    lns = ln_scale.astype(jnp.float32).reshape(1, c)
    lnb = ln_bias.astype(jnp.float32).reshape(1, c)
    k1c = k1.astype(x.dtype)
    b1c = b1.astype(jnp.float32).reshape(1, hidden)
    k2c = k2.astype(x.dtype)
    b2c = b2.astype(jnp.float32).reshape(1, c)

    def call(x, lns, lnb, k1c, b1c, k2c, b2c):
        rows_l = x.shape[0]
        r = _pick_rows(rows_l, hidden)
        full = lambda i: (0, 0)
        return pl.pallas_call(
            kern,
            grid=(rows_l // r,),
            in_specs=[
                pl.BlockSpec((r, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), full), pl.BlockSpec((1, c), full),
                pl.BlockSpec((c, hidden), full),
                pl.BlockSpec((1, hidden), full),
                pl.BlockSpec((hidden, c), full),
                pl.BlockSpec((1, c), full),
            ],
            out_specs=pl.BlockSpec((r, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows_l, c), x.dtype),
            interpret=interpret,
        )(x, lns, lnb, k1c, b1c, k2c, b2c)

    mesh = _wa._SPMD_MESH
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            call, mesh=mesh,
            in_specs=(P('data'), P(), P(), P(), P(), P(), P()),
            out_specs=P('data'), check_vma=False)(
                x, lns, lnb, k1c, b1c, k2c, b2c)
    return call(x, lns, lnb, k1c, b1c, k2c, b2c)


@jax.custom_vjp
def mlp_block_fused(x, ln_scale, ln_bias, k1, b1, k2, b2):
    """x + fc2(gelu(fc1(LN(x)))), fused on TPU.

    Args:
      x: [R, C] rows (compute dtype; caller flattens spatial dims).
      ln_scale, ln_bias: [C] LayerNorm params (f32).
      k1, b1: [C, 4C], [4C] fc1 params. k2, b2: [4C, C], [C] fc2 params.
    Returns: [R, C] in x.dtype.
    """
    interpret = jax.default_backend() == 'cpu'
    return _mlp_pallas(x, ln_scale, ln_bias, k1, b1, k2, b2,
                       interpret=interpret)


def _fused_fwd(x, ln_scale, ln_bias, k1, b1, k2, b2):
    return (mlp_block_fused(x, ln_scale, ln_bias, k1, b1, k2, b2),
            (x, ln_scale, ln_bias, k1, b1, k2, b2))


def _fused_bwd(res, grad):
    _, vjp = jax.vjp(_mlp_xla, *res)
    return vjp(grad)


mlp_block_fused.defvjp(_fused_fwd, _fused_bwd)
