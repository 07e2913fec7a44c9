"""Round-5 probe: fused attention HALF-BLOCK kernel vs the round-4
composition (XLA qkv Dense -> window_attention_fused -> XLA proj Dense) at
the swin-544 stage geometries, on the live TPU.

Also serves as the Mosaic-acceptance check for the kernel's in-kernel
rank-3 x rank-2 dot_general contractions (the first thing that would fail).

Run: python probes/_attn_block_probe.py [--dtype bfloat16] [--b 16]
Prints ms/call per stage for both formulations + max|err| vs the XLA oracle.
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.ops.window_attention import (
    _block_xla, window_attention_block_fused, window_attention_fused)
from yolact_minimal_tpu.models.swin import shifted_window_regions

# (heads, C, padded feature H=W) at img_size 544: stage0 136->140, stage1
# 68->70, stage2 34->35, stage3 17->21
STAGES_544 = [(3, 96, 140), (6, 192, 70), (12, 384, 35), (24, 768, 21)]


def _time(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16')
    p.add_argument('--b', type=int, default=16)
    p.add_argument('--masked', action='store_true', default=True)
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    for heads, c, hp in STAGES_544:
        nw = (hp // 7) ** 2
        bnw = args.b * nw
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(bnw, 49, c).astype(np.float32)).astype(dtype)
        wqkv = jnp.asarray(rng.randn(c, 3 * c).astype(np.float32) * 0.05)
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        wproj = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.05)
        bproj = jnp.zeros((c,), jnp.float32)
        bias = jnp.asarray(rng.randn(heads, 49, 49).astype(np.float32)
                           * 0.1).astype(dtype)
        region = jnp.asarray(
            shifted_window_regions(hp, hp).astype(np.int32))

        blockfn = jax.jit(window_attention_block_fused, static_argnums=(7,))

        @jax.jit
        def composed(x, wqkv, bqkv, bias, region, wproj, bproj):
            qkv = (jnp.dot(x, wqkv.astype(x.dtype),
                           preferred_element_type=jnp.float32)
                   + bqkv).astype(x.dtype)
            out = window_attention_fused(qkv, bias, region, heads)
            return (jnp.dot(out, wproj.astype(x.dtype),
                            preferred_element_type=jnp.float32)
                    + bproj).astype(x.dtype)

        try:
            got = blockfn(x, wqkv, bqkv, bias, region, wproj, bproj, heads)
            want = _block_xla(x, wqkv, bqkv, bias, region, wproj, bproj,
                              heads)
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - want.astype(jnp.float32))))
            t_block = _time(blockfn, x, wqkv, bqkv, bias, region, wproj,
                            bproj, heads)
            t_comp = _time(composed, x, wqkv, bqkv, bias, region, wproj,
                           bproj)
            print(f'stage h={heads:2d} c={c:3d} nW={nw:3d}: '
                  f'block {t_block:7.3f} ms  composed {t_comp:7.3f} ms  '
                  f'max|err|={err:.2e}', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'stage h={heads:2d} c={c:3d}: FAIL '
                  f'{type(e).__name__}: {str(e)[:300]}', flush=True)


if __name__ == '__main__':
    main()
