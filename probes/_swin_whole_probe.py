"""Round-5 probe: fused WHOLE-SwinBlock kernel (ops/swin_block.py) vs the
per-stage round-5 policy (attention half-block / composed kernel + fused MLP
half) at the swin-544 stage geometries, on the live TPU.

Times a complete SwinBlock (shifted, so masked + padded paths are hot) via
chained dispatch; both variants include the pad/roll/partition+reverse XLA
movement, so the delta is purely the fusion depth.

Run: PYTHONPATH=. python probes/_swin_whole_probe.py [--dtype bfloat16]
"""
import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.models.swin import SwinBlock
from yolact_minimal_tpu.utils.compile_cache import enable

enable()

# (H=W, C, heads) per stage at img 544; policy = the SwinTiny per-stage
# round-5 default these compete against
GEOS = [(136, 96, 3, dict(fused_attn_block=True, fused_mlp=True)),
        (68, 192, 6, dict(fused_attn_block=True, fused_mlp=True)),
        (34, 384, 12, dict(fused_attn=True, fused_mlp=True)),
        (17, 768, 24, dict(fused_mlp=True))]
B = 16


def timed(label, blk, v, x, k=4, n=6):
    @jax.jit
    def chain(x0):
        y = x0
        for _ in range(k):
            out = blk.apply(v, y)
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(y.dtype)
            y = y + fb
        return out

    out = chain(x)
    jax.device_get(jnp.asarray(out).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = chain(x)
    jax.device_get(jnp.asarray(out).reshape(-1)[0])
    per = (time.perf_counter() - t0) / (n * k)
    print(f'{label}: {per*1e3:.3f} ms', flush=True)
    return per


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--dtype', default='bfloat16')
    args = p.parse_args()
    dt = jnp.dtype(args.dtype)
    rng = np.random.RandomState(0)

    for si, (hw, c, heads, policy) in enumerate(GEOS):
        x = jnp.asarray(rng.rand(B, hw, hw, c).astype(np.float32)).astype(dt)
        base = SwinBlock(c, heads, shift=3, drop_path_rate=0.0, dtype=dt)
        v = base.init(jax.random.PRNGKey(0), x[:1])
        print(f'--- stage{si}: [{B},{hw},{hw},{c}] heads={heads} ---',
              flush=True)
        cur = SwinBlock(c, heads, shift=3, drop_path_rate=0.0, dtype=dt,
                        **policy)
        whole = SwinBlock(c, heads, shift=3, drop_path_rate=0.0, dtype=dt,
                          fused_whole=True)
        try:
            t_cur = timed('  r5-policy block', cur, v, x)
            t_whole = timed('  whole-fused    ', whole, v, x)
            print(f'  -> whole/policy = {t_whole / t_cur:.3f}', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'  FAIL {type(e).__name__}: {str(e)[:300]}', flush=True)


if __name__ == '__main__':
    main()
