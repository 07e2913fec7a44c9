#!/usr/bin/env python
"""End-to-end detect throughput benchmark on one TPU chip.

Measures the full on-device detect path — forward + box decode + fast-NMS +
lincomb mask assembly + mask upsample/binarize (detect_fixed) — at the
reference's 544x544 eval size (the nearest /32 size to the 550 headline) and
prints ONE JSON line. Baseline: 200 img/s (BASELINE.md north star).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import argparse
    import jax
    import jax.numpy as jnp

    from yolact_minimal_tpu.config import get_config
    from yolact_minimal_tpu.pipeline import Detector
    from yolact_minimal_tpu.models.yolact import Yolact

    p = argparse.ArgumentParser()
    p.add_argument('--img_size', type=int, default=544)
    p.add_argument('--batch', type=int, default=16)
    args = p.parse_args()
    img_size = args.img_size
    batch = args.batch
    cfg = get_config('res50_coco', mode='val', img_size=img_size,
                     compute_dtype='bfloat16')
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, img_size, img_size, 3), jnp.float32),
                           train=False)
    det = Detector(cfg, variables)

    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, img_size, img_size, 3)
        .astype(np.float32))

    # warmup + compile
    out = det.detect_fixed(images, img_size)
    jax.block_until_ready(out[1])

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = det.detect_fixed(images, img_size)
    jax.block_until_ready(out[1])
    dt = time.perf_counter() - t0

    imgs_per_s = n_iters * batch / dt
    print(json.dumps({
        'metric': f'end-to-end detect img/s at {img_size}x{img_size}, '
                  f'res50_coco, bf16, batch {batch}, single chip',
        'value': round(imgs_per_s, 2),
        'unit': 'img/s',
        'vs_baseline': round(imgs_per_s / 200.0, 3),
    }))


if __name__ == '__main__':
    main()
