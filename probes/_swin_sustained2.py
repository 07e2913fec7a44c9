"""Third angle on the chained-vs-sustained gap for fused swin detect:
dispatch detect over 20 DISTINCT pre-staged inputs (no perturb executable,
no cross-iteration dependency, no client cache since args differ). If this
matches the chained 60.5 ms, the bench harness's perturb interleave is the
overhead; if it matches 82.8, the fused executable itself dispatches slow."""
import copy
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector

IMG, B, K = 544, 16, 20

for fwa in ('on', 'off'):
    cfg = get_config('swin_tiny_coco', mode='val', img_size=IMG,
                     compute_dtype='bfloat16')
    cfg.fused_window_attn = fwa
    with jax.default_device(jax.devices('cpu')[0]):
        cfg_i = copy.copy(cfg)
        cfg_i.fused_window_attn = 'off'
        variables = Yolact(cfg=cfg_i, train_mode=False).init(
            jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
            train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    det = Detector(cfg, variables)

    rng = np.random.RandomState(0)
    base = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    inputs = [jax.device_put(jnp.asarray(base + 1e-6 * i)) for i in range(K)]

    out = det.detect_fixed(inputs[0], IMG)
    jax.device_get(out[0].scores[0, 0])

    t0 = time.perf_counter()
    outs = [det.detect_fixed(x, IMG) for x in inputs]
    for o in outs:
        jax.device_get(o[0].scores[0, 0])
    per = (time.perf_counter() - t0) / K
    print(f'fused={fwa}: prestaged sustained {per*1e3:.3f} ms/batch '
          f'({B/per:.1f} img/s)', flush=True)
