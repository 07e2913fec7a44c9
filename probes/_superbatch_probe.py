"""Validate super-batched dispatch: K batches of 16 per dispatch via
lax.map should approach the true device rate (874 img/s chained) instead
of the sustained single-dispatch 546 img/s."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector

B, S = 16, 544
cfg = get_config('res50_coco', mode='val', img_size=S,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, 3), jnp.float32), train=False)
det = Detector(cfg, variables)
rng = np.random.RandomState(0)

for k in (2, 4):
    imgs = jnp.asarray(rng.rand(k, B, S, S, 3).astype(np.float32))

    @jax.jit
    def multi(chunks):
        return jax.lax.map(lambda c: det._infer_fixed(det.variables, c, S),
                           chunks)

    out = multi(imgs)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    # sustained loop with cross-dispatch perturbation (bench.py pattern)
    pert = jax.jit(lambda x, s: x + (s.reshape(-1)[0] * 0).astype(x.dtype))
    imgs_i = pert(imgs, jax.tree.leaves(out)[0])
    out = multi(imgs_i)
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        imgs_i = pert(imgs_i, jax.tree.leaves(out)[0])
        out = multi(imgs_i)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = time.perf_counter() - t0
    print(f'k={k}: {n*k*B/dt:.1f} img/s sustained '
          f'({dt/n*1e3:.1f} ms/dispatch)', flush=True)
