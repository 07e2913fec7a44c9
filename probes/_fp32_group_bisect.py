"""Round-5 fp32@544/b8 loss-GROUP bisection (VERDICT r04 #4).

Round-3 established: each of the four per-loss backwards passes alone, the
combined four-loss backward faults the worker. Question: does a 2+2 (or 3+1)
grouping pass, halving the split-step's ~4x cost? Run ONE grouping per
invocation (a faulting attempt costs a 10-25 min worker recovery — the
caller decides how many to risk):

    python probes/_fp32_group_bisect.py "0,1|2,3"    # class+box | mask+sem

Prints PASS/step-time or dies with the worker. Loss indices:
0=class 1=box 2=mask 3=semantic (train_state.make_train_step_split order).
"""
import sys
import time

import numpy as np

from yolact_minimal_tpu.utils.compile_cache import enable

enable()

groups = tuple(tuple(int(i) for i in part.split(','))
               for part in sys.argv[1].split('|'))
print(f'groups = {groups}', flush=True)

import jax

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.train_state import (create_train_state,
                                            make_anchors_for,
                                            make_train_step_split)

IMG, B = 544, 8
cfg = get_config('res50_coco', mode='train', img_size=IMG, train_bs=B,
                 max_gt=16, compute_dtype='float32')

with jax.default_device(jax.devices('cpu')[0]):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
state = jax.device_put(state, jax.devices()[0])
step_fn = make_train_step_split(cfg, make_anchors_for(cfg), groups=groups)

rng = np.random.RandomState(0)
g = cfg.max_gt
xy1 = rng.uniform(0, 0.5, size=(B, g, 2)).astype(np.float32)
wh = rng.uniform(0.2, 0.4, size=(B, g, 2)).astype(np.float32)
batch = jax.device_put(dict(
    image=rng.rand(B, IMG, IMG, 3).astype(np.float32),
    boxes=np.concatenate([xy1, xy1 + wh], axis=2),
    labels=rng.randint(0, 80, (B, g)).astype(np.int32),
    valid=np.ones((B, g), bool),
    masks_proto=(rng.rand(B, g, IMG // 4, IMG // 4) > 0.5).astype(np.float32),
    masks_seg=(rng.rand(B, g, IMG // 8, IMG // 8) > 0.5).astype(np.float32)))

key = jax.random.PRNGKey(1)
t0 = time.perf_counter()
state, losses = step_fn(state, batch, key)
jax.device_get(losses.total)
print(f'compile+first step OK in {time.perf_counter()-t0:.1f}s', flush=True)

t0 = time.perf_counter()
N = 6
for _ in range(N):
    state, losses = step_fn(state, batch, key)
jax.device_get(losses.total)
dt = (time.perf_counter() - t0) / N
print(f'PASS groups={groups}: {dt*1e3:.1f} ms/step '
      f'({B/dt:.1f} img/s), loss={float(losses.total):.2f}', flush=True)
