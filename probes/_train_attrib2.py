"""Slim train-step attribution at 544/bs8 bf16 (res50) — the cheap-compile
subset of _train_attrib.py (whose 5 chained full-model grad graphs cost more
remote compile time than they are worth):

  1. full train step sustained (ping-pong between two batch buffers vs the
     SAME batch buffer every call — detect showed successive dispatches
     sharing non-donated argument buffers do not pipeline on this backend;
     the train step is serialized by the donated state anyway, but a shared
     batch may still add a per-dispatch stall and make bench_train_step
     under-report)
  2. model forward alone (chained in-jit)
  3. each loss fwd given device-resident outputs (tiny graphs)
  4. match() alone

bwd+optimizer = step - fwd - losses - match (they overlap compile-wise but
the split shows which side of the graph to attack).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.utils.compile_cache import enable
enable()

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops.losses import compute_loss
from yolact_minimal_tpu.ops.matching import match
from yolact_minimal_tpu.train_state import (create_train_state,
                                            make_anchors_for, make_train_step)

IMG, BS, DT = 544, 8, 'bfloat16'

cfg = get_config('res50_coco', mode='train', img_size=IMG, train_bs=BS,
                 max_gt=16, compute_dtype=DT)
with jax.default_device(jax.devices('cpu')[0]):
    state = create_train_state(cfg, jax.random.PRNGKey(0))
state = jax.device_put(state, jax.devices()[0])
anchors = jnp.asarray(make_anchors_for(cfg))
step_fn = make_train_step(cfg, make_anchors_for(cfg))

rng = np.random.RandomState(0)
g = cfg.max_gt
xy1 = rng.uniform(0, 0.5, size=(BS, g, 2)).astype(np.float32)
wh = rng.uniform(0.2, 0.4, size=(BS, g, 2)).astype(np.float32)
host_batch = dict(
    image=rng.rand(BS, IMG, IMG, 3).astype(np.float32),
    boxes=np.concatenate([xy1, xy1 + wh], axis=2),
    labels=rng.randint(0, 81, (BS, g)).astype(np.int32),
    valid=np.ones((BS, g), bool),
    masks_proto=(rng.rand(BS, g, IMG // 4, IMG // 4) > 0.5).astype(np.float32),
    masks_seg=(rng.rand(BS, g, IMG // 8, IMG // 8) > 0.5).astype(np.float32))
batch_a = jax.device_put(host_batch)
batch_b = jax.device_put(host_batch)

key = jax.random.PRNGKey(1)
st, losses = step_fn(state, batch_a, key)     # compile + warmup
jax.device_get(losses.total)

N = 24
# (a) same batch buffer every dispatch (bench_train_step's pattern)
t0 = time.perf_counter()
for _ in range(N):
    st, losses = step_fn(st, batch_a, key)
jax.device_get(losses.total)
same = (time.perf_counter() - t0) / N
print(f'step, same batch buffer:    {same*1e3:.2f} ms  ({BS/same:.1f} img/s)',
      flush=True)

# (b) ping-pong between two identical-content buffers
t0 = time.perf_counter()
for i in range(N):
    st, losses = step_fn(st, batch_a if i % 2 == 0 else batch_b, key)
jax.device_get(losses.total)
pp = (time.perf_counter() - t0) / N
print(f'step, ping-pong buffers:    {pp*1e3:.2f} ms  ({BS/pp:.1f} img/s)',
      flush=True)


def timed(label, one, x, k=6, n=3):
    @jax.jit
    def chain(x0):
        x = x0
        y = None
        for _ in range(k):
            y = one(x)
            fb = (jnp.sum(jnp.asarray(y).astype(jnp.float32)).reshape(())
                  * 1e-30).astype(x.dtype)
            x = x + fb
        return y

    y = chain(x)
    jax.device_get(jnp.asarray(y).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = chain(x)
    jax.device_get(jnp.asarray(y).reshape(-1)[0])
    per = (time.perf_counter() - t0) / (n * k)
    print(f'{label}: {per*1e3:.3f} ms', flush=True)
    return per


model = Yolact(cfg=cfg, train_mode=True)
variables = {'params': st.params, 'batch_stats': st.batch_stats}
img = batch_a['image']


def fwd(x):
    outs, _ = model.apply(variables, x, train=True, mutable=['batch_stats'],
                          rngs={'dropout': jax.random.PRNGKey(0)})
    return outs[0]


timed('model fwd (train graph)', fwd, img)

outs, _ = model.apply(variables, img, train=True, mutable=['batch_stats'],
                      rngs={'dropout': jax.random.PRNGKey(0)})
outs = jax.device_put(outs)


def loss_of(idx):
    def f(o0):
        o = (o0,) + tuple(outs[1:])
        l = compute_loss(cfg, o, batch_a, anchors, jax.random.PRNGKey(2))
        return (l[idx].reshape(1) if idx is not None else
                jnp.stack([l.loss_c, l.loss_b, l.loss_m, l.loss_s]))
    return f


for idx, name in [(0, 'loss_c (OHEM)'), (1, 'loss_b'), (2, 'loss_m (lincomb)'),
                  (3, 'loss_s'), (None, 'all 4 losses fwd')]:
    timed(f'{name} fwd (given outputs)', loss_of(idx), outs[0], k=8)


def match_only(b):
    m = match(b, batch_a['labels'], batch_a['valid'], anchors,
              cfg.pos_iou_thre, cfg.neg_iou_thre)
    return m.offsets


timed('match()', match_only, batch_a['boxes'], k=8)
