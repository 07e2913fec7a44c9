"""Train-step time attribution at 544/bs8 bf16 (res50): where does the
step go — backbone fwd, heads, each loss's fwd+bwd, optimizer? Chained
timing per docs/ARCHITECTURE.md (state threads through the chain, so the
train step needs no artificial feedback; pieces get sum(y)*1e-30)."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops.losses import (category_loss, compute_loss,
                                           lincomb_mask_loss)
from yolact_minimal_tpu.ops.matching import match
from yolact_minimal_tpu.train_state import (create_train_state,
                                            make_anchors_for, make_train_step)

IMG, BS, DT = 544, 8, 'bfloat16'

cfg = get_config('res50_coco', mode='train', img_size=IMG, train_bs=BS,
                 max_gt=16, compute_dtype=DT)
state = create_train_state(cfg, jax.random.PRNGKey(0))
anchors = jnp.asarray(make_anchors_for(cfg))
step_fn = make_train_step(cfg, make_anchors_for(cfg))

rng = np.random.RandomState(0)
g = cfg.max_gt
xy1 = rng.uniform(0, 0.5, size=(BS, g, 2)).astype(np.float32)
wh = rng.uniform(0.2, 0.4, size=(BS, g, 2)).astype(np.float32)
batch = jax.device_put(dict(
    image=rng.rand(BS, IMG, IMG, 3).astype(np.float32),
    boxes=np.concatenate([xy1, xy1 + wh], axis=2),
    labels=rng.randint(0, 81, (BS, g)).astype(np.int32),
    valid=np.ones((BS, g), bool),
    masks_proto=(rng.rand(BS, g, IMG // 4, IMG // 4) > 0.5).astype(np.float32),
    masks_seg=(rng.rand(BS, g, IMG // 8, IMG // 8) > 0.5).astype(np.float32)))


def timed(label, one, x, k=8, n=3):
    @jax.jit
    def chain(x0):
        x = x0
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


# 0. full sustained train step (threads its own state; no feedback needed)
key = jax.random.PRNGKey(1)
st, losses = step_fn(state, batch, key)     # compile + warmup
jax.device_get(losses.total)
t0 = time.perf_counter()
N = 24
for _ in range(N):
    st, losses = step_fn(st, batch, key)
jax.device_get(losses.total)
full = (time.perf_counter() - t0) / N
print(f'full train step: {full*1e3:.3f} ms  ({BS/full:.1f} img/s)', flush=True)

model = Yolact(cfg=cfg, train_mode=True)
variables = {'params': st.params, 'batch_stats': st.batch_stats}
img = batch['image']

# 1. model forward alone
def fwd(x):
    outs, _ = model.apply(variables, x, train=True, mutable=['batch_stats'],
                          rngs={'dropout': jax.random.PRNGKey(0)})
    return outs[0]

timed('model fwd (train graph)', fwd, img)

# 2. fwd + each loss (and total) WITHOUT backward
outs, _ = model.apply(variables, img, train=True, mutable=['batch_stats'],
                      rngs={'dropout': jax.random.PRNGKey(0)})
outs = jax.device_put(outs)

def loss_of(idx):
    def f(o0):
        o = (o0,) + tuple(outs[1:])
        l = compute_loss(cfg, o, batch, anchors, jax.random.PRNGKey(2))
        return l[idx].reshape(1) if idx is not None else \
            jnp.stack([l.loss_c, l.loss_b, l.loss_m, l.loss_s])
    return f

for idx, name in [(0, 'loss_c (OHEM)'), (1, 'loss_b'), (2, 'loss_m (lincomb)'),
                  (3, 'loss_s'), (None, 'all 4 losses fwd')]:
    timed(f'{name} fwd (given outputs)', loss_of(idx), outs[0])

# 3. match() alone (shared by all losses)
def match_only(b):
    m = match(b, batch['labels'], batch['valid'], anchors,
              cfg.pos_iou_thre, cfg.neg_iou_thre)
    return m.offsets

timed('match()', match_only, batch['boxes'])

# 4. grad of each loss separately through the FULL model. The chained
# variable is the IMAGE (feedback perturbs it), so the K grad computations
# stay distinct — chaining a dead dummy would let CSE collapse them.
def grad_of(idx, label):
    def loss_fn(params, x):
        o, _ = model.apply({'params': params, 'batch_stats': st.batch_stats},
                           x, train=True, mutable=['batch_stats'],
                           rngs={'dropout': jax.random.PRNGKey(0)})
        l = compute_loss(cfg, o, batch, anchors, jax.random.PRNGKey(2))
        return l[idx] if idx is not None else l.total

    def one(x):
        gr = jax.grad(loss_fn)(st.params, x)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), gr, 0.0
        ).reshape(1)

    timed(label, one, img, k=4, n=2)

for idx, name in [(0, 'grad loss_c'), (1, 'grad loss_b'),
                  (2, 'grad loss_m'), (3, 'grad loss_s'),
                  (None, 'grad total (all four)')]:
    grad_of(idx, name)
