"""Swin-544 DETECT-graph attribution: the fused backbone alone measures
42 ms/b16 but the full detect measures ~81 ms — where do the other ~39 ms
go? (res50's full non-backbone cost is ~12 ms at the same shapes.)
Times each piece of the real Yolact graph with the real init params.
Chained timing per docs/ARCHITECTURE.md."""
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import (FPN, PredictionHead, ProtoNet,
                                              Yolact)
from yolact_minimal_tpu.models.swin import SwinTiny
from yolact_minimal_tpu.pipeline import Detector

IMG, B = 544, 16
DT = jnp.bfloat16

cfg = get_config('swin_tiny_coco', mode='val', img_size=IMG,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
with jax.default_device(jax.devices('cpu')[0]):
    import copy
    cfg_i = copy.copy(cfg)
    cfg_i.fused_window_attn = 'off'
    variables = Yolact(cfg=cfg_i, train_mode=False).init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        train=False)
variables = jax.device_put(variables, jax.devices()[0])
params = variables['params']

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))


def timed(label, one, x, k=4, n=3):
    @jax.jit
    def chain(x0):
        x = x0
        for _ in range(k):
            y = one(x)
            leaves = jax.tree_util.tree_leaves(y)
            fb = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            x = x + (fb * 1e-30).astype(x.dtype)
        return y

    y = chain(x)
    jax.device_get(jnp.asarray(jax.tree_util.tree_leaves(y)[0]).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        y = chain(x)
    jax.device_get(jnp.asarray(jax.tree_util.tree_leaves(y)[0]).reshape(-1)[0])
    per = (time.perf_counter() - t0) / (n * k)
    print(f'{label}: {per*1e3:.3f} ms', flush=True)
    return per


bb = SwinTiny(dtype=DT, fused_attn=True)
vbb = {'params': params['backbone']}

# 1. backbone alone (all four outs live)
timed('backbone (fused)', lambda x: bb.apply(vbb, x, train=False), img)

# 2. backbone -> FPN
fpn = FPN(dtype=DT)
vfpn = {'params': params['fpn']}

def bb_fpn(x):
    outs = bb.apply(vbb, x, train=False)
    return fpn.apply(vfpn, outs[1], outs[2], outs[3])

timed('backbone+FPN', bb_fpn, img)

# 3. + proto
proto_net = ProtoNet(dtype=DT)
vproto = {'params': params['proto_net']}

def bb_fpn_proto(x):
    ps = bb_fpn(x)
    return ps, proto_net.apply(vproto, ps[0])

timed('backbone+FPN+proto', bb_fpn_proto, img)

# 4. + heads (full forward equivalent minus softmax)
head = PredictionHead(num_classes=cfg.num_classes,
                      num_ratios=len(cfg.aspect_ratios), dtype=DT)
vhead = {'params': params['prediction_layers']}

def fwd_manual(x):
    ps, proto = bb_fpn_proto(x)
    confs, boxes, coefs = [], [], []
    for p in ps:
        c, b_, co = head.apply(vhead, p)
        confs.append(c)
        boxes.append(b_)
        coefs.append(co)
    return (jnp.concatenate(confs, 1), jnp.concatenate(boxes, 1),
            jnp.concatenate(coefs, 1), proto)

timed('backbone+FPN+proto+heads', fwd_manual, img)

# 5. full model.apply (adds softmax + f32 casts)
timed('model.apply full fwd', lambda x: model.apply(variables, x,
                                                    train=False), img)

# 6. full detect_fixed via Detector (sustained, self-threading)
det = Detector(cfg, variables)
out = det.detect_fixed(img, IMG)

@jax.jit
def perturb(images, scores):
    return images + (scores[0, 0] * 0).astype(images.dtype)

imgs_i = perturb(img, out[0].scores)
out = det.detect_fixed(imgs_i, IMG)
jax.device_get(out[0].scores[0, 0])
t0 = time.perf_counter()
N = 20
for _ in range(N):
    imgs_i = perturb(imgs_i, out[0].scores)
    out = det.detect_fixed(imgs_i, IMG)
jax.device_get(out[0].scores[0, 0])
per = (time.perf_counter() - t0) / N
print(f'detect_fixed sustained: {per*1e3:.3f} ms  ({B/per:.1f} img/s)',
      flush=True)
