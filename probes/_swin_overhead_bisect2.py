"""Continue the +22 ms bisection: sustained wall per dispatch as the swin
detect graph grows tail-ward. The backbone alone shows no gap; where does
it start?"""
import copy
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import (FPN, PredictionHead, ProtoNet,
                                              Yolact)
from yolact_minimal_tpu.models.swin import SwinTiny
from yolact_minimal_tpu.ops.boxes import make_anchors
from yolact_minimal_tpu.ops.nms import (assemble_masks,
                                        detect_postprocess_batch,
                                        finalize_masks_fixed)

IMG, B = 544, 16
DT = jnp.bfloat16

cfg = get_config('swin_tiny_coco', mode='val', img_size=IMG,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
with jax.default_device(jax.devices('cpu')[0]):
    cfg_i = copy.copy(cfg)
    cfg_i.fused_window_attn = 'off'
    variables = Yolact(cfg=cfg_i, train_mode=False).init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        train=False)
variables = jax.device_put(variables, jax.devices()[0])
params = variables['params']
anchors = jnp.asarray(make_anchors(cfg.img_size, cfg.aspect_ratios,
                                   cfg.scales))

rng = np.random.RandomState(0)
x544 = jnp.asarray(rng.rand(B, IMG, IMG, 3).astype(np.float32))


def sustained(label, fn, x, n=16):
    f = jax.jit(fn)

    @jax.jit
    def perturb(x, leaf):
        return x + (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(x.dtype)

    y = f(x)
    leaf = jax.tree_util.tree_leaves(y)[0]
    xi = perturb(x, leaf)
    y = f(xi)
    leaf = jax.tree_util.tree_leaves(y)[0]
    jax.device_get(jnp.asarray(leaf).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        xi = perturb(xi, leaf)
        y = f(xi)
        leaf = jax.tree_util.tree_leaves(y)[0]
    jax.device_get(jnp.asarray(leaf).reshape(-1)[0])
    per = (time.perf_counter() - t0) / n
    print(f'{label}: sustained {per*1e3:.2f} ms', flush=True)
    return per


bb = SwinTiny(dtype=DT, fused_attn=True)
vbb = {'params': params['backbone']}
fpn = FPN(dtype=DT)
vfpn = {'params': params['fpn']}
proto_net = ProtoNet(dtype=DT)
vproto = {'params': params['proto_net']}
head = PredictionHead(num_classes=cfg.num_classes,
                      num_ratios=len(cfg.aspect_ratios), dtype=DT)
vhead = {'params': params['prediction_layers']}


def fwd(x):
    outs = bb.apply(vbb, x, train=False)
    ps = fpn.apply(vfpn, outs[1], outs[2], outs[3])
    proto = proto_net.apply(vproto, ps[0])
    confs, boxes, coefs = [], [], []
    for p in ps:
        c, b_, co = head.apply(vhead, p)
        confs.append(c)
        boxes.append(b_)
        coefs.append(co)
    cp = jax.nn.softmax(jnp.concatenate(confs, 1).astype(jnp.float32), -1)
    return (cp, jnp.concatenate(boxes, 1).astype(jnp.float32),
            jnp.concatenate(coefs, 1).astype(jnp.float32),
            proto.astype(jnp.float32))


sustained('fwd (bb+fpn+proto+heads+softmax)', fwd, x544)


def fwd_nms(x):
    cp, bp, co, pr = fwd(x)
    dets = detect_postprocess_batch(
        cp, bp, co, anchors, cfg.nms_score_thre, cfg.nms_iou_thre,
        cfg.top_k, cfg.max_detections, getattr(cfg, 'nms_pre_topk', 1024))
    return dets


sustained('fwd+NMS (no masks)', fwd_nms, x544)


def fwd_nms_assemble(x):
    cp, bp, co, pr = fwd(x)
    dets = detect_postprocess_batch(
        cp, bp, co, anchors, cfg.nms_score_thre, cfg.nms_iou_thre,
        cfg.top_k, cfg.max_detections, getattr(cfg, 'nms_pre_topk', 1024))
    masks_p = jax.vmap(functools.partial(assemble_masks, do_crop=True)
                       )(pr, dets)
    return dets, masks_p


sustained('fwd+NMS+assemble (proto-res masks)', fwd_nms_assemble, x544)


def detect_full(x):
    dets, masks_p = fwd_nms_assemble(x)
    masks = jax.vmap(lambda m: finalize_masks_fixed(m, IMG))(masks_p)
    return dets, masks


sustained('full detect (+finalize 544 masks)', detect_full, x544)
