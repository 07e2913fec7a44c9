"""True device-time attribution of the detect graph: K-chained calls inside
one jit (amortizing the tunnel RPC overhead) for each prefix of the
pipeline: forward -> +decode/NMS -> +mask assemble -> +fixed upsample."""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops.nms import (assemble_masks,
                                        detect_postprocess_batch,
                                        finalize_masks_fixed)
from yolact_minimal_tpu.ops.boxes import make_anchors

B, S, K, N = 16, 544, 8, 4
cfg = get_config('res50_coco', mode='val', img_size=S,
                 compute_dtype='bfloat16')
model = Yolact(cfg=cfg, train_mode=False)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, S, S, 3), jnp.float32), train=False)
variables = jax.device_put({'params': variables['params'],
                            'batch_stats': variables.get('batch_stats', {})})
anchors = jnp.asarray(make_anchors(cfg.img_size, cfg.aspect_ratios, cfg.scales))
rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, S, S, 3).astype(np.float32))


def fwd(x):
    return model.apply(variables, x, train=False)


def dets_of(x):
    class_p, box_p, coef_p, proto = fwd(x)
    dets = detect_postprocess_batch(
        class_p, box_p, coef_p, anchors, cfg.nms_score_thre,
        cfg.nms_iou_thre, cfg.top_k, cfg.max_detections,
        getattr(cfg, 'nms_pre_topk', 1024))
    return dets, proto


def with_masks(x):
    dets, proto = dets_of(x)
    masks_proto = jax.vmap(
        functools.partial(assemble_masks, do_crop=True))(proto, dets)
    return dets, masks_proto


def full_fixed(x):
    dets, masks_proto = with_masks(x)
    masks = jax.vmap(lambda m: finalize_masks_fixed(m, S))(masks_proto)
    return dets, masks


def bench(label, fn):
    @jax.jit
    def chain(x):
        for _ in range(K):
            out = fn(x)
            s = jax.tree.leaves(out)[0]
            x = x + (s.reshape(-1)[0].astype(jnp.float32) * 1e-30).astype(x.dtype)
        return out

    out = chain(img)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(N):
        out = chain(img)
    jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0])
    per = (time.perf_counter() - t0) / (N * K)
    print(f'{label}: {per*1e3:.2f} ms/batch  {B/per:.0f} img/s', flush=True)
    return per


t1 = bench('forward            ', fwd)
t2 = bench('+decode/NMS        ', dets_of)
t3 = bench('+mask assemble     ', with_masks)
t4 = bench('+fixed 544 upsample', full_fixed)
print(f'stages: nms {1e3*(t2-t1):.2f} | assemble {1e3*(t3-t2):.2f} | '
      f'upsample {1e3*(t4-t3):.2f} ms', flush=True)
