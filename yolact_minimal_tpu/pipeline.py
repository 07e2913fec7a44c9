"""High-level inference pipeline: jitted forward + on-device postprocess.

The device side (backbone -> FPN -> heads -> decode -> fast-NMS -> lincomb
mask assembly at prototype resolution) is one fixed-shape jitted graph with
zero host sync — the TPU-native replacement for the reference's
eval/detect hot path (eval.py:45-52, detect.py:70-78). The host side only
upsamples the few valid masks to the original image size (cv2, matching the
reference's align_corners=False interpolate + 0.5 binarize) and converts
boxes to pixels.

For fixed-size outputs (video, benchmarking) `detect_fixed` keeps even the
upsample+binarize on device.
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

_USE_PALLAS_MASKS = os.environ.get('YOLACT_PALLAS_MASKS', '0') == '1'

from yolact_minimal_tpu.config import Config
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.ops.boxes import crop_numpy, decode, make_anchors
from yolact_minimal_tpu.ops.nms import (Detections, assemble_masks,
                                        detect_postprocess_batch,
                                        finalize_masks_fixed)


class Detector:
    """Wraps a config + variables into jitted detect functions.

    With `mesh` (a 1-D `data` jax.sharding.Mesh), inference runs
    data-parallel: parameters are replicated, the image batch is sharded on
    its leading axis, and XLA splits the whole forward+NMS graph across the
    mesh — the eval-side counterpart of the training DP step (the reference
    evaluates on one GPU only, eval.py:30; this exceeds it).
    """

    def __init__(self, cfg: Config, variables: dict, mesh=None,
                 static_weights: bool = True):
        self.cfg = cfg
        self.mesh = mesh
        # Over a multi-device mesh the fused swin window attention runs
        # under shard_map on the batch axis (set_spmd_mesh below, declared
        # at trace time inside each jitted graph) — DP eval keeps the
        # Pallas fast path instead of falling back to the XLA einsum.
        self.model = Yolact(cfg=cfg, train_mode=False)
        # With static_weights the parameter pytree is CLOSED OVER by the
        # jitted graphs (jit constants) instead of passed as call arguments.
        # Measured on the tunneled v5e: successive dispatches that share
        # non-donated argument buffers do not pipeline — the swin-544 detect
        # sustained 88.2 ms/dispatch as-args vs 59.7 ms as-constants against
        # a 58.6 ms device compute (profiler-verified); a single flat packed
        # weight argument reproduced 87.4 ms, so it is buffer sharing, not
        # argument count. Weights-as-constants restores back-to-back device
        # execution. The cost: swapping weights retraces (update_variables);
        # in-training validation passes static_weights=False to keep its
        # swap-without-retrace behavior.
        self.static_weights = static_weights
        # Pin weights on device once — passing host numpy through jit would
        # re-upload the full parameter set on every call.
        weights = {'params': variables['params'],
                   'batch_stats': variables.get('batch_stats') or {}}
        if mesh is not None:
            from yolact_minimal_tpu.parallel.mesh import replicated
            self.variables = jax.device_put(weights, replicated(mesh))
        else:
            self.variables = jax.device_put(weights)
        self.anchors = jnp.asarray(make_anchors(cfg.img_size, cfg.aspect_ratios,
                                                cfg.scales))
        self._build_jits()

    def _build_jits(self):
        cfg = self.cfg

        def _apply(variables, images):
            # trace-time side effect: declares the mesh the fused window
            # attention shard_maps over (no-op at execution time). Reset in
            # finally so the global never leaks into other traces (e.g. a
            # later single-device model.init in the same process).
            from yolact_minimal_tpu.ops.window_attention import set_spmd_mesh
            set_spmd_mesh(self.mesh)
            try:
                return self.model.apply(variables, images, train=False)
            finally:
                set_spmd_mesh(None)

        def _infer(variables, images):
            class_p, box_p, coef_p, proto = _apply(variables, images)
            dets = detect_postprocess_batch(
                class_p, box_p, coef_p, self.anchors, cfg.nms_score_thre,
                cfg.nms_iou_thre, cfg.top_k, cfg.max_detections,
                getattr(cfg, 'nms_pre_topk', 1024))
            masks_proto = jax.vmap(
                functools.partial(assemble_masks, do_crop=not cfg.no_crop)
            )(proto, dets)
            return dets, masks_proto, proto

        def _infer_fixed(variables, images, out_size):
            class_p, box_p, coef_p, proto = _apply(variables, images)
            dets = detect_postprocess_batch(
                class_p, box_p, coef_p, self.anchors, cfg.nms_score_thre,
                cfg.nms_iou_thre, cfg.top_k, cfg.max_detections,
                getattr(cfg, 'nms_pre_topk', 1024))
            # Opt-in fused Pallas finalize (lincomb+crop+4x upsample+
            # binarize in VMEM, YOLACT_PALLAS_MASKS=1). Measured SLOWER than
            # the XLA pair on v5e (533 vs 566 img/s end-to-end): XLA's
            # producer-consumer fusion already keeps the chain in registers
            # and pipelines the whole batch, while the kernel re-runs the
            # lincomb per row band. Kept as a validated alternative; see
            # docs/ARCHITECTURE.md.
            # (backend check: Pallas TPU kernels can't lower on the CPU
            # test mesh; the tunneled TPU registers as platform 'axon'.
            # mesh check: pallas_call has no SPMD partitioning rule, so it
            # must not be jitted over batch-sharded inputs — DP runs take
            # the XLA pair instead)
            if (_USE_PALLAS_MASKS and out_size == 4 * proto.shape[1]
                    and jax.default_backend() != 'cpu'
                    and self.mesh is None):
                from yolact_minimal_tpu.ops.pallas_masks import \
                    fused_mask_finalize
                masks = fused_mask_finalize(proto, dets.coefs, dets.boxes,
                                            dets.valid, out_size,
                                            not cfg.no_crop)
            else:
                masks_proto = jax.vmap(
                    functools.partial(assemble_masks, do_crop=not cfg.no_crop)
                )(proto, dets)
                masks = jax.vmap(
                    lambda m: finalize_masks_fixed(m, out_size))(masks_proto)
            return dets, masks

        def _infer_raw(variables, images):
            """Forward + box decode only — the device half of the
            --traditional_nms path; greedy suppression runs host-side."""
            class_p, box_p, coef_p, proto = _apply(variables, images)
            boxes = decode(box_p, self.anchors, clip=True)
            return class_p, boxes, coef_p, proto

        if self.static_weights:
            v = self.variables
            self._infer = jax.jit(functools.partial(_infer, v))
            self._infer_fixed = jax.jit(functools.partial(_infer_fixed, v),
                                        static_argnums=(1,))
            self._infer_raw = jax.jit(functools.partial(_infer_raw, v))
        else:
            bound_infer = jax.jit(_infer)
            bound_fixed = jax.jit(_infer_fixed, static_argnums=(2,))
            bound_raw = jax.jit(_infer_raw)
            self._infer = lambda *a: bound_infer(self.variables, *a)
            self._infer_fixed = lambda *a: bound_fixed(self.variables, *a)
            self._infer_raw = lambda *a: bound_raw(self.variables, *a)

    def update_variables(self, variables: dict):
        """Swap in new weights. With static_weights=False (in-training
        validation) the jitted graphs take the weights as arguments and are
        NOT retraced; with static_weights=True the weights are baked-in
        constants, so the jits are rebuilt (retrace on next call)."""
        weights = {'params': variables['params'],
                   'batch_stats': variables.get('batch_stats') or {}}
        if self.mesh is not None:
            from yolact_minimal_tpu.parallel.mesh import replicated
            self.variables = jax.device_put(weights, replicated(self.mesh))
        else:
            self.variables = jax.device_put(weights)
        if self.static_weights:
            self._build_jits()

    def _shard(self, images: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None:
            return images
        from yolact_minimal_tpu.parallel.mesh import batch_sharding
        n = self.mesh.devices.size
        if images.shape[0] % n != 0:
            raise ValueError(
                f'batch {images.shape[0]} not divisible by mesh size {n}')
        return jax.device_put(images, batch_sharding(self.mesh))

    def __call__(self, images: jnp.ndarray):
        """images [B, S, S, 3] normalized RGB -> (Detections, masks_proto
        [B, ph, pw, D], proto [B, ph, pw, 32]). On device for fast-NMS;
        host numpy slates (same shapes/interface) for --traditional_nms."""
        if self.cfg.traditional_nms:
            return self._call_traditional(images)
        return self._infer(self._shard(images))

    def _call_traditional(self, images: jnp.ndarray):
        """--traditional_nms dispatch (reference output_utils.py:126-134):
        jitted forward+decode on device, then the native C++ greedy per-class
        NMS (ops/traditional_nms.py) and mask assembly host-side, padded back
        into the fixed [max_detections] slate so every downstream consumer
        (postprocess_host, eval, detect) is dispatch-agnostic."""
        from yolact_minimal_tpu.ops.traditional_nms import traditional_nms
        cfg = self.cfg
        # the jitted forward+decode is sharded over the mesh like the
        # fast-NMS path; only the greedy suppression tail is host-side
        class_p, boxes_all, coef_p, proto = jax.device_get(
            self._infer_raw(self._shard(images)))
        bsz, _, n_coef = coef_p.shape
        ph, pw = proto.shape[1:3]
        d = cfg.max_detections
        ids = np.zeros((bsz, d), np.int32)
        scores = np.zeros((bsz, d), np.float32)
        boxes = np.zeros((bsz, d, 4), np.float32)
        coefs = np.zeros((bsz, d, n_coef), np.float32)
        valid = np.zeros((bsz, d), bool)
        masks_proto = np.zeros((bsz, ph, pw, d), np.float32)
        for b in range(bsz):
            cls_scores = np.ascontiguousarray(class_p[b][:, 1:].T)  # [C-1, A]
            bx, cf, cl, sc = traditional_nms(
                boxes_all[b], coef_p[b], cls_scores, cfg.img_size,
                cfg.nms_score_thre, cfg.nms_iou_thre, d)
            k = len(cl)
            if k == 0:
                continue
            ids[b, :k], scores[b, :k] = cl, sc
            boxes[b, :k], coefs[b, :k] = bx, cf
            valid[b, :k] = True
            masks = 1.0 / (1.0 + np.exp(-(proto[b] @ cf.T)))
            if not cfg.no_crop:
                masks = crop_numpy(masks, bx)
            masks_proto[b, :, :, :k] = masks
        dets = Detections(ids, scores, boxes, coefs, valid)
        return dets, masks_proto, proto

    def detect_fixed(self, images: jnp.ndarray, out_size: int):
        """Fully on-device detect with square binarized masks [B, D, S, S]."""
        return self._infer_fixed(self._shard(images), out_size)

    def postprocess_host(self, dets: Detections, masks_proto, img_h: int,
                         img_w: int, visual_thre: Optional[float] = None
                         ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Reference after_nms host tail (output_utils.py:200-233) for ONE
        image: filter by visual threshold, upsample masks to the original
        size, binarize, slice the padded square, scale boxes to pixels."""
        # one batched D2H fetch — per-field np.asarray costs a full transfer
        # round-trip each (expensive over a remote-TPU link)
        dets, masks_proto = jax.device_get((dets, masks_proto))
        valid = np.asarray(dets.valid)
        scores = np.asarray(dets.scores)
        keep = valid if visual_thre is None else valid & (scores >= visual_thre)
        if not keep.any():
            return (np.zeros(0, np.int32), np.zeros(0, np.float32),
                    np.zeros((0, 4), np.int32),
                    np.zeros((0, img_h, img_w), bool))

        ids = np.asarray(dets.ids)[keep]
        scores = scores[keep]
        boxes = np.asarray(dets.boxes)[keep]
        masks = np.asarray(masks_proto)[:, :, keep]          # [ph, pw, K]

        ori = max(img_h, img_w)
        up = cv2.resize(masks, (ori, ori), interpolation=cv2.INTER_LINEAR)
        if up.ndim == 2:
            up = up[:, :, None]
        up = np.transpose(up, (2, 0, 1)) > 0.5
        up = up[:, :img_h, :] if img_h < img_w else up[:, :, :img_w]

        boxes = (boxes * ori).astype(np.int32)
        return ids, scores, boxes, up


def load_detector(weight_path: str, cfg: Optional[Config] = None) -> Detector:
    """Build a Detector from a checkpoint file, recovering the config from
    the filename when not given (reference detect.py:38-41)."""
    from yolact_minimal_tpu.config import cfg_name_from_weight, get_config
    from yolact_minimal_tpu.utils.checkpoint import load_weights_auto
    if cfg is None:
        cfg = get_config(cfg_name_from_weight(weight_path), mode='detect')
    variables = load_weights_auto(weight_path, include_semantic=False)
    return Detector(cfg, variables)
