#!/usr/bin/env python
"""Standalone inference driver for exported artifacts.

Runs the serialized AOT graph and finishes detection with the numpy-twin
postprocess — the analog of the reference's ONNXRuntime/TensorRT drivers
(/root/reference/detect_with_onnx.py, detect_with_trt.py): no model-building
code, no flax, just the artifact + numpy + cv2.
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import time

import cv2
import numpy as np

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.data.augment import val_aug
from yolact_minimal_tpu.deploy import load_exported
from yolact_minimal_tpu.ops.nms_numpy import (after_nms_numpy,
                                              detect_postprocess_numpy)
from yolact_minimal_tpu.utils import timer
from yolact_minimal_tpu.utils.progress import ProgressBar
from yolact_minimal_tpu.utils.visualize import draw_img


def main():
    from yolact_minimal_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument('--artifact', type=str, required=True)
    p.add_argument('--image', default=None, type=str)
    p.add_argument('--video', default=None, type=str)
    p.add_argument('--visual_thre', default=0.3, type=float)
    p.add_argument('--hide_mask', action='store_true')
    p.add_argument('--hide_bbox', action='store_true')
    p.add_argument('--hide_score', action='store_true')
    p.add_argument('--no_crop', action='store_true')
    p.add_argument('--real_time', action='store_true')
    args = p.parse_args()

    call, meta, anchors = load_exported(args.artifact)
    cfg = get_config(meta['name'], mode='detect', img_size=meta['img_size'],
                     visual_thre=args.visual_thre, hide_mask=args.hide_mask,
                     hide_bbox=args.hide_bbox, hide_score=args.hide_score,
                     no_crop=args.no_crop, real_time=args.real_time,
                     image=args.image, video=args.video)

    out_dir = 'results/export_images'
    os.makedirs(out_dir, exist_ok=True)

    def run_one(img_origin, img_name=None, fps=None):
        h, w = img_origin.shape[:2]
        normed = val_aug(img_origin, cfg.img_size)
        class_p, box_p, coef_p, proto = [np.asarray(o)
                                         for o in call(normed[None])]
        boxes, coefs, ids, scores = detect_postprocess_numpy(
            class_p[0], box_p[0], coef_p[0], anchors, cfg.nms_score_thre,
            cfg.nms_iou_thre, cfg.top_k, cfg.max_detections)
        ids, scores, boxes_pix, masks = after_nms_numpy(
            ids, scores, boxes, coefs, proto[0], h, w,
            visual_thre=cfg.visual_thre, do_crop=not cfg.no_crop)
        return draw_img(ids, scores, boxes_pix, masks, img_origin, cfg,
                        img_name=img_name, fps=fps, out_dir=out_dir)

    if args.image:
        paths = sorted(glob.glob(osp.join(args.image, '*.jpg')) +
                       glob.glob(osp.join(args.image, '*.png')))
        assert paths, 'No images found.'
        progress = ProgressBar(40, len(paths))
        timer.reset()
        for i, path in enumerate(paths):
            if i == 1:
                timer.start()
            img = cv2.imread(path)
            with timer.counter('detect'):
                out = run_one(img, img_name=osp.basename(path))
            cv2.imwrite(osp.join(out_dir, osp.basename(path)), out)
            now = time.perf_counter()
            if i > 0:
                timer.add_batch_time(now - prev)
                t_t, = timer.get_times(['batch'])
                print(f'\r{progress.get_bar(i + 1)} {i + 1}/{len(paths)} '
                      f'fps: {1 / max(t_t, 1e-9):.2f}', end='')
            prev = now
        print(f'\nFinished, saved in: {out_dir}')
    elif args.video:
        vid = cv2.VideoCapture(args.video)
        fps_target = round(vid.get(cv2.CAP_PROP_FPS))
        fw, fh = (round(vid.get(cv2.CAP_PROP_FRAME_WIDTH)),
                  round(vid.get(cv2.CAP_PROP_FRAME_HEIGHT)))
        n = round(vid.get(cv2.CAP_PROP_FRAME_COUNT))
        name = osp.basename(args.video)
        os.makedirs('results/export_videos', exist_ok=True)
        writer = cv2.VideoWriter(f'results/export_videos/{name}',
                                 cv2.VideoWriter_fourcc(*'mp4v'),
                                 fps_target, (fw, fh))
        t_fps = 0.0
        prev = None
        for i in range(n):
            frame = vid.read()[1]
            if frame is None:
                break
            out = run_one(frame, fps=t_fps)
            writer.write(out)
            now = time.perf_counter()
            if prev is not None:
                t_fps = 1 / max(now - prev, 1e-9)
            prev = now
        vid.release()
        writer.release()
        print(f'Finished, saved in: results/export_videos/{name}')
    else:
        p.error('Provide --image <folder> or --video <path>.')


if __name__ == '__main__':
    main()
