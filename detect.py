#!/usr/bin/env python
"""Detection CLI: image folder or video inference with visualization.

TPU-native rebuild of /root/reference/detect.py. The device path (forward +
fast-NMS + proto-space mask assembly) is one jitted graph; drawing and video
IO stay host-side. Supports --cutout, --save_lincomb, --no_crop, --hide_*,
--real_time, --visual_thre exactly like the reference CLI surface.
"""
from __future__ import annotations

import argparse
import os
import time

import cv2
import numpy as np

from yolact_minimal_tpu.config import cfg_name_from_weight, get_config
from yolact_minimal_tpu.data.augment import val_aug
from yolact_minimal_tpu.data.coco import COCODetection
from yolact_minimal_tpu.pipeline import Detector
from yolact_minimal_tpu.utils import timer
from yolact_minimal_tpu.utils.progress import ProgressBar
from yolact_minimal_tpu.utils.visualize import draw_img, draw_lincomb


def _detect_one(detector, cfg, img_normed, img_origin, img_name=None, fps=None):
    import jax.numpy as jnp
    h, w = img_origin.shape[:2]
    dets, masks_proto, proto = detector(jnp.asarray(img_normed)[None])
    det0 = type(dets)(*(x[0] for x in dets))
    if cfg.save_lincomb and img_name:
        valid = np.asarray(det0.valid)
        if valid.any():
            draw_lincomb(np.asarray(proto[0]),
                         np.asarray(det0.coefs)[valid], img_name)
    ids, scores, boxes, masks = detector.postprocess_host(
        det0, masks_proto[0], h, w, visual_thre=cfg.visual_thre)
    return draw_img(ids, scores, boxes, masks, img_origin, cfg,
                    img_name=img_name, fps=fps)


def main():
    parser = argparse.ArgumentParser(description='YOLACT-TPU Detection')
    parser.add_argument('--weight', type=str, required=True)
    parser.add_argument('--image', default=None, type=str,
                        help='Folder of images to detect.')
    parser.add_argument('--video', default=None, type=str)
    parser.add_argument('--img_size', type=int, default=544)
    parser.add_argument('--traditional_nms', action='store_true')
    parser.add_argument('--hide_mask', action='store_true')
    parser.add_argument('--hide_bbox', action='store_true')
    parser.add_argument('--hide_score', action='store_true')
    parser.add_argument('--cutout', action='store_true')
    parser.add_argument('--save_lincomb', action='store_true')
    parser.add_argument('--no_crop', action='store_true')
    parser.add_argument('--real_time', action='store_true')
    parser.add_argument('--visual_thre', default=0.3, type=float)
    parser.add_argument('--cfg', type=str, default=None)
    args = parser.parse_args()

    name = args.cfg or cfg_name_from_weight(args.weight)
    cfg = get_config(name, mode='detect', **{
        k: v for k, v in vars(args).items() if k not in ('weight', 'cfg')})

    from yolact_minimal_tpu.utils.checkpoint import load_weights_auto
    variables = load_weights_auto(args.weight, include_semantic=False)
    detector = Detector(cfg, variables)

    os.makedirs('results/images', exist_ok=True)
    os.makedirs('results/videos', exist_ok=True)

    if cfg.image is not None:
        dataset = COCODetection(cfg, mode='detect')
        n = len(dataset)
        assert n > 0, 'No images found.'
        progress = ProgressBar(40, n)
        timer.reset()
        for i in range(n):
            if i == 1:
                timer.start()
            item = dataset.get_detect(i)
            with timer.counter('detect'):
                out = _detect_one(detector, cfg, item['image'], item['origin'],
                                  img_name=item['name'])
            cv2.imwrite(f"results/images/{item['name']}", out)
            now = time.perf_counter()
            if i > 0:
                timer.add_batch_time(now - prev)
            prev = now
            if i > 0:
                t_t, t_d = timer.get_times(['batch', 'detect'])
                print(f'\rDetecting: {progress.get_bar(i + 1)} {i + 1}/{n}, '
                      f'fps: {1 / max(t_d, 1e-9):.2f} | total fps: '
                      f'{1 / max(t_t, 1e-9):.2f}', end='')
        print('\nFinished, saved in: results/images.')

    elif cfg.video is not None:
        vid = cv2.VideoCapture(cfg.video)
        target_fps = round(vid.get(cv2.CAP_PROP_FPS))
        fw = round(vid.get(cv2.CAP_PROP_FRAME_WIDTH))
        fh = round(vid.get(cv2.CAP_PROP_FRAME_HEIGHT))
        num_frames = round(vid.get(cv2.CAP_PROP_FRAME_COUNT))
        name = os.path.basename(cfg.video)
        writer = cv2.VideoWriter(f'results/videos/{name}',
                                 cv2.VideoWriter_fourcc(*'mp4v'),
                                 target_fps, (fw, fh))
        progress = ProgressBar(40, num_frames)
        timer.reset()
        t_fps = 0.0
        for i in range(num_frames):
            if i == 1:
                timer.start()
            frame = vid.read()[1]
            if frame is None:
                break
            with timer.counter('detect'):
                out = _detect_one(detector, cfg, val_aug(frame, cfg.img_size),
                                  frame, fps=t_fps)
            if cfg.real_time:
                cv2.imshow('Detection', out)
                cv2.waitKey(1)
            else:
                writer.write(out)
            now = time.perf_counter()
            if i > 0:
                timer.add_batch_time(now - prev)
                t_t, = timer.get_times(['batch'])
                t_fps = 1 / max(t_t, 1e-9)
                print(f'\rDetecting: {progress.get_bar(i + 1)} '
                      f'{i + 1}/{num_frames}, total fps: {t_fps:.2f}', end='')
            prev = now
        vid.release()
        writer.release()
        if not cfg.real_time:
            print(f'\n\nFinished, saved in: results/videos/{name}')
    else:
        parser.error('Provide --image <folder> or --video <path>.')


if __name__ == '__main__':
    main()
