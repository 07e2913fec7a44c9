#!/usr/bin/env python
"""Standalone inference driver for exported artifacts.

Runs the serialized AOT graph and finishes detection with the numpy-twin
postprocess — the analog of the reference's ONNXRuntime/TensorRT drivers
(/root/reference/detect_with_onnx.py, detect_with_trt.py): no model-building
code, no flax, just the artifact + numpy + cv2. Like the TRT driver's async
H2D/D2H streaming (detect_with_trt.py:109-126), the loop overlaps host work
with device compute: a reader thread decodes + val_augs the NEXT chunk and a
writer thread postprocesses + draws the PREVIOUS one while the graph runs,
and chunks are sized to the artifact's compiled batch (tail padded).
"""
from __future__ import annotations

import argparse
import glob
import os
import os.path as osp
import time
from concurrent.futures import ThreadPoolExecutor

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
    bs = int(meta.get('batch', 1))
    cfg = get_config(meta['name'], mode='detect', img_size=meta['img_size'],
                     visual_thre=args.visual_thre, hide_mask=args.hide_mask,
                     hide_bbox=args.hide_bbox, hide_score=args.hide_score,
                     no_crop=args.no_crop, real_time=args.real_time,
                     image=args.image, video=args.video)

    out_dir = 'results/export_images'
    os.makedirs(out_dir, exist_ok=True)

    def postprocess_one(outs, j, img_origin, img_name=None, fps=None):
        """Numpy tail for element j of a device chunk: decode+NMS+masks+draw."""
        class_p, box_p, coef_p, proto = outs
        h, w = img_origin.shape[:2]
        boxes, coefs, ids, scores = detect_postprocess_numpy(
            class_p[j], box_p[j], coef_p[j], anchors, cfg.nms_score_thre,
            cfg.nms_iou_thre, cfg.top_k, cfg.max_detections)
        ids, scores, boxes_pix, masks = after_nms_numpy(
            ids, scores, boxes, coefs, proto[j], h, w,
            visual_thre=cfg.visual_thre, do_crop=not cfg.no_crop)
        return draw_img(ids, scores, boxes_pix, masks, img_origin, cfg,
                        img_name=img_name, fps=fps, out_dir=out_dir)

    def run_chunk(normed):
        """One graph dispatch on a padded chunk; returns the 4 output arrays."""
        x = np.stack(normed, 0).astype(np.float32)
        if len(normed) < bs:
            x = np.concatenate([x, np.repeat(x[-1:], bs - len(normed), 0)], 0)
        return [np.asarray(o) for o in call(x)]

    if args.image:
        paths = sorted(glob.glob(osp.join(args.image, '*.jpg')) +
                       glob.glob(osp.join(args.image, '*.png')))
        assert paths, 'No images found.'
        chunks = [paths[i:i + bs] for i in range(0, len(paths), bs)]
        progress = ProgressBar(40, len(paths))
        reader = ThreadPoolExecutor(2)
        writer = ThreadPoolExecutor(1)

        def read_chunk(chunk):
            imgs = [cv2.imread(pth) for pth in chunk]
            return imgs, [val_aug(im, cfg.img_size) for im in imgs]

        def finish_chunk(chunk, imgs, outs):
            for j, pth in enumerate(chunk):
                out = postprocess_one(outs, j, imgs[j],
                                      img_name=osp.basename(pth))
                cv2.imwrite(osp.join(out_dir, osp.basename(pth)), out)

        timer.reset()
        done = 0
        prev = None
        pending = None
        fut = reader.submit(read_chunk, chunks[0])
        for ci, chunk in enumerate(chunks):
            if ci == 1:
                timer.start()
            imgs, normed = fut.result()
            if ci + 1 < len(chunks):
                fut = reader.submit(read_chunk, chunks[ci + 1])
            with timer.counter('detect'):
                outs = run_chunk(normed)
            if pending is not None:
                pending.result()
            pending = writer.submit(finish_chunk, chunk, imgs, outs)
            done += len(chunk)
            now = time.perf_counter()
            if ci > 0:
                timer.add_batch_time(now - prev)
                t_t, = timer.get_times(['batch'])
                print(f'\r{progress.get_bar(done)} {done}/{len(paths)} '
                      f'fps: {bs / max(t_t, 1e-9):.2f}', end='')
            prev = now
        if pending is not None:
            pending.result()
        reader.shutdown(wait=True)
        writer.shutdown(wait=True)
        print(f'\nFinished, saved in: {out_dir}')
    elif args.video:
        vid = cv2.VideoCapture(args.video)
        fps_target = round(vid.get(cv2.CAP_PROP_FPS))
        fw, fh = (round(vid.get(cv2.CAP_PROP_FRAME_WIDTH)),
                  round(vid.get(cv2.CAP_PROP_FRAME_HEIGHT)))
        n = round(vid.get(cv2.CAP_PROP_FRAME_COUNT))
        name = osp.basename(args.video)
        os.makedirs('results/export_videos', exist_ok=True)
        writer_v = cv2.VideoWriter(f'results/export_videos/{name}',
                                   cv2.VideoWriter_fourcc(*'mp4v'),
                                   fps_target, (fw, fh))
        io_pool = ThreadPoolExecutor(1)
        write_pool = ThreadPoolExecutor(1)

        def read_batch():
            frames = []
            while len(frames) < bs:
                frame = vid.read()[1]
                if frame is None:
                    break
                frames.append(frame)
            return frames, [val_aug(f, cfg.img_size) for f in frames]

        def finish_batch(frames, outs, t_fps):
            for j, frame in enumerate(frames):
                writer_v.write(postprocess_one(outs, j, frame, fps=t_fps))

        done, t_fps, t0, warm = 0, 0.0, None, 0
        pending = None
        fut = io_pool.submit(read_batch)
        try:
            while True:
                frames, normed = fut.result()
                if not frames:
                    break
                fut = io_pool.submit(read_batch)
                outs = run_chunk(normed)
                if pending is not None:
                    pending.result()
                pending = write_pool.submit(finish_batch, frames, outs, t_fps)
                done += len(frames)
                if t0 is None:
                    t0 = time.perf_counter()   # exclude compile/warmup batch
                    warm = done
                else:
                    t_fps = (done - warm) / max(time.perf_counter() - t0, 1e-9)
                print(f'\rDetecting: {done}/{n}, total fps: {t_fps:.2f}',
                      end='')
            if pending is not None:
                pending.result()
        finally:
            fut.cancel()
            io_pool.shutdown(wait=True)
            write_pool.shutdown(wait=True)
            vid.release()
            writer_v.release()
        print(f'\nFinished, saved in: results/export_videos/{name} '
              f'({t_fps:.1f} fps sustained)')
    else:
        p.error('Provide --image <folder> or --video <path>.')


if __name__ == '__main__':
    main()
