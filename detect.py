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
    from yolact_minimal_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
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
    parser.add_argument('--video_bs', type=int, default=8,
                        help='Frames per device batch in video mode (the '
                             'reference runs bs=1; batching multiplies '
                             'video throughput on TPU).')
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
        detect_video(detector, cfg)
    else:
        parser.error('Provide --image <folder> or --video <path>.')


def detect_video(detector, cfg):
    """Batched video inference (reference detect.py:102-167 rebuilt for
    throughput): frames go through the device `video_bs` at a time — the
    bs=1 frame loop wastes >90% of the chip on dispatch+D2H round trips
    over the tunneled link — with read+val_aug prefetched on a worker
    thread and draw+encode overlapped on a writer thread, so the device
    never waits on host video IO."""
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    vid = cv2.VideoCapture(cfg.video)
    target_fps = round(vid.get(cv2.CAP_PROP_FPS))
    fw = round(vid.get(cv2.CAP_PROP_FRAME_WIDTH))
    fh = round(vid.get(cv2.CAP_PROP_FRAME_HEIGHT))
    num_frames = round(vid.get(cv2.CAP_PROP_FRAME_COUNT))
    name = os.path.basename(cfg.video)
    writer = None
    if not cfg.real_time:
        writer = cv2.VideoWriter(f'results/videos/{name}',
                                 cv2.VideoWriter_fourcc(*'mp4v'),
                                 target_fps, (fw, fh))
    bs = max(1, int(getattr(cfg, 'video_bs', 8)))
    progress = ProgressBar(40, max(num_frames, 1))

    aug_pool = ThreadPoolExecutor(2)

    def read_batch():
        """Decode + val_aug the next <=bs frames (runs on the reader
        thread, overlapped with device compute on the previous batch)."""
        frames = []
        while len(frames) < bs:
            frame = vid.read()[1]
            if frame is None:
                break
            frames.append(frame)
        normed = list(aug_pool.map(
            lambda f: val_aug(f, cfg.img_size), frames))
        return frames, normed

    io_pool = ThreadPoolExecutor(1)
    write_pool = ThreadPoolExecutor(1)

    def finish_frame(frames, dets_np, masks_np, t_fps):
        """Host tail for one device batch: per-frame mask upsample, draw,
        encode (runs on the writer thread, in submission order)."""
        outs = []
        for j, frame in enumerate(frames):
            det0 = type(dets_np)(*(x[j] for x in dets_np))
            ids, scores, boxes, masks = detector.postprocess_host(
                det0, masks_np[j], fh, fw, visual_thre=cfg.visual_thre)
            out = draw_img(ids, scores, boxes, masks, frame, cfg, fps=t_fps)
            if cfg.real_time:
                cv2.imshow('Detection', out)
                cv2.waitKey(1)
            else:
                writer.write(out)
            outs.append(out)
        return len(outs)

    done, t_fps, t0 = 0, 0.0, None
    pending_write = None
    fut = io_pool.submit(read_batch)
    try:
        while True:
            frames, normed = fut.result()
            if not frames:
                break
            fut = io_pool.submit(read_batch)

            imgs = np.stack(normed, 0)
            if len(frames) < bs:    # pad the tail to the compiled shape
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], bs - len(frames), 0)], 0)
            dets, masks_proto, _ = detector(jnp.asarray(imgs))
            dets_np, masks_np = jax.device_get((dets, masks_proto))

            if pending_write is not None:
                pending_write.result()
            if cfg.real_time:
                # cv2.imshow/waitKey must run on the main thread (several
                # GUI backends hang or crash off-main) — no write overlap
                # in preview mode.
                finish_frame(frames, dets_np, masks_np, t_fps)
            else:
                pending_write = write_pool.submit(finish_frame, frames,
                                                  dets_np, masks_np, t_fps)
            done += len(frames)
            if t0 is None:
                t0 = time.perf_counter()   # exclude compile/warmup batch
                warm = done
            else:
                t_fps = (done - warm) / max(time.perf_counter() - t0, 1e-9)
            print(f'\rDetecting: {progress.get_bar(done)} '
                  f'{done}/{num_frames}, total fps: {t_fps:.2f}', end='')
        if pending_write is not None:
            pending_write.result()
    finally:
        # Drain the reader BEFORE releasing the capture: an in-flight
        # vid.read() on a released VideoCapture is a use-after-release.
        fut.cancel()
        io_pool.shutdown(wait=True)
        write_pool.shutdown(wait=True)
        aug_pool.shutdown(wait=True)
        vid.release()
        if writer is not None:
            writer.release()
    if not cfg.real_time:
        print(f'\n\nFinished, saved in: results/videos/{name} '
              f'({t_fps:.1f} fps sustained)')


if __name__ == '__main__':
    main()
