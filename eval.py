#!/usr/bin/env python
"""Evaluation CLI: COCO-style box+mask mAP.

TPU-native rebuild of /root/reference/eval.py: the forward + NMS + mask
assembly run as one jitted device graph per image; the greedy mAP
accumulation (or detection-json export for external COCOeval) runs host-side.
The config name is recovered from the checkpoint filename.
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from yolact_minimal_tpu.config import cfg_name_from_weight, get_config
from yolact_minimal_tpu.data.coco import COCODetection
from yolact_minimal_tpu.pipeline import Detector
from yolact_minimal_tpu.utils import timer
from yolact_minimal_tpu.utils.map_eval import (MakeJson, calc_map,
                                               make_ap_data, prep_metrics)
from yolact_minimal_tpu.utils.progress import ProgressBar


def evaluate(detector: Detector, cfg, step=None, max_images: int = -1):
    """Runs validation; returns (table, box_row, mask_row) like the
    reference evaluate() (eval.py:28-108)."""
    import jax.numpy as jnp

    dataset = COCODetection(cfg, mode='val')
    n = len(dataset) if max_images == -1 else min(max_images, len(dataset))
    progress = ProgressBar(40, n)
    timer.reset()

    ap_data = make_ap_data(len(cfg.class_names))
    make_json = MakeJson(cfg.continuous_id) if cfg.coco_api else None

    # prefetch the host-side decode/resize so cv2 overlaps device compute
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(2)
    futures = [pool.submit(dataset.get_val, i) for i in range(min(n, 4))]

    last = None
    for i in range(n):
        if i == 1:
            timer.start()
        item = futures[i].result()
        futures[i] = None   # don't retain every image for the whole eval
        if len(futures) < n:
            futures.append(pool.submit(dataset.get_val, len(futures)))
        img = jnp.asarray(item['image'])[None]

        with timer.counter('forward+nms', fence=lambda: last):
            dets, masks_proto, _ = detector(img)
            last = dets.scores

        with timer.counter('after_nms'):
            det0 = type(dets)(*(x[0] for x in dets))
            ids, scores, boxes, masks = detector.postprocess_host(
                det0, masks_proto[0], item['height'], item['width'])

        with timer.counter('metric'):
            if len(ids) != 0:
                if cfg.coco_api:
                    for j in range(len(ids)):
                        b = boxes[j]
                        if (b[3] - b[1]) * (b[2] - b[0]) > 0:
                            make_json.add_bbox(item['image_id'], ids[j], b, scores[j])
                            make_json.add_mask(item['image_id'], ids[j], masks[j], scores[j])
                else:
                    prep_metrics(ap_data, ids, scores, boxes, masks,
                                 item['boxes'], item['labels'], item['masks'],
                                 item['height'], item['width'])

        now = time.perf_counter()
        if i > 0:
            timer.add_batch_time(now - prev)
        prev = now
        if i > 0:
            t_t, t_fn, t_an, t_me = timer.get_times(
                ['batch', 'forward+nms', 'after_nms', 'metric'])
            fps = 1 / max(t_fn + t_an, 1e-9)
            print(f'\rTesting: {progress.get_bar(i + 1)} {i + 1}/{n}, '
                  f'fps: {fps:.2f} | total fps: {1 / max(t_t, 1e-9):.2f} | '
                  f't_t: {t_t:.3f} | t_fwd_nms: {t_fn:.3f} | '
                  f't_after_nms: {t_an:.3f} | t_metric: {t_me:.3f}', end='')

    pool.shutdown(wait=False)
    print()
    if cfg.coco_api:
        make_json.dump()
        print("Json files dumped, saved in: 'results/', start evaluating.")
        from yolact_minimal_tpu.utils.cocoeval import evaluate_detections
        evaluate_detections(cfg.val_ann, 'results/bbox_detections.json',
                            'results/mask_detections.json')
        return None, None, None

    table, box_row, mask_row = calc_map(ap_data, len(cfg.class_names), step=step)
    print(table)
    return table, box_row, mask_row


def main():
    parser = argparse.ArgumentParser(description='YOLACT-TPU Evaluation')
    parser.add_argument('--weight', type=str, required=True)
    parser.add_argument('--img_size', type=int, default=544)
    parser.add_argument('--val_num', type=int, default=-1)
    parser.add_argument('--coco_api', action='store_true')
    parser.add_argument('--traditional_nms', action='store_true')
    parser.add_argument('--cfg', type=str, default=None,
                        help='Override config name (else parsed from weight).')
    args = parser.parse_args()

    name = args.cfg or cfg_name_from_weight(args.weight)
    cfg = get_config(name, mode='val', img_size=args.img_size,
                     val_num=args.val_num, coco_api=args.coco_api,
                     traditional_nms=args.traditional_nms)
    cfg.print_cfg()

    from yolact_minimal_tpu.utils.checkpoint import load_weights_auto
    variables = load_weights_auto(args.weight, include_semantic=False)
    detector = Detector(cfg, variables)
    evaluate(detector, cfg, max_images=cfg.val_num)


if __name__ == '__main__':
    main()
