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
    reference evaluate() (eval.py:28-108).

    Unlike the reference's bs=1 loop (eval.py:30), images go through the
    device in batches of cfg.val_bs with the tail padded to keep a single
    compiled shape — on a remote-TPU link each dispatch+D2H round trip is
    expensive, so batching directly multiplies eval throughput. Host tails
    (mask upsample, metrics) stay per-image.
    """
    dataset = COCODetection(cfg, mode='val')
    n = len(dataset) if max_images == -1 else min(max_images, len(dataset))
    bs = max(1, int(cfg.val_bs))
    progress = ProgressBar(40, n)
    timer.reset()

    ap_data = make_ap_data(len(cfg.class_names))
    make_json = MakeJson(cfg.continuous_id) if cfg.coco_api else None

    # prefetch the host-side decode/resize so cv2 overlaps device compute;
    # try/finally so an exception mid-loop doesn't leak the pool's threads
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(4)
    try:
        return _eval_loop(detector, cfg, dataset, n, bs, progress, ap_data,
                          make_json, pool, step)
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


def _eval_loop(detector, cfg, dataset, n, bs, progress, ap_data, make_json,
               pool, step):
    import jax
    import jax.numpy as jnp
    ahead = 2 * bs + 2
    futures = {i: pool.submit(dataset.get_val, i) for i in range(min(n, ahead))}

    state = dict(done=0, prev=None)

    def drain(pending):
        """D2H + host tail for one already-dispatched batch. Runs AFTER the
        next batch's dispatch is queued, so the fetch and the per-image
        metrics overlap the device computing that next batch (JAX dispatch
        is async; device_get is the only blocking point)."""
        items, dets, masks_proto = pending
        with timer.counter('fetch'):
            dets_np, masks_np = jax.device_get((dets, masks_proto))
        for j, item in enumerate(items):
            det0 = type(dets_np)(*(x[j] for x in dets_np))
            with timer.counter('after_nms'):
                ids, scores, boxes, masks = detector.postprocess_host(
                    det0, masks_np[j], item['height'], item['width'])

            with timer.counter('metric'):
                if len(ids) != 0:
                    if cfg.coco_api:
                        for k in range(len(ids)):
                            b = boxes[k]
                            if (b[3] - b[1]) * (b[2] - b[0]) > 0:
                                make_json.add_bbox(item['image_id'], ids[k], b, scores[k])
                                make_json.add_mask(item['image_id'], ids[k], masks[k], scores[k])
                    else:
                        prep_metrics(ap_data, ids, scores, boxes, masks,
                                     item['boxes'], item['labels'], item['masks'],
                                     item['height'], item['width'])
        state['done'] += len(items)

        now = time.perf_counter()
        if state['prev'] is not None:
            timer.add_batch_time(now - state['prev'])
            t_t, t_fn, t_an, t_me = timer.get_times(
                ['batch', 'fetch', 'after_nms', 'metric'])
            # with the dispatch/fetch overlap the only end-to-end rate is
            # batch wall time; a forward-only 'fps' would be fiction here
            print(f'\rTesting: {progress.get_bar(state["done"])} '
                  f'{state["done"]}/{n}, '
                  f'total fps: {bs / max(t_t, 1e-9):.2f} | '
                  f't_t: {t_t:.3f} | t_fetch: {t_fn:.3f} | '
                  f't_after_nms: {t_an:.3f} | t_metric: {t_me:.3f}', end='')
        state['prev'] = now

    pending = None
    for batch_start in range(0, n, bs):
        if batch_start == bs:
            timer.start()   # exclude the first (compile/warm-up) batch
        idxs = range(batch_start, min(batch_start + bs, n))
        items = []
        for i in idxs:
            try:
                items.append(futures.pop(i).result())
            except RuntimeError as e:
                # crowd-only / annotation-free val image. The reference
                # crashes here (utils/coco.py:109-111); by default we skip it
                # so a 5000-image eval survives — --strict restores the
                # reference behavior.
                if cfg.strict:
                    raise
                print(f'\nWarning: skipping val image {i}: {e}')
            if i + ahead < n:
                futures[i + ahead] = pool.submit(dataset.get_val, i + ahead)
        if not items:
            continue
        imgs = np.stack([it['image'] for it in items], 0)
        if len(items) < bs:   # pad the tail batch to the compiled shape
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], bs - len(items), axis=0)], 0)

        # async dispatch FIRST, then drain the previous batch: the device
        # computes this batch while the host fetches/accumulates the last one
        dets, masks_proto, _ = detector(jnp.asarray(imgs))
        if pending is not None:
            drain(pending)
        pending = (items, dets, masks_proto)

    if pending is not None:
        drain(pending)
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
    from yolact_minimal_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser(description='YOLACT-TPU Evaluation')
    parser.add_argument('--weight', type=str, required=True)
    parser.add_argument('--img_size', type=int, default=544)
    parser.add_argument('--val_num', type=int, default=-1)
    parser.add_argument('--val_bs', type=int, default=None,
                        help='Device batch size for eval (default: cfg.val_bs).')
    parser.add_argument('--coco_api', action='store_true')
    parser.add_argument('--strict', action='store_true',
                        help='Crash on crowd-only val images like the '
                             'reference instead of skipping them.')
    parser.add_argument('--traditional_nms', action='store_true')
    parser.add_argument('--cfg', type=str, default=None,
                        help='Override config name (else parsed from weight).')
    parser.add_argument('--data_parallel', type=int, default=0,
                        help='Shard each eval batch over this many devices '
                             '(0 = single device). val_bs must be a '
                             'multiple; the reference evaluates on one GPU '
                             'only.')
    parser.add_argument('--val_imgs', type=str, default=None,
                        help='Override the validation image directory '
                             '(mirrors train.py --train_imgs).')
    parser.add_argument('--val_ann', type=str, default=None,
                        help='Override the validation annotation json.')
    args = parser.parse_args()

    name = args.cfg or cfg_name_from_weight(args.weight)
    overrides = {} if args.val_bs is None else {'val_bs': args.val_bs}
    if args.val_imgs:
        overrides['val_imgs'] = args.val_imgs
    if args.val_ann:
        overrides['val_ann'] = args.val_ann
    cfg = get_config(name, mode='val', img_size=args.img_size,
                     val_num=args.val_num, coco_api=args.coco_api,
                     strict=args.strict,
                     traditional_nms=args.traditional_nms, **overrides)
    cfg.print_cfg()

    from yolact_minimal_tpu.utils.checkpoint import load_weights_auto
    variables = load_weights_auto(args.weight, include_semantic=False)
    mesh = None
    if args.data_parallel:
        from yolact_minimal_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.data_parallel)
        if cfg.val_bs % args.data_parallel:
            cfg.val_bs = args.data_parallel * max(
                1, cfg.val_bs // args.data_parallel)
            print(f'val_bs rounded to {cfg.val_bs} for the '
                  f'{args.data_parallel}-device mesh.')
    detector = Detector(cfg, variables, mesh=mesh)
    evaluate(detector, cfg, max_images=cfg.val_num)


if __name__ == '__main__':
    main()
