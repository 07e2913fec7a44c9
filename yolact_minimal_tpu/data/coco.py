"""COCO-style dataset + fixed-shape batch assembly + prefetching loader.

Host-side rebuild of /root/reference/utils/coco.py. Differences by design:
  * samples are padded to a static `max_gt` with a validity mask and gt masks
    are pre-downsampled (cv2 bilinear, the same align_corners=False sampling
    torch's F.interpolate uses) to prototype (S/4) and seg (S/8) resolutions,
    so the device sees only fixed-shape tensors;
  * the DataLoader worker pool becomes a spawned process pool (cv2/numpy
    augmentation is GIL-bound under threads) with a bounded in-flight window
    feeding the TPU; a thread backend exists for tests;
  * DistributedSampler becomes per-process index sharding
    (`process_index::process_count`) + per-epoch shuffling.
The None-retry protocol is kept: failed augmentations are repaired by
repeating valid samples within the batch (reference coco.py:14-28).
"""
from __future__ import annotations

import glob
import os.path as osp

import random

from typing import Dict, Iterator, List, Optional

import cv2
import numpy as np

from yolact_minimal_tpu.config import Config
from yolact_minimal_tpu.data.augment import train_aug, val_aug


def downsample_mask_pyramid(masks: np.ndarray, img_size: int):
    """Binarized gt masks at prototype (S/4) and seg (S/8) resolutions via
    bilinear sampling (matches the reference's in-loss F.interpolate + >0.5,
    yolact.py:247-251, 302-304)."""
    ph = pw = img_size // 4
    sh = sw = img_size // 8
    n = masks.shape[0]
    proto = np.empty((n, ph, pw), np.float32)
    seg = np.empty((n, sh, sw), np.float32)
    for i in range(n):
        m = masks[i].astype(np.float32)
        proto[i] = cv2.resize(m, (pw, ph), interpolation=cv2.INTER_LINEAR)
        seg[i] = cv2.resize(m, (sw, sh), interpolation=cv2.INTER_LINEAR)
    return (proto > 0.5).astype(np.float32), (seg > 0.5).astype(np.float32)


class COCODetection:
    """Modes: train (augmented fixed-shape samples), val (resized image +
    original-scale gt), detect (folder of images)."""

    def __init__(self, cfg: Config, mode: str = 'train'):
        self.cfg = cfg
        self.mode = mode
        if mode in ('train', 'val'):
            from yolact_minimal_tpu.data.coco_io import COCO
            self.image_path = cfg.train_imgs if mode == 'train' else cfg.val_imgs
            self.coco = COCO(cfg.train_ann if mode == 'train' else cfg.val_ann)
            self.ids = list(self.coco.imgToAnns.keys())
        elif mode == 'detect':
            self.image_path = sorted(glob.glob(osp.join(cfg.image, '*.jpg')) +
                                     glob.glob(osp.join(cfg.image, '*.png')))
        self.continuous_id = cfg.continuous_id

    def __len__(self):
        if self.mode == 'train':
            return len(self.ids)
        if self.mode == 'val':
            n = len(self.ids)
            return n if self.cfg.val_num == -1 else min(self.cfg.val_num, n)
        return len(self.image_path)

    def _load_annotated(self, index: int):
        img_id = self.ids[index]
        anns = self.coco.loadAnns(self.coco.getAnnIds(imgIds=img_id))
        anns = [a for a in anns if not a['iscrowd']]
        file_name = self.coco.loadImgs(img_id)[0]['file_name']
        img = cv2.imread(osp.join(self.image_path, file_name))
        assert img is not None, f'Missing image {file_name}'
        h, w = img.shape[:2]

        boxes, masks, labels = [], [], []
        for a in anns:
            x, y, bw, bh = a['bbox']
            if self.mode == 'train' and (x < 0 or y < 0 or bw < 4 or bh < 4):
                continue  # degenerate box (reference coco.py:91-93)
            boxes.append([x, y, x + bw, y + bh])
            masks.append(self.coco.annToMask(a))
            labels.append(self.continuous_id[a['category_id']] - 1)
        if not boxes:
            return img, None, None, None, h, w
        return (img, np.array(boxes, np.float32), np.stack(masks, 0),
                np.array(labels, np.int32), h, w)

    def get_train(self, index: int, rnd: random.Random) -> Optional[dict]:
        img, boxes, masks, labels, _, _ = self._load_annotated(index)
        if boxes is None:
            return None
        out = train_aug(img, masks, boxes, labels, self.cfg.img_size, rnd)
        if out is None:
            return None
        img, masks, boxes, labels = out
        g = boxes.shape[0]
        if g > self.cfg.max_gt:   # static capacity; COCO max ~93 objects
            keep = rnd.sample(range(g), self.cfg.max_gt)
            boxes, masks, labels = boxes[keep], masks[keep], labels[keep]
        proto, seg = downsample_mask_pyramid(masks, self.cfg.img_size)
        return dict(image=img, boxes=boxes, labels=labels,
                    masks_proto=proto, masks_seg=seg)

    def get_val(self, index: int) -> dict:
        img, boxes, masks, labels, h, w = self._load_annotated(index)
        if boxes is None:
            raise RuntimeError('No valid object in this image.')
        normed = val_aug(img, self.cfg.img_size)
        boxes = boxes / np.array([w, h, w, h], np.float32)
        return dict(image=normed, boxes=boxes, labels=labels, masks=masks,
                    height=h, width=w, image_id=self.ids[index])

    def get_detect(self, index: int) -> dict:
        name = self.image_path[index]
        img = cv2.imread(name)
        return dict(image=val_aug(img, self.cfg.img_size), origin=img,
                    name=osp.basename(name))


def assemble_train_batch(samples: List[dict], cfg: Config) -> Dict[str, np.ndarray]:
    """Pad per-sample gt to [B, max_gt, ...] with a validity mask. `samples`
    may contain None entries (failed augs); they are replaced by repeating
    valid samples, like the reference collate (coco.py:14-28)."""
    valid = [s for s in samples if s is not None]
    assert valid, 'Entire batch failed augmentation.'
    for i in range(len(samples) - len(valid)):
        valid.append(valid[i % len(valid)])
    b, g, s = len(valid), cfg.max_gt, cfg.img_size

    # masks ship as uint8 (binarized anyway) — 4x less host->device traffic;
    # the loss casts them on device.
    batch = dict(
        image=np.stack([v['image'] for v in valid]).astype(np.float32),
        boxes=np.zeros((b, g, 4), np.float32),
        labels=np.zeros((b, g), np.int32),
        valid=np.zeros((b, g), bool),
        masks_proto=np.zeros((b, g, s // 4, s // 4), np.uint8),
        masks_seg=np.zeros((b, g, s // 8, s // 8), np.uint8),
    )
    for i, v in enumerate(valid):
        n = v['boxes'].shape[0]
        batch['boxes'][i, :n] = v['boxes']
        batch['labels'][i, :n] = v['labels']
        batch['valid'][i, :n] = True
        batch['masks_proto'][i, :n] = v['masks_proto']
        batch['masks_seg'][i, :n] = v['masks_seg']
    return batch


# --- loader worker-process globals (spawn initializer) -----------------------
_worker_ds: Optional[COCODetection] = None
_worker_cfg: Optional[Config] = None


def _pool_init(cfg: Config):
    global _worker_ds, _worker_cfg
    _worker_cfg = cfg
    _worker_ds = COCODetection(cfg, mode='train')


def _pool_build(args):
    indices, seed_key = args
    rnd = random.Random(seed_key)
    samples = [_worker_ds.get_train(int(i), rnd) for i in indices]
    return assemble_train_batch(samples, _worker_cfg)


class TrainLoader:
    """Sharded, shuffled, prefetching train-batch iterator.

    `batch_size` is the GLOBAL batch size; each process builds and yields
    only its `batch_size / process_count` rows per step (the multi-host
    shard_batch contract — jax.make_array_from_process_local_data assembles
    the global array from per-process rows). Per epoch: indices are
    shuffled with a shared seed, sharded process_index::process_count and
    truncated to the common length so every process yields the same number
    of batches (DistributedSampler analog, reference train.py:77,98-100),
    then built by a worker pool feeding a bounded in-flight window so
    augmentation overlaps device compute. `backend='process'` (default for
    num_workers > 1) uses spawned worker processes — cv2/numpy augmentation
    is GIL-bound under threads (the reference's DataLoader workers are
    processes for the same reason); `backend='thread'` keeps everything
    in-process for tests.
    """

    def __init__(self, dataset: COCODetection, cfg: Config,
                 batch_size: int, num_workers: int = 8, seed: int = 0,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 8, backend: Optional[str] = None):
        if batch_size % process_count:
            raise ValueError(f'global batch size {batch_size} must divide '
                             f'over {process_count} processes')
        self.ds = dataset
        self.cfg = cfg
        self.bs = batch_size // process_count     # per-process rows
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.pidx, self.pcount = process_index, process_count
        self.prefetch = prefetch
        self.epoch = 0
        self.backend = backend or ('process' if self.num_workers > 1 else 'thread')
        self._pool = None

    def _epoch_indices(self) -> np.ndarray:
        rng = np.random.RandomState(self.seed + self.epoch)
        idx = rng.permutation(len(self.ds))
        # common per-process length so every process agrees on batch count
        per_proc = len(idx) // self.pcount
        idx = idx[self.pidx::self.pcount][:per_proc]
        n_batches = len(idx) // self.bs
        return idx[: n_batches * self.bs].reshape(n_batches, self.bs)

    def _get_pool(self):
        if self._pool is None:
            if self.backend == 'process':
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor
                self._pool = ProcessPoolExecutor(
                    self.num_workers, mp_context=mp.get_context('spawn'),
                    initializer=_pool_init, initargs=(self.cfg,))
            else:
                from concurrent.futures import ThreadPoolExecutor
                self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def _submit(self, pool, batch_indices, seed_key):
        if self.backend == 'process':
            return pool.submit(_pool_build, (batch_indices, seed_key))

        def build():
            rnd = random.Random(seed_key)
            samples = [self.ds.get_train(int(i), rnd) for i in batch_indices]
            return assemble_train_batch(samples, self.cfg)
        return pool.submit(build)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from collections import deque
        self.epoch += 1
        plan = self._epoch_indices()
        pool = self._get_pool()
        window = self.num_workers + self.prefetch
        pending = deque(
            self._submit(pool, batch_indices, f'{self.seed}-{self.epoch}-{bi}')
            for bi, batch_indices in enumerate(plan[:window]))
        for bi in range(len(plan)):
            batch = pending.popleft().result()
            nxt = bi + window
            if nxt < len(plan):
                pending.append(self._submit(pool, plan[nxt],
                                            f'{self.seed}-{self.epoch}-{nxt}'))
            yield batch

    def close(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __len__(self):
        return len(self._epoch_indices())
