"""Data pipeline tests on a generated synthetic COCO dataset."""
import random

import numpy as np
import pytest

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.data.coco import (COCODetection, TrainLoader,
                                          assemble_train_batch,
                                          downsample_mask_pyramid)
from yolact_minimal_tpu.data.synthetic import generate_dataset

IMG = 256


@pytest.fixture(scope='module')
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth')
    img_dir, ann = generate_dataset(str(root), num_images=8, img_size=320,
                                    num_classes=4, seed=3)
    cfg = get_config('res50_custom', mode='train', img_size=IMG,
                     train_imgs=img_dir, train_ann=ann,
                     val_imgs=img_dir, val_ann=ann)
    return cfg, COCODetection(cfg, mode='train')


def test_train_sample_shapes(dataset):
    cfg, ds = dataset
    rnd = random.Random(0)
    got = None
    for i in range(len(ds)):
        got = ds.get_train(i, rnd)
        if got is not None:
            break
    assert got is not None
    assert got['image'].shape == (IMG, IMG, 3)
    n = got['boxes'].shape[0]
    assert got['labels'].shape == (n,)
    assert got['masks_proto'].shape == (n, IMG // 4, IMG // 4)
    assert got['masks_seg'].shape == (n, IMG // 8, IMG // 8)
    assert np.all(got['boxes'] >= 0) and np.all(got['boxes'] <= 1)
    assert set(np.unique(got['masks_proto'])) <= {0.0, 1.0}


def test_assemble_batch_with_failures(dataset):
    cfg, ds = dataset
    rnd = random.Random(1)
    s = None
    for i in range(len(ds)):
        s = ds.get_train(i, rnd)
        if s is not None:
            break
    batch = assemble_train_batch([s, None, None, s], cfg)
    assert batch['image'].shape == (4, IMG, IMG, 3)
    assert batch['boxes'].shape == (4, cfg.max_gt, 4)
    assert batch['valid'].dtype == bool
    assert batch['valid'][1].sum() > 0  # repaired from a valid sample


def test_train_loader_iterates(dataset):
    cfg, ds = dataset
    loader = TrainLoader(ds, cfg, batch_size=2, num_workers=2, seed=0)
    batches = list(loader)
    assert len(batches) == len(ds) // 2
    for b in batches:
        assert b['image'].shape == (2, IMG, IMG, 3)


def test_loader_sharding(dataset):
    """Two processes see disjoint index shards covering the dataset."""
    cfg, ds = dataset
    l0 = TrainLoader(ds, cfg, batch_size=2, seed=0, process_index=0, process_count=2)
    l1 = TrainLoader(ds, cfg, batch_size=2, seed=0, process_index=1, process_count=2)
    l0.epoch = l1.epoch = 1
    i0 = set(l0._epoch_indices().ravel().tolist())
    i1 = set(l1._epoch_indices().ravel().tolist())
    assert not (i0 & i1)
    assert len(i0) + len(i1) == len(ds)


def test_cv2_downsample_matches_torch_interpolate(rng):
    """Our host-side mask pyramid must equal torch's in-loss
    F.interpolate(bilinear, align_corners=False) + >0.5 binarize."""
    import torch
    import torch.nn.functional as F
    masks = (rng.uniform(size=(3, 256, 256)) > 0.6).astype(np.float32)
    proto, seg = downsample_mask_pyramid(masks, 256)
    t = torch.tensor(masks).unsqueeze(1)
    t_proto = (F.interpolate(t, (64, 64), mode='bilinear',
                             align_corners=False).squeeze(1).numpy() > 0.5)
    t_seg = (F.interpolate(t, (32, 32), mode='bilinear',
                           align_corners=False).squeeze(1).numpy() > 0.5)
    assert (proto == t_proto.astype(np.float32)).mean() > 0.999
    assert (seg == t_seg.astype(np.float32)).mean() > 0.999


def test_val_mode(dataset):
    cfg, _ = dataset
    ds = COCODetection(cfg.replace(mode='val'), mode='val')
    item = ds.get_val(0)
    assert item['image'].shape == (IMG, IMG, 3)
    assert item['height'] == item['width'] == 320
    assert item['boxes'].max() <= 1.0
