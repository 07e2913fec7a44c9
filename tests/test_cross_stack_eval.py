"""Cross-stack eval parity — the honest mAP-parity proxy (BASELINE.md:26-28).

One set of weights is loaded into BOTH stacks (torch reference Yolact ->
convert_state_dict -> our flax Yolact), both evaluate the SAME synthetic val
images, and the resulting box/mask mAP tables must agree:

  * ours: pipeline.Detector + eval.evaluate (jitted forward, fixed-shape
    fast-NMS, host mask tail, vectorized greedy matcher);
  * reference: /root/reference utils/output_utils.nms + after_nms +
    common_utils.prep_metrics + calc_map (torch CPU), driven exactly like
    reference eval.py:38-108.

The custom 4-class config keeps random-init softmax scores (~0.2) above the
0.05 NMS threshold, so the comparison exercises real detections, NMS
survivors, mask assembly, and greedy matching — not just empty tables.
"""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.data.coco import COCODetection
from yolact_minimal_tpu.data.synthetic import generate_dataset
from yolact_minimal_tpu.models.yolact import Yolact
from yolact_minimal_tpu.pipeline import Detector
from yolact_minimal_tpu.utils.weights import convert_state_dict

IMG = 256
# CROSS_STACK_N scales the comparison set for out-of-suite evidence runs
# (e.g. CROSS_STACK_N=100 python -m pytest ... -k trained -s); the standing
# suite stays at 8 to keep CI time bounded.
N_IMAGES = int(os.environ.get('CROSS_STACK_N', 8))

# Stub the reference's unavailable third-party imports (pycocotools,
# terminaltables, the compiled cython_nms) before importing its modules.
# We only exercise fast-NMS and the custom metric path, which touch none
# of the stubbed functionality.
sys.path.insert(0, '/root/reference')


def _install_reference_stubs():
    if 'pycocotools' not in sys.modules:
        sys.modules['pycocotools'] = types.ModuleType('pycocotools')
    if 'terminaltables' not in sys.modules:
        tt = types.ModuleType('terminaltables')

        class AsciiTable:
            def __init__(self, rows):
                self.table = '\n'.join(' | '.join(map(str, r)) for r in rows)

        tt.AsciiTable = AsciiTable
        sys.modules['terminaltables'] = tt
    if 'cython_nms' not in sys.modules:
        cn = types.ModuleType('cython_nms')

        def nms(*a, **k):
            raise RuntimeError('traditional NMS not exercised here')

        cn.nms = nms
        sys.modules['cython_nms'] = cn


@pytest.fixture(scope='module')
def setup(tmp_path_factory):
    _install_reference_stubs()
    import torch
    from modules.yolact import Yolact as RefYolact

    # CROSS_STACK_DATASET points at a checked-in dataset (images/ +
    # annotations.json), e.g. eval1k_dataset/ for the N=1000 evidence run;
    # default generates a fresh synthetic sample
    ds_root = os.environ.get('CROSS_STACK_DATASET')
    if ds_root:
        img_dir = os.path.join(ds_root, 'images')
        ann = os.path.join(ds_root, 'annotations.json')
    else:
        root = tmp_path_factory.mktemp('cross_stack')
        img_dir, ann = generate_dataset(str(root), num_images=N_IMAGES,
                                        img_size=IMG, num_classes=4, seed=7)
    cfg = get_config('res50_custom', mode='val', img_size=IMG,
                     val_imgs=img_dir, val_ann=ann,
                     train_imgs=img_dir, train_ann=ann)

    # reference Yolact picks the backbone from the cfg CLASS NAME
    # (yolact.py:98-106), so build a class literally named 'res50_cross'
    ref_cfg = type('res50_cross', (), {})()
    ref_cfg.mode = 'val'
    ref_cfg.img_size = IMG
    ref_cfg.num_classes = cfg.num_classes
    ref_cfg.aspect_ratios = list(cfg.aspect_ratios)
    ref_cfg.scales = list(cfg.scales)
    ref_cfg.nms_score_thre = cfg.nms_score_thre
    ref_cfg.nms_iou_thre = cfg.nms_iou_thre
    ref_cfg.top_k = cfg.top_k
    ref_cfg.max_detections = cfg.max_detections
    ref_cfg.traditional_nms = False
    torch.manual_seed(3)
    ref_net = RefYolact(ref_cfg)
    ref_net.eval()

    variables = convert_state_dict(
        {k: v.numpy() for k, v in ref_net.state_dict().items()},
        include_semantic=False)
    detector = Detector(cfg, variables)
    return cfg, ref_cfg, ref_net, detector


def _reference_evaluate(ref_cfg, ref_net, cfg, dataset):
    """Reference eval.py:38-108 loop on torch CPU over our val items."""
    import torch
    from utils.common_utils import APDataObject, calc_map, prep_metrics
    from utils.output_utils import after_nms, nms

    iou_thres = [x / 100 for x in range(50, 100, 5)]
    ap_data = {kind: [[APDataObject() for _ in cfg.class_names]
                      for _ in iou_thres] for kind in ('box', 'mask')}
    for i in range(len(dataset)):
        item = dataset.get_val(i)
        img = torch.tensor(np.transpose(item['image'], (2, 0, 1))[None])
        with torch.no_grad():
            class_p, box_p, coef_p, proto_p = ref_net(img)
        ids_p, class_p, box_p, coef_p, proto_p = nms(
            class_p, box_p, coef_p, proto_p, ref_net.anchors, ref_cfg)
        ids_p, class_p, boxes_p, masks_p = after_nms(
            ids_p, class_p, box_p, coef_p, proto_p,
            item['height'], item['width'])
        if ids_p is None:
            continue
        ids_p = list(ids_p.cpu().numpy().astype(int))
        class_p = list(class_p.cpu().numpy().astype(float))
        gt = torch.tensor(np.concatenate(
            [item['boxes'], item['labels'][:, None].astype(np.float32)], 1))
        gt_masks = torch.tensor(item['masks'].astype(np.float32))
        prep_metrics(ap_data, ids_p, class_p, boxes_p, masks_p, gt, gt_masks,
                     item['height'], item['width'], iou_thres)
    table, box_row, mask_row = calc_map(ap_data, iou_thres,
                                        len(cfg.class_names), step=None)
    return box_row, mask_row


def test_cross_stack_map_parity_random_init(setup):
    """Random-init weights: both stacks must march through real detections
    (custom-class softmax ~0.2 > 0.05 threshold) and land on the same table.
    At random init nothing overlaps gt at IoU>=0.5, so the tables are ~0 —
    the trained-checkpoint test below is the non-vacuous companion."""
    cfg, ref_cfg, ref_net, detector = setup
    from eval import evaluate

    _, our_box, our_mask = evaluate(detector, cfg, max_images=N_IMAGES)
    ref_box, ref_mask = _reference_evaluate(
        ref_cfg, ref_net, cfg, COCODetection(cfg, mode='val'))

    print(f'\ncross-stack mAP (random init)  ours box/mask: '
          f'{our_box[1]}/{our_mask[1]}  reference box/mask: '
          f'{ref_box[1]}/{ref_mask[1]}')
    assert abs(our_box[1] - ref_box[1]) <= 0.2, (our_box, ref_box)
    assert abs(our_mask[1] - ref_mask[1]) <= 0.2, (our_mask, ref_mask)


def test_reverse_converter_roundtrip(setup):
    """our variables -> to_torch_state_dict -> convert_state_dict must be the
    identity (validates the reverse key/layout mapping leaf by leaf)."""
    import jax
    from yolact_minimal_tpu.utils.weights import to_torch_state_dict

    cfg, ref_cfg, ref_net, detector = setup
    variables = jax.device_get(detector.variables)
    back = convert_state_dict(to_torch_state_dict(variables),
                              include_semantic=False)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(
        {'params': back['params'],
         'batch_stats': back.get('batch_stats', {})})[0]
    assert len(flat_a) == len(flat_b) and len(flat_a) > 100
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


def test_cross_stack_map_parity_trained(setup, tmp_path_factory):
    """The north-star proxy (BASELINE.md:26-28): ONE trained checkpoint,
    loaded into both stacks via the reverse converter, evaluated by both
    eval stacks on the same images — box & mask mAP within 0.2, non-zero.

    Uses the fixture-trained res50_custom checkpoint produced by the verify
    recipe (tools/make_custom_dataset.py + train.py); skips if absent."""
    import glob as _glob

    import torch

    from modules.yolact import Yolact as RefYolact
    from yolact_minimal_tpu.utils.checkpoint import load_weights_auto
    from yolact_minimal_tpu.utils.weights import to_torch_state_dict

    ckpts = sorted(_glob.glob('weights/best_*_res50_custom_*.ckpt'))
    if not ckpts:
        pytest.skip('no trained res50_custom checkpoint (run the verify '
                    'recipe first)')
    cfg, ref_cfg, _, _ = setup
    variables = load_weights_auto(ckpts[-1], include_semantic=False)
    detector = Detector(cfg, variables)

    sd = to_torch_state_dict(variables)
    ref_net = RefYolact(ref_cfg)
    missing, unexpected = ref_net.load_state_dict(
        {k: torch.tensor(np.array(v)) for k, v in sd.items()}, strict=False)
    # only BN bookkeeping and the train-only semantic head may be absent
    assert all('num_batches_tracked' in k or 'semantic_seg_conv' in k
               for k in missing), missing
    assert not unexpected, unexpected
    ref_net.eval()

    from eval import evaluate
    _, our_box, our_mask = evaluate(detector, cfg, max_images=N_IMAGES)
    ref_box, ref_mask = _reference_evaluate(
        ref_cfg, ref_net, cfg, COCODetection(cfg, mode='val'))

    print(f'\ncross-stack mAP (trained)  ours box/mask: '
          f'{our_box[1]}/{our_mask[1]}  reference box/mask: '
          f'{ref_box[1]}/{ref_mask[1]}')
    assert our_box[1] > 5 and ref_box[1] > 5, 'trained model scored ~0'
    assert abs(our_box[1] - ref_box[1]) <= 0.2, (our_box, ref_box)
    assert abs(our_mask[1] - ref_mask[1]) <= 0.2, (our_mask, ref_mask)
