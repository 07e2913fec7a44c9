"""Forward-pass parity: reference torch Yolact (random init) -> weight
converter -> our flax Yolact must produce identical eval outputs. This
validates conv padding conventions, both bilinear-resize modes, NHWC
reshapes/anchor ordering, and the state_dict key mapping end to end."""
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from yolact_minimal_tpu.config import get_config
from yolact_minimal_tpu.models.yolact import Yolact, num_anchors
from yolact_minimal_tpu.utils.weights import convert_state_dict

sys.path.insert(0, '/root/reference')

IMG = 128


def _make_ref_net(name):
    import torch
    from modules.yolact import Yolact as RefYolact

    cls = type(name, (), {})
    cfg = cls()
    cfg.mode = 'val'
    cfg.img_size = IMG
    cfg.num_classes = 81
    cfg.aspect_ratios = [1, 1 / 2, 2]
    cfg.scales = [int(IMG / 544 * s) for s in (24, 48, 96, 192, 384)]
    torch.manual_seed(0)
    net = RefYolact(cfg)
    net.eval()
    return net


@pytest.mark.parametrize('name,our_cfg', [
    ('res50_parity', 'res50_coco'),
    ('swin_tiny_parity', 'swin_tiny_coco'),
])
def test_forward_parity_resnet(rng, name, our_cfg):
    import torch
    ref = _make_ref_net(name)
    state = {k: v.numpy() for k, v in ref.state_dict().items()}

    cfg = get_config(our_cfg, mode='val', img_size=IMG)
    variables = convert_state_dict(state)
    model = Yolact(cfg=cfg, train_mode=False)

    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        t_class, t_box, t_coef, t_proto = ref(torch.tensor(img))

    x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))  # NCHW -> NHWC
    j_class, j_box, j_coef, j_proto = model.apply(
        {'params': variables['params'],
         'batch_stats': variables.get('batch_stats', {})},
        x, train=False)

    a = num_anchors(IMG)
    assert j_class.shape == (1, a, 81)
    np.testing.assert_allclose(np.asarray(j_class), t_class.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_box), t_box.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_coef), t_coef.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_proto), t_proto.numpy(), atol=2e-3)


@pytest.mark.parametrize('name,expected', [
    ('res50_coco', 31.16e6),      # reference README.md:32
    ('res101_coco', 50.15e6),     # README.md:33
    ('swin_tiny_coco', 34.58e6),  # README.md:34
])
def test_param_counts_match_published(name, expected):
    """Eval-mode parameter counts must match the reference's published
    model sizes."""
    import jax
    cfg = get_config(name, mode='val', img_size=IMG)
    model = Yolact(cfg=cfg, train_mode=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables['params']))
    assert abs(n - expected) / expected < 0.02, f'{name}: {n/1e6:.2f}M params'


@pytest.mark.parametrize('backbone,layers', [
    ('resnet50', (3, 4, 6, 3)),
    ('resnet101', (3, 4, 23, 3)),
])
def test_backbone_init_parity(rng, backbone, layers):
    """Pretrained-backbone training init (reference train.py:56 /
    resnet.py:100-104): a reference backbone-only state_dict converted by
    convert_backbone_state_dict and grafted via create_train_state must
    reproduce the torch backbone's C2-C5 activations exactly."""
    import jax
    import torch
    from modules.resnet import ResNet as RefResNet

    from yolact_minimal_tpu.models.resnet import ResNet
    from yolact_minimal_tpu.train_state import create_train_state
    from yolact_minimal_tpu.utils.weights import convert_backbone_state_dict

    torch.manual_seed(1)
    ref = RefResNet(list(layers))
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    bb = convert_backbone_state_dict(sd)

    cfg = get_config(f'res{"50" if layers[2] == 6 else "101"}_coco',
                     mode='train', img_size=IMG, train_bs=8)
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               backbone_variables=bb)

    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        t_outs = ref(torch.tensor(img))

    x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    j_outs = ResNet(layers=layers).apply(
        {'params': state.params['backbone'],
         'batch_stats': state.batch_stats['backbone']}, x, train=False)

    assert len(j_outs) == len(t_outs) == 4
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(j), np.transpose(t.numpy(), (0, 2, 3, 1)), atol=2e-4)


def test_backbone_init_strict_rejects_mismatch(rng):
    """strict (resnet) graft must reject an incomplete backbone weight."""
    import jax
    from yolact_minimal_tpu.train_state import create_train_state

    cfg = get_config('res50_coco', mode='train', img_size=IMG, train_bs=8)
    bad = {'params': {'conv1': {'kernel': np.zeros((7, 7, 3, 64), np.float32)}},
           'batch_stats': {}}
    with pytest.raises(ValueError, match='strict'):
        create_train_state(cfg, jax.random.PRNGKey(0), backbone_variables=bad)


def test_backbone_init_swin(rng):
    """Swin backbone-only checkpoints convert with root-level keys and graft
    leniently (reference swin strict=False, swin_transformer.py:498)."""
    import jax
    import torch
    from modules.swin_transformer import SwinTransformer as RefSwin

    from yolact_minimal_tpu.models.swin import SwinTiny
    from yolact_minimal_tpu.train_state import create_train_state
    from yolact_minimal_tpu.utils.weights import convert_backbone_state_dict

    torch.manual_seed(2)
    ref = RefSwin()
    ref.eval()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    bb = convert_backbone_state_dict(sd)

    cfg = get_config('swin_tiny_coco', mode='train', img_size=IMG, train_bs=8)
    state = create_train_state(cfg, jax.random.PRNGKey(0),
                               backbone_variables=bb)

    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        t_outs = ref(torch.tensor(img))

    x = jnp.asarray(np.transpose(img, (0, 2, 3, 1)))
    j_outs = SwinTiny().apply({'params': state.params['backbone']},
                              x, train=False)
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(j), np.transpose(t.numpy(), (0, 2, 3, 1)), atol=2e-3)
