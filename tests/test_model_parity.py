"""Forward-pass parity: reference torch Yolact (random init) -> weight
converter -> our flax Yolact must produce identical eval outputs. This
validates conv padding conventions, both bilinear-resize modes, NHWC
reshapes/anchor ordering, and the state_dict key mapping end to end."""
import sys

import numpy as np
import pytest

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
