"""YOLACT model assembly: backbone + FPN + ProtoNet + shared head.

TPU-native rebuild of /root/reference/modules/yolact.py. NHWC throughout;
the eval forward is one fixed-shape jittable graph returning dense
per-anchor predictions (softmax class scores, box offsets, mask coefs) plus
the prototype map; the train forward additionally returns the semantic-seg
logits. Losses live in ops/losses.py (pure functions over these outputs),
keeping the module tree purely structural.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn

# Reference inits every conv with Xavier-uniform + zero bias (yolact.py:120-125).
_conv_init = nn.initializers.xavier_uniform()
import jax
import jax.numpy as jnp

from yolact_minimal_tpu.config import Config
from yolact_minimal_tpu.models.resnet import ResNet
from yolact_minimal_tpu.ops.resize import resize_bilinear

COEF_DIM = 32


class FPN(nn.Module):
    """3 lateral 1x1 convs + top-down 2x bilinear + 3x3 pred convs -> P3..P5,
    then two stride-2 convs -> P6, P7; 256 channels everywhere
    (reference yolact.py:56-89)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5):
        lat = lambda name: nn.Conv(256, (1, 1), kernel_init=_conv_init, dtype=self.dtype, name=name)
        pred = lambda name: nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), kernel_init=_conv_init,
                                    dtype=self.dtype, name=name)
        down = lambda name: nn.Conv(256, (3, 3), strides=(2, 2), kernel_init=_conv_init,
                                    padding=((1, 1), (1, 1)), dtype=self.dtype, name=name)

        p5_1 = lat('lat5')(c5)
        p4_1 = lat('lat4')(c4) + resize_bilinear(
            p5_1, c4.shape[-3], c4.shape[-2], align_corners=False)
        p3_1 = lat('lat3')(c3) + resize_bilinear(
            p4_1, c3.shape[-3], c3.shape[-2], align_corners=False)

        p3 = nn.relu(pred('pred3')(p3_1))
        p4 = nn.relu(pred('pred4')(p4_1))
        p5 = nn.relu(pred('pred5')(p5_1))
        p6 = nn.relu(down('down6')(p5))
        p7 = nn.relu(down('down7')(p6))
        return p3, p4, p5, p6, p7


class ProtoNet(nn.Module):
    """3x(3x3 conv+ReLU) -> 2x bilinear (align_corners=True) -> 3x3 conv+ReLU
    -> 1x1 conv to COEF_DIM prototypes + ReLU, on P3
    (reference yolact.py:34-53)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c3 = lambda name: nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                                  kernel_init=_conv_init, dtype=self.dtype, name=name)
        for i in range(3):
            x = nn.relu(c3(f'proto1_{i}')(x))
        x = resize_bilinear(x, x.shape[-3] * 2, x.shape[-2] * 2, align_corners=True)
        x = nn.relu(c3('proto2_0')(x))
        x = nn.relu(nn.Conv(COEF_DIM, (1, 1), kernel_init=_conv_init, dtype=self.dtype, name='proto2_1')(x))
        return x


class PredictionHead(nn.Module):
    """Single head shared across all 5 FPN levels: upfeature conv, then three
    parallel 3x3 convs -> box (ARx4), conf (ARxC), coef (ARx32, tanh)
    (reference yolact.py:12-31)."""
    num_classes: int
    num_ratios: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                                       kernel_init=_conv_init, dtype=self.dtype, name=name)
        b = x.shape[0]
        x = nn.relu(conv(256, 'upfeature')(x))
        conf = conv(self.num_ratios * self.num_classes, 'conf_layer')(x)
        box = conv(self.num_ratios * 4, 'bbox_layer')(x)
        coef = jnp.tanh(conv(self.num_ratios * COEF_DIM, 'coef_layer')(x))
        # NHWC reshape: anchors iterate rows, cols, ratios — matching the
        # anchor generator's (j, i, ar) order (ops/boxes.py make_anchors).
        return (conf.reshape(b, -1, self.num_classes),
                box.reshape(b, -1, 4),
                coef.reshape(b, -1, COEF_DIM))


BACKBONE_FPN_CHANNELS = {
    'resnet50': (512, 1024, 2048),
    'resnet101': (512, 1024, 2048),
    'swin_tiny': (192, 384, 768),
}


class Yolact(nn.Module):
    """Full model. `train_mode` adds the semantic-seg head (train-only
    auxiliary, reference yolact.py:116-117)."""
    cfg: Config
    train_mode: bool = False

    @nn.compact
    def __call__(self, img, train: bool = False):
        dtype = jnp.bfloat16 if self.cfg.compute_dtype == 'bfloat16' else jnp.float32
        img = img.astype(dtype)

        remat = bool(getattr(self.cfg, 'remat', False))
        if self.cfg.backbone in ('resnet50', 'resnet101'):
            layers = (3, 4, 6, 3) if self.cfg.backbone == 'resnet50' else (3, 4, 23, 3)
            outs = ResNet(layers=layers, dtype=dtype, remat=remat,
                          name='backbone')(img, train=train)
            c3, c4, c5 = outs[1], outs[2], outs[3]
        elif self.cfg.backbone == 'swin_tiny':
            from yolact_minimal_tpu.models.swin import SwinTiny
            fwa = getattr(self.cfg, 'fused_window_attn', 'auto')
            fused = fwa == 'on' or (fwa == 'auto'
                                    and jax.default_backend() != 'cpu')
            outs = SwinTiny(dtype=dtype, remat=remat, fused_attn=fused,
                            name='backbone')(img, train=train)
            c3, c4, c5 = outs[1], outs[2], outs[3]
        else:
            raise ValueError(f'Unknown backbone {self.cfg.backbone!r}')

        p3, p4, p5, p6, p7 = FPN(dtype=dtype, name='fpn')(c3, c4, c5)
        proto = ProtoNet(dtype=dtype, name='proto_net')(p3)   # [B, H/4, W/4, 32]

        head = PredictionHead(num_classes=self.cfg.num_classes,
                              num_ratios=len(self.cfg.aspect_ratios),
                              dtype=dtype, name='prediction_layers')
        confs, boxes, coefs = [], [], []
        for p in (p3, p4, p5, p6, p7):
            conf, box, coef = head(p)
            confs.append(conf)
            boxes.append(box)
            coefs.append(coef)
        class_pred = jnp.concatenate(confs, axis=1).astype(jnp.float32)
        box_pred = jnp.concatenate(boxes, axis=1).astype(jnp.float32)
        coef_pred = jnp.concatenate(coefs, axis=1).astype(jnp.float32)
        proto = proto.astype(jnp.float32)

        if self.train_mode:
            seg_pred = nn.Conv(self.cfg.num_classes - 1, (1, 1), dtype=dtype,
                               kernel_init=_conv_init,
                               name='semantic_seg_conv')(p3).astype(jnp.float32)
            return class_pred, box_pred, coef_pred, proto, seg_pred
        return nn.softmax(class_pred, axis=-1), box_pred, coef_pred, proto


def fpn_shapes(img_size: int) -> Tuple[Tuple[int, int], ...]:
    """Feature-map sizes of P3..P7 (ceil(img/stride), reference yolact.py:112)."""
    return tuple((math.ceil(img_size / s), math.ceil(img_size / s))
                 for s in (8, 16, 32, 64, 128))


def num_anchors(img_size: int, num_ratios: int = 3) -> int:
    return sum(h * w for h, w in fpn_shapes(img_size)) * num_ratios
