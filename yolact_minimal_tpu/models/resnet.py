"""ResNet-50/101 backbone, NHWC, flax.linen.

TPU-native rebuild of the reference backbone (/root/reference/modules/resnet.py):
bottleneck residual stages (3,4,6,3) / (3,4,23,3) returning the C2..C5 pyramid.
All convolutions use explicit torch-style symmetric padding (not XLA 'SAME')
so converted reference checkpoints reproduce activations exactly; layout is
NHWC so XLA tiles convs onto the MXU without transposes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride) -> 1x1(x4) bottleneck with identity/projection
    shortcut (reference resnet.py:5-40). `train` is a module attribute (not a
    call arg) so nn.remat needs no static_argnums plumbing."""
    planes: int
    stride: int = 1
    projection: bool = False
    dtype: jnp.dtype = jnp.float32
    train: bool = False

    @nn.compact
    def __call__(self, x):
        train = self.train
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((p, p), (p, p)), use_bias=False,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        residual = x
        out = conv(self.planes, 1, 1, 0, 'conv1')(x)
        out = nn.relu(bn('bn1')(out))
        out = conv(self.planes, 3, self.stride, 1, 'conv2')(out)
        out = nn.relu(bn('bn2')(out))
        out = conv(self.planes * 4, 1, 1, 0, 'conv3')(out)
        out = bn('bn3')(out)

        if self.projection:
            residual = conv(self.planes * 4, 1, self.stride, 0, 'downsample_conv')(x)
            residual = bn('downsample_bn')(residual)

        return nn.relu(out + residual)


class ResNet(nn.Module):
    """Returns the (C2, C3, C4, C5) feature pyramid, channels
    (256, 512, 1024, 2048) at strides (4, 8, 16, 32).

    `remat` rematerializes each bottleneck block in the backward pass
    (activation memory ~ one block instead of the whole backbone; extra
    forward FLOPs) — enables large-image/large-batch training that
    otherwise exhausts HBM."""
    layers: Sequence[int]          # (3,4,6,3) for R50, (3,4,23,3) for R101
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype, name='conv1')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name='bn1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        outs = []
        in_planes = 64
        for stage, blocks in enumerate(self.layers):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = block_cls(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    projection=(b == 0 and (stride != 1 or in_planes != planes * 4)),
                    dtype=self.dtype, train=train,
                    name=f'layer{stage}_{b}')(x)
            in_planes = planes * 4
            outs.append(x)
        return tuple(outs)
