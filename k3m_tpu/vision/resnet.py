"""Flax ResNet-101 (caffe-style, C4 split) with frozen BatchNorm.

Matches the detectron2 `build_resnet_backbone` R101-C4 used by
py-bottom-up-attention (reference README.md:41-60; driven at
data_prepare.py:196-209): conv1 7x7/2 + maxpool, res2 (3 blocks),
res3 (4), res4 (23) as the backbone; res5 (3 blocks, stride 2) is applied
per-RoI as the box head. BN is inference-frozen: y = x * scale + bias with
scale = gamma / sqrt(var + eps), folded at weight-conversion time.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """Inference-only BN: per-channel affine (converter folds running
    stats into scale/bias)."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        # caffe-style: stride lives on the 1x1 conv1 (detectron2
        # stride_in_1x1=True for caffe models)
        out = nn.Conv(self.bottleneck_channels, (1, 1),
                      strides=(self.stride, self.stride), use_bias=False,
                      name="conv1")(x)
        out = FrozenBN(self.bottleneck_channels, name="conv1_bn")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.bottleneck_channels, (3, 3), padding=1,
                      use_bias=False, name="conv2")(out)
        out = FrozenBN(self.bottleneck_channels, name="conv2_bn")(out)
        out = jax.nn.relu(out)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = FrozenBN(self.out_channels, name="conv3_bn")(out)
        if self.has_shortcut:
            sc = nn.Conv(self.out_channels, (1, 1),
                         strides=(self.stride, self.stride), use_bias=False,
                         name="shortcut")(x)
            sc = FrozenBN(self.out_channels, name="shortcut_bn")(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class ResStage(nn.Module):
    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    first_stride: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = Bottleneck(self.out_channels, self.bottleneck_channels,
                           stride=self.first_stride if i == 0 else 1,
                           has_shortcut=(i == 0), name=f"block{i}")(x)
        return x


class ResNet101C4Backbone(nn.Module):
    """conv1 + res2..res4; input NHWC (BGR, mean-subtracted), output stride 16."""

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="stem_conv1")(x)
        x = FrozenBN(64, name="stem_bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResStage(3, 256, 64, 1, name="res2")(x)
        x = ResStage(4, 512, 128, 2, name="res3")(x)
        x = ResStage(23, 1024, 256, 2, name="res4")(x)
        return x


class Res5Head(nn.Module):
    """res5 stage applied to pooled RoI features [N, 14, 14, 1024] ->
    [N, 7, 7, 2048] (first stride 2)."""

    @nn.compact
    def __call__(self, x):
        return ResStage(3, 2048, 512, 2, name="res5")(x)
