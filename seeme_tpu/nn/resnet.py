"""ResNet-50 image backbone (torchvision layout) in flax, NHWC.

Reimplements `EgoHMR/models/resnet.py:60-165` — conv7x7/2 + maxpool + four
bottleneck stages [3,4,6,3] + global average pool -> 2048-d features. Used as
the frozen image encoder of ProHMR-Scene (`prohmr_scene.py:34, 99-100`).
Parameter naming mirrors the torch module tree (layer1.0.conv1 ...) so the
weight converter is a mechanical rename.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(out)
        out = norm("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """(B, H, W, 3) image -> (B, 2048) pooled features."""
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
            planes *= 2

        return jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)


def resnet50() -> ResNet:
    return ResNet(layers=(3, 4, 6, 3))
