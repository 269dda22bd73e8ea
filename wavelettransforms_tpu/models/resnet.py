"""Flax ResNet family matching HuggingFace ``ResNetForImageClassification``.

The reference's only model is HF ResNet-18 on ImageNet
(/root/reference/ResNet/utils.py:6-25 loads it with
AutoModelForImageClassification; /root/reference/ResNet/testing_suite/utils.py:44-111
re-loads it from config.json + model.safetensors).  This module provides the
same architecture family (18/34 basic, 50/101/152 bottleneck) as a flax model
whose parameter tree maps 1:1 onto the HF safetensors layout
(see ``hf_io.py``), so checkpoints pruned by this framework evaluate
identically in either stack.

Layout: NHWC on TPU (channels-last feeds the MXU/VPU lanes); HF torch NCHW
inputs are transposed at the boundary.  BatchNorm runs in inference mode with
loaded running stats by default; training mode maintains batch_stats the flax
way.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class ResNetConfig:
    """Mirror of the HF ResNetConfig fields the architecture depends on."""

    num_channels: int = 3
    embedding_size: int = 64
    hidden_sizes: tuple = (64, 128, 256, 512)
    depths: tuple = (2, 2, 2, 2)
    layer_type: str = "basic"  # 'basic' | 'bottleneck'
    num_labels: int = 1000
    downsample_in_first_stage: bool = False
    downsample_in_bottleneck: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @staticmethod
    def resnet18(num_labels: int = 1000) -> "ResNetConfig":
        return ResNetConfig(num_labels=num_labels)

    @staticmethod
    def resnet34(num_labels: int = 1000) -> "ResNetConfig":
        return ResNetConfig(depths=(3, 4, 6, 3), num_labels=num_labels)

    @staticmethod
    def resnet50(num_labels: int = 1000) -> "ResNetConfig":
        return ResNetConfig(
            depths=(3, 4, 6, 3), hidden_sizes=(256, 512, 1024, 2048),
            layer_type="bottleneck", num_labels=num_labels)

    @staticmethod
    def from_hf_dict(d: dict) -> "ResNetConfig":
        """Build from an HF config.json dict (testing_suite/utils.py:28-41
        equivalent)."""
        return ResNetConfig(
            num_channels=d.get("num_channels", 3),
            embedding_size=d.get("embedding_size", 64),
            hidden_sizes=tuple(d.get("hidden_sizes", (64, 128, 256, 512))),
            depths=tuple(d.get("depths", (2, 2, 2, 2))),
            layer_type=d.get("layer_type", "basic"),
            num_labels=len(d.get("id2label", {})) or d.get("num_labels", 1000),
            downsample_in_first_stage=d.get("downsample_in_first_stage", False),
            downsample_in_bottleneck=d.get("downsample_in_bottleneck", False),
        )


class ConvNorm(nn.Module):
    """HF ResNetConvLayer: conv (no bias, same padding) + BN + optional relu."""

    features: int
    kernel_size: int
    stride: int = 1
    act: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            name="convolution",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=self.bn_eps,
            momentum=self.bn_momentum, name="normalization",
        )(x)
        if self.act:
            x = nn.relu(x)
        return x


class Shortcut(nn.Module):
    features: int
    stride: int
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, name="convolution")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=self.bn_eps,
                         name="normalization")(x)
        return x


class BasicLayer(nn.Module):
    features: int
    stride: int = 1
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_f = x.shape[-1]
        apply_shortcut = in_f != self.features or self.stride != 1
        residual = x
        if apply_shortcut:
            residual = Shortcut(self.features, self.stride, self.bn_eps,
                                name="shortcut")(x, train)
        y = ConvNorm(self.features, 3, self.stride, True, self.bn_eps,
                     name="layer_0")(x, train)
        y = ConvNorm(self.features, 3, 1, False, self.bn_eps,
                     name="layer_1")(y, train)
        return nn.relu(y + residual)


class BottleneckLayer(nn.Module):
    features: int
    stride: int = 1
    reduction: int = 4
    downsample_in_bottleneck: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_f = x.shape[-1]
        apply_shortcut = in_f != self.features or self.stride != 1
        residual = x
        if apply_shortcut:
            residual = Shortcut(self.features, self.stride, self.bn_eps,
                                name="shortcut")(x, train)
        reduces = self.features // self.reduction
        s1 = self.stride if self.downsample_in_bottleneck else 1
        s2 = 1 if self.downsample_in_bottleneck else self.stride
        y = ConvNorm(reduces, 1, s1, True, self.bn_eps, name="layer_0")(x, train)
        y = ConvNorm(reduces, 3, s2, True, self.bn_eps, name="layer_1")(y, train)
        y = ConvNorm(self.features, 1, 1, False, self.bn_eps,
                     name="layer_2")(y, train)
        return nn.relu(y + residual)


class Stage(nn.Module):
    config: ResNetConfig
    features: int
    stride: int
    depth: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        for i in range(self.depth):
            stride = self.stride if i == 0 else 1
            if cfg.layer_type == "bottleneck":
                x = BottleneckLayer(
                    self.features, stride,
                    downsample_in_bottleneck=cfg.downsample_in_bottleneck,
                    bn_eps=cfg.bn_eps, name=f"layer_{i}")(x, train)
            else:
                x = BasicLayer(self.features, stride, cfg.bn_eps,
                               name=f"layer_{i}")(x, train)
        return x


class ResNetBackbone(nn.Module):
    config: ResNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        x = ConvNorm(cfg.embedding_size, 7, 2, True, cfg.bn_eps,
                     name="embedder")(x, train)
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i, (size, depth) in enumerate(zip(cfg.hidden_sizes, cfg.depths)):
            stride = 2 if i > 0 or cfg.downsample_in_first_stage else 1
            x = Stage(cfg, size, stride, depth, name=f"stage_{i}")(x, train)
        return x


class ResNetForImageClassification(nn.Module):
    """Forward-compatible with HF: returns logits (N, num_labels).

    Input: NHWC float images (HF NCHW callers transpose at the boundary).
    """

    config: ResNetConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        x = ResNetBackbone(cfg, name="resnet")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        x = nn.Dense(cfg.num_labels, name="classifier")(x)
        return x


def create_model(config: ResNetConfig | str = "resnet18"):
    if isinstance(config, str):
        config = getattr(ResNetConfig, config)()
    return ResNetForImageClassification(config)
