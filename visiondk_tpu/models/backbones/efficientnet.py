"""EfficientNetV2 (S/M/L) — the efficientnet row of the reference's
recommended list (configs/classification/pet.yaml:22:
timm-tf_efficientnetv2_l).

Fused-MBConv in the early stages (full 3×3 conv — better MXU utilization than
depthwise at high resolution), MBConv with SE later; NHWC, BN+SiLU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.backbones.mobilenet import (
    SEBlock,
    _conv_pad,
    _make_divisible,
)

Array = jax.Array


class FusedMBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int
    bn_eval: bool = False
    tf_same: bool = False
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype, name=name
        )
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(
                mid, (self.kernel, self.kernel), (self.stride, self.stride),
                padding=_conv_pad(self.tf_same, y, self.kernel, self.stride),
                use_bias=False, dtype=self.dtype, name="expand",
            )(y)
            y = nn.silu(norm("bn_expand")(y))
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
            y = norm("bn_project")(y)
        else:
            y = nn.Conv(
                self.out_ch, (self.kernel, self.kernel), (self.stride, self.stride),
                padding=_conv_pad(self.tf_same, y, self.kernel, self.stride),
                use_bias=False, dtype=self.dtype, name="project",
            )(y)
            y = nn.silu(norm("bn_project")(y))
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class MBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int
    stride: int
    bn_eval: bool = False
    tf_same: bool = False
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype, name=name
        )
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(x)
        y = nn.silu(norm("bn_expand")(y))
        y = nn.Conv(
            mid, (self.kernel, self.kernel), (self.stride, self.stride),
            padding=_conv_pad(self.tf_same, y, self.kernel, self.stride),
            feature_group_count=mid,
            use_bias=False, dtype=self.dtype, name="dw",
        )(y)
        y = nn.silu(norm("bn_dw")(y))
        # EfficientNet SE: reduce from the block's INPUT chs (paper: in·0.25),
        # silu act + plain sigmoid gate (timm parity; mnv3's hard_sigmoid
        # would corrupt converted checkpoints)
        y = SEBlock(
            _make_divisible(in_ch // 4), act=nn.silu, gate=jax.nn.sigmoid,
            dtype=self.dtype, name="se",
        )(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = norm("bn_project")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


# (block type, repeats, kernel, stride, expand, out_ch) — EffNetV2 paper table 4-ish.
_V2_S = [
    ("fused", 2, 3, 1, 1, 24),
    ("fused", 4, 3, 2, 4, 48),
    ("fused", 4, 3, 2, 4, 64),
    ("mb", 6, 3, 2, 4, 128),
    ("mb", 9, 3, 1, 6, 160),
    ("mb", 15, 3, 2, 6, 256),
]
_V2_M = [
    ("fused", 3, 3, 1, 1, 24),
    ("fused", 5, 3, 2, 4, 48),
    ("fused", 5, 3, 2, 4, 80),
    ("mb", 7, 3, 2, 4, 160),
    ("mb", 14, 3, 1, 6, 176),
    ("mb", 18, 3, 2, 6, 304),
    ("mb", 5, 3, 1, 6, 512),
]
_V2_L = [
    ("fused", 4, 3, 1, 1, 32),
    ("fused", 7, 3, 2, 4, 64),
    ("fused", 7, 3, 2, 4, 96),
    ("mb", 10, 3, 2, 4, 192),
    ("mb", 19, 3, 1, 6, 224),
    ("mb", 25, 3, 2, 6, 384),
    ("mb", 7, 3, 1, 6, 640),
]


class EfficientNetV2(nn.Module):
    stages: Tuple = tuple(_V2_S)
    stem_ch: int = 24
    head_ch: int = 1280
    num_classes: int = 1000
    unpooled: bool = False
    bn_eval: bool = False
    tf_same: bool = False  # tf_* variants: asymmetric TF-SAME conv padding
    bn_eps: float = 1e-5   # tf_* checkpoints were trained at TF's 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype, name=name
        )
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_ch, (3, 3), (2, 2),
                    padding=_conv_pad(self.tf_same, x, 3, 2), use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = nn.silu(norm("stem_bn")(x))
        for si, (kind, reps, k, s, e, out) in enumerate(self.stages):
            for b in range(reps):
                stride = s if b == 0 else 1
                cls = FusedMBConv if kind == "fused" else MBConv
                x = cls(out, e, k, stride, bn_eval=self.bn_eval,
                        tf_same=self.tf_same, bn_eps=self.bn_eps, dtype=self.dtype,
                        name=f"stage{si + 1}_block{b + 1}")(x, train=train)
        x = nn.Conv(self.head_ch, (1, 1), use_bias=False, dtype=self.dtype, name="head_conv")(x)
        x = nn.silu(norm("head_bn")(x))
        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(feats)


def _effv2(stages, stem_ch, **defaults):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        cfg = dict(defaults)
        cfg.update(kwargs)
        return EfficientNetV2(
            stages=tuple(stages), stem_ch=stem_ch,
            num_classes=num_classes, dtype=dtype, **cfg,
        )

    return factory


BACKBONES.register(_effv2(_V2_S, 24), name="efficientnetv2_s")
BACKBONES.register(_effv2(_V2_M, 24), name="efficientnetv2_m")
BACKBONES.register(_effv2(_V2_L, 32), name="efficientnetv2_l")
# TF-origin checkpoints (reference recommended list, pet.yaml:22:
# timm-tf_efficientnetv2_l.in21k_ft_in1k): TF-SAME padding + BN eps 1e-3.
BACKBONES.register(
    _effv2(_V2_L, 32, tf_same=True, bn_eps=1e-3), name="tf_efficientnetv2_l"
)
BACKBONES.register(
    _effv2(_V2_S, 24, tf_same=True, bn_eps=1e-3), name="tf_efficientnetv2_s"
)
