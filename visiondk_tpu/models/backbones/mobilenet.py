"""MobileNetV3 (large/small) — the mobile rows of the reference's recommended
backbone list (configs/classification/pet.yaml:19:
timm-tf_mobilenetv3_large_minimal_100).

NHWC, inverted residual blocks with optional squeeze-excite and hard-swish.
``unpooled=True`` + ``num_classes=0`` returns the final [B, H, W, C] feature
map (TimmWrapper feature-mode semantics, timm_wrapper.py:16-21).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES

Array = jax.Array


def hard_sigmoid(x: Array) -> Array:
    return jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def hard_swish(x: Array) -> Array:
    return x * hard_sigmoid(x)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SEBlock(nn.Module):
    """Squeeze-excite. MobileNetV3 flavor by default (relu + hard-sigmoid
    gate); EfficientNetV2 passes silu + sigmoid (timm parity — the gate
    choice changes converted-checkpoint outputs, not just training)."""

    reduce_ch: int
    act: Any = None  # default nn.relu
    gate: Any = None  # default hard_sigmoid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = self.act or nn.relu
        gate = self.gate or hard_sigmoid
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(self.reduce_ch, dtype=self.dtype, name="fc1")(s)
        s = act(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = gate(s.astype(jnp.float32)).astype(x.dtype)
        return x * s[:, None, None, :]


class InvertedResidual(nn.Module):
    exp_ch: int
    out_ch: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype, name=name
        )
        act = hard_swish if self.use_hs else nn.relu
        in_ch = x.shape[-1]
        y = x
        if self.exp_ch != in_ch:
            y = nn.Conv(self.exp_ch, (1, 1), use_bias=False, dtype=self.dtype, name="expand")(y)
            y = act(norm("bn_expand")(y))
        y = nn.Conv(
            self.exp_ch,
            (self.kernel, self.kernel),
            (self.stride, self.stride),
            padding=self.kernel // 2,
            feature_group_count=self.exp_ch,
            use_bias=False,
            dtype=self.dtype,
            name="dw",
        )(y)
        y = act(norm("bn_dw")(y))
        if self.use_se:
            y = SEBlock(_make_divisible(self.exp_ch // 4), dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="project")(y)
        y = norm("bn_project")(y)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


# (kernel, exp, out, SE, HS, stride) per block — MobileNetV3 paper tables 1/2.
_V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_V3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class MobileNetV3(nn.Module):
    blocks: Tuple = tuple(_V3_LARGE)
    last_exp: int = 960
    width_mult: float = 1.0
    num_classes: int = 1000
    head_width: int = 1280  # post-pool Dense width (timm conv_head)
    unpooled: bool = False
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype, name=name
        )
        w = self.width_mult
        x = x.astype(self.dtype)
        x = nn.Conv(
            _make_divisible(16 * w), (3, 3), (2, 2), padding=1,
            use_bias=False, dtype=self.dtype, name="stem",
        )(x)
        x = hard_swish(norm("stem_bn")(x))
        for i, (k, exp, out, se, hs, s) in enumerate(self.blocks):
            x = InvertedResidual(
                _make_divisible(exp * w), _make_divisible(out * w), k, s, se, hs,
                bn_eval=self.bn_eval, dtype=self.dtype, name=f"stage{i + 1}_block1",
            )(x, train=train)
        x = nn.Conv(
            _make_divisible(self.last_exp * w), (1, 1), use_bias=False,
            dtype=self.dtype, name="head_conv",
        )(x)
        x = hard_swish(norm("head_bn")(x))
        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        feats = nn.Dense(self.head_width, dtype=jnp.float32, name="pre_head")(feats)
        feats = hard_swish(feats)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(feats)


def _mnv3(blocks, last_exp, **defaults):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        cfg = dict(defaults)
        cfg.update(kwargs)
        return MobileNetV3(
            blocks=tuple(blocks), last_exp=last_exp,
            num_classes=num_classes, dtype=dtype, **cfg,
        )

    return factory


BACKBONES.register(_mnv3(_V3_LARGE, 960), name="mobilenetv3_large_100")
# small's conv_head is 576→1024 (MobileNetV3 paper Table 2 / timm head_chs),
# NOT large's 1280 — a 1280 head silently fails pretrained import (non-strict
# merge skips the mismatched pre_head/fc and leaves them at random init)
BACKBONES.register(_mnv3(_V3_SMALL, 576, head_width=1024), name="mobilenetv3_small_100")
BACKBONES.register(_mnv3(_V3_LARGE, 960, width_mult=0.75), name="mobilenetv3_large_075")
