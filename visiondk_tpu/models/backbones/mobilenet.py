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


def tf_same_padding(h: int, w: int, kernel: int, stride: int):
    """TF 'SAME' per-side padding (asymmetric: the extra pixel goes
    bottom/right). timm's tf_* checkpoints were trained with this geometry
    (Conv2dSame); a symmetric k//2 pad shifts every strided conv's
    activations by one pixel (the round-3 reason for refusing tf_ imports —
    now implemented instead, VERDICT round-4 item 4)."""

    def side(n: int) -> Tuple[int, int]:
        out = -(-n // stride)
        total = max((out - 1) * stride + kernel - n, 0)
        return total // 2, total - total // 2

    return (side(h), side(w))


def _conv_pad(tf_same: bool, x: Array, kernel: int, stride: int):
    """Padding arg for a spatial conv: symmetric k//2, or per-side TF-SAME
    computed from the trace-time input size."""
    if not tf_same:
        return kernel // 2
    return tf_same_padding(x.shape[1], x.shape[2], kernel, stride)


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
    tf_same: bool = False
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype, name=name
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
            padding=_conv_pad(self.tf_same, y, self.kernel, self.stride),
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
    tf_same: bool = False    # tf_* variants: asymmetric TF-SAME conv padding
    bn_eps: float = 1e-5     # tf_* checkpoints were trained at TF's 1e-3
    relu_act: bool = False   # 'minimal' variants: relu everywhere (no h-swish)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = lambda name: nn.BatchNorm(
            use_running_average=(not train) or self.bn_eval, momentum=0.9,
            epsilon=self.bn_eps, dtype=self.dtype, name=name
        )
        act = nn.relu if self.relu_act else hard_swish
        w = self.width_mult
        x = x.astype(self.dtype)
        x = nn.Conv(
            _make_divisible(16 * w), (3, 3), (2, 2),
            padding=_conv_pad(self.tf_same, x, 3, 2),
            use_bias=False, dtype=self.dtype, name="stem",
        )(x)
        x = act(norm("stem_bn")(x))
        for i, (k, exp, out, se, hs, s) in enumerate(self.blocks):
            x = InvertedResidual(
                _make_divisible(exp * w), _make_divisible(out * w), k, s, se, hs,
                bn_eval=self.bn_eval, tf_same=self.tf_same, bn_eps=self.bn_eps,
                dtype=self.dtype, name=f"stage{i + 1}_block1",
            )(x, train=train)
        x = nn.Conv(
            _make_divisible(self.last_exp * w), (1, 1), use_bias=False,
            dtype=self.dtype, name="head_conv",
        )(x)
        x = act(norm("head_bn")(x))
        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        feats = nn.Dense(self.head_width, dtype=jnp.float32, name="pre_head")(feats)
        feats = act(feats)
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

# timm's 'minimal' arch: the large table with every depthwise kernel at 3,
# no squeeze-excite, relu everywhere; tf_ prefix = TF-SAME padding + BN eps
# 1e-3 (reference recommended list, configs/classification/pet.yaml:19:
# timm-tf_mobilenetv3_large_minimal_100).
_V3_LARGE_MINIMAL = [
    (3, exp, out, False, False, s) for (_k, exp, out, _se, _hs, s) in _V3_LARGE
]
BACKBONES.register(
    _mnv3(_V3_LARGE_MINIMAL, 960, tf_same=True, bn_eps=1e-3, relu_act=True),
    name="tf_mobilenetv3_large_minimal_100",
)
