"""ResNet family: resnet18/34/50/101/152, wide_resnet, resnext, seresnet,
resnet-d stems.

Covers the CNN rows of the reference's recommended list
(configs/classification/pet.yaml:14-19: wide_resnet101_2, resnet50d,
resnext50_32x4d, legacy_seresnet50). NHWC, BN via flax; under a sharded batch
the BN statistics reduce over the *global* batch inside jit, so multi-device
training gets SyncBN semantics (reference gates this behind
``--sync_bn``, main.py:57-60) for free.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.layers import SqueezeExcite, global_avg_pool

Array = Any


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    use_se: bool = False
    avg_down: bool = False
    bn_eval: bool = False  # freeze_bn: always use running stats (classify_model.py:96-102)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm(name="bn2")(y)
        if self.use_se:
            y = SqueezeExcite(dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            if self.avg_down and self.strides > 1:
                residual = nn.avg_pool(residual, (2, 2), (2, 2))
                residual = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            else:
                residual = nn.Conv(self.filters, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            residual = norm(name="down_bn")(residual)
        return nn.relu(residual + y)


class Bottleneck(nn.Module):
    filters: int  # internal width; output = filters * 4
    strides: int = 1
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    avg_down: bool = False
    bn_eval: bool = False  # freeze_bn: always use running stats (classify_model.py:96-102)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype)
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        out_filters = self.filters * 4
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), (self.strides, self.strides), padding=1, feature_group_count=self.groups, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.use_se:
            y = SqueezeExcite(dtype=self.dtype, name="se")(y)
        if residual.shape != y.shape:
            if self.avg_down and self.strides > 1:
                residual = nn.avg_pool(residual, (2, 2), (2, 2))
                residual = nn.Conv(out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            else:
                residual = nn.Conv(out_filters, (1, 1), (self.strides, self.strides), use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            residual = norm(name="down_bn")(residual)
        return nn.relu(residual + y)


class SplitAttnConv(nn.Module):
    """ResNeSt split-attention 3×3 conv (radix-major channel blocks, matching
    timm's SplAtConv2d layout so converted torch weights line up)."""

    width: int            # output channels
    radix: int = 2
    cardinality: int = 1
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype)
        w, r, card = self.width, self.radix, self.cardinality
        y = nn.Conv(
            w * r, (3, 3), padding=1, feature_group_count=card * r,
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        y = nn.relu(norm(name="bn0")(y))
        B, H, W, _ = y.shape
        ys = y.reshape(B, H, W, r, w)                      # radix-major splits
        gap = jnp.mean(jnp.sum(ys, axis=3), axis=(1, 2))    # [B, w]
        inter = max(w * r // 4, 32)
        a = nn.Conv(inter, (1, 1), feature_group_count=card, dtype=self.dtype, name="fc1")(
            gap[:, None, None, :]
        )
        a = nn.relu(norm(name="bn1")(a))
        a = nn.Conv(w * r, (1, 1), feature_group_count=card, dtype=self.dtype, name="fc2")(a)
        # rSoftMax: softmax over the radix axis per cardinal group, flattened
        # back radix-major (torch: view(B,card,r,-1).transpose(1,2).softmax(1))
        a = a.reshape(B, card, r, w // card)
        a = jnp.transpose(a, (0, 2, 1, 3))                  # [B, r, card, w/card]
        a = jax.nn.softmax(a.astype(jnp.float32), axis=1).astype(self.dtype)
        a = a.reshape(B, r, w)
        return jnp.sum(ys * a[:, None, None, :, :], axis=3)  # [B, H, W, w]


class ResNestBottleneck(nn.Module):
    """ResNeSt bottleneck: 1×1 → split-attention 3×3 (stride via a preceding
    3×3 avg pool, timm's avd_first) → 1×1, avg-down shortcut."""

    filters: int
    strides: int = 1
    radix: int = 2
    cardinality: int = 1
    base_width: int = 64
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype)
        width = int(self.filters * (self.base_width / 64.0)) * self.cardinality
        out_filters = self.filters * 4
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm(name="bn1")(y))
        if self.strides > 1:  # avd_first: pool before the split-attn conv
            y = nn.avg_pool(y, (3, 3), (self.strides, self.strides), padding=((1, 1), (1, 1)))
        y = SplitAttnConv(
            width, radix=self.radix, cardinality=self.cardinality,
            bn_eval=self.bn_eval, dtype=self.dtype, name="conv2",
        )(y, train=train)
        y = nn.Conv(out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm(name="bn3")(y)
        if residual.shape != y.shape:
            if self.strides > 1:
                residual = nn.avg_pool(residual, (2, 2), (2, 2))
            residual = nn.Conv(out_filters, (1, 1), use_bias=False, dtype=self.dtype, name="down_conv")(residual)
            residual = norm(name="down_bn")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: str = "bottleneck"  # "basic" | "bottleneck" | "resnest"
    num_classes: int = 1000
    groups: int = 1
    base_width: int = 64
    radix: int = 2           # resnest only
    use_se: bool = False
    deep_stem: bool = False  # resnet-d: 3x 3x3 stem convs
    avg_down: bool = False   # resnet-d: avgpool in downsample path
    unpooled: bool = False   # num_classes=0: return the NHWC map instead of pooled feats
    bn_eval: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        norm = partial(nn.BatchNorm, use_running_average=(not train) or self.bn_eval, momentum=0.9, dtype=self.dtype)
        x = x.astype(self.dtype)
        if self.deep_stem:
            x = nn.Conv(32, (3, 3), (2, 2), padding=1, use_bias=False, dtype=self.dtype, name="stem_conv1")(x)
            x = nn.relu(norm(name="stem_bn1")(x))
            x = nn.Conv(32, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="stem_conv2")(x)
            x = nn.relu(norm(name="stem_bn2")(x))
            x = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="stem_conv3")(x)
            x = nn.relu(norm(name="stem_bn3")(x))
        else:
            x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, dtype=self.dtype, name="stem_conv")(x)
            x = nn.relu(norm(name="stem_bn")(x))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))

        block_cls = {
            "basic": BasicBlock, "bottleneck": Bottleneck, "resnest": ResNestBottleneck
        }[self.block]
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                kwargs = dict(
                    filters=64 * 2**stage,
                    strides=strides,
                    bn_eval=self.bn_eval,
                    dtype=self.dtype,
                )
                if self.block == "resnest":
                    kwargs.update(
                        radix=self.radix, cardinality=self.groups, base_width=self.base_width
                    )
                else:
                    kwargs.update(use_se=self.use_se, avg_down=self.avg_down)
                    if self.block == "bottleneck":
                        kwargs.update(groups=self.groups, base_width=self.base_width)
                x = block_cls(**kwargs, name=f"stage{stage + 1}_block{b + 1}")(x, train=train)

        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)  # [B, H, W, C] feature map
        feats = global_avg_pool(x).astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(feats)


def _resnet(stage_sizes, block, **defaults):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        cfg = dict(defaults)
        cfg.update(kwargs)
        return ResNet(stage_sizes=stage_sizes, block=block, num_classes=num_classes, dtype=dtype, **cfg)

    return factory


BACKBONES.register(_resnet([2, 2, 2, 2], "basic"), name="resnet18")
BACKBONES.register(_resnet([3, 4, 6, 3], "basic"), name="resnet34")
BACKBONES.register(_resnet([3, 4, 6, 3], "bottleneck"), name="resnet50")
BACKBONES.register(_resnet([3, 4, 23, 3], "bottleneck"), name="resnet101")
BACKBONES.register(_resnet([3, 8, 36, 3], "bottleneck"), name="resnet152")
BACKBONES.register(
    _resnet([3, 4, 6, 3], "bottleneck", deep_stem=True, avg_down=True), name="resnet50d"
)
BACKBONES.register(
    _resnet([3, 4, 23, 3], "bottleneck", base_width=128), name="wide_resnet101_2"
)
BACKBONES.register(
    _resnet([3, 4, 6, 3], "bottleneck", groups=32, base_width=4), name="resnext50_32x4d"
)
BACKBONES.register(
    _resnet([3, 4, 6, 3], "bottleneck", use_se=True), name="legacy_seresnet50"
)
BACKBONES.register(
    # reference recommended list pet.yaml:18: radix 4, cardinality 2, width 40
    _resnet([3, 4, 6, 3], "resnest", radix=4, groups=2, base_width=40, deep_stem=True),
    name="resnest50d_4s2x40d",
)
