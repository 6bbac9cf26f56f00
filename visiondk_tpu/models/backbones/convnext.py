"""ConvNeXt (T/S/B/L) — reference recommends convnext_base / convnext_large
(configs/classification/pet.yaml:20-21).

TPU notes: the 7x7 depthwise conv maps to the VPU; the two pointwise convs are
Dense layers (MXU). LayerScale as a learned per-channel gamma.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.layers import DropPath, gelu

Array = Any


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.Conv(
            self.dim,
            (7, 7),
            padding=3,
            feature_group_count=self.dim,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = gelu(y)  # erf in f32 (torch parity), tanh approx in bf16 (speed)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,), jnp.float32
        )
        y = y * gamma.astype(self.dtype)
        return x + DropPath(self.drop_path, name="drop_path")(y, deterministic=deterministic)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    stochastic_depth_prob: float = 0.0
    unpooled: bool = False  # num_classes=0: return the NHWC map
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        det = not train
        x = x.astype(self.dtype)
        # Stem: 4x4 non-overlapping conv + LN.
        x = nn.Conv(self.dims[0], (4, 4), (4, 4), padding="VALID", dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="stem_norm")(x)

        total_blocks = sum(self.depths)
        block_idx = 0
        for stage in range(len(self.depths)):
            if stage > 0:
                x = nn.LayerNorm(dtype=self.dtype, name=f"downsample_norm{stage}")(x)
                x = nn.Conv(
                    self.dims[stage], (2, 2), (2, 2), padding="VALID", dtype=self.dtype,
                    name=f"downsample_conv{stage}",
                )(x)
            for b in range(self.depths[stage]):
                dp = self.stochastic_depth_prob * block_idx / max(total_blocks - 1, 1)
                x = ConvNeXtBlock(
                    self.dims[stage], drop_path=dp, dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, deterministic=det)
                block_idx += 1

        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)  # [B, H, W, C] feature map
        feats = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
        feats = nn.LayerNorm(dtype=jnp.float32, name="head_norm")(feats)
        if self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feats)


def _convnext(depths, dims):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        return ConvNeXt(depths=depths, dims=dims, num_classes=num_classes, dtype=dtype, **kwargs)

    return factory


BACKBONES.register(_convnext((3, 3, 9, 3), (96, 192, 384, 768)), name="convnext_tiny")
BACKBONES.register(_convnext((3, 3, 27, 3), (96, 192, 384, 768)), name="convnext_small")
BACKBONES.register(_convnext((3, 3, 27, 3), (128, 256, 512, 1024)), name="convnext_base")
BACKBONES.register(_convnext((3, 3, 27, 3), (192, 384, 768, 1536)), name="convnext_large")
