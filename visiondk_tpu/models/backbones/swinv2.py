"""Swin Transformer V2 (T/S/B) — covers the swinv2 rows of the reference's
recommended list (configs/classification/pet.yaml:9-10:
timm-swinv2_base_window8_256, swinv2_large_window12to16_192to256).

V2 changes vs V1 (all implemented):
- post-norm residual blocks (norm after attention/MLP, not before);
- scaled cosine attention: cos(q, k) / τ with a learned per-head temperature
  clamped at log(1/0.01);
- log-spaced continuous relative position bias: a 2-layer MLP over
  log-scaled coordinates instead of a lookup table.

Reuses V1's window partition / shift machinery (swin.py).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.backbones.swin import (
    window_partition,
    window_region_ids,
    window_reverse,
)
from visiondk_tpu.models.layers import DropPath, Mlp

Array = Any


class PatchMergingV2(nn.Module):
    """SwinV2 patch merging: 2x2 concat → Linear(4C→2C) → LayerNorm(2C).
    V2 moved the norm *after* the reduction (V1 normalizes the 4C concat);
    matches timm swin_transformer_v2.PatchMerging for pretrained import."""

    input_resolution: Tuple[int, int]
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        H, W = self.input_resolution
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:  # timm parity: pad odd edges before 2x2 merge
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        Ho, Wo = -(-H // 2), -(-W // 2)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(B, Ho * Wo, 4 * C)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


def log_relative_coords(ws: int) -> np.ndarray:
    """[ws², ws², 2] log-spaced signed relative coordinates (SwinV2 eq. 4)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1).astype(np.float32)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)  # [n, n, 2]
    rel = rel / max(ws - 1, 1) * 8.0
    return np.sign(rel) * np.log2(np.abs(rel) + 1.0) / np.log2(8.0)


class WindowAttentionV2(nn.Module):
    """SwinV2 scaled-cosine window MSA over [B, H, W, C] feature maps.

    TPU fast path: reuses V1's fused Pallas window kernel
    (ops/pallas/window_attention.py) — q/k are L2-normalized per head and the
    learned (traced) logit scale is folded into q *outside* the kernel, so
    the kernel runs with a static scale of 1.0; the continuous-position-bias
    MLP output rides the kernel's bias input unchanged."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    use_fused: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, region_ids: np.ndarray) -> Array:
        B, H, W, C = x.shape
        ws = self.window_size
        N = ws * ws
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)

        logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, np.log(10.0), jnp.float32),
            (h, 1, 1),
        )
        scale = jnp.exp(jnp.minimum(logit_scale, np.log(100.0)))  # [h,1,1] f32

        # continuous log-CPB: MLP(2 → 512 → h) over log relative coords
        rel = jnp.asarray(log_relative_coords(ws))  # [N, N, 2]
        cpb = nn.Dense(512, dtype=jnp.float32, name="cpb_fc1")(rel)
        cpb = nn.relu(cpb)
        cpb = nn.Dense(h, use_bias=False, dtype=jnp.float32, name="cpb_fc2")(cpb)
        bias = 16.0 * jax.nn.sigmoid(jnp.transpose(cpb, (2, 0, 1)))  # [h, N, N] f32
        shifted = bool(region_ids.max() > 0)

        # cosine attention: normalize q/k per head (f32 norms)
        q3 = qkv.reshape(B, H, W, 3, h, hd)

        def _l2n(t):
            n = jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True)
            return t / jnp.maximum(n, 1e-6).astype(t.dtype)

        qn, kn, v = _l2n(q3[..., 0, :, :]), _l2n(q3[..., 1, :, :]), q3[..., 2, :, :]

        from visiondk_tpu.ops.pallas import interpret_forced

        from visiondk_tpu.ops.pallas import window_plan_fits

        fused_ok = (
            self.use_fused
            and isinstance(B, int)
            and H % ws == 0
            and W % ws == 0
            and (jax.default_backend() == "tpu" or interpret_forced())
            # VMEM-feasible plan (wide shapes fall back instead of dying in
            # Mosaic allocation — ops/pallas/window_attention.plan_fits)
            and window_plan_fits(B, H, W, 3 * C, ws, h,
                                 elt_bytes=jnp.dtype(self.dtype).itemsize)
        )
        mesh = None
        if fused_ok and jax.device_count() > 1:
            from visiondk_tpu.parallel.mesh import current_mesh

            mesh = current_mesh()
            n_data = mesh.shape.get("data", 1) if mesh is not None else 1
            if mesh is None or B % n_data != 0:
                fused_ok = False

        if fused_ok:
            from jax.sharding import PartitionSpec as P

            from visiondk_tpu.ops.pallas import fused_window_attention

            # fold the traced per-head scale into normalized q → static kernel
            qs = (qn.astype(jnp.float32) * scale[:, 0, 0][None, None, None, :, None]).astype(
                self.dtype
            )
            qkv2 = jnp.stack([qs, kn, v], axis=3).reshape(B, H, W, 3 * C)
            ids_arr = jnp.asarray(region_ids) if shifted else None
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                if shifted:
                    kernel = jax.shard_map(
                        lambda q_, b_, i_: fused_window_attention(q_, b_, i_, h, 1.0),
                        mesh=mesh,
                        in_specs=(P("data"), P(), P()),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                    out = kernel(qkv2, bias, ids_arr)
                else:
                    kernel = jax.shard_map(
                        lambda q_, b_: fused_window_attention(q_, b_, None, h, 1.0),
                        mesh=mesh,
                        in_specs=(P("data"), P()),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                    out = kernel(qkv2, bias)
            else:
                out = fused_window_attention(qkv2, bias, ids_arr, h, 1.0)
        else:
            qkv2 = jnp.stack([qn, kn, v], axis=3).reshape(B, H, W, 3 * C)
            windows = window_partition(qkv2, ws).reshape(-1, N, 3 * C)
            Bp = windows.shape[0]
            qn_, kn_, v_ = jnp.moveaxis(windows.reshape(Bp, N, 3, h, hd), 2, 0)
            qn_ = jnp.moveaxis(qn_, 2, 1)  # [B', h, N, hd]
            kn_ = jnp.moveaxis(kn_, 2, 1)
            v_ = jnp.moveaxis(v_, 2, 1)
            attn = jnp.einsum("bhqd,bhkd->bhqk", qn_, kn_, preferred_element_type=jnp.float32)
            attn = attn * scale[None]
            attn = attn + bias[None]
            if shifted:  # SW-MSA
                mask = (
                    (region_ids[:, None, :] != region_ids[:, :, None]).astype(np.float32)
                    * -100.0
                )
                nW = mask.shape[0]
                attn = attn.reshape(Bp // nW, nW, h, N, N) + jnp.asarray(mask)[None, :, None]
                attn = attn.reshape(Bp, h, N, N)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, v_)
            o = jnp.moveaxis(o, 1, 2).reshape(Bp, N, C)
            out = window_reverse(o.reshape(-1, ws, ws, C), ws, H, W)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinV2Block(nn.Module):
    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    window_size: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    use_fused: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        H, W = self.input_resolution
        B, N, C = x.shape
        ws = min(self.window_size, H, W)
        shift = self.shift if ws < min(H, W) else 0

        y = x.reshape(B, H, W, C)
        pad_b, pad_r = (-H) % ws, (-W) % ws  # timm parity: pad to window mult
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        region_ids = window_region_ids(Hp, Wp, ws, shift)
        y = WindowAttentionV2(
            self.dim, self.num_heads, ws, use_fused=self.use_fused,
            dtype=self.dtype, name="attn",
        )(y, region_ids)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :H, :W]
        y = y.reshape(B, N, C)
        # V2 post-norm
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=deterministic)

        y = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(x, deterministic=deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=deterministic)


class SwinTransformerV2(nn.Module):
    image_size: int = 256
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 8
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    stochastic_depth_prob: float = 0.1
    unpooled: bool = False
    remat: bool = False
    use_fused: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        det = not train
        x = x.astype(self.dtype)
        B = x.shape[0]
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        _, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        block_cls = (
            nn.remat(SwinV2Block, static_argnums=(2,)) if self.remat else SwinV2Block
        )
        total = sum(self.depths)
        bidx = 0
        res = (H, W)
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for b in range(depth):
                dp = self.stochastic_depth_prob * bidx / max(total - 1, 1)
                x = block_cls(
                    dim, self.num_heads[stage], res,
                    window_size=self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dp, use_fused=self.use_fused, dtype=self.dtype,
                    name=f"stage{stage}_block{b}",
                )(x, det)
                bidx += 1
            if stage < len(self.depths) - 1:
                x = PatchMergingV2(res, dim, dtype=self.dtype, name=f"merge{stage}")(x)
                res = (-(-res[0] // 2), -(-res[1] // 2))  # ceil: odd edges padded
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)
        feats = jnp.mean(x, axis=1).astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feats)


def _swinv2(embed_dim, depths, num_heads, window_size=8):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        return SwinTransformerV2(
            embed_dim=embed_dim, depths=depths, num_heads=num_heads,
            window_size=window_size, num_classes=num_classes, dtype=dtype, **kwargs,
        )

    return factory


BACKBONES.register(_swinv2(96, (2, 2, 6, 2), (3, 6, 12, 24)), name="swinv2_tiny_window8_256")
BACKBONES.register(_swinv2(96, (2, 2, 18, 2), (3, 6, 12, 24)), name="swinv2_small_window8_256")
BACKBONES.register(_swinv2(128, (2, 2, 18, 2), (4, 8, 16, 32)), name="swinv2_base_window8_256")
BACKBONES.register(
    # reference recommended list pet.yaml:11 (window12to16: fine-tuned window 16)
    _swinv2(192, (2, 2, 18, 2), (6, 12, 24, 48), window_size=16),
    name="swinv2_large_window12to16_192to256",
)
