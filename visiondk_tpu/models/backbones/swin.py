"""Swin Transformer (T/S/B) — the reference's default backbone
(configs/classification/pet.yaml:26: swin_base_patch4_window7_224).

TPU notes: window attention runs as a fused Pallas kernel straight off the
[B, H, W, 3C] QKV projection (ops/pallas/window_attention.py) — window
(de)partition happens in VMEM and scores never touch HBM; the shifted-window
mask is recomputed in-kernel from static region ids; cyclic shift is
``jnp.roll``. XLA einsum fallback retained for CPU/export paths.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.layers import DropPath, Mlp

Array = Any


def window_partition(x: Array, ws: int) -> Array:
    """[B, H, W, C] → [B·nW, ws, ws, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, C)


def window_reverse(windows: Array, ws: int, H: int, W: int) -> Array:
    """[B·nW, ws, ws, C] → [B, H, W, C]."""
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    """Static [ws², ws²] index into the (2ws−1)² relative-bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + np.array([ws - 1, ws - 1])
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def window_region_ids(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Static per-window shift-region ids [nW, ws²]; positions with different
    ids must not attend (SW-MSA). shift=0 → all zeros (W-MSA)."""
    if shift == 0:
        return np.zeros(((H // ws) * (W // ws), ws * ws), np.int32)
    img_mask = np.zeros((1, H, W, 1), np.int32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, H // ws, ws, W // ws, ws, 1)
    return mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws).astype(np.int32)


def shifted_window_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Static additive attention mask [nW, ws², ws²] for SW-MSA."""
    mw = window_region_ids(H, W, ws, shift)
    attn_mask = (mw[:, None, :] != mw[:, :, None]).astype(np.float32) * -100.0
    return attn_mask  # [nW, n, n]


class WindowAttention(nn.Module):
    """Window MSA over [B, H, W, C] feature maps.

    TPU fast path: the fused Pallas window kernel
    (ops/pallas/window_attention.py) consumes the QKV projection's natural
    [B, H, W, 3C] layout — window (de)partition happens inside VMEM, the
    relative-position bias stays kernel-resident, and the [B·nW, h, 49, 49]
    score tensors never touch HBM (measured 51% of the Swin-B step on the
    XLA path, benchmarks/swin_dissect.py). Falls back to the XLA einsum path
    off-TPU, under a multi-device runtime with no published mesh, or for
    indivisible batch/window shapes.
    """

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    use_fused: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, region_ids: np.ndarray) -> Array:
        # x: [B, H, W, C]; region_ids: static [nH·nW, ws²] int (row-major
        # windows; all-zero ⇒ W-MSA, no mask)
        B, H, W, C = x.shape
        ws = self.window_size
        N = ws * ws
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
            jnp.float32,
        )
        idx = relative_position_index(self.window_size)
        bias = jnp.transpose(
            table[idx.reshape(-1)].reshape(N, N, h), (2, 0, 1)
        )  # [h, N, N] f32
        shifted = bool(region_ids.max() > 0)

        from visiondk_tpu.ops.pallas import interpret_forced

        from visiondk_tpu.ops.pallas import window_plan_fits

        fused_ok = (
            self.use_fused
            and isinstance(B, int)  # symbolic batch (jax.export) → XLA path
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
            # a bare pallas custom call inside a sharded jit fails the SPMD
            # partitioner → only run it under an explicit shard_map
            if mesh is None or B % n_data != 0:
                fused_ok = False

        if fused_ok:
            from functools import partial

            from jax.sharding import PartitionSpec as P

            from visiondk_tpu.ops.pallas import fused_window_attention

            ids_arr = jnp.asarray(region_ids) if shifted else None
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                if shifted:
                    kernel = jax.shard_map(
                        lambda q, b, i: fused_window_attention(q, b, i, h),
                        mesh=mesh,
                        in_specs=(P("data"), P(), P()),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                    out = kernel(qkv, bias, ids_arr)
                else:
                    kernel = jax.shard_map(
                        lambda q, b: fused_window_attention(q, b, None, h),
                        mesh=mesh,
                        in_specs=(P("data"), P()),
                        out_specs=P("data"),
                        check_vma=False,
                    )
                    out = kernel(qkv, bias)
            else:
                out = fused_window_attention(qkv, bias, ids_arr, h)
        else:
            windows = window_partition(qkv, ws).reshape(-1, N, 3 * C)  # [B·nW', N, 3C]
            Bp = windows.shape[0]
            q, k, v = jnp.moveaxis(windows.reshape(Bp, N, 3, h, hd), 2, 0)
            q = jnp.moveaxis(q, 2, 1)  # [B', h, N, hd]
            k = jnp.moveaxis(k, 2, 1)
            v = jnp.moveaxis(v, 2, 1)
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q * hd**-0.5, k, preferred_element_type=jnp.float32
            )
            attn = attn + bias[None]
            if shifted:  # SW-MSA mask
                mask = (
                    (region_ids[:, None, :] != region_ids[:, :, None]).astype(np.float32)
                    * -100.0
                )
                nW = mask.shape[0]
                attn = attn.reshape(Bp // nW, nW, h, N, N) + jnp.asarray(mask)[None, :, None]
                attn = attn.reshape(Bp, h, N, N)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            o = jnp.moveaxis(o, 1, 2).reshape(Bp, N, C)
            out = window_reverse(o.reshape(-1, ws, ws, C), ws, H, W)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    input_resolution: Tuple[int, int]
    window_size: int = 7
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

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x).reshape(B, H, W, C)
        # pad H/W to window multiples (timm swin parity: zero-pad bottom/right
        # before windowing, crop after) — enables arbitrary image sizes and
        # progressive resize
        pad_b, pad_r = (-H) % ws, (-W) % ws
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        region_ids = window_region_ids(Hp, Wp, ws, shift)  # static [nH·nW, ws²]
        y = WindowAttention(
            self.dim, self.num_heads, ws, use_fused=self.use_fused,
            dtype=self.dtype, name="attn",
        )(y, region_ids)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :H, :W]
        y = y.reshape(B, N, C)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=deterministic)


class PatchMerging(nn.Module):
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
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    stochastic_depth_prob: float = 0.1
    unpooled: bool = False
    remat: bool = False  # checkpoint each block
    use_fused: bool = True  # fused Pallas window attention on TPU
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

        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if self.remat else SwinBlock
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
                x = PatchMerging(res, dim, dtype=self.dtype, name=f"merge{stage}")(x)
                res = (-(-res[0] // 2), -(-res[1] // 2))  # ceil: odd edges padded
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if self.num_classes == 0 and self.unpooled:
            return x.astype(jnp.float32)  # [B, H/32·W/32, 8·embed_dim]
        feats = jnp.mean(x, axis=1).astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feats)


def _swin(embed_dim, depths, num_heads, window_size=7):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        return SwinTransformer(
            embed_dim=embed_dim, depths=depths, num_heads=num_heads,
            window_size=window_size, num_classes=num_classes, dtype=dtype, **kwargs,
        )

    return factory


BACKBONES.register(_swin(96, (2, 2, 6, 2), (3, 6, 12, 24)), name="swin_tiny_patch4_window7_224")
BACKBONES.register(_swin(96, (2, 2, 18, 2), (3, 6, 12, 24)), name="swin_small_patch4_window7_224")
BACKBONES.register(_swin(128, (2, 2, 18, 2), (4, 8, 16, 32)), name="swin_base_patch4_window7_224")
