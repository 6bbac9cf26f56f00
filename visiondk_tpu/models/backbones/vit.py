"""Vision Transformer (ViT-S/B/L/H) — the flagship throughput model.

Covers the transformer rows of the reference's recommended backbone list
(configs/classification/pet.yaml:4-12: vit_base_patch16_224,
vit_base_patch8_224, vit_large_patch16_224, vit_huge_patch14, ...).

TPU notes: all shapes static; tokens = (224/16)² + 1 = 197; attention and MLP
run in the configured compute dtype (bf16 default in training) with fp32
softmax accumulation (see layers.Attention). The final features/logits are
fp32.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.layers import Attention, DropPath, Mlp, PatchEmbed

Array = Any


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dropout: float = 0.0
    attn_dropout: float = 0.0
    n_valid: Optional[int] = None  # real tokens when N is sublane-padded
    # timm LayerScale (dinov2: 1e-5): per-channel gammas on both residual
    # branches; None = no LayerScale params (vanilla ViT)
    init_values: Optional[float] = None
    dtype: Any = jnp.float32

    def _ls(self, name: str, y: Array) -> Array:
        if self.init_values is None:
            return y
        gamma = self.param(
            name, nn.initializers.constant(self.init_values), (y.shape[-1],), jnp.float32
        )
        return y * gamma.astype(y.dtype)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(
            self.num_heads,
            attn_drop=self.attn_dropout,
            proj_drop=self.dropout,
            dtype=self.dtype,
            n_valid=self.n_valid,
            name="attn",
        )(y, deterministic=deterministic)
        y = self._ls("ls1", y)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            int(x.shape[-1] * self.mlp_ratio),
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        y = self._ls("ls2", y)
        x = x + DropPath(self.drop_path, name="drop_path2")(y, deterministic=deterministic)
        return x


class VisionTransformer(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    dropout: float = 0.0
    attention_dropout: float = 0.0
    stochastic_depth_prob: float = 0.0
    pool: str = "cls"  # "cls" | "mean" | "map" (learned-query attention pool)
    class_token: bool = True  # False: no CLS (SigLIP-style, pool must be mean/map)
    init_values: Optional[float] = None  # LayerScale init (dinov2: 1e-5)
    unpooled: bool = False  # num_classes=0: return all tokens [B, N+1, C]
    remat: bool = False  # checkpoint each block: ~O(√L) activation memory
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        det = not train
        x = x.astype(self.dtype)
        tokens = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype, name="patch_embed")(x)
        B, N, C = tokens.shape
        if self.class_token:
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, C), jnp.float32)
            cls = jnp.broadcast_to(cls.astype(self.dtype), (B, 1, C))
            tokens = jnp.concatenate([cls, tokens], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, tokens.shape[1], C), jnp.float32
        )
        tokens = tokens + pos.astype(self.dtype)
        tokens = nn.Dropout(self.dropout)(tokens, deterministic=det)

        # Pad the token count to a sublane multiple (197 → 200): with N % 8
        # != 0 every [B,N,C] ↔ [B·N,C] reshape around the matmuls is a real
        # HBM copy on TPU (tiled layouts pad the sublane dim per batch slab).
        # Measured: +2.3% embedding-extraction throughput (2606→2667 im/s,
        # v5e bs128); the full train step is neutral (the isolated-layer win
        # in benchmarks/vit_dissect.py fused-vs-fused200 is hidden behind the
        # bwd/optimizer phases end-to-end). Attention masks the pad keys
        # (n_valid); pad rows never influence valid rows and are cropped
        # before pooling.
        n_tok = tokens.shape[1]
        pad_n = (-n_tok) % 8
        if pad_n:
            tokens = jnp.pad(tokens, ((0, 0), (0, pad_n), (0, 0)))

        block_cls = nn.remat(ViTBlock, static_argnums=(2,)) if self.remat else ViTBlock
        for i in range(self.depth):
            dp = self.stochastic_depth_prob * i / max(self.depth - 1, 1)
            tokens = block_cls(
                self.num_heads,
                self.mlp_ratio,
                drop_path=dp,
                dropout=self.dropout,
                attn_dropout=self.attention_dropout,
                n_valid=n_tok if pad_n else None,
                init_values=self.init_values,
                dtype=self.dtype,
                name=f"block{i}",
            )(tokens, det)

        if pad_n:
            tokens = tokens[:, :n_tok]
        tokens = nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)
        if self.num_classes == 0 and self.unpooled:
            return tokens.astype(jnp.float32)  # [B, N+1, C] token map
        patch_tokens = tokens[:, 1:] if self.class_token else tokens
        if self.pool == "map":
            # timm AttentionPoolLatent layout (siglip import parity)
            from visiondk_tpu.models.layers import AttentionPoolLatent

            feats = AttentionPoolLatent(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, name="attn_pool",
            )(patch_tokens)
        elif self.pool == "mean" or not self.class_token:
            feats = jnp.mean(patch_tokens, axis=1)
        else:
            feats = tokens[:, 0]
        feats = feats.astype(jnp.float32)
        if self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(feats)


def _vit(patch_size, embed_dim, depth, num_heads, **extra):
    def factory(num_classes: int = 1000, dtype=jnp.float32, **kwargs):
        cfg = dict(extra)
        cfg.update(kwargs)
        return VisionTransformer(
            patch_size=patch_size,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            num_classes=num_classes,
            dtype=dtype,
            **cfg,
        )

    return factory


BACKBONES.register(_vit(16, 384, 12, 6), name="vit_small_patch16_224")
BACKBONES.register(_vit(16, 768, 12, 12), name="vit_base_patch16_224")
BACKBONES.register(_vit(8, 768, 12, 12), name="vit_base_patch8_224")
BACKBONES.register(_vit(16, 1024, 24, 16), name="vit_large_patch16_224")
BACKBONES.register(_vit(14, 1280, 32, 16), name="vit_huge_patch14_224")
# DINOv2 ViT-L/14 (reference recommended list pet.yaml:12): timm structural
# parity — LayerScale with init_values=1e-5 on both residual branches; the
# pos_embed here is sized from the input, and merge_converted bicubically
# resizes an imported 518px pos_embed grid to the target size.
BACKBONES.register(
    _vit(14, 1024, 24, 16, init_values=1e-5, mlp_ratio=4.0),
    name="vit_large_patch14_dinov2",
)
# SigLIP so400m (pet.yaml:13): no CLS token, learned-query attention pooling
BACKBONES.register(
    _vit(14, 1152, 27, 16, mlp_ratio=4304 / 1152, class_token=False, pool="map"),
    name="vit_so400m_patch14_siglip_224",
)
