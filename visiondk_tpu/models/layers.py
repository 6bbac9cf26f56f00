"""Common building blocks for the JAX model zoo.

NHWC layout throughout (TPU-native: XLA tiles the channel dim onto the
128-lane registers). Params live in fp32; compute dtype is configurable
(bf16 by default in training) so matmuls/convs hit the MXU at full rate.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any


class DropPath(nn.Module):
    """Stochastic depth: drop a residual branch per sample (timm semantics:
    survivors scaled by 1/keep_prob)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: Optional[bool] = None) -> Array:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def gelu(x: Array) -> Array:
    """Dtype-aware GELU: erf-exact in f32 (timm/torch nn.GELU parity for
    converted pretrained weights), tanh approximation in half precision —
    there the two differ by ≤3e-4, below bf16 rounding, and the erf lowering
    measured 8% slower end-to-end on ViT-B/16 train (v5e, 1184→1088 img/s)."""
    return nn.gelu(x, approximate=(x.dtype != jnp.float32))


class Mlp(nn.Module):
    """Transformer MLP: fc → act → drop → fc → drop."""

    hidden_dim: int
    out_dim: Optional[int] = None
    act: Callable = gelu
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention.

    TPU fast path: the fused Pallas kernel consumes the QKV projection's
    natural [B, N, 3C] layout and emits [B, N, C] with the whole
    softmax(QKᵀ)V core VMEM-resident — no [B,H,N,D] transposes, no [N,N]
    HBM materialization. Measured 844 → 1098 img/s on ViT-B/16 train
    (B=128, v5e). Falls back to the XLA einsum path off-TPU or when
    attention dropout is active (the kernel has no RNG)."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    use_fused: bool = True
    # real token count when the caller pads N up to a sublane multiple
    # (vit.py pads 197 → 200 so [B,N,C] ↔ [B·N,C] reshapes are bitcasts);
    # keys ≥ n_valid are masked, pad-row outputs are garbage-but-isolated
    n_valid: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        B, N, C = x.shape
        n_valid = N if self.n_valid is None else self.n_valid
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)

        dropout_active = self.attn_drop > 0.0 and not deterministic
        # A bare pallas_call inside a *sharded* jit fails SPMD partitioning
        # (spmd_partitioner RET_CHECK on the custom call), so under an active
        # multi-device mesh the kernel is wrapped in a shard_map over the
        # batch ('data') axis — the kernel is batch-parallel, so each shard
        # runs it on its local rows and jit keeps the surrounding collectives.
        from visiondk_tpu.ops.pallas import interpret_forced

        fused_ok = (
            self.use_fused
            and not dropout_active
            and head_dim <= 128
            and isinstance(B, int)  # symbolic batch (jax.export) → XLA path
            and (jax.default_backend() == "tpu" or interpret_forced())
        )
        mesh = None
        if fused_ok and jax.device_count() > 1:
            from visiondk_tpu.parallel.mesh import current_mesh

            mesh = current_mesh()
            n_data = mesh.shape.get("data", 1) if mesh is not None else 1
            if mesh is None or B % n_data != 0:
                # no published mesh to shard_map over (or indivisible batch):
                # cannot risk a bare custom call inside a sharded jit
                fused_ok = False

        if fused_ok:
            from functools import partial

            from jax.sharding import PartitionSpec as P

            from visiondk_tpu.ops.pallas import fused_qkv_attention

            kernel = partial(fused_qkv_attention, heads=self.num_heads, n_valid=n_valid)
            if mesh is not None and mesh.shape.get("data", 1) > 1:
                kernel = jax.shard_map(
                    kernel, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                    check_vma=False,
                )
            out = kernel(qkv)
        else:
            q, k, v = jnp.moveaxis(qkv.reshape(B, N, 3, self.num_heads, head_dim), 2, 0)
            q = jnp.moveaxis(q, 2, 1)  # [B, H, N, D]
            k = jnp.moveaxis(k, 2, 1)
            v = jnp.moveaxis(v, 2, 1)
            scale = head_dim**-0.5
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=jnp.float32
            )
            if n_valid < N:  # mask caller-padded key columns
                col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, 3)
                attn = jnp.where(col < n_valid, attn, -1e30)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            out = jnp.moveaxis(out, 1, 2).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class PatchEmbed(nn.Module):
    """Image → patch tokens via a strided conv."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


class SqueezeExcite(nn.Module):
    """SE channel attention (for seresnet/resnest/efficientnet variants)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))  # [B, C]
        s = nn.Dense(max(c // self.reduction, 8), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Dense(c, dtype=self.dtype, name="fc2")(s)
        s = jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)
        return x * s[:, None, None, :]


class AttentionPooling(nn.Module):
    """Learned-query attention pooling over spatial tokens (reference:
    built/attention_based_pooler.py, paper 2112.13692). Aggregates [B, N, C]
    → [B, C] with a single learned CLS query."""

    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        B, N, C = tokens.shape
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, C), jnp.float32)
        probe = jnp.broadcast_to(probe.astype(self.dtype), (B, 1, C))
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(tokens)
        head_dim = C // self.num_heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(probe).reshape(B, 1, self.num_heads, head_dim)
        k = nn.Dense(C, dtype=self.dtype, name="k")(x).reshape(B, N, self.num_heads, head_dim)
        v = nn.Dense(C, dtype=self.dtype, name="v")(x).reshape(B, N, self.num_heads, head_dim)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * head_dim**-0.5, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        return out[:, 0]


class AttentionPoolLatent(nn.Module):
    """timm ``AttentionPoolLatent`` parity (the siglip 'map' pooling head):
    learned latent query, fused kv projection, and a residual MLP after the
    output projection — structurally import-compatible with timm
    vit_so400m_patch14_siglip checkpoints (convert.py maps attn_pool.*).
    Differs from ``AttentionPooling`` (the reference's inert
    built/attention_based_pooler.py design), which normalizes the inputs and
    has separate k/v projections and no MLP."""

    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        B, N, C = tokens.shape
        hd = C // self.num_heads
        latent = self.param(
            "latent", nn.initializers.normal(C**-0.5), (1, 1, C), jnp.float32
        )
        q = nn.Dense(C, dtype=self.dtype, name="q")(
            jnp.broadcast_to(latent.astype(self.dtype), (B, 1, C))
        ).reshape(B, 1, self.num_heads, hd)
        kv = nn.Dense(2 * C, dtype=self.dtype, name="kv")(tokens)
        k, v = jnp.moveaxis(kv.reshape(B, N, 2, self.num_heads, hd), 2, 0)
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q * hd**-0.5, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(out)
        out = out + Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return out[:, 0]


def global_avg_pool(x: Array) -> Array:
    """NHWC feature map → [B, C]."""
    return jnp.mean(x, axis=(1, 2))
