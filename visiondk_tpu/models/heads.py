"""Flax margin-head modules wrapping the fused ops in ops/margin_heads.

Head factory parity with the reference's HeadFactory
(models/faceX/head/head_def.py:7-56): arcface / magface / circleloss /
mv-softmax, constructed from the same config keys.

Partial-FC sharding: the [feat_dim, num_class] weight leaf is named
``weight`` under the head module path; the engine's state-sharding builder
(engine/state.py) maps that leaf to ``PartitionSpec(None, 'model')`` so under
jit the class dim is sharded over the mesh whenever model parallelism is on —
no separate sharded implementation needed.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.ops import margin_heads as ops

Array = jax.Array


def _weight_init(key, shape, dtype=jnp.float32):
    return ops.init_margin_weight(key, *shape).astype(dtype)


class MarginHead(nn.Module):
    """Base: holds the [feat_dim, num_class] weight, class-dim partitioned.

    ``class_pad_multiple``: pad the class dim up to a multiple (default 1 =
    exact). Real-world class counts are rarely divisible by the mesh's model
    axis (the reference's flagship recipe has 58,671 classes —
    configs/faceX/face.yaml:34, an odd number), so partial-FC sharding pads
    the weight columns and masks the pad logits to −1e9 *after* the margin op
    — pad classes get zero softmax mass and zero gradient (their columns stay
    at init), and every head treats them uniformly (mv-softmax would
    otherwise re-weight a pad column as a hard negative). 128 both lane-aligns
    the matmul and divides by any power-of-two model axis, keeping the
    checkpointed weight shape mesh-independent."""

    feat_dim: int
    num_class: int
    class_pad_multiple: int = 1

    @property
    def padded_classes(self) -> int:
        m = self.class_pad_multiple
        return ((self.num_class + m - 1) // m) * m

    def _weight(self) -> Array:
        return self.param("weight", _weight_init, (self.feat_dim, self.padded_classes))

    def _mask_pad(self, out: Tuple[Array, Array]) -> Tuple[Array, Array]:
        logits, aux = out
        if self.padded_classes == self.num_class:
            return logits, aux
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        return jnp.where(col < self.num_class, logits, -1e9), aux


class ArcFaceHead(MarginHead):
    margin_arc: float = 0.35
    margin_am: float = 0.0
    scale: float = 32.0

    @nn.compact
    def __call__(self, feats: Array, labels: Array) -> Tuple[Array, Array]:
        return self._mask_pad(ops.arcface_logits(
            self._weight(), feats, labels,
            margin_arc=self.margin_arc, margin_am=self.margin_am, scale=self.scale,
        ))


class MagFaceHead(MarginHead):
    margin_am: float = 0.0
    scale: float = 32.0
    l_a: float = 10.0
    u_a: float = 110.0
    l_margin: float = 0.45
    u_margin: float = 0.8
    lamda: float = 20.0

    @nn.compact
    def __call__(self, feats: Array, labels: Array) -> Tuple[Array, Array]:
        return self._mask_pad(ops.magface_logits(
            self._weight(), feats, labels,
            margin_am=self.margin_am, scale=self.scale,
            l_a=self.l_a, u_a=self.u_a,
            l_margin=self.l_margin, u_margin=self.u_margin, lamda=self.lamda,
        ))


class CircleLossHead(MarginHead):
    margin: float = 0.25
    gamma: float = 256.0

    @nn.compact
    def __call__(self, feats: Array, labels: Array) -> Tuple[Array, Array]:
        return self._mask_pad(ops.circle_logits(
            self._weight(), feats, labels, margin=self.margin, gamma=self.gamma
        ))


class MVSoftmaxHead(MarginHead):
    is_am: bool = False
    margin: float = 0.35
    mv_weight: float = 1.12
    scale: float = 32.0

    @nn.compact
    def __call__(self, feats: Array, labels: Array) -> Tuple[Array, Array]:
        return self._mask_pad(ops.mv_softmax_logits(
            self._weight(), feats, labels,
            is_am=self.is_am, margin=self.margin,
            mv_weight=self.mv_weight, scale=self.scale,
        ))


def build_head(head_config: dict, class_pad_multiple: int = 1) -> nn.Module:
    """head_config = {head_type: params} — the reference's head_def schema.
    ``class_pad_multiple``: see MarginHead (partial-FC padding)."""
    (head_type, params), = head_config.items()
    params = dict(params or {})
    feat_dim = params.pop("feat_dim")
    num_class = params.pop("num_class")
    params.setdefault("class_pad_multiple", class_pad_multiple)
    if head_type == "arcface":
        return ArcFaceHead(feat_dim, num_class, **params)
    if head_type == "magface":
        return MagFaceHead(feat_dim, num_class, **params)
    if head_type == "circleloss":
        return CircleLossHead(feat_dim, num_class, **params)
    if head_type in ("mv-softmax", "mv_softmax"):
        return MVSoftmaxHead(feat_dim, num_class, **params)
    raise ValueError(
        f"head {head_type!r} not supported (arcface, magface, circleloss, mv-softmax)"
    )
