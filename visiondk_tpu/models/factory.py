"""Model factory: task dispatch + classification / embedding wrappers.

Parity with the reference's ``get_model`` (models/smartmodel.py:5-10),
``VisionWrapper`` (models/classifier/classify_model.py), ``FaceTrainingModel``
(models/faceX/face_model.py:28-54) and ``TimmWrapper``'s projection neck
(models/faceX/backbone/timm_wrapper.py:23-49):

- classification → backbone with an ``num_classes``-way linear head, optional
  attention pooling, backbone/BN freeze handled as optimizer masks
  (functionally equivalent to requires_grad=False);
- face/cbir → backbone in *unpooled* feature mode → norm → flatten →
  Dense(feat_dim) → BatchNorm1d neck → margin head (training) or the raw
  embedding (extraction).

Model names are native zoo names; ``timm-<name>.<tag>`` strings from reference
configs are canonicalized (config/checks.canonical_model_name).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.config.checks import canonical_model_name
from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models.heads import build_head
from visiondk_tpu.models.layers import AttentionPooling

Array = jax.Array


class EmbeddingNeck(nn.Module):
    """TimmWrapper output_layer semantics: norm → flatten → Dense(feat_dim) →
    BatchNorm1d. CNN maps get BatchNorm, token maps get LayerNorm (reference
    timm_wrapper.py:30-46)."""

    feat_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if x.ndim == 4:  # [B, H, W, C] CNN map
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="norm")(x)
        elif x.ndim == 3:  # [B, N, C] token map
            x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        else:
            raise ValueError(f"unexpected feature shape {x.shape}")
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.feat_dim, dtype=self.dtype, name="proj")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=jnp.float32, name="bn_out")(
            x.astype(jnp.float32)
        )
        return x


class VisionModel(nn.Module):
    """Classification model: backbone(num_classes=N) or backbone(0)+attn-pool+fc."""

    backbone_name: str
    num_classes: int
    attention_pool: bool = False
    backbone_kwargs: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.float32

    def setup(self):
        kwargs = dict(self.backbone_kwargs or {})
        if self.attention_pool:
            self.backbone = BACKBONES.create(
                self.backbone_name, num_classes=0, dtype=self.dtype, unpooled=True, **kwargs
            )
            self.pool = AttentionPooling(dtype=self.dtype)
            self.fc = nn.Dense(self.num_classes, dtype=jnp.float32)
        else:
            self.backbone = BACKBONES.create(
                self.backbone_name, num_classes=self.num_classes, dtype=self.dtype, **kwargs
            )

    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.attention_pool:
            fmap = self.backbone(x, train=train)
            if fmap.ndim == 4:  # NHWC → tokens
                b, h, w, c = fmap.shape
                fmap = fmap.reshape(b, h * w, c)
            feats = self.pool(fmap.astype(self.dtype))
            return self.fc(feats.astype(jnp.float32))
        return self.backbone(x, train=train)


class EmbeddingModel(nn.Module):
    """Face/CBIR model: backbone(unpooled) → neck → feat_dim embedding.

    ``__call__(x, labels)`` → (margin logits, aux loss) for training;
    ``embed(x)`` → [B, feat_dim] embeddings for extraction/eval
    (FaceTrainingModel / FeatureExtractor semantics, face_model.py:28-143).
    """

    backbone_name: str
    feat_dim: int
    head_config: Optional[Dict[str, Any]] = None
    backbone_kwargs: Optional[Dict[str, Any]] = None
    # partial-FC: pad the head's class dim to this multiple (masked logits) so
    # odd class counts (58,671 in the reference face recipe) shard evenly
    class_pad_multiple: int = 1
    dtype: Any = jnp.float32

    def setup(self):
        kwargs = dict(self.backbone_kwargs or {})
        self.backbone = BACKBONES.create(
            self.backbone_name, num_classes=0, dtype=self.dtype, unpooled=True, **kwargs
        )
        self.neck = EmbeddingNeck(self.feat_dim, dtype=self.dtype)
        if self.head_config is not None:
            self.head = build_head(self.head_config, self.class_pad_multiple)

    def embed(self, x: Array, train: bool = False) -> Array:
        fmap = self.backbone(x, train=train)
        return self.neck(fmap, train=train)

    def __call__(self, x: Array, labels: Array, train: bool = False) -> Tuple[Array, Array]:
        feats = self.embed(x, train=train)
        return self.head(feats, labels)


def get_model(
    model_cfg: Dict[str, Any], dtype: Any = jnp.float32, class_pad_multiple: int = 1
) -> nn.Module:
    """Task dispatch mirroring models/smartmodel.py:5-10.

    ``class_pad_multiple``: margin-head class-dim padding for partial-FC
    sharding (see models/heads.MarginHead) — the trainer passes a multiple
    that any model-axis size divides."""
    task = model_cfg["task"]
    if task == "classification":
        name = canonical_model_name(model_cfg["name"])
        kwargs = dict(model_cfg.get("kwargs") or {})
        if model_cfg.get("bn_freeze"):
            # reference freeze_bn: BatchNorm always uses running stats
            # (classify_model.py:96-102); affine freeze is an optimizer mask.
            kwargs["bn_eval"] = True
        return VisionModel(
            backbone_name=name,
            num_classes=model_cfg["num_classes"],
            attention_pool=model_cfg.get("attention_pool", False),
            backbone_kwargs=kwargs,
            dtype=dtype,
        )
    if task in ("face", "cbir"):
        (bb_name, bb_params), = model_cfg["backbone"].items()
        bb_params = dict(bb_params or {})
        name = canonical_model_name(bb_name)
        feat_dim = bb_params.get("feat_dim", 128)
        extra = {
            k: v
            for k, v in bb_params.items()
            if k not in ("feat_dim", "image_size", "pretrained")
        }
        return EmbeddingModel(
            backbone_name=name,
            feat_dim=feat_dim,
            head_config=model_cfg.get("head"),
            backbone_kwargs=extra,
            class_pad_multiple=class_pad_multiple,
            dtype=dtype,
        )
    raise ValueError(f"task {task!r} not supported")
