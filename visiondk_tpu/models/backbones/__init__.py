"""Backbone registry. Each entry is ``name -> factory(num_classes, dtype, **kwargs)``
returning a flax Module with signature ``apply(vars, x, train=...) -> logits | features``.

``num_classes=0`` puts a backbone in feature mode (returns pooled features),
matching the reference's timm ``num_classes=0, global_pool=''`` usage
(models/faceX/backbone/timm_wrapper.py:16-21).
"""

from visiondk_tpu.registry import Registry

BACKBONES = Registry("backbone")

# Import for registration side effects.
from visiondk_tpu.models.backbones import (  # noqa: E402,F401
    resnet,
    vit,
    convnext,
    swin,
    mobilenet,
    efficientnet,
    swinv2,
)

__all__ = ["BACKBONES"]
