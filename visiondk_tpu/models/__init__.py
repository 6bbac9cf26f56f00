from visiondk_tpu.models.factory import get_model, VisionModel, EmbeddingModel, EmbeddingNeck
from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.models import heads, ema

__all__ = [
    "get_model",
    "VisionModel",
    "EmbeddingModel",
    "EmbeddingNeck",
    "BACKBONES",
    "heads",
    "ema",
]
