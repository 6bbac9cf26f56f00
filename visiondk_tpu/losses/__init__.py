from visiondk_tpu.losses.losses import (
    LOSS,
    create_lossfn,
    list_lossfns,
    cross_entropy,
    binary_cross_entropy,
    focal_loss,
    distill_kl,
)

__all__ = [
    "LOSS",
    "create_lossfn",
    "list_lossfns",
    "cross_entropy",
    "binary_cross_entropy",
    "focal_loss",
    "distill_kl",
]
