from visiondk_tpu.data.datasets import (
    ImageDatasets,
    PredictImageDatasets,
    CBIRDatasets,
    read_image,
    smooth_labels,
)
from visiondk_tpu.data.transforms import (
    AUG_METHODS,
    Compose,
    create_aug_transforms,
    extract_normalization,
    set_pipeline_size,
    SPATIAL_TRANSFORMS,
)
from visiondk_tpu.data.loader import DataLoader
from visiondk_tpu.data.dataprocessor import SmartDataProcessor
from visiondk_tpu.data.class_augmenter import ClassWiseAugmenter

__all__ = [
    "ImageDatasets",
    "PredictImageDatasets",
    "CBIRDatasets",
    "read_image",
    "smooth_labels",
    "AUG_METHODS",
    "Compose",
    "create_aug_transforms",
    "extract_normalization",
    "set_pipeline_size",
    "SPATIAL_TRANSFORMS",
    "DataLoader",
    "SmartDataProcessor",
    "ClassWiseAugmenter",
]
