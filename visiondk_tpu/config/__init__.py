from visiondk_tpu.config.loader import yaml_load, yaml_dump, increment_path, get_imgsz
from visiondk_tpu.config.checks import check

__all__ = ["yaml_load", "yaml_dump", "increment_path", "get_imgsz", "check"]
