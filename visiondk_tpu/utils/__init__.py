from visiondk_tpu.utils.logger import SmartLogger
from visiondk_tpu.utils.meters import AverageMeter
from visiondk_tpu.utils.plots import colorstr

__all__ = ["SmartLogger", "AverageMeter", "colorstr"]
