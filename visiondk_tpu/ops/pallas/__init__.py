from visiondk_tpu.ops.pallas._interpret import force_interpret, interpret_forced
from visiondk_tpu.ops.pallas.attention import fused_qkv_attention, vision_attention
from visiondk_tpu.ops.pallas.window_attention import (
    fused_window_attention,
    plan_fits as window_plan_fits,
)

__all__ = [
    "fused_qkv_attention",
    "vision_attention",
    "fused_window_attention",
    "window_plan_fits",
    "force_interpret",
    "interpret_forced",
]
