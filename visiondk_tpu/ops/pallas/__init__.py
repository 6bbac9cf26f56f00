from visiondk_tpu.ops.pallas._interpret import force_interpret, interpret_forced
from visiondk_tpu.ops.pallas.attention import fused_qkv_attention, vision_attention

__all__ = ["fused_qkv_attention", "vision_attention", "force_interpret", "interpret_forced"]
