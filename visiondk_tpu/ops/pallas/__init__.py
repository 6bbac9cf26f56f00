from visiondk_tpu.ops.pallas.attention import fused_qkv_attention, vision_attention

__all__ = ["fused_qkv_attention", "vision_attention"]
