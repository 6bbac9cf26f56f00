from visiondk_tpu.ops import margin_heads, retrieval

__all__ = ["margin_heads", "retrieval"]
