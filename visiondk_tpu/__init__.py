"""visiondk-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision training & retrieval framework.

Capability-parity rebuild of the DORAEMON toolkit (wuji3/visiondk): image
classification (single-label CE / multi-label BCE), metric-learning embedding
training (ArcFace / MagFace / CircleLoss / MV-Softmax heads) for face
recognition and content-based image retrieval, plus the full surrounding
training system (config validation, augmentation registry, EMA, SAM, OHEM,
mixup, progressive resolution, checkpoint/resume, per-class evaluation,
GradCAM, retrieval metrics) — redesigned TPU-first:

- compute path: jitted functional train/eval steps over a ``jax.sharding.Mesh``
  (data-parallel batch sharding + model-parallel margin heads), bf16 matmuls
  on the MXU, Pallas kernels for fused device-side augmentation and retrieval;
- no DDP/NCCL: collectives are XLA ``psum``/``all_gather`` over ICI;
- no faiss: exact top-k retrieval is a sharded GEMM + ``jax.lax.top_k``.

Reference layer map: /root/reference (see SURVEY.md).
"""

from visiondk_tpu.version import __version__

__all__ = ["__version__"]
