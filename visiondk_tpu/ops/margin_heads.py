"""Fused margin-softmax logit ops (ArcFace / MagFace / CircleLoss / MV-Softmax).

Math parity with the reference heads (models/faceX/head/{arcface,magface,
circleloss,mv_softmax}.py) as pure JAX functions on a weight matrix of shape
``[feat_dim, num_class]`` (same layout as the reference's
``Parameter(torch.Tensor(feat_dim, num_class))``).

TPU-first design notes:

- Each op is a single fused expression — normalize → MXU matmul → elementwise
  margin rewrite via a one-hot mask (``jnp.where``) instead of the reference's
  in-place ``scatter_``/boolean indexing, which XLA fuses into the matmul
  epilogue. No data-dependent shapes anywhere.
- Partial-FC-style model parallelism needs **no separate implementation**:
  shard the weight's class dim over the mesh's ``model`` axis
  (``PartitionSpec(None, 'model')``) and jit inserts the collectives for the
  matmul and the downstream softmax reduction automatically.
- All ops return ``(logits, aux_loss)`` with ``aux_loss = 0`` except MagFace's
  norm regularizer. (The reference's MagFace returns a tuple that its own
  trainer then feeds straight into CE — a latent crash; we instead add
  ``mean(aux)`` into the loss, matching the MagFace paper.)

Angular-margin precision is sensitive near cos θ = ±1, so the cosine matmul
accumulates in fp32 (``preferred_element_type``) regardless of input dtype.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def l2_normalize(x: Array, axis: int = -1, eps: float = _EPS) -> Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


def cosine_logits(weight: Array, feats: Array) -> Array:
    """cos θ between L2-normalized features [B, D] and class weights [D, C]."""
    w = l2_normalize(weight.astype(jnp.float32), axis=0)
    f = l2_normalize(feats.astype(jnp.float32), axis=1)
    # HIGHEST: true-fp32 MXU accumulation. The margin rewrite is numerically
    # sensitive near cos θ = ±1; TPU default matmul precision (bf16 inputs)
    # drifts by ~1e-3 which the where()-thresholds then amplify.
    cos = jnp.dot(
        f, w, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.clip(cos, -1.0, 1.0)


def _one_hot_mask(labels: Array, num_class: int) -> Array:
    return jax.nn.one_hot(labels, num_class, dtype=jnp.bool_)


@partial(jax.jit, static_argnames=("margin_arc", "margin_am", "scale"))
def arcface_logits(
    weight: Array,
    feats: Array,
    labels: Array,
    margin_arc: float = 0.35,
    margin_am: float = 0.0,
    scale: float = 32.0,
) -> Tuple[Array, Array]:
    """Additive angular margin: cos(θ+m) on the target class, am-margin fallback
    when θ > π − m (reference: arcface.py:20-36)."""
    cos = cosine_logits(weight, feats)
    sin = jnp.sqrt(jnp.clip(1.0 - jnp.square(cos), 0.0, 1.0))
    cos_m = cos * math.cos(margin_arc) - sin * math.sin(margin_arc)
    min_cos = math.cos(math.pi - margin_arc)
    cos_m = jnp.where(cos > min_cos, cos_m, cos - margin_am)
    mask = _one_hot_mask(labels, cos.shape[1])
    logits = jnp.where(mask, cos_m, cos) * scale
    return logits, jnp.zeros((), jnp.float32)


@partial(
    jax.jit,
    static_argnames=("margin_am", "scale", "l_a", "u_a", "l_margin", "u_margin", "lamda"),
)
def magface_logits(
    weight: Array,
    feats: Array,
    labels: Array,
    margin_am: float = 0.0,
    scale: float = 32.0,
    l_a: float = 10.0,
    u_a: float = 110.0,
    l_margin: float = 0.45,
    u_margin: float = 0.8,
    lamda: float = 20.0,
) -> Tuple[Array, Array]:
    """Feature-norm-adaptive margin m(‖x‖) + regularizer λ·g(‖x‖)
    (reference: magface.py:22-47). aux = mean over batch of λ·g."""
    f32 = feats.astype(jnp.float32)
    x_norm = jnp.clip(
        jnp.sqrt(jnp.sum(jnp.square(f32), axis=1, keepdims=True)), l_a, u_a
    )  # [B, 1]
    ada_m = (u_margin - l_margin) / (u_a - l_a) * (x_norm - l_a) + l_margin
    cos_ada, sin_ada = jnp.cos(ada_m), jnp.sin(ada_m)
    loss_g = x_norm / (u_a**2) + 1.0 / x_norm

    cos = cosine_logits(weight, feats)
    sin = jnp.sqrt(jnp.clip(1.0 - jnp.square(cos), 0.0, 1.0))
    cos_m = cos * cos_ada - sin * sin_ada
    min_cos = jnp.cos(math.pi - ada_m)
    cos_m = jnp.where(cos > min_cos, cos_m, cos - margin_am)
    mask = _one_hot_mask(labels, cos.shape[1])
    logits = jnp.where(mask, cos_m, cos) * scale
    return logits, lamda * jnp.mean(loss_g)


@partial(jax.jit, static_argnames=("margin", "gamma"))
def circle_logits(
    weight: Array,
    feats: Array,
    labels: Array,
    margin: float = 0.25,
    gamma: float = 256.0,
) -> Tuple[Array, Array]:
    """Classification-form circle loss with adaptive αp/αn re-weighting
    (reference: circleloss.py:22-43). The α factors are stop-gradiented,
    matching the reference's ``.detach()``."""
    cos = cosine_logits(weight, feats)
    o_p, o_n = 1.0 + margin, -margin
    delta_p, delta_n = 1.0 - margin, margin
    cos_sg = jax.lax.stop_gradient(cos)
    alpha_p = jnp.maximum(o_p - cos_sg, 0.0)
    alpha_n = jnp.maximum(cos_sg - o_n, 0.0)
    logit_p = alpha_p * (cos - delta_p)
    logit_n = alpha_n * (cos - delta_n)
    mask = _one_hot_mask(labels, cos.shape[1])
    logits = jnp.where(mask, logit_p, logit_n) * gamma
    return logits, jnp.zeros((), jnp.float32)


@partial(jax.jit, static_argnames=("is_am", "margin", "mv_weight", "scale"))
def mv_softmax_logits(
    weight: Array,
    feats: Array,
    labels: Array,
    is_am: bool = False,
    margin: float = 0.35,
    mv_weight: float = 1.12,
    scale: float = 32.0,
) -> Tuple[Array, Array]:
    """Mis-classified-vector guided softmax (reference: mv_softmax.py:31-44):
    hard negatives (cos > margin-adjusted gt) are re-weighted by mv_weight; the
    ground-truth column gets an AM or Arc margin."""
    cos = cosine_logits(weight, feats)
    num_class = cos.shape[1]
    mask_gt = _one_hot_mask(labels, num_class)
    gt = jnp.sum(jnp.where(mask_gt, cos, 0.0), axis=1, keepdims=True)  # [B, 1]

    if is_am:
        hard_mask = cos > (gt - margin)
        final_gt = jnp.where(gt > margin, gt - margin, gt)
    else:
        sin_gt = jnp.sqrt(jnp.clip(1.0 - jnp.square(gt), 0.0, 1.0))
        cos_gt_m = gt * math.cos(margin) - sin_gt * math.sin(margin)
        hard_mask = cos > cos_gt_m
        final_gt = jnp.where(gt > 0.0, cos_gt_m, gt)

    reweighted = jnp.where(hard_mask, mv_weight * cos + (mv_weight - 1.0), cos)
    logits = jnp.where(mask_gt, final_gt, reweighted) * scale
    return logits, jnp.zeros((), jnp.float32)


def init_margin_weight(key: Array, feat_dim: int, num_class: int) -> Array:
    """U(-1,1) then per-class-column renorm to unit L2 — matching the
    reference's ``uniform_(-1,1).renorm_(2,1,1e-5).mul_(1e5)`` init."""
    w = jax.random.uniform(key, (feat_dim, num_class), jnp.float32, -1.0, 1.0)
    norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=0, keepdims=True))
    return w / jnp.maximum(norm, _EPS)  # unit columns


MARGIN_OPS = {
    "arcface": arcface_logits,
    "magface": magface_logits,
    "circleloss": circle_logits,
    "mv_softmax": mv_softmax_logits,
}
