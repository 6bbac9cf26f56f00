"""Loss registry: ce (label smoothing), bce, focal, distill-KL.

Numeric parity with the reference registry (models/losses/loss.py):

- ``ce``    ≡ torch.nn.CrossEntropyLoss(label_smoothing=s) — int labels,
  mean over batch. Also accepts soft/one-hot targets (mixup path).
- ``bce``   ≡ torch.nn.BCEWithLogitsLoss — mean over all elements.
- ``focal`` ≡ the reference's TF-style FocalLoss wrapper around BCE
  (loss.py:27-54): bce * alpha_factor * (1-p_t)^gamma, mean.
- ``distill_kl`` ≡ DistillKL (loss.py:56-66): KL(student‖teacher) · T² / B.

Every loss optionally takes a ``sample_weight`` [B] mask so OHEM (a
data-dependent *drop* in the reference, structure/sampler.py) becomes a
shape-static masked mean on TPU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from visiondk_tpu.registry import Registry

Array = jax.Array

LOSS = Registry("loss")


def _weighted_mean(per_sample: Array, sample_weight: Optional[Array]) -> Array:
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = sample_weight.astype(per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def softmax_cross_entropy(
    logits: Array,
    targets: Array,
    label_smooth: float = 0.0,
    sample_weight: Optional[Array] = None,
    valid_class: Optional[int] = None,
) -> Array:
    """CE with label smoothing. ``targets`` is int [B] or soft [B, C].

    ``valid_class``: number of REAL classes when the logit width is padded
    (margin heads pad the class dim for partial-FC sharding and mask pad
    columns to −1e9, models/heads.py). Smoothing mass must be spread over the
    real classes only — ls/C weight on a −1e9 column would add ~ls/C·1e9 to
    every sample's loss."""
    logits = logits.astype(jnp.float32)
    num_class = logits.shape[-1]
    if targets.ndim == logits.ndim - 1:
        q = jax.nn.one_hot(targets, num_class, dtype=jnp.float32)
    else:
        q = targets.astype(jnp.float32)
    if label_smooth > 0.0:
        if valid_class is not None and valid_class < num_class:
            real = (jnp.arange(num_class) < valid_class).astype(jnp.float32)
            q = (1.0 - label_smooth) * q + (label_smooth / valid_class) * real
        else:
            q = (1.0 - label_smooth) * q + label_smooth / num_class
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_sample = -jnp.sum(q * logp, axis=-1)
    return _weighted_mean(per_sample, sample_weight)


def sigmoid_binary_cross_entropy(
    logits: Array,
    targets: Array,
    sample_weight: Optional[Array] = None,
) -> Array:
    """BCE-with-logits, mean over all elements (per-sample mean over classes
    first, so sample_weight masks whole rows)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # log(1+e^-|x|) stable form.
    per_elem = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_sample = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim))) if per_elem.ndim > 1 else per_elem
    return _weighted_mean(per_sample, sample_weight)


def sigmoid_focal(
    logits: Array,
    targets: Array,
    alpha: float = 0.25,
    gamma: float = 1.5,
    sample_weight: Optional[Array] = None,
) -> Array:
    """TF-addons-style focal loss over BCE elements (reference loss.py:41-49)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per_elem = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    per_elem = per_elem * alpha_factor * jnp.power(1.0 - p_t, gamma)
    per_sample = jnp.mean(per_elem, axis=tuple(range(1, per_elem.ndim))) if per_elem.ndim > 1 else per_elem
    return _weighted_mean(per_sample, sample_weight)


def distill_kl(student_logits: Array, teacher_logits: Array, temperature: float = 4.0) -> Array:
    """KL(student ‖ teacher) at temperature T, scaled by T²/B (reference loss.py:56-66)."""
    t = temperature
    log_p_s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=1)
    p_t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=1)
    kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-12)) - log_p_s))
    return kl * (t**2) / student_logits.shape[0]


# --- registry entries: factory(params) -> fn(logits, targets, sample_weight=None) ---


@LOSS.register(name="ce")
def cross_entropy(label_smooth: float = 0.0, valid_class: Optional[int] = None) -> Callable:
    def fn(logits, targets, sample_weight=None):
        return softmax_cross_entropy(
            logits, targets, label_smooth, sample_weight, valid_class
        )

    return fn


@LOSS.register(name="bce")
def binary_cross_entropy() -> Callable:
    def fn(logits, targets, sample_weight=None):
        return sigmoid_binary_cross_entropy(logits, targets, sample_weight)

    return fn


@LOSS.register(name="focal")
def focal_loss(gamma: float = 1.5, alpha: float = 0.25) -> Callable:
    def fn(logits, targets, sample_weight=None):
        return sigmoid_focal(logits, targets, alpha, gamma, sample_weight)

    return fn


def create_lossfn(name: str, **kwargs) -> Callable:
    return LOSS.create(name, **kwargs)


def list_lossfns():
    return LOSS.keys()
