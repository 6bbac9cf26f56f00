"""Optimizers: sgd / adam / sam with torch-parity update math.

Reference: engine/optimizer.py (registry :16-27, SAM :29-106,
create_Optimizer :131-137) and built/layer_optimizer.py (backbone lr, head
lr×10).

Parity notes:
- torch SGD: g ← g + wd·p; v ← μ·v + g; p ← p − lr·v  →
  optax chain [add_decayed_weights, trace(momentum), scale_by_lr].
- torch Adam(weight_decay): L2-coupled (not AdamW) →
  [add_decayed_weights, scale_by_adam, scale_by_lr].
- grad clip: the reference clips global norm at 10.0 *before* the optimizer
  step (train.py:209) — expressed here as a leading clip_by_global_norm.
- SAM (rho=0.05, adaptive=True): the two-pass perturbation lives in the
  jitted train step (engine/steps.py); this module supplies the base
  transform and a ``SAMConfig``. (The reference computes the first-step grad
  without DDP sync, optimizer.py + train.py:157-159; under jit the gradient
  is globally averaged in both passes — m-sharpness differences are noted in
  docs/PARITY.md.)
- momentum/lr are dynamic (schedule-evaluated inside the step) via
  inject_hyperparams, replicating the warmup-momentum swap
  (vision_engine.py:351-353).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from visiondk_tpu.registry import Registry

OPTIMIZER = Registry("optimizer")

GRAD_CLIP_NORM = 10.0


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    rho: float = 0.05
    adaptive: bool = True
    # m-sharpness: compute the FIRST (perturbation) gradient per device shard
    # without cross-device averaging — exact parity with the reference's
    # `model.no_sync()` first backward (engine/procedure/train.py:157-159);
    # the second (update) gradient is always globally averaged. False reverts
    # to the pre-round-4 global-ε behaviour (hyp: sam_local_perturb: false).
    local_perturb: bool = True


@OPTIMIZER.register(name="sgd")
def sgd(
    lr_schedule: Callable,
    weight_decay: float,
    momentum_schedule: Callable,
) -> optax.GradientTransformation:
    def make(momentum, learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(make)(
        momentum=momentum_schedule, learning_rate=lr_schedule
    )


@OPTIMIZER.register(name="adam")
def adam(
    lr_schedule: Callable,
    weight_decay: float,
    momentum_schedule: Callable = None,  # unused; torch Adam ignores `momentum`
) -> optax.GradientTransformation:
    def make(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale_by_learning_rate(learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=lr_schedule)


@OPTIMIZER.register(name="sam")
def sam(
    lr_schedule: Callable,
    weight_decay: float,
    momentum_schedule: Callable,
) -> optax.GradientTransformation:
    """SAM's *base* optimizer (SGD, like the reference default). The
    perturbation pass is handled by the train step when task config selects
    sam; the transform itself is identical to sgd."""
    return sgd(lr_schedule, weight_decay, momentum_schedule)


def with_grad_clip(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(GRAD_CLIP_NORM), tx)


def layer_wise(
    tx_factory: Callable[[Callable], optax.GradientTransformation],
    lr_schedule: Callable,
    params_example: Any,
    head_multiplier: float = 10.0,
) -> optax.GradientTransformation:
    """Backbone at lr, head at lr×10 (built/layer_optimizer.py:26-29).

    ``tx_factory(schedule)`` builds the base transform for a given lr
    schedule; params whose top-level key is 'head' (or 'fc'/'neck' for the
    projection) get the boosted schedule.
    """

    def label_fn(params):
        def label_tree(tree, lab):
            return jax.tree_util.tree_map(lambda _: lab, tree)

        out = {}
        for k, v in params.items():
            lab = "head" if k in ("head", "fc") else "backbone"
            out[k] = label_tree(v, lab)
        return out

    boosted = lambda t: lr_schedule(t) * head_multiplier
    return optax.multi_transform(
        {"backbone": tx_factory(lr_schedule), "head": tx_factory(boosted)},
        label_fn,
    )


def sam_perturb(params: Any, grads: Any, cfg: SAMConfig) -> Any:
    """First SAM step: w + e(w), e = ρ · (p² if adaptive) · g / ‖(|p| if
    adaptive) · g‖₂ (reference optimizer.py:44-56,79-90)."""
    if cfg.adaptive:
        scaled = jax.tree_util.tree_map(lambda p, g: jnp.abs(p) * g, params, grads)
    else:
        scaled = grads
    sq = sum(
        jnp.sum(jnp.square(x)) for x in jax.tree_util.tree_leaves(scaled)
    )
    grad_norm = jnp.sqrt(sq)
    scale = cfg.rho / (grad_norm + 1e-12)

    def _e(p, g):
        factor = jnp.square(p) if cfg.adaptive else 1.0
        return p + factor * g * scale

    return jax.tree_util.tree_map(_e, params, grads)


_HEAD_KEYS = ("fc", "head", "pool", "neck", "pre_head")


def freeze_mask(
    backbone_freeze: bool = False,
    bn_freeze_affine: bool = False,
    head_keys=_HEAD_KEYS,
) -> Callable:
    """Param label fn for optax.multi_transform: 'frozen' params get zero
    updates — the functional requires_grad_(False) (reference
    classify_model.py:83-102: freeze all-but-classifier; BN affine freeze)."""

    def labels(params):
        def label(path, leaf):
            parts = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
            if backbone_freeze and not any(p in head_keys for p in parts):
                return "frozen"
            if (
                bn_freeze_affine
                and len(parts) >= 2
                and "bn" in parts[-2]
                and parts[-1] in ("scale", "bias")
            ):
                return "frozen"
            return "train"

        return jax.tree_util.tree_map_with_path(label, params)

    return labels


def with_freeze(
    tx: optax.GradientTransformation,
    backbone_freeze: bool,
    bn_freeze_affine: bool,
) -> optax.GradientTransformation:
    if not (backbone_freeze or bn_freeze_affine):
        return tx
    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()},
        freeze_mask(backbone_freeze, bn_freeze_affine),
    )


def create_optimizer(
    name: str,
    lr_schedule: Callable,
    weight_decay: float,
    momentum_schedule: Callable,
    params_example: Optional[Any] = None,
    layer_wise_lr: bool = False,
    head_multiplier: float = 10.0,
    backbone_freeze: bool = False,
    bn_freeze_affine: bool = False,
) -> optax.GradientTransformation:
    """create_Optimizer parity (engine/optimizer.py:131-137) + clip + freezes."""
    if layer_wise_lr:
        factory = lambda sched: OPTIMIZER.create(
            name, sched, weight_decay, momentum_schedule
        )
        tx = layer_wise(factory, lr_schedule, params_example, head_multiplier)
    else:
        tx = OPTIMIZER.create(name, lr_schedule, weight_decay, momentum_schedule)
    tx = with_freeze(tx, backbone_freeze, bn_freeze_affine)
    return with_grad_clip(tx)


def list_optimizers():
    return OPTIMIZER.keys()
