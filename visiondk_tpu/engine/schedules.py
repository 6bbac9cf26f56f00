"""LR / momentum schedules as pure functions of progress.

Parity with the reference registry (engine/scheduler.py:12-64), which builds
torch ``LinearLR`` / ``CosineAnnealingLR`` / ``SequentialLR``:

- ``linear``            lr(t) = lr0 · (1 + (r−1)·min(t,T)/T)
- ``cosine``            lr(t) = eta_min + (lr0−eta_min)·(1+cos(π·t/T))/2
- ``linear_with_warm``  linear 0.1→1 over warm_ep, then linear 1→r over T−warm
- ``cosine_with_warm``  linear 0.1→1 over warm_ep, then cosine over T−warm
  with r = lrf_ratio (default 0.1), eta_min = r·lr0.

``t`` is a *float epoch*: classification steps the schedule per epoch
(train.py:145), embedding tasks per batch with the horizon multiplied by
steps-per-epoch (vision_engine.py:486-489) — both are just ``t = step /
steps_per_unit`` here, evaluated inside the jitted train step so no host
round-trip.

Also here: the warmup momentum swap (0.8 during warm epochs → nominal after,
vision_engine.py:351-353).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from visiondk_tpu.registry import Registry

SCHEDULER = Registry("scheduler")


def _r(lrf_ratio: Optional[float]) -> float:
    return 0.1 if lrf_ratio is None else lrf_ratio


@SCHEDULER.register(name="linear")
def linear(warm_ep: int, epochs: int, lr0: float, lrf_ratio: Optional[float] = None) -> Callable:
    r = _r(lrf_ratio)

    def fn(t):
        frac = jnp.clip(t / epochs, 0.0, 1.0)
        return lr0 * (1.0 + (r - 1.0) * frac)

    return fn


@SCHEDULER.register(name="cosine")
def cosine(warm_ep: int, epochs: int, lr0: float, lrf_ratio: Optional[float] = None) -> Callable:
    eta_min = _r(lrf_ratio) * lr0

    def fn(t):
        frac = jnp.clip(t / epochs, 0.0, 1.0)
        return eta_min + (lr0 - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return fn


@SCHEDULER.register(name="linear_with_warm")
def linear_with_warm(warm_ep: int, epochs: int, lr0: float, lrf_ratio: Optional[float] = None) -> Callable:
    r = _r(lrf_ratio)

    def fn(t):
        warm_frac = jnp.clip(t / jnp.maximum(warm_ep, 1e-8), 0.0, 1.0)
        warm_lr = lr0 * (0.1 + 0.9 * warm_frac)
        main_frac = jnp.clip((t - warm_ep) / jnp.maximum(epochs - warm_ep, 1e-8), 0.0, 1.0)
        main_lr = lr0 * (1.0 + (r - 1.0) * main_frac)
        return jnp.where(t < warm_ep, warm_lr, main_lr)

    return fn


@SCHEDULER.register(name="cosine_with_warm")
def cosine_with_warm(warm_ep: int, epochs: int, lr0: float, lrf_ratio: Optional[float] = None) -> Callable:
    eta_min = _r(lrf_ratio) * lr0

    def fn(t):
        warm_frac = jnp.clip(t / jnp.maximum(warm_ep, 1e-8), 0.0, 1.0)
        warm_lr = lr0 * (0.1 + 0.9 * warm_frac)
        main_frac = jnp.clip((t - warm_ep) / jnp.maximum(epochs - warm_ep, 1e-8), 0.0, 1.0)
        main_lr = eta_min + (lr0 - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * main_frac))
        return jnp.where(t < warm_ep, warm_lr, main_lr)

    return fn


def create_scheduler(
    name: str, warm_ep: int, epochs: int, lr0: float, lrf_ratio: Optional[float] = None
) -> Callable:
    return SCHEDULER.create(name, warm_ep, epochs, lr0, lrf_ratio)


def momentum_schedule(warm_ep: int, momentum: float, warmup_momentum: float) -> Callable:
    """Discrete swap at the warmup boundary (reference sets 0.8 during warm
    epochs, restores nominal at epoch == warm_ep)."""

    def fn(t):
        return jnp.where(t < warm_ep, warmup_momentum, momentum)

    return fn
