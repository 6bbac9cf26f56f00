"""Exponential moving average of a parameter pytree.

Parity with the reference ``ModelEMA`` (models/ema.py:14-37): fp32 shadow of
everything floating-point (params AND batch-norm statistics), with ramped
decay ``d(updates) = decay · (1 − e^(−updates/tau))`` so early updates track
the model closely.

Functionally: ``ema = update_ema(ema, live, updates)`` — a pure tree_map that
runs inside the jitted train step (no host sync).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(tree: Any) -> Any:
    """fp32 copy of all float leaves; non-float leaves copied as-is.

    Always a true copy (never an alias of the live leaf): the train step donates
    the whole TrainState, and XLA rejects donating the same buffer twice.
    """

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.array(x, jnp.float32, copy=True)
        return jnp.array(x, copy=True)

    return jax.tree_util.tree_map(_cast, tree)


def ema_decay(updates: jax.Array, decay: float = 0.9999, tau: float = 2000.0) -> jax.Array:
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def update_ema(
    ema_tree: Any,
    live_tree: Any,
    updates: jax.Array,
    decay: float = 0.9999,
    tau: float = 2000.0,
) -> Any:
    """One EMA step. ``updates`` is the post-increment step count (the
    reference increments before computing d, ema.py:29-31)."""
    d = ema_decay(updates, decay, tau)

    def _upd(e, m):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * m.astype(jnp.float32)
        return m

    return jax.tree_util.tree_map(_upd, ema_tree, live_tree)
