"""Functional train state — the reference's god-object ``CenterProcessor``
state (model/EMA/optimizer/scheduler/scaler, engine/vision_engine.py:68-167)
reduced to one pytree threaded through a jitted step.

No GradScaler: bf16 needs no loss scaling. The LR/momentum schedules are
evaluated *inside* the step from ``state.step`` (no host round trip).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from visiondk_tpu.models.ema import init_ema
from visiondk_tpu.parallel.mesh import MeshContext


class TrainState(struct.PyTreeNode):
    step: jax.Array                     # int32 — optimizer updates so far
    params: Any
    batch_stats: Any                    # BN running stats ({} for BN-free models)
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jax.Array              # int32 — EMA update count (resumable)


def create_train_state(variables: Dict[str, Any], tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=init_ema(params),
        ema_batch_stats=init_ema(batch_stats),
        ema_updates=jnp.zeros((), jnp.int32),
    )


def _spec_for_path(path, leaf) -> P:
    """Partial-FC: margin-head weight leaves ([feat_dim, num_class]) shard
    classes over the 'model' axis; everything else is replicated."""
    keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if "head" in keys and keys[-1] == "weight" and getattr(leaf, "ndim", 0) == 2:
        return P(None, "model")
    return P()


def state_shardings(ctx: MeshContext, state: TrainState) -> TrainState:
    """A TrainState-shaped pytree of NamedShardings for jit in/out_shardings."""

    def shard_tree(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(ctx.mesh, _spec_for_path(path, leaf)), tree
        )

    rep = NamedSharding(ctx.mesh, P())
    return TrainState(
        step=rep,
        params=shard_tree(state.params),
        batch_stats=shard_tree(state.batch_stats),
        opt_state=jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(ctx.mesh, _spec_for_path(path, leaf)),
            state.opt_state,
        ),
        ema_params=shard_tree(state.ema_params),
        ema_batch_stats=shard_tree(state.ema_batch_stats),
        ema_updates=rep,
    )


def place_state(ctx: MeshContext, state: TrainState) -> TrainState:
    return jax.device_put(state, state_shardings(ctx, state))
