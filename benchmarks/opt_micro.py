"""Optimizer-tail microbenchmark at ViT-B scale.

Production trace: "optimizer/cast fusions" ~= 18.5 ms of the 106 ms step,
vs a ~4 ms HBM-traffic floor (read g twice + read m/p/ema + write m/p/ema
~= 2.75 GB at ~800 GB/s). Candidates:

  a) current   — optax.chain(clip_by_global_norm(10), sgd(momentum))
                 + optax.apply_updates + update_ema
  b) fused     — one tree_map: gnorm pass, then p/m/ema updated together
  c) fused+bf16— (b) but also emitting a bf16 shadow of params (would let
                 the fwd skip its per-step fp32->bf16 cast of all params)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/opt_micro.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visiondk_tpu.models.factory import VisionModel
from visiondk_tpu.models.ema import ema_decay

LR, MU, DECAY, TAU = 0.006, 0.937, 0.9999, 2000.0


def build_tree():
    model = VisionModel(backbone_name="vit_base_patch16_224", num_classes=1000, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    x = jnp.zeros((2, 224, 224, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    params = variables["params"]
    n = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
    print(f"params: {n/1e6:.1f} M over {len(jax.tree.leaves(params))} leaves", flush=True)
    return params


def timeit(name, step, state, iters=30, warmup=3):
    for _ in range(warmup):
        state = step(state)
    float(jax.tree.leaves(state)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        state = step(state)
    float(jax.tree.leaves(state)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:14s} {dt*1000:7.2f} ms", flush=True)
    return dt


def main():
    params = build_tree()
    key = jax.random.key(1)
    grads = jax.tree.map(lambda l: 1e-3 * jnp.ones(l.shape, l.dtype), params)
    grads = jax.device_put(grads)

    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(LR, momentum=MU))

    # ---- a) current path -------------------------------------------------
    def cur(state):
        p, m_opt, e, u = state
        updates, m_opt = tx.update(grads, m_opt, p)
        p = optax.apply_updates(p, updates)
        u = u + 1
        d = ema_decay(u, DECAY, TAU)
        e = jax.tree.map(lambda ee, pp: ee * d + (1.0 - d) * pp, e, p)
        return (p, m_opt, e, u)

    state_a = (params, tx.init(params), jax.tree.map(jnp.copy, params), jnp.zeros((), jnp.int32))
    timeit("current", jax.jit(cur, donate_argnums=0), state_a)

    # ---- b) fused single pass -------------------------------------------
    def fused(state):
        p, m, e, u = state
        gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        scale = jnp.minimum(1.0, 10.0 / jnp.maximum(jnp.sqrt(gsq), 1e-12))
        u = u + 1
        d = ema_decay(u, DECAY, TAU)

        def upd(pp, mm, gg, ee):
            mm = MU * mm + gg * scale
            pp = pp - LR * mm
            ee = ee * d + (1.0 - d) * pp
            return pp, mm, ee

        out = jax.tree.map(upd, p, m, grads, e)
        p = jax.tree.map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        m = jax.tree.map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        e = jax.tree.map(lambda o: o[2], out, is_leaf=lambda x: isinstance(x, tuple))
        return (p, m, e, u)

    zeros_m = jax.tree.map(jnp.zeros_like, params)
    state_b = (params, zeros_m, jax.tree.map(jnp.copy, params), jnp.zeros((), jnp.int32))
    timeit("fused", jax.jit(fused, donate_argnums=0), state_b)

    # ---- c) fused + bf16 shadow -----------------------------------------
    def fused_bf16(state):
        p, m, e, u, _ = state
        gsq = sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(grads))
        scale = jnp.minimum(1.0, 10.0 / jnp.maximum(jnp.sqrt(gsq), 1e-12))
        u = u + 1
        d = ema_decay(u, DECAY, TAU)

        def upd(pp, mm, gg, ee):
            mm = MU * mm + gg * scale
            pp = pp - LR * mm
            ee = ee * d + (1.0 - d) * pp
            return pp, mm, ee, pp.astype(jnp.bfloat16)

        out = jax.tree.map(upd, p, m, grads, e)
        get = lambda i: jax.tree.map(lambda o: o[i], out, is_leaf=lambda x: isinstance(x, tuple))
        return (get(0), get(1), get(2), u, get(3))

    state_c = (
        params,
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.copy, params),
        jnp.zeros((), jnp.int32),
        jax.tree.map(lambda l: l.astype(jnp.bfloat16), params),
    )
    timeit("fused+bf16", jax.jit(fused_bf16, donate_argnums=0), state_c)

    # ---- floor: pure copy traffic (read 4x + write 3x of one tree) ------
    def floor(state):
        p, m, e, u = state
        out = jax.tree.map(lambda pp, mm, gg, ee: (pp + 1e-9 * gg, mm + 1e-9 * gg, ee + 1e-9 * gg), p, m, grads, e)
        get = lambda i: jax.tree.map(lambda o: o[i], out, is_leaf=lambda x: isinstance(x, tuple))
        return (get(0), get(1), get(2), u + 1)

    state_d = (params, jax.tree.map(jnp.zeros_like, params), jax.tree.map(jnp.copy, params), jnp.zeros((), jnp.int32))
    timeit("traffic-floor", jax.jit(floor, donate_argnums=0), state_d)


if __name__ == "__main__":
    main()
