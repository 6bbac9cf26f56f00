"""Fused windowed attention (Pallas/TPU) for Swin-style transformers.

Swin's window attention is the worst-case XLA shape: thousands of tiny
[49, 32] matmuls per layer plus relative-position-bias and shifted-window
mask adds, each materializing [B·nW, h, 49, 49] tensors in HBM — measured
69% of swin_tiny's step time at ~8% MFU on v5e.

This kernel consumes the window QKV projection's natural [B·nW, N, 3C]
layout (N padded to 128), adds the relative-position bias and the
shifted-window mask (recomputed in-VMEM from compact per-window region ids),
and runs softmax per window without touching HBM. The custom VJP emits dqkv
and the bias gradient (accumulated across all windows in-kernel), so the
learned bias table trains through the ordinary chain rule outside.

Layout contract:
- ``qkv``  [B·nW, Np, 3C] (Np multiple of 128; tail masked by the bias)
- ``bias`` [h, Np, Np] f32 — relative-position bias with -inf at invalid
  key columns (doubles as the N-padding mask)
- ``ids``  [nW, Np] int32 — shift-region ids per window (all-equal ⇒ no mask);
  windows of one image must be consecutive in the batch dim (window_partition
  layout), so cell ``c`` covers windows [cR, cR+R) with ids rows
  ``(c mod nW/R)·R …``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from visiondk_tpu.ops.pallas._interpret import interpret_forced
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MASK_VAL = -100.0  # reference shifted_window_mask value (swin.py)


def _pick_windows_per_cell(n_windows: int, np_: int, c3: int) -> int:
    """Windows per grid cell: amortize cell overhead, stay under ~2MB x-block."""
    budget = 2 * 1024 * 1024
    per_w = np_ * c3 * 2  # bf16
    r = max(1, min(n_windows, budget // max(per_w, 1), 8))
    while n_windows % r:
        r -= 1
    return r


def _wattn_fwd_kernel(
    qkv_ref, bias_ref, ids_ref, o_ref, *, heads: int, head_dim: int, scale: float
):
    x = qkv_ref[...]  # [R, Np, 3C]
    ids = ids_ref[...]  # [R, Np]
    c = heads * head_dim
    r, n, _ = x.shape
    for w in range(r):
        mask = jnp.where(
            ids[w][:, None] != ids[w][None, :], _MASK_VAL, 0.0
        )  # [Np, Np] f32
        for h in range(heads):
            q = x[w, :, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
            k = x[w, :, c + h * head_dim : c + (h + 1) * head_dim].astype(jnp.float32)
            v = x[w, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale + bias_ref[h] + mask
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v.dtype)
            o_ref[w, :, h * head_dim : (h + 1) * head_dim] = jnp.dot(
                p, v, preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _wattn_bwd_kernel(
    qkv_ref, bias_ref, ids_ref, do_ref, dqkv_ref, dbias_ref,
    *, heads: int, head_dim: int, scale: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    x = qkv_ref[...]
    do3 = do_ref[...]
    ids = ids_ref[...]
    c = heads * head_dim
    r, n, _ = x.shape
    for w in range(r):
        mask = jnp.where(ids[w][:, None] != ids[w][None, :], _MASK_VAL, 0.0)
        for h in range(heads):
            q = x[w, :, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
            k = x[w, :, c + h * head_dim : c + (h + 1) * head_dim].astype(jnp.float32)
            v = x[w, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim].astype(jnp.float32)
            do = do3[w, :, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale + bias_ref[h] + mask
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            dv = jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            delta = jnp.sum(p * dp, axis=1, keepdims=True)
            ds = p * (dp - delta)  # grad wrt (scaled scores + bias + mask)
            dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            dqkv_ref[w, :, h * head_dim : (h + 1) * head_dim] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[w, :, c + h * head_dim : c + (h + 1) * head_dim] = dk.astype(
                dqkv_ref.dtype
            )
            dqkv_ref[w, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim] = dv.astype(
                dqkv_ref.dtype
            )
            dbias_ref[h] += ds


def _specs(r: int, np_: int, c3: int, c: int, heads: int, n_windows: int):
    x_spec = pl.BlockSpec((r, np_, c3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (heads, np_, np_), lambda b: (0, 0, 0), memory_space=pltpu.VMEM
    )
    ids_spec = pl.BlockSpec(
        (r, np_), lambda b: (b % (n_windows // r), 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((r, np_, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return x_spec, bias_spec, ids_spec, o_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_window_attention(qkv: Array, bias: Array, ids: Array, heads: int) -> Array:
    """[B·nW, Np, 3C] windows → [B·nW, Np, C] (see module docstring)."""
    return _wattn_fwd(qkv, bias, ids, heads)


def _wattn_fwd(qkv, bias, ids, heads):
    bw, np_, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    n_windows = ids.shape[0]
    r = _pick_windows_per_cell(n_windows, np_, c3)
    x_spec, bias_spec, ids_spec, o_spec = _specs(r, np_, c3, c, heads, n_windows)
    kern = functools.partial(
        _wattn_fwd_kernel, heads=heads, head_dim=head_dim, scale=head_dim**-0.5
    )
    return pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(bw // r,),
        in_specs=[x_spec, bias_spec, ids_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((bw, np_, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bw * heads * np_ * np_ * head_dim,
            bytes_accessed=(bw * np_ * (c3 + c)) * 2,
            transcendentals=bw * heads * np_ * np_,
        ),
    )(qkv, bias, ids)


def _wattn_vjp_fwd(qkv, bias, ids, heads):
    return _wattn_fwd(qkv, bias, ids, heads), (qkv, bias, ids)


def _wattn_vjp_bwd(heads, res, do):
    qkv, bias, ids = res
    bw, np_, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    n_windows = ids.shape[0]
    r = _pick_windows_per_cell(n_windows, np_, c3)
    x_spec, bias_spec, ids_spec, o_spec = _specs(r, np_, c3, c, heads, n_windows)
    kern = functools.partial(
        _wattn_bwd_kernel, heads=heads, head_dim=head_dim, scale=head_dim**-0.5
    )
    dqkv, dbias = pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(bw // r,),
        in_specs=[x_spec, bias_spec, ids_spec, o_spec],
        out_specs=[x_spec, bias_spec],  # dbias accumulates across cells
        out_shape=[
            jax.ShapeDtypeStruct((bw, np_, c3), qkv.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        # sequential grid: dbias is a cross-cell accumulation
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bw * heads * np_ * np_ * head_dim,
            bytes_accessed=2 * (bw * np_ * (c3 + c)) * 2,
            transcendentals=bw * heads * np_ * np_,
        ),
    )(qkv, bias, ids, do)
    return dqkv, dbias, None


fused_window_attention.defvjp(_wattn_vjp_fwd, _wattn_vjp_bwd)
