"""Fused short-sequence attention (Pallas/TPU) for vision transformers.

Why not XLA or generic flash attention:
- XLA materializes the [B, H, N, N] f32 score tensor in HBM three times per
  layer (scores → softmax → AV read); at ViT shapes the attention core
  measured ~4% MFU on v5e while the surrounding MLPs run at ~89%.
- The generic pallas flash_attention op is tuned for long sequences; at
  N≈200 its block pipeline measured 2× *slower* end-to-end than plain XLA.

This kernel targets the vision regime (N ≤ 1024, head_dim 64..128): one grid
cell per (batch, head) computes softmax(QKᵀ·scale)·V entirely in VMEM —
scores never touch HBM. The backward kernel recomputes the probabilities
flash-style and produces dq/dk/dv in one pass, also VMEM-resident.

Layout contract: q, k, v are [B, H, N, D] with N padded to a multiple of 128
(mask handles the tail); wrapper `vision_attention` does the padding and
slicing and wires the custom VJP.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from visiondk_tpu.ops.pallas._interpret import interpret_forced
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _softmax_p(q, k, n_valid: int, scale: float):
    """[H, N, N] f32 probabilities with padded keys masked out."""
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [H, N, N] batched over heads
    n = q.shape[1]
    if n_valid < n:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=2, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int, scale: float):
    # One grid cell = one batch element; heads ride the matmul batch dim so
    # the MXU stream stays deep (per-(b,h) cells measured 2× slower: ~µs of
    # fixed cost × B·H cells dominates the actual 17 MFLOP of work).
    q = q_ref[0].astype(jnp.float32)  # [H, N, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    p = _softmax_p(q, k, n_valid, scale).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, n_valid: int, scale: float
):
    q = q_ref[0].astype(jnp.float32)  # [H, N, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    p = _softmax_p(q, k, n_valid, scale)  # [H, N, N]

    # dv = Pᵀ dO (per head)
    dv_ref[0] = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    # dP = dO Vᵀ ; dS = P ∘ (dP − rowsum(P ∘ dP)) · scale
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(p * dp, axis=2, keepdims=True)
    ds = p * (dp - delta) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


def _b_spec(hb: int, n: int, d: int):
    return pl.BlockSpec((1, hb, n, d), lambda b, g: (b, g, 0, 0), memory_space=pltpu.VMEM)


def _heads_per_block(h: int, n: int, live_nn_tensors: int) -> int:
    """Largest divisor of h whose f32 [hb, n, n] working set fits VMEM."""
    budget = 10 * 1024 * 1024  # leave headroom under the 16MB scoped limit
    per_head = live_nn_tensors * n * n * 4
    hb = max(1, min(h, budget // max(per_head, 1)))
    while h % hb:
        hb -= 1
    return hb


def _attn_fwd_padded(q: Array, k: Array, v: Array, n_valid: int, scale: float) -> Array:
    b, h, n, d = q.shape
    hb = _heads_per_block(h, n, live_nn_tensors=2)  # s/e alias, p
    kern = functools.partial(_fwd_kernel, n_valid=n_valid, scale=scale)
    flops = 2 * 2 * b * h * n * n * d
    return pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(b, h // hb),
        in_specs=[_b_spec(hb, n, d)] * 3,
        out_specs=_b_spec(hb, n, d),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * b * h * n * d * 2, transcendentals=b * h * n * n
        ),
    )(q, k, v)


def _attn_bwd_padded(
    q: Array, k: Array, v: Array, do: Array, n_valid: int, scale: float
) -> Tuple[Array, Array, Array]:
    b, h, n, d = q.shape
    hb = _heads_per_block(h, n, live_nn_tensors=4)  # p, dp, ds + slack
    kern = functools.partial(_bwd_kernel, n_valid=n_valid, scale=scale)
    return pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(b, h // hb),
        in_specs=[_b_spec(hb, n, d)] * 4,
        out_specs=[_b_spec(hb, n, d)] * 3,
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * n * n * d,
            bytes_accessed=7 * b * h * n * d * 2,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _vision_attention_padded(q: Array, k: Array, v: Array, n_valid: int) -> Array:
    scale = q.shape[-1] ** -0.5
    return _attn_fwd_padded(q, k, v, n_valid, scale)


def _vjp_fwd(q, k, v, n_valid):
    return _vision_attention_padded(q, k, v, n_valid), (q, k, v)


def _vjp_bwd(n_valid, res, do):
    q, k, v = res
    scale = q.shape[-1] ** -0.5
    dq, dk, dv = _attn_bwd_padded(q, k, v, do, n_valid, scale)
    return dq, dk, dv


_vision_attention_padded.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# Transpose-free fused attention: consumes the QKV projection's natural
# [B, N, 3C] layout and emits [B, N, C]. The [B,H,N,D] transposes around the
# attention core are full HBM passes (~45ms/step for ViT-B B=128 on v5e);
# slicing heads from the lane dimension inside VMEM makes them free.
# --------------------------------------------------------------------------


def _bf16_dots() -> bool:
    """bf16 matmul *operands* (always f32 accumulation) in the fused kernels.

    v5e's MXU is bf16-native; f32-operand dots run at a fraction of the rate.
    Read at trace time; override with VDK_ATTN_BF16=0/1 for A/B sweeps."""
    import os

    return os.environ.get("VDK_ATTN_BF16", "0") == "1"


_LOG2E = 1.4426950408889634


def _sw_pipeline() -> bool:
    """Software-pipeline the fwd per-head loop: issue head h+1's score dot
    (MXU) before head h's softmax sweeps (VPU) so the two units can overlap.
    Round-5 experiment (VERDICT item 8); A/B with VDK_ATTN_PIPE=0/1."""
    import os

    return os.environ.get("VDK_ATTN_PIPE", "0") == "1"


def _fused_fwd_kernel(
    qkv_ref, o_ref, p_ref=None, *, heads: int, head_dim: int, n_valid: int, scale: float,
    n_array: Optional[int] = None,
):
    # VPU-elementwise-bound regime (B·H·N² score elements dominate; the dots
    # are a minority of the time) — every per-element op matters:
    #   · the N block is sublane-granular (×8), not lane-granular (×128):
    #     ViT's 200 tokens process as 200 rows, not 256 (−22% of everything)
    #   · scale·log2e folded into q ([N,D] op, not [N,N]) + exp2 instead of exp
    #   · key-pad mask as ONE precomputed additive bias row (no per-head
    #     compare+select)
    #   · softmax division as reciprocal + broadcast multiply
    x = qkv_ref[...]  # [R, N, 3C] in VMEM (R batch rows per cell)
    n = x.shape[1]
    n_arr = n_array if n_array is not None else n
    c = heads * head_dim
    op_t = x.dtype if _bf16_dots() else jnp.float32
    if n_arr < n:
        # Block over-reads past the array's sublane extent (OOB reads are
        # undefined); zero the tail so garbage V rows can't leak NaNs through
        # p·V (p is exactly 0 there, but 0·NaN = NaN).
        row3 = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(row3 < n_arr, x, 0)
    if n_valid < n:
        # Padded key columns get -inf bias; padded q rows produce garbage
        # outputs the caller never reads.
        # hoisted col + per-head select (an additive-bias formulation
        # crashes Mosaic's layout pass at sublane-granular N)
        col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], n, n), 2)
        kmask = col < n_valid

    def score(h):
        q = x[:, :, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
        k = x[:, :, c + h * head_dim : c + (h + 1) * head_dim].astype(op_t)
        q = (q * (scale * _LOG2E)).astype(op_t)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # log2-domain scores
        if n_valid < n:
            s = jnp.where(kmask, s, _NEG_INF)
        return s

    pipe = _sw_pipeline()
    s = score(0) if pipe else None
    for h in range(heads):
        if not pipe:
            s = score(h)
        v = x[:, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim]
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp2(s - m)
        if pipe and h + 1 < heads:
            # issue the NEXT head's score dot between this head's VPU sweeps:
            # the MXU matmul has no dependence on e/p, so the in-order
            # scheduler can run it under the exp2/sum/recip sweeps
            s = score(h + 1)
        p = (e * (1.0 / jnp.sum(e, axis=2, keepdims=True))).astype(v.dtype)
        if p_ref is not None:
            # stash probabilities for the backward pass (skips the whole
            # softmax recompute there — the dominant VPU cost of this regime)
            p_ref[:, h] = p
        o_ref[:, :, h * head_dim : (h + 1) * head_dim] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _fused_bwd_kernel(
    qkv_ref, do_ref, dqkv_ref, *, heads: int, head_dim: int, n_valid: int, scale: float,
    n_array: Optional[int] = None,
):
    x = qkv_ref[...]  # [R, N, 3C]
    do3 = do_ref[...]
    n = x.shape[1]
    n_arr = n_array if n_array is not None else n
    c = heads * head_dim
    op_t = x.dtype if _bf16_dots() else jnp.float32
    if n_arr < n:
        # The block over-reads past the array's sublane extent (pallas masks
        # writes but OOB *reads* are undefined); zero those garbage tails —
        # they would contaminate dV/dK through the row reductions.
        rx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(rx < n_arr, x, 0)
        rdo = jax.lax.broadcasted_iota(jnp.int32, do3.shape, 1)
        do3 = jnp.where(rdo < n_arr, do3, 0)
    if n_valid < n:
        # hoisted col + per-head select (an additive-bias formulation
        # crashes Mosaic's layout pass at sublane-granular N)
        col = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], n, n), 2)
        kmask = col < n_valid
    for h in range(heads):
        q = x[:, :, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
        k = x[:, :, c + h * head_dim : c + (h + 1) * head_dim]
        v = x[:, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim].astype(op_t)
        do = do3[:, :, h * head_dim : (h + 1) * head_dim].astype(op_t)
        q2 = (q * (scale * _LOG2E)).astype(op_t)   # log2-domain score operand
        kc = k.astype(op_t)
        s = jax.lax.dot_general(
            q2, kc, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if n_valid < n:
            s = jnp.where(kmask, s, _NEG_INF)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp2(s - m)
        p = e * (1.0 / jnp.sum(e, axis=2, keepdims=True))
        dv = jax.lax.dot_general(
            p.astype(op_t), do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=2, keepdims=True)
        ds = (p * (dp - delta)).astype(op_t)       # unscaled; scale rides the [N,D] operands
        ks = (k.astype(jnp.float32) * scale).astype(op_t)
        dq = jax.lax.dot_general(
            ds, ks, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q2, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * (1.0 / _LOG2E)                          # q2 carries scale·log2e
        dqkv_ref[:, :, h * head_dim : (h + 1) * head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + h * head_dim : c + (h + 1) * head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim] = dv.astype(
            dqkv_ref.dtype
        )


def _fused_bwd_from_p_kernel(
    qkv_ref, p_ref, do_ref, dqkv_ref, *, heads: int, head_dim: int, scale: float,
    n_array: Optional[int] = None,
):
    """Backward with the forward's stashed probabilities: no score matmul, no
    softmax recompute — 4 dots + 4 N² elementwise sweeps per head instead of
    5 dots + ~11 sweeps. The key-pad mask is implicit (cached p is 0 there)."""
    x = qkv_ref[...]  # [R, N, 3C]
    do3 = do_ref[...]
    n = x.shape[1]
    n_arr = n_array if n_array is not None else n
    c = heads * head_dim
    op_t = x.dtype if _bf16_dots() else jnp.float32
    if n_arr < n:
        # zero over-read sublane tails (garbage rows would contaminate the
        # row reductions; cached p pad rows are finite so 0-weighting works)
        rx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(rx < n_arr, x, 0)
        rdo = jax.lax.broadcasted_iota(jnp.int32, do3.shape, 1)
        do3 = jnp.where(rdo < n_arr, do3, 0)
    for h in range(heads):
        q = x[:, :, h * head_dim : (h + 1) * head_dim].astype(jnp.float32)
        k = x[:, :, c + h * head_dim : c + (h + 1) * head_dim].astype(jnp.float32)
        v = x[:, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim].astype(op_t)
        do = do3[:, :, h * head_dim : (h + 1) * head_dim].astype(op_t)
        p = p_ref[:, h].astype(jnp.float32)  # [R, N, N]
        dv = jax.lax.dot_general(
            p.astype(op_t), do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=2, keepdims=True)
        ds = (p * (dp - delta)).astype(op_t)  # unscaled; scale rides the [N,D] operands
        dq = jax.lax.dot_general(
            ds, (k * scale).astype(op_t), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, (q * scale).astype(op_t), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, :, h * head_dim : (h + 1) * head_dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + h * head_dim : c + (h + 1) * head_dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim] = dv.astype(
            dqkv_ref.dtype
        )


def _row_spec(n: int, width: int, rows: int = 1):
    return pl.BlockSpec((rows, n, width), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)


def _rows_per_cell(b: int, bwd: bool = False) -> int:
    """Batch rows per grid cell: 2 for both directions (amortizes per-cell
    overhead; measured best of 1/2/4 on v5e at ViT-B shapes for fwd AND bwd
    — bwd rows=1 regressed the full model 1186→1144 img/s despite the bwd
    custom-call sitting ~3× above its DMA floor in isolation). Override per
    direction with VDK_ATTN_ROWS / VDK_ATTN_ROWS_BWD for A/B sweeps.
    """
    import os

    env = os.environ.get("VDK_ATTN_ROWS_BWD" if bwd else "VDK_ATTN_ROWS")
    # clamp bad overrides: 0 would divide-by-zero below, negatives would
    # terminate with a negative grid size
    r = min(max(int(env), 1) if env else 2, max(b, 1))
    while b % r:
        r -= 1
    return r


_PARALLEL = pltpu.CompilerParams(dimension_semantics=("parallel",))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_attention_padded(qkv: Array, heads: int, head_dim: int, n_valid: int) -> Array:
    """qkv may be unpadded ([B, n_valid, 3C]): block shapes are rounded up to
    the 128-lane tile and pallas masks the out-of-range writes — no jnp.pad /
    slice HBM passes (the kernels zero the over-read tails in VMEM)."""
    b, n, w = qkv.shape
    c = heads * head_dim
    scale = head_dim**-0.5
    rows = _rows_per_cell(b)
    np_ = _round_up(max(n, 8), 8)  # sublane-granular: N=200 stays 200, not 256
    kern = functools.partial(
        _fused_fwd_kernel, heads=heads, head_dim=head_dim, n_valid=n_valid, scale=scale,
        n_array=n if np_ != n else None,
    )
    return pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(b // rows,),
        in_specs=[_row_spec(np_, w, rows)],
        out_specs=_row_spec(np_, c, rows),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=_PARALLEL,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * np_ * np_ * head_dim,
            bytes_accessed=(b * n * w + b * n * c) * 2,
            transcendentals=b * heads * np_ * np_,
        ),
    )(qkv)


def _p_cache_enabled() -> bool:
    """Stash fwd probabilities for bwd (b·h·n² extra HBM per layer — 123 MB
    at ViT-B bs128 — in exchange for skipping the bwd softmax recompute).
    Disable with VDK_ATTN_NO_PCACHE=1 for memory-constrained shapes."""
    import os

    return os.environ.get("VDK_ATTN_NO_PCACHE", "0") != "1"


def _fused_vjp_fwd(qkv, heads, head_dim, n_valid):
    if not _p_cache_enabled():
        return _fused_attention_padded(qkv, heads, head_dim, n_valid), (qkv, None)
    b, n, w = qkv.shape
    c = heads * head_dim
    scale = head_dim**-0.5
    rows = _rows_per_cell(b)
    np_ = _round_up(max(n, 8), 8)
    kern = functools.partial(
        _fused_fwd_kernel, heads=heads, head_dim=head_dim, n_valid=n_valid, scale=scale,
        n_array=n if np_ != n else None,
    )
    o, p = pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(b // rows,),
        in_specs=[_row_spec(np_, w, rows)],
        out_specs=[
            _row_spec(np_, c, rows),
            pl.BlockSpec((rows, heads, np_, np_), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, heads, np_, np_), qkv.dtype),
        ],
        compiler_params=_PARALLEL,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * heads * np_ * np_ * head_dim,
            bytes_accessed=(b * n * w + b * n * c + b * heads * np_ * np_) * 2,
            transcendentals=b * heads * np_ * np_,
        ),
    )(qkv)
    return o, (qkv, p)


def _fused_vjp_bwd(heads, head_dim, n_valid, res, do):
    qkv, p = res
    b, n, w = qkv.shape
    scale = head_dim**-0.5
    rows = _rows_per_cell(b, bwd=True)
    np_ = _round_up(max(n, 8), 8)  # sublane-granular (see fwd)
    if p is None:
        kern = functools.partial(
            _fused_bwd_kernel, heads=heads, head_dim=head_dim, n_valid=n_valid, scale=scale,
            n_array=n if np_ != n else None,
        )
        in_specs = [_row_spec(np_, w, rows), _row_spec(np_, heads * head_dim, rows)]
        args = (qkv, do)
        flops = 5 * 2 * b * heads * np_ * np_ * head_dim
    else:
        kern = functools.partial(
            _fused_bwd_from_p_kernel, heads=heads, head_dim=head_dim, scale=scale,
            n_array=n if np_ != n else None,
        )
        in_specs = [
            _row_spec(np_, w, rows),
            pl.BlockSpec((rows, heads, np_, np_), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            _row_spec(np_, heads * head_dim, rows),
        ]
        args = (qkv, p, do)
        flops = 4 * 2 * b * heads * np_ * np_ * head_dim
    dqkv = pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(b // rows,),
        in_specs=in_specs,
        out_specs=_row_spec(np_, w, rows),
        out_shape=jax.ShapeDtypeStruct((b, n, w), qkv.dtype),
        compiler_params=_PARALLEL,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * (b * n * w + b * n * heads * head_dim) * 2,
            transcendentals=b * heads * np_ * np_,
        ),
    )(*args)
    return (dqkv,)


_fused_attention_padded.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_qkv_attention(qkv: Array, heads: int, n_valid: Optional[int] = None) -> Array:
    """Attention straight from the QKV projection: [B, N, 3C] → [B, N, C].

    No [B,H,N,D] transposes anywhere — heads are lane slices inside VMEM.
    N needs no host-visible padding: the kernel blocks round up to the
    128-lane tile and mask the tail. ``n_valid < N`` masks trailing key
    columns (− caller-padded tokens, e.g. ViT's 197 → 200 sublane-aligned
    layout; pad-row *outputs* are garbage but padded queries never leak into
    valid rows).
    """
    b, n, w = qkv.shape
    assert w % (3 * heads) == 0, (w, heads)
    head_dim = w // (3 * heads)
    return _fused_attention_padded(qkv, heads, head_dim, n if n_valid is None else n_valid)


def vision_attention(q: Array, k: Array, v: Array) -> Array:
    """softmax(QKᵀ/√D)·V for [B, H, N, D] inputs (N arbitrary, D ≤ 128).

    Pads N up to a multiple of 128 (ViT-B: 197 → 256), runs the fused VMEM
    kernel, slices back. Differentiable (custom VJP, flash-style recompute).
    """
    b, h, n, d = q.shape
    n_pad = _round_up(max(n, 128), 128)
    if n_pad != n:
        pad = ((0, 0), (0, 0), (0, n_pad - n), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    out = _vision_attention_padded(q, k, v, n)
    return out[:, :, :n, :] if n_pad != n else out
