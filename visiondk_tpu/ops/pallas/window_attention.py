"""Fused windowed attention v2 (Pallas/TPU) for Swin-style transformers.

Swin — the reference's default backbone (configs/classification/pet.yaml:25)
— is the worst-case XLA attention shape: thousands of tiny [49, 32] matmuls
plus relative-position-bias and shifted-window-mask adds, each materializing
[B·nW, h, 49, 49] tensors in HBM. Measured (benchmarks/swin_dissect.py,
Swin-B bs64 bf16 on v5e): the attention core alone is 90 ms of a 176 ms train
step — 51%.

v1 of this kernel (git history) padded windows 49→128 host-side (6.8× wasted
score FLOPs plus an extra HBM pad/slice pass) and Python-looped windows one
at a time; it measured 6× slower than XLA. v2 fixes both and also swallows
the window (de)partition:

- consumes the QKV projection's natural ``[B, H, W, 3C]`` layout; the grid
  walks (batch-block, window-row-block) and each cell rearranges its windows
  in VMEM — the host-side 6-d window_partition/reverse transposes disappear;
- windows stay N=49 (padding only to the physical 56-sublane/128-lane tile,
  never in the FLOP count);
- all windows of a cell ride one batched dot per head (`dot_general` with a
  leading batch dim) instead of per-window loops;
- the relative-position bias [h, 49, 49] has a constant index map, so Pallas
  fetches it once and keeps it VMEM-resident across the whole grid;
- the shifted-window mask is recomputed in-VMEM from compact per-window
  region ids (ws² int32 per window instead of ws⁴ f32 mask rows in HBM); the
  unshifted variant compiles the mask path away entirely (static flag);
- the backward kernel recomputes probabilities flash-style, emits dqkv in the
  same [B, H, W, 3C] layout, and accumulates the bias gradient across all
  cells into a constant-index output block (sequential grid). Under
  ``shard_map`` the per-shard partial dbias is psum'd by shard_map's own
  transpose of the replicated bias input — no explicit collective here.

Layout contract:
- ``qkv``  [B, H, W, 3C]  (H % ws == 0, W % ws == 0)
- ``bias`` [heads, ws², ws²] f32 — relative-position bias per head
- ``ids``  [nH·nW, ws²] int32 region ids (row-major over windows), or None
  for the unshifted case (W-MSA)
Returns [B, H, W, C].

Reference semantics: softmax(QKᵀ/√d + bias + mask)·V per window, mask value
-100.0 between different shift regions (reference models swin mask;
/root/reference — timm swin via WindowAttention has the same structure).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visiondk_tpu.ops.pallas._interpret import interpret_forced

Array = jax.Array

_MASK_VAL = -100.0  # reference shifted_window_mask value (swin region mask)

# Off-diagonal fill for the window-PAIRING mask (see _pick_pair): after the
# kernel's ×log2e fold this is ≈ -43k, so exp2(s - m) underflows to EXACTLY
# 0.0 in f32 — cross-window probabilities vanish bit-exactly and the paired
# kernel computes the same o/dqkv/dbias as the unpaired one.
_PAIR_MASK_VAL = -30000.0


def _pick_pair(nW: int) -> int:
    """Windows packed block-diagonally into one attention call (opt-in).

    Hypothesis (round 3): the dominant stage-3 calls run at ~6× their DMA
    floor on thousands of tiny [56,32]×[32,128] MXU ops, so packing P=2
    windows into one 98-token attention with a -inf-like off-diagonal mask
    (halving the matmul count; one [104,128] score tile vs two [56,128])
    should help. MEASURED on the full Swin-B v5e step: 623 → 599 img/s
    (attn custom calls 36.5 → 40.4 ms). The kernel is bound by VPU sweep
    AREA (softmax + head-slice relayouts over tile-padded scores), which
    pairing barely changes, while the [R,N,c]→[R/P,PN,c] regroup adds a
    relayout per tensor. Kept as an opt-in (VDK_WATTN_PAIR=2, exactness
    covered by test_window_pairing_matches_unpaired) and as the recorded
    negative result behind BASELINE.md's Swin roofline. Pairs never cross a
    window ROW (P must divide nW) so any (RB, RH) cell plan slices the
    paired p-cache cleanly.
    """
    import os

    want = max(1, int(os.environ.get("VDK_WATTN_PAIR", "1") or 1))
    p = 1
    while p * 2 <= want and nW % (p * 2) == 0:
        p *= 2
    return p


def _cell_resident_bytes(
    RB: int, RH: int, ws: int, W: int, nW: int, c3: int,
    p_bytes_per_window: int, P: int = 1, elt_bytes: int = 2,
) -> int:
    """Upper-bound VMEM footprint of one grid cell: the x/do and o/dqkv
    blocks, the f32 gathered-window temporaries, one head's [R,N,N] score/p
    working set, and the optional p-cache block. Conservative — Mosaic may
    fuse some temporaries away — but it catches the shapes that would
    otherwise fail at compile time (wide W or nW ≫ the windows target).
    ``elt_bytes`` is the compute dtype's size (bf16→2, f32→4) — the x/o
    blocks and p-cache live in that dtype."""
    c = c3 // 3
    N = ws * ws
    R = RB * RH * nW
    x_blocks = RB * RH * ws * W * (c3 + c) * elt_bytes  # in + out blocks
    gathered = R * N * (c3 + c) * 4  # xw + dow f32 relayouts
    scores = R * P * N * N * 4 * 2  # one head's p + ds ([R/P, PN, PN] paired)
    p_cache = RB * RH * nW * p_bytes_per_window
    return x_blocks + gathered + scores + p_cache


def _plan(
    B: int, nH: int, nW: int, ws: int, W: int, c3: int, budget: int,
    p_bytes_per_window: int = 0, P: int = 1, elt_bytes: int = 2,
) -> Tuple[int, int]:
    """Pick (batch rows RB, window rows RH) per grid cell: enough windows to
    amortize per-cell overhead, x-block (+ optional p-cache block) under
    ``budget`` bytes in the compute dtype (``elt_bytes``: bf16→2, f32→4).
    A hard cap on the FULL resident footprint
    (x/o blocks + f32 gathered temporaries + score working set) additionally
    shrinks RH for wide stages — the budget alone only bounds the x block, so
    a large-W or many-window shape could otherwise pass planning and die in
    Mosaic VMEM allocation even at RB=1."""
    import os

    target = int(os.environ.get("VDK_WATTN_CELL_WINDOWS", "16"))  # windows per cell
    hard_cap = int(os.environ.get("VDK_WATTN_VMEM_CAP", str(6 * 1024 * 1024)))
    RH = 1
    for cand in range(nH, 0, -1):
        if nH % cand == 0 and cand * nW <= target:
            RH = cand
            break
    # shrink RH (not just RB) when even a single batch row oversubscribes VMEM
    while RH > 1 and _cell_resident_bytes(1, RH, ws, W, nW, c3, p_bytes_per_window, P, elt_bytes) > hard_cap:
        RH = next(c for c in range(RH - 1, 0, -1) if nH % c == 0)
    RB = 1
    per_b = RH * ws * W * c3 * elt_bytes + RH * nW * p_bytes_per_window
    for cand in range(B, 0, -1):
        if (
            B % cand == 0
            and cand * RH * nW <= target
            and cand * per_b <= budget
            and _cell_resident_bytes(cand, RH, ws, W, nW, c3, p_bytes_per_window, P, elt_bytes) <= hard_cap
        ):
            RB = cand
            break
    return RB, RH


def plan_fits(
    B: int, H: int, W: int, c3: int, ws: int, heads: int, elt_bytes: int = 2
) -> bool:
    """True when the fused kernel has a VMEM-feasible plan for this shape.
    Callers (models/backbones/swin*.py) gate the fused path on this and fall
    back to XLA windows otherwise — a shape whose single window-row block
    already oversubscribes VMEM would die in Mosaic allocation. Pass
    ``elt_bytes=4`` for f32 models (blocks + p-cache live in the compute
    dtype; assuming bf16 would halve the estimate and re-create the compile
    failure this guard exists to prevent)."""
    import os

    hard_cap = int(os.environ.get("VDK_WATTN_VMEM_CAP", str(6 * 1024 * 1024)))
    nH, nW = H // ws, W // ws
    N = ws * ws
    P = _pick_pair(nW)
    p_bytes = heads * N * N * elt_bytes * P  # fwd p-cache block per window
    _, RH = _plan(
        B, nH, nW, ws, W, c3, budget=2_500_000,
        p_bytes_per_window=p_bytes, P=P, elt_bytes=elt_bytes,
    )
    return _cell_resident_bytes(1, RH, ws, W, nW, c3, p_bytes, P, elt_bytes) <= hard_cap


def _gather_windows(x: Array, RB: int, RH: int, nW: int, ws: int, c: int) -> Array:
    """[RB, RH·ws, nW·ws, c] → [RB·RH·nW, ws², c] (VMEM relayout)."""
    x = x.reshape(RB, RH, ws, nW, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(RB * RH * nW, ws * ws, c)


def _scatter_windows(o: Array, RB: int, RH: int, nW: int, ws: int, c: int) -> Array:
    """[RB·RH·nW, ws², c] → [RB, RH·ws, nW·ws, c]."""
    o = o.reshape(RB, RH, nW, ws, ws, c)
    o = jnp.transpose(o, (0, 1, 3, 2, 4, 5))
    return o.reshape(RB, RH * ws, nW * ws, c)


_LOG2E = 1.4426950408889634


def _region_mask(ids: Array) -> Array:
    """[G, N] int32 → [G, N, N] f32 additive mask (log2-domain value — the
    scores it joins are ×log2e, see ``_scores``)."""
    return jnp.where(
        ids[:, :, None] != ids[:, None, :], jnp.float32(_MASK_VAL * _LOG2E), jnp.float32(0.0)
    )


def _pair_bias(bias: Array, P: int, N: int) -> Array:
    """[h, N, N] → [h, PN, PN]: the per-window bias on the diagonal blocks,
    ``_PAIR_MASK_VAL`` off-diagonal (kills cross-window attention exactly —
    see _pick_pair). Built outside the kernel (tiny, constant index map →
    fetched to VMEM once for the whole grid)."""
    if P == 1:
        return bias
    blk = jnp.kron(jnp.eye(P, dtype=jnp.int32), jnp.ones((N, N), jnp.int32)) != 0
    return jnp.where(blk, jnp.tile(bias, (1, P, P)), jnp.float32(_PAIR_MASK_VAL))


def _pair_ids(ids: Optional[Array], P: int) -> Optional[Array]:
    """[G, N] region ids → [G/P, PN], each window slot offset into its own id
    space so the region mask never matches across paired windows (the pair
    mask already zeroes those entries; the offset keeps ids well-defined)."""
    if ids is None or P == 1:
        return ids
    G, N = ids.shape
    off = (jnp.arange(P, dtype=ids.dtype) + 1) * 4096
    return (ids.reshape(G // P, P, N) + off[None, :, None]).reshape(G // P, P * N)


def _scores(q, k, bias_h, mask, G: int, scale: float):
    """Batched [R, N, N] **log2-domain** scores: (scale·QKᵀ + bias + mask)·log2e
    with log2e folded into the cheap [N,D] q prescale and the [N,N] bias (once
    per cell), so the softmax can use exp2 without any extra N²·R sweep. The
    caller's p is unchanged as a function of the inputs — every backward
    formula stays in the original domain.

    Operands are cast to f32 before the dot: measured 602 vs 497 img/s on
    Swin-B train against native-bf16 operands at these tiny K=32 shapes
    (bf16's (16,128) tiling pads the 49-row windows worse than f32's
    (8,128); the conversions are cheap VPU sweeps)."""
    s = jax.lax.dot_general(
        q * (scale * _LOG2E), k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s + bias_h[None]
    if mask is not None:
        R, N, _ = s.shape
        s = (s.reshape(R // G, G, N, N) + mask[None]).reshape(R, N, N)
    return s


def _wattn_fwd_kernel(
    *refs, heads: int, head_dim: int, ws: int, nW: int, RB: int, RH: int,
    masked: bool, scale: Optional[float], save_p: bool = False, P: int = 1,
):
    if masked:
        qkv_ref, bias_ref, ids_ref, *rest = refs
        Gp = (RH * nW) // P
        # ids_ref holds the whole array; take this cell's window-row rows
        mask = _region_mask(ids_ref[pl.ds(pl.program_id(1) * Gp, Gp)])  # [G/P, PN, PN]
    else:
        qkv_ref, bias_ref, *rest = refs
        mask = None
    if save_p:
        o_ref, p_ref, ow = rest
    else:
        o_ref, ow = rest
        p_ref = None
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    N = ws * ws
    G = RH * nW
    R = RB * G
    PN = P * N
    scale = head_dim**-0.5 if scale is None else scale
    # [R, N, 3C] → paired [R/P, PN, 3C]: P windows block-stacked along tokens
    xw = _gather_windows(qkv_ref[...], RB, RH, nW, ws, c3).reshape(R // P, PN, c3)
    bias2 = bias_ref[...] * _LOG2E  # log2-domain (once per cell, all heads)
    for h in range(heads):
        lo = h * head_dim
        q = xw[:, :, lo : lo + head_dim].astype(jnp.float32)
        k = xw[:, :, c + lo : c + lo + head_dim].astype(jnp.float32)
        v = xw[:, :, 2 * c + lo : 2 * c + lo + head_dim]
        s = _scores(q, k, bias2[h], mask, G // P, scale)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp2(s - m)
        p = (e * (1.0 / jnp.sum(e, axis=2, keepdims=True))).astype(v.dtype)
        if p_ref is not None:
            # stash probabilities for backward (skips its score matmul,
            # bias/mask adds, and softmax recompute — the dominant VPU cost
            # at these 49-token, 2.6×-lane-padded shapes)
            p_ref[:, :, h] = p.reshape(RB, G // P, PN, PN)
        ow[:, :, lo : lo + head_dim] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(ow.dtype)
    o_ref[...] = _scatter_windows(ow[...].reshape(R, N, c), RB, RH, nW, ws, c)


def _wattn_bwd_kernel(
    *refs, heads: int, head_dim: int, ws: int, nW: int, RB: int, RH: int,
    masked: bool, scale: Optional[float], P: int = 1,
):
    if masked:
        qkv_ref, bias_ref, ids_ref, do_ref, dqkv_ref, dbias_ref, dw = refs
        Gp = (RH * nW) // P
        mask = _region_mask(ids_ref[pl.ds(pl.program_id(1) * Gp, Gp)])
    else:
        qkv_ref, bias_ref, do_ref, dqkv_ref, dbias_ref, dw = refs
        mask = None

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    N = ws * ws
    G = RH * nW
    R = RB * G
    PN = P * N
    scale = head_dim**-0.5 if scale is None else scale
    xw = _gather_windows(qkv_ref[...], RB, RH, nW, ws, c3).reshape(R // P, PN, c3)
    dow = _gather_windows(do_ref[...], RB, RH, nW, ws, c).reshape(R // P, PN, c)
    bias2 = bias_ref[...] * _LOG2E  # log2-domain (once per cell, all heads)
    for h in range(heads):
        lo = h * head_dim
        q = xw[:, :, lo : lo + head_dim].astype(jnp.float32)
        k = xw[:, :, c + lo : c + lo + head_dim].astype(jnp.float32)
        v = xw[:, :, 2 * c + lo : 2 * c + lo + head_dim].astype(jnp.float32)
        do = dow[:, :, lo : lo + head_dim].astype(jnp.float32)
        s = _scores(q, k, bias2[h], mask, G // P, scale)
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp2(s - m)
        p = e * (1.0 / jnp.sum(e, axis=2, keepdims=True))
        dv = jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=2, keepdims=True)
        ds = p * (dp - delta)  # grad wrt (scaled scores + bias + mask)
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dw[:, :, lo : lo + head_dim] = dq.astype(dw.dtype)
        dw[:, :, c + lo : c + lo + head_dim] = dk.astype(dw.dtype)
        dw[:, :, 2 * c + lo : 2 * c + lo + head_dim] = dv.astype(dw.dtype)
    dqkv_ref[...] = _scatter_windows(dw[...].reshape(R, N, c3), RB, RH, nW, ws, c3)


def _wattn_bwd_from_p_kernel(
    *refs, heads: int, head_dim: int, ws: int, nW: int, RB: int, RH: int,
    scale: Optional[float], P: int = 1,
):
    """Backward with the forward's stashed probabilities: no score matmul, no
    bias/mask adds, no softmax recompute. dbias still accumulates Σ ds across
    cells (sequential grid); the region mask is implicit in the cached p."""
    qkv_ref, p_ref, do_ref, dqkv_ref, dbias_ref, dw = refs

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    N = ws * ws
    R = RB * RH * nW
    PN = P * N
    scale = head_dim**-0.5 if scale is None else scale
    xw = _gather_windows(qkv_ref[...], RB, RH, nW, ws, c3).reshape(R // P, PN, c3)
    dow = _gather_windows(do_ref[...], RB, RH, nW, ws, c).reshape(R // P, PN, c)
    for h in range(heads):
        lo = h * head_dim
        q = xw[:, :, lo : lo + head_dim].astype(jnp.float32)
        k = xw[:, :, c + lo : c + lo + head_dim].astype(jnp.float32)
        v = xw[:, :, 2 * c + lo : 2 * c + lo + head_dim].astype(jnp.float32)
        do = dow[:, :, lo : lo + head_dim].astype(jnp.float32)
        p = p_ref[:, :, h].reshape(R // P, PN, PN).astype(jnp.float32)
        dv = jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        delta = jnp.sum(p * dp, axis=2, keepdims=True)
        ds = p * (dp - delta)  # grad wrt (scaled scores + bias + mask)
        dbias_ref[h] += jnp.sum(ds, axis=0)
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dw[:, :, lo : lo + head_dim] = dq.astype(dw.dtype)
        dw[:, :, c + lo : c + lo + head_dim] = dk.astype(dw.dtype)
        dw[:, :, 2 * c + lo : 2 * c + lo + head_dim] = dv.astype(dw.dtype)
    dqkv_ref[...] = _scatter_windows(dw[...].reshape(R, N, c3), RB, RH, nW, ws, c3)


def _common(qkv: Array, bias: Array, heads: int):
    B, H, W, c3 = qkv.shape
    c = c3 // 3
    head_dim = c // heads
    N = bias.shape[-1]
    ws = int(round(N**0.5))
    nH, nW = H // ws, W // ws
    return B, H, W, c3, c, head_dim, N, ws, nH, nW


def _specs(B, nH, nW, ws, W, c3, c, heads, N, RB, RH, masked, P=1):
    G = RH * nW
    PN = P * N
    x_spec = pl.BlockSpec(
        (RB, RH * ws, W, c3), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (heads, PN, PN), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    # whole (tiny) ids array, constant index map — fetched to VMEM once; the
    # kernel slices its G/P rows itself (a G/P row-block can violate Mosaic's
    # sublane divisibility when pairing halves it, e.g. 4 rows of an 8-row
    # array)
    ids_spec = pl.BlockSpec(
        (nH * nW // P, PN), lambda b, i: (0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec(
        (RB, RH * ws, W, c), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [x_spec, bias_spec] + ([ids_spec] if masked else [])
    return in_specs, o_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_window_attention(
    qkv: Array, bias: Array, ids: Optional[Array], heads: int,
    scale: Optional[float] = None,
) -> Array:
    """softmax(scale·QKᵀ + bias [+ shift mask])·V over ws×ws windows.

    ``scale`` defaults to 1/√head_dim (Swin V1). SwinV2 passes 1.0 and bakes
    its learned per-head logit scale into q outside the kernel (cosine
    attention: q/k are pre-normalized, scale is a traced tensor — folding it
    into q keeps the kernel static).

    See module docstring for the layout contract. Safe inside ``shard_map``
    over the batch axis: the bias cotangent is per-shard partial, and
    shard_map's transpose of the replicated (P()) bias input inserts the
    cross-shard psum itself (verified by
    tests/test_pallas_attention.py::test_fused_window_attention_sharded_equals_single)."""
    return _wattn_fwd(qkv, bias, ids, heads, scale)


def _wattn_fwd(qkv, bias, ids, heads, scale=None):
    B, H, W, c3, c, head_dim, N, ws, nH, nW = _common(qkv, bias, heads)
    masked = ids is not None
    P = _pick_pair(nW)
    eb = jnp.dtype(qkv.dtype).itemsize
    RB, RH = _plan(B, nH, nW, ws, W, c3, budget=2_500_000, P=P, elt_bytes=eb)
    in_specs, o_spec = _specs(B, nH, nW, ws, W, c3, c, heads, N, RB, RH, masked, P)
    kern = functools.partial(
        _wattn_fwd_kernel,
        heads=heads, head_dim=head_dim, ws=ws, nW=nW, RB=RB, RH=RH, masked=masked,
        scale=scale, P=P,
    )
    R = RB * RH * nW
    args = (qkv, _pair_bias(bias, P, N), _pair_ids(ids, P)) if masked else (
        qkv, _pair_bias(bias, P, N))
    return pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(B // RB, nH // RH),
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, c), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((R // P, P * N, c), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nH * nW * heads * N * N * head_dim,
            bytes_accessed=B * H * W * (c3 + c) * 2,
            transcendentals=B * nH * nW * heads * N * N,
        ),
    )(*args)


def _p_cache_enabled() -> bool:
    import os

    return os.environ.get("VDK_ATTN_NO_PCACHE", "0") != "1"


def _p_spec(RB, G, heads, N, P=1):
    return pl.BlockSpec(
        (RB, G // P, heads, P * N, P * N),
        lambda b, i: (b, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _wattn_vjp_fwd(qkv, bias, ids, heads, scale):
    if not _p_cache_enabled():
        return _wattn_fwd(qkv, bias, ids, heads, scale), (qkv, bias, ids, None)
    B, H, W, c3, c, head_dim, N, ws, nH, nW = _common(qkv, bias, heads)
    masked = ids is not None
    P = _pick_pair(nW)
    eb = jnp.dtype(qkv.dtype).itemsize
    RB, RH = _plan(
        B, nH, nW, ws, W, c3, budget=2_500_000,
        p_bytes_per_window=heads * N * N * eb * P, P=P, elt_bytes=eb,
    )
    in_specs, o_spec = _specs(B, nH, nW, ws, W, c3, c, heads, N, RB, RH, masked, P)
    kern = functools.partial(
        _wattn_fwd_kernel,
        heads=heads, head_dim=head_dim, ws=ws, nW=nW, RB=RB, RH=RH, masked=masked,
        scale=scale, save_p=True, P=P,
    )
    R = RB * RH * nW
    G = RH * nW
    args = (qkv, _pair_bias(bias, P, N), _pair_ids(ids, P)) if masked else (
        qkv, _pair_bias(bias, P, N))
    o, p = pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(B // RB, nH // RH),
        in_specs=in_specs,
        out_specs=[o_spec, _p_spec(RB, G, heads, N, P)],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, c), qkv.dtype),
            jax.ShapeDtypeStruct((B, nH * nW // P, heads, P * N, P * N), qkv.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((R // P, P * N, c), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * nH * nW * heads * N * N * head_dim,
            bytes_accessed=B * H * W * (c3 + c) * 2 + B * nH * nW * heads * N * N * 2,
            transcendentals=B * nH * nW * heads * N * N,
        ),
    )(*args)
    return o, (qkv, bias, ids, p)


def _wattn_vjp_bwd(heads, scale, res, g):
    qkv, bias, ids, p = res
    B, H, W, c3, c, head_dim, N, ws, nH, nW = _common(qkv, bias, heads)
    masked = ids is not None
    P = _pick_pair(nW)
    PN = P * N
    dbias_spec = pl.BlockSpec(
        (heads, PN, PN), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    eb = jnp.dtype(qkv.dtype).itemsize
    if p is None:
        RB, RH = _plan(B, nH, nW, ws, W, c3, budget=1_500_000, P=P, elt_bytes=eb)
        in_specs, o_spec = _specs(B, nH, nW, ws, W, c3, c, heads, N, RB, RH, masked, P)
        kern = functools.partial(
            _wattn_bwd_kernel,
            heads=heads, head_dim=head_dim, ws=ws, nW=nW, RB=RB, RH=RH, masked=masked,
            scale=scale, P=P,
        )
        in_specs = in_specs + [o_spec]
        args = (qkv, _pair_bias(bias, P, N), _pair_ids(ids, P), g) if masked else (
            qkv, _pair_bias(bias, P, N), g)
        flops = 5 * 2 * B * nH * nW * heads * N * N * head_dim
    else:
        RB, RH = _plan(
            B, nH, nW, ws, W, c3, budget=1_500_000,
            p_bytes_per_window=heads * N * N * eb * P, P=P, elt_bytes=eb,
        )
        x_specs, o_spec = _specs(B, nH, nW, ws, W, c3, c, heads, N, RB, RH, False, P)
        kern = functools.partial(
            _wattn_bwd_from_p_kernel,
            heads=heads, head_dim=head_dim, ws=ws, nW=nW, RB=RB, RH=RH, scale=scale,
            P=P,
        )
        in_specs = [x_specs[0], _p_spec(RB, RH * nW, heads, N, P), o_spec]
        args = (qkv, p, g)
        flops = 4 * 2 * B * nH * nW * heads * N * N * head_dim
    R = RB * RH * nW
    dqkv, dbiasP = pl.pallas_call(
        kern,
        interpret=interpret_forced(),
        grid=(B // RB, nH // RH),
        in_specs=in_specs,
        out_specs=[in_specs[0], dbias_spec],
        out_shape=[
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((heads, PN, PN), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R // P, PN, c3), qkv.dtype)],
        # dbias accumulates across cells → sequential grid
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * H * W * (c3 + c) * 2,
            transcendentals=B * nH * nW * heads * N * N,
        ),
    )(*args)
    if P > 1:
        # every paired window added its ds into its own diagonal block; the
        # per-window bias gradient is their sum (cross blocks are exact zeros)
        dbias = sum(dbiasP[:, j * N : (j + 1) * N, j * N : (j + 1) * N] for j in range(P))
    else:
        dbias = dbiasP
    return dqkv, dbias.astype(bias.dtype), None


fused_window_attention.defvjp(_wattn_vjp_fwd, _wattn_vjp_bwd)
