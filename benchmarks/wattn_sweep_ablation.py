"""Measure the VPU-sweep cost of the fused window-attention kernels directly.

BASELINE.md claims the Swin window kernels are bound by VPU sweep AREA
(softmax/bias/mask/delta elementwise over tile-padded [56,128] score blocks),
not by their matmuls or DMA. This script proves it by ablation: it swaps in
kernel variants that keep EVERYTHING structural — the window gather/scatter
relayouts, every per-head dot (q·k, p·v, dv, dp, dq, dk), the p-cache
write/read, identical block specs and grids — and delete only the VPU sweeps
(bias+mask add, max, exp2, row-sum, recip-mul in fwd; p·dp, delta, ds, dbias
reduce in bwd). The ablated kernels compute garbage; the full Swin-B train
step still compiles with the same graph shape, so the difference in the
profiler's attention custom-call device time is exactly the sweeps' cost.

Run (real chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/wattn_sweep_ablation.py [base|tiny] [bs]
"""
import glob
import gzip
import json
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import visiondk_tpu.ops.pallas.window_attention as W
from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.losses import create_lossfn

name = {"base": "swin_base_patch4_window7_224", "tiny": "swin_tiny_patch4_window7_224"}[
    sys.argv[1] if len(sys.argv) > 1 else "base"
]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64


def _ablated_fwd_kernel(*refs, heads, head_dim, ws, nW, RB, RH, masked, scale,
                        save_p=False, P=1):
    if masked:
        qkv_ref, bias_ref, ids_ref, *rest = refs
    else:
        qkv_ref, bias_ref, *rest = refs
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
    xw = W._gather_windows(qkv_ref[...], RB, RH, nW, ws, c3).reshape(R // P, PN, c3)
    for h in range(heads):
        lo = h * head_dim
        q = xw[:, :, lo : lo + head_dim].astype(jnp.float32)
        k = xw[:, :, c + lo : c + lo + head_dim].astype(jnp.float32)
        v = xw[:, :, 2 * c + lo : 2 * c + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        p = s.astype(v.dtype)  # the only kept sweep: operand convert for p·v
        if p_ref is not None:
            p_ref[:, :, h] = p.reshape(RB, G // P, PN, PN)
        ow[:, :, lo : lo + head_dim] = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(ow.dtype)
    o_ref[...] = W._scatter_windows(ow[...].reshape(R, N, c), RB, RH, nW, ws, c)


def _ablated_bwd_from_p_kernel(*refs, heads, head_dim, ws, nW, RB, RH, scale, P=1):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    qkv_ref, p_ref, do_ref, dqkv_ref, dbias_ref, dw = refs

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    N = ws * ws
    R = RB * RH * nW
    PN = P * N
    xw = W._gather_windows(qkv_ref[...], RB, RH, nW, ws, c3).reshape(R // P, PN, c3)
    dow = W._gather_windows(do_ref[...], RB, RH, nW, ws, c).reshape(R // P, PN, c)
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
        ds = dp  # ablated: no p*dp, no delta row-sum, no p*(dp-delta), no dbias reduce
        dq = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dw[:, :, lo : lo + head_dim] = dq.astype(dw.dtype)
        dw[:, :, c + lo : c + lo + head_dim] = dk.astype(dw.dtype)
        dw[:, :, 2 * c + lo : 2 * c + lo + head_dim] = dv.astype(dw.dtype)
    dqkv_ref[...] = W._scatter_windows(dw[...].reshape(R, N, c3), RB, RH, nW, ws, c3)


def run(tag, ablate):
    # "full" always runs first; patching afterwards swaps the kernel bodies the
    # (already-imported) model code resolves through W's module globals.
    if ablate:
        W._wattn_fwd_kernel = _ablated_fwd_kernel
        W._wattn_bwd_from_p_kernel = _ablated_bwd_from_p_kernel
    model = BACKBONES.get(name)(num_classes=1000, dtype=jnp.bfloat16, use_fused=True)
    lossfn = create_lossfn("ce")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))
    params = model.init({"params": jax.random.key(0)}, jnp.zeros((2, 224, 224, 3)))["params"]

    @jax.jit
    def fwdbwd(p):
        def loss(pp):
            out = model.apply(
                {"params": pp}, imgs, train=True, rngs={"dropout": jax.random.key(1)}
            )
            return lossfn(out, labels, None)

        l, g = jax.value_and_grad(loss)(p)
        p2 = jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
        return l, p2

    l, params = fwdbwd(params)
    jnp.isnan(l).item()
    iters = 10
    t0 = time.perf_counter()
    prof = f"/tmp/prof_ablate_{tag}"
    with jax.profiler.trace(prof):
        acc = None
        for _ in range(iters):
            l, params = fwdbwd(params)
            acc = l if acc is None else acc + l
        jnp.isnan(acc).item()
    dt = (time.perf_counter() - t0) / iters
    tr = sorted(glob.glob(prof + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(tr))
    attn_us = tot_us = 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != 3:
            continue
        n = e["name"]
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue
        tot_us += e["dur"]
        if n.startswith("attn"):
            attn_us += e["dur"]
    print(
        f"{name} bs={B} {tag:8s} wall {dt*1e3:7.1f} ms/step  device "
        f"{tot_us/iters/1e3:7.1f} ms  attn-calls {attn_us/iters/1e3:6.1f} ms",
        flush=True,
    )


run("full", ablate=False)
run("ablated", ablate=True)
