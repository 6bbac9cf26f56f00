"""A/B the software-pipelined fused-attention forward (VDK_ATTN_PIPE).

Round-5 VERDICT item 8: both fused kernels sit at ~1.46x their DMA floors;
the last candidate lever is overlapping the softmax VPU sweeps with the score
dot. ops/pallas/attention.py grew a trace-time gate (VDK_ATTN_PIPE=1) that
issues head h+1's q.k MXU dot between head h's exp2/sum/recip sweeps, so the
in-order Mosaic scheduler can run MXU under VPU.

The gate is read at TRACE time, so ONE process can build both variants and
interleave them (tunnel/host drift makes separate-process wall clocks
incomparable). For each trial we profile 10 full ViT-B/16 train steps (bs
128, bf16, value_and_grad + sgd-like update) and 10 fwd-only passes, and read
the DEVICE track (pid 3) from the trace: total device ms/step and the
attention custom-call ms/step (CLAUDE.md: wall clock through the tunnel
measures dispatch, not compute, for small kernels).

Run (real chip): PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/attn_pipe_ab.py [trials]
"""
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from visiondk_tpu.models.factory import VisionModel
from visiondk_tpu.losses import create_lossfn

B = 128
DTYPE = jnp.bfloat16
ITERS = 10


def device_ms(prof_dir):
    tr = sorted(glob.glob(prof_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(tr))
    tot = attn = 0.0
    names = {}
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") != 3:
            continue
        n = e["name"]
        if n.startswith("jit_") or re.fullmatch(r"\d+", n):
            continue
        tot += e["dur"]
        names[n] = names.get(n, 0.0) + e["dur"]
        if "fused" in n or "attn" in n:
            attn += e["dur"]
    top = sorted(names.items(), key=lambda kv: -kv[1])[:4]
    return tot / ITERS / 1e3, attn / ITERS / 1e3, top


def build(pipe, tag):
    """Fresh model + fresh jitted fns so the trace-time VDK_ATTN_PIPE gate is
    re-read (distinct function objects -> distinct jit cache entries)."""
    os.environ["VDK_ATTN_PIPE"] = "1" if pipe else "0"
    model = VisionModel(backbone_name="vit_base_patch16_224", num_classes=1000, dtype=DTYPE)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))
    params = model.init({"params": jax.random.key(0)}, jnp.zeros((2, 224, 224, 3)))["params"]
    lossfn = create_lossfn("ce")

    @jax.jit
    def step(p):
        def loss(pp):
            return lossfn(model.apply({"params": pp}, imgs, train=True), labels, None)

        l, g = jax.value_and_grad(loss)(p)
        p2 = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
        return l, p2

    @jax.jit
    def fwd(p, carry):
        out = model.apply({"params": p}, imgs + carry, train=False)
        return jnp.mean(out).astype(jnp.float32)

    # CRITICAL: trace NOW, while VDK_ATTN_PIPE still holds this variant's
    # value — jit traces lazily at first call, so deferring to trial() would
    # trace every variant with the LAST build's env (first run of this script
    # measured one program twice: base == pipe to 0.01 ms)
    l, params = step(params)
    float(l)
    float(fwd(params, jnp.float32(0)))
    return params, step, fwd, tag


def trial(params, step, fwd, tag, t):
    l, params = step(params)  # warm
    float(l)
    prof = f"/tmp/prof_pipe_{tag}_t{t}"
    with jax.profiler.trace(prof):
        acc = None
        for _ in range(ITERS):
            l, params = step(params)
            acc = l if acc is None else acc + l
        float(acc)
    tr_tot, tr_attn, top = device_ms(prof)

    c = fwd(params, jnp.float32(0))
    float(c)
    proff = f"/tmp/prof_pipe_fwd_{tag}_t{t}"
    with jax.profiler.trace(proff):
        for _ in range(ITERS):
            c = fwd(params, c * 1e-9)
        float(c)
    f_tot, f_attn, _ = device_ms(proff)
    print(
        f"# trial {t} {tag}: train device {tr_tot:6.1f} ms (attn {tr_attn:5.2f})"
        f"  fwd device {f_tot:6.1f} ms (attn {f_attn:5.2f})",
        flush=True,
    )
    if t == 0:
        print(f"#   top events {tag}: " + ", ".join(f"{n}={v/ITERS/1e3:.2f}ms" for n, v in top), flush=True)
    return tr_tot, tr_attn, f_tot, f_attn


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    variants = {tag: build(pipe, tag) for tag, pipe in (("base", False), ("pipe", True))}
    res = {tag: [] for tag in variants}
    for t in range(trials):
        for tag in ("base", "pipe"):
            res[tag].append(trial(*variants[tag], t))
    med = {tag: [float(np.median([r[i] for r in rs])) for i in range(4)] for tag, rs in res.items()}
    out = {
        "metric": "ViT-B attn sw-pipeline A/B (median device ms/step, "
        f"{trials} interleaved trials)",
        "train_ms": {t: round(m[0], 2) for t, m in med.items()},
        "train_attn_ms": {t: round(m[1], 2) for t, m in med.items()},
        "fwd_ms": {t: round(m[2], 2) for t, m in med.items()},
        "fwd_attn_ms": {t: round(m[3], 2) for t, m in med.items()},
        "value": round(med["base"][0] / med["pipe"][0], 4),
        "unit": "x train-step speedup (pipe vs base)",
        "vs_baseline": round(med["base"][0] / med["pipe"][0], 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
