"""Is int8×int8→int32 dot faster than bf16 on this chip through XLA?

v5e's MXU advertises 2× int8 throughput (394 TOPS vs 197 bf16 TFLOP/s). If
XLA maps `lax.dot_general(int8, int8, preferred_element_type=int32)` onto it,
a quantized inference path for the dense-dominated embed extractor is worth
building; if not, record the negative and skip. Device times come from the
profiler's device track (wall clock through the tunnel measures dispatch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_micro.py
"""
import glob
import gzip
import json
import re

import numpy as np
import jax
import jax.numpy as jnp

M, K, N = 128 * 200, 768, 3072
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-127, 127, (M, K)).astype(np.int8))
b8 = jnp.asarray(rng.integers(-127, 127, (K, N)).astype(np.int8))
abf = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32)).astype(jnp.bfloat16)
bbf = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32)).astype(jnp.bfloat16)


@jax.jit
def dot_i8(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


@jax.jit
def dot_bf(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


@jax.jit
def dot_i8_scaled(a, b, sa, sb):
    """The realistic inference op: int8 dot + dequant epilogue."""
    acc = jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * (sa * sb)).astype(jnp.bfloat16)


sb = jnp.ones((N,), jnp.float32)
for f, args, tag in ((dot_i8, (a8, b8), "i8"), (dot_bf, (abf, bbf), "bf16"),
                     (dot_i8_scaled, (a8, b8, jnp.float32(0.01), sb), "i8+deq")):
    int(np.asarray(f(*args)).reshape(-1)[0])  # compile+sync
    with jax.profiler.trace(f"/tmp/prof_i8_{tag}"):
        outs = [f(*args) for _ in range(10)]
        int(np.asarray(outs[-1]).reshape(-1)[0])
    tr = sorted(glob.glob(f"/tmp/prof_i8_{tag}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(tr))
    us = sum(
        e["dur"]
        for e in d["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3
        and not (e["name"].startswith("jit_") or re.fullmatch(r"\d+", e["name"]))
    )
    flops = 2 * M * K * N
    print(
        f"{tag:7s} {us/10/1e3:7.3f} ms device  {flops/(us/10/1e6)/1e12:6.1f} TOP/s",
        flush=True,
    )
