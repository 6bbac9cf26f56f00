"""Microbench the fused ViT attention kernel at ViT-B shapes.

Times fused_qkv_attention fwd and fwd+bwd at [128, 197, 3*768] (12 heads)
against the bare XLA attention core, plus rows-per-cell variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/attn_kernel_micro.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import visiondk_tpu.ops.pallas.attention as A

B, N, H, D = 128, 197, 12, 64
C = H * D
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)).astype(np.float32)).astype(jnp.bfloat16)


def timed(fn, label, iters=30):
    out = fn(qkv)
    s = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        out = fn(qkv)
        acc = out if acc is None else acc + out
    float(jnp.sum(acc.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt*1000:8.2f} ms", flush=True)
    return dt


def xla_core(qkv):
    q, k, v = jnp.moveaxis(qkv.reshape(B, N, 3, H, D), 2, 0)
    q = jnp.moveaxis(q, 2, 1)
    k = jnp.moveaxis(k, 2, 1)
    v = jnp.moveaxis(v, 2, 1)
    a = jnp.einsum("bhqd,bhkd->bhqk", q * D**-0.5, k, preferred_element_type=jnp.float32)
    a = jax.nn.softmax(a, -1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    return jnp.moveaxis(o, 1, 2).reshape(B, N, C)


def grad_of(f):
    def g(x):
        return jax.grad(lambda xx: jnp.sum(f(xx).astype(jnp.float32) ** 2))(x)

    return jax.jit(g)


for rows in (1, 2, 4):
    A._rows_per_cell = lambda b, _r=rows: _r
    fwd = jax.jit(lambda x: A.fused_qkv_attention(x, H))
    timed(fwd, f"fused fwd rows={rows}")
    timed(grad_of(lambda x: A.fused_qkv_attention(x, H)), f"fused fwd+bwd rows={rows}")

timed(jax.jit(xla_core), "xla core fwd")
timed(grad_of(xla_core), "xla core fwd+bwd")
