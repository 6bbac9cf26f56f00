"""What do ViT-B's dense matmuls actually run at on this chip?

Times (a) a bare 12-layer MLP chain at ViT-B shapes (fwd+bwd+update, no
attention, no LN), (b) the same with LayerNorms and residuals, to separate
"matmul roof at these shapes" from "elementwise/LN drag".

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/dense_micro.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

B, N, C, F = 128, 197, 768, 3072
DT = jnp.bfloat16


class Chain(nn.Module):
    with_ln: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(12):
            y = nn.LayerNorm(dtype=DT, name=f"ln{i}")(x) if self.with_ln else x
            y = nn.Dense(F, dtype=DT, name=f"up{i}")(y)
            y = nn.gelu(y)
            y = nn.Dense(C, dtype=DT, name=f"dn{i}")(y)
            x = x + y if self.with_ln else y
        return x


def bench(with_ln):
    model = Chain(with_ln=with_ln)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, N, C)).astype(np.float32)).astype(DT)
    params = model.init(jax.random.key(0), x[:2])["params"]

    @jax.jit
    def step(p):
        l, g = jax.value_and_grad(
            lambda pp: jnp.sum(model.apply({"params": pp}, x).astype(jnp.float32) ** 2)
        )(p)
        return l, jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

    l, params = step(params)
    float(l)
    iters = 20
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        l, params = step(params)
        acc = l if acc is None else acc + l
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    flops = 3 * 2 * 12 * 2 * B * N * C * F  # fwd+bwd(2x) over 12 blocks, 2 matmuls
    print(f"{'mlp+ln ' if with_ln else 'mlp    '} {dt*1000:7.2f} ms  {flops/dt/1e12:6.1f} TF/s", flush=True)


bench(False)
bench(True)
