"""A/B: XLA window attention vs the fused Pallas v2 kernel inside the real
swin backbones (full train-like fwd+bwd+update, bf16).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/swin_fused_ab.py [base|tiny] [bs]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from visiondk_tpu.models.backbones import BACKBONES
from visiondk_tpu.losses import create_lossfn

name = {"base": "swin_base_patch4_window7_224", "tiny": "swin_tiny_patch4_window7_224"}[
    sys.argv[1] if len(sys.argv) > 1 else "base"
]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 64

lossfn = create_lossfn("ce")
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
labels = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))

for fused in (False, True):
    model = BACKBONES.get(name)(num_classes=1000, dtype=jnp.bfloat16, use_fused=fused)
    params = model.init({"params": jax.random.key(0)}, jnp.zeros((2, 224, 224, 3)))["params"]

    @jax.jit
    def fwdbwd(p):
        def loss(pp):
            out = model.apply(
                {"params": pp}, imgs, train=True, rngs={"dropout": jax.random.key(1)}
            )
            return lossfn(out, labels, None)

        l, g = jax.value_and_grad(loss)(p)
        p2 = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
        return l, p2

    t0 = time.perf_counter()
    l, params = fwdbwd(params)
    float(l)
    compile_s = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        l, params = fwdbwd(params)
        acc = l if acc is None else acc + l
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    tag = "fused" if fused else "xla  "
    print(f"{name} bs={B} {tag} {dt*1000:8.1f} ms/step {B/dt:8.1f} img/s (compile {compile_s:.0f}s)", flush=True)
