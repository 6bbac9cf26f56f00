"""Dissect ViT-B/16 train-step time (bs 128, bf16) around the fused kernel.

Variants:
  fused    — production path (fused_qkv_attention)
  xla      — XLA einsum attention
  attn_id  — attention core replaced by identity (out = v slice of qkv):
             bounds the non-attention step time
  fwdonly  — fused, forward pass only (no grad): fwd/bwd split

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/vit_dissect.py [variants...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.layers import Mlp, PatchEmbed
from visiondk_tpu.ops.pallas import fused_qkv_attention
from visiondk_tpu.losses import create_lossfn

B = 128
DTYPE = jnp.bfloat16


class ViTV(nn.Module):
    variant: str = "fused"

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(DTYPE)
        t = PatchEmbed(16, 768, dtype=DTYPE, name="pe")(x)
        Bs, N, C = t.shape
        H, hd = 12, 64
        pos = self.param("pos", nn.initializers.normal(0.02), (1, N, C), jnp.float32)
        t = t + pos.astype(DTYPE)
        if self.variant == "fused200":
            # pad tokens to a sublane multiple: [B,200,C] reshapes to/from
            # [B*200, C] become bitcasts (197 forces a 200-padded tiled layout
            # and therefore a real HBM copy around every matmul)
            t = jnp.pad(t, ((0, 0), (0, -N % 8), (0, 0)))
            N = t.shape[1]
        for i in range(12):
            y = nn.LayerNorm(dtype=DTYPE, name=f"n1_{i}")(t)
            qkv = nn.Dense(3 * C, dtype=DTYPE, name=f"qkv_{i}")(y)
            if self.variant == "attn_id":
                o = qkv[:, :, 2 * C :]
            elif self.variant == "attn_sum":
                # keep q/k columns alive (attn_id lets XLA dead-code 2/3 of
                # the qkv matmul) — bounds the step with a free attention core
                o = qkv[:, :, : C] + qkv[:, :, C : 2 * C] + qkv[:, :, 2 * C :]
            elif self.variant == "xla":
                q, k, v = jnp.moveaxis(qkv.reshape(Bs, N, 3, H, hd), 2, 0)
                q = jnp.moveaxis(q, 2, 1)
                k = jnp.moveaxis(k, 2, 1)
                v = jnp.moveaxis(v, 2, 1)
                a = jnp.einsum("bhqd,bhkd->bhqk", q * hd**-0.5, k,
                               preferred_element_type=jnp.float32)
                a = jax.nn.softmax(a, -1).astype(DTYPE)
                o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
                o = jnp.moveaxis(o, 1, 2).reshape(Bs, N, C)
            else:
                o = fused_qkv_attention(qkv, H)
            t = t + nn.Dense(C, dtype=DTYPE, name=f"proj_{i}")(o)
            y = nn.LayerNorm(dtype=DTYPE, name=f"n2_{i}")(t)
            t = t + Mlp(3072, dtype=DTYPE, name=f"mlp_{i}")(y, deterministic=True)
        t = nn.LayerNorm(dtype=DTYPE, name="nf")(t)
        return nn.Dense(1000, dtype=jnp.float32, name="head")(t[:, 0].astype(jnp.float32))


def main():
    variants = sys.argv[1:] or ["fused", "attn_id", "fwdonly"]
    lossfn = create_lossfn("ce")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))
    for variant in variants:
        model = ViTV(variant="fused" if variant == "fwdonly" else variant)
        params = model.init({"params": jax.random.key(0)}, jnp.zeros((2, 224, 224, 3)))["params"]

        if variant == "fwdonly":

            @jax.jit
            def stepf(p, carry):
                out = model.apply({"params": p}, imgs + carry, train=False)
                return jnp.mean(out).astype(jnp.float32)

            t0 = time.perf_counter()
            c = stepf(params, jnp.float32(0))
            float(c)
            compile_s = time.perf_counter() - t0
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                c = stepf(params, c * 1e-9)
            float(c)
        else:

            @jax.jit
            def step(p):
                def loss(pp):
                    return lossfn(model.apply({"params": pp}, imgs, train=True), labels, None)

                l, g = jax.value_and_grad(loss)(p)
                p2 = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
                return l, p2

            t0 = time.perf_counter()
            l, params = step(params)
            float(l)
            compile_s = time.perf_counter() - t0
            iters = 20
            t0 = time.perf_counter()
            acc = None
            for _ in range(iters):
                l, params = step(params)
                acc = l if acc is None else acc + l
            float(acc)
        dt = (time.perf_counter() - t0) / iters
        print(f"{variant:8s} {dt*1000:8.1f} ms/step {B/dt:8.1f} img/s (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
