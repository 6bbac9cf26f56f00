"""Dissect Swin-B train-step time (bs 64, bf16): where do 185ms go?

Variants (each full fwd+bwd+SGD-like update through a CE loss):
  full        — the real thing (XLA window attention path)
  attn_id     — attention core replaced by identity (out = v): isolates the
                scores/softmax/bias/mask cost incl. their HBM materialization
  noshift     — shift=0 everywhere (no rolls, no SW masks)
  nobias      — no relative-position bias gather/add
  nowindow    — window partition/reverse replaced by a pure reshape
                (WRONG semantics; measures the 6-d transpose cost)
  bf16scores  — scores computed/softmaxed in bf16 instead of f32

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/swin_dissect.py [variants...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from visiondk_tpu.models.backbones.swin import (
    window_partition,
    window_reverse,
    window_region_ids,
    relative_position_index,
)
from visiondk_tpu.models.layers import DropPath, Mlp
from visiondk_tpu.losses import create_lossfn

B = 64
DTYPE = jnp.bfloat16


class WAttn(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    variant: str = "full"

    @nn.compact
    def __call__(self, x, region_ids):
        Bp, N, C = x.shape
        h = self.num_heads
        hd = C // h
        qkv = nn.Dense(3 * C, dtype=DTYPE, name="qkv")(x)
        q, k, v = jnp.moveaxis(qkv.reshape(Bp, N, 3, h, hd), 2, 0)
        q = jnp.moveaxis(q, 2, 1)
        k = jnp.moveaxis(k, 2, 1)
        v = jnp.moveaxis(v, 2, 1)
        if self.variant == "attn_id":
            out = v
        else:
            acc_t = DTYPE if self.variant == "bf16scores" else jnp.float32
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q * hd**-0.5, k, preferred_element_type=acc_t
            )
            if self.variant != "nobias":
                table = self.param(
                    "rpb", nn.initializers.normal(0.02),
                    ((2 * self.window_size - 1) ** 2, h), jnp.float32,
                )
                idx = relative_position_index(self.window_size)
                bias = jnp.transpose(table[idx.reshape(-1)].reshape(N, N, h), (2, 0, 1))
                attn = attn + bias[None].astype(acc_t)
            if region_ids.max() > 0:
                mask = ((region_ids[:, None, :] != region_ids[:, :, None]).astype(np.float32) * -100.0)
                nW = mask.shape[0]
                attn = attn.reshape(Bp // nW, nW, h, N, N) + jnp.asarray(mask, acc_t)[None, :, None]
                attn = attn.reshape(Bp, h, N, N)
            attn = jax.nn.softmax(attn, axis=-1).astype(DTYPE)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.moveaxis(out, 1, 2).reshape(Bp, N, C)
        return nn.Dense(C, dtype=DTYPE, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    res: tuple
    shift: int
    variant: str

    @nn.compact
    def __call__(self, x):
        H, W = self.res
        Bs, N, C = x.shape
        ws = 7
        shift = 0 if self.variant == "noshift" else self.shift
        y = nn.LayerNorm(dtype=DTYPE, name="n1")(x).reshape(Bs, H, W, C)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        region_ids = window_region_ids(H, W, ws, shift)
        if self.variant == "nowindow":
            windows = y.reshape(-1, ws * ws, C)  # WRONG semantics, layout-free
        else:
            windows = window_partition(y, ws).reshape(-1, ws * ws, C)
        a = WAttn(self.dim, self.num_heads, ws, self.variant, name="attn")(windows, region_ids)
        if self.variant == "nowindow":
            y = a.reshape(Bs, H, W, C)
        else:
            y = window_reverse(a.reshape(-1, ws, ws, C), ws, H, W)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = x + y.reshape(Bs, N, C)
        y = nn.LayerNorm(dtype=DTYPE, name="n2")(x)
        return x + Mlp(int(C * 4), dtype=DTYPE, name="mlp")(y, deterministic=True)


class SwinB(nn.Module):
    variant: str = "full"

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(DTYPE)
        Bs = x.shape[0]
        x = nn.Conv(128, (4, 4), strides=(4, 4), padding="VALID", dtype=DTYPE, name="pe")(x)
        _, H, W, C = x.shape
        x = x.reshape(Bs, H * W, C)
        x = nn.LayerNorm(dtype=DTYPE, name="pn")(x)
        res, dim = (H, W), 128
        heads = (4, 8, 16, 32)
        for stage, depth in enumerate((2, 2, 18, 2)):
            for b in range(depth):
                x = Block(dim, heads[stage], res, 0 if b % 2 == 0 else 3,
                          self.variant, name=f"s{stage}b{b}")(x)
            if stage < 3:
                Hh, Ww = res
                x = x.reshape(Bs, Hh, Ww, dim)
                x = jnp.concatenate(
                    [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
                    axis=-1).reshape(Bs, (Hh // 2) * (Ww // 2), 4 * dim)
                x = nn.LayerNorm(dtype=DTYPE, name=f"mn{stage}")(x)
                x = nn.Dense(2 * dim, use_bias=False, dtype=DTYPE, name=f"mr{stage}")(x)
                res, dim = (Hh // 2, Ww // 2), dim * 2
        x = nn.LayerNorm(dtype=DTYPE, name="nf")(x)
        return nn.Dense(1000, dtype=jnp.float32, name="head")(jnp.mean(x, 1).astype(jnp.float32))


def main():
    variants = sys.argv[1:] or ["full", "attn_id", "noshift", "nobias", "nowindow", "bf16scores"]
    lossfn = create_lossfn("ce")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(B, 224, 224, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 1000, (B,)).astype(np.int32))
    for variant in variants:
        model = SwinB(variant=variant)
        params = model.init({"params": jax.random.key(0)}, jnp.zeros((2, 224, 224, 3)))["params"]

        @jax.jit
        def fwdbwd(p):
            def loss(pp):
                return lossfn(model.apply({"params": pp}, imgs, train=True), labels, None)

            l, g = jax.value_and_grad(loss)(p)
            # fold grads back so iterations chain (SGD-ish)
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
        print(f"{variant:12s} {dt*1000:8.1f} ms/step  {B/dt:8.1f} img/s  (compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
