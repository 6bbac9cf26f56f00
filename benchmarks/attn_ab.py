"""A/B: XLA attention vs fused pallas vision_attention inside a ViT-B (fwd+bwd, B=128)."""
import time, numpy as np
import jax, jax.numpy as jnp
from flax import linen as nn
from visiondk_tpu.models.layers import Mlp, PatchEmbed
from visiondk_tpu.ops.pallas import vision_attention
from visiondk_tpu.engine.steps import device_preprocess
from visiondk_tpu.losses import create_lossfn

B = 128
lossfn = create_lossfn("ce")
rngk = jax.random.key(0)
imgs = jnp.asarray(np.random.default_rng(0).integers(0,255,(B,224,224,3)).astype(np.uint8))
labels = jnp.asarray(np.random.default_rng(1).integers(0,1000,(B,)).astype(np.int32))

def timed_scalar(fn, iters=20):
    s = fn(); float(s)
    t0 = time.perf_counter(); acc = None
    for _ in range(iters):
        s = fn(); acc = s if acc is None else acc + s
    float(acc)
    return (time.perf_counter()-t0)/iters

class ViTP(nn.Module):
    use_pallas: bool = True
    dtype: any = jnp.bfloat16
    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        t = PatchEmbed(16, 768, dtype=self.dtype, name="pe")(x)
        Bs, N, C = t.shape
        H, hd = 12, 64
        pos = self.param("pos", nn.initializers.normal(0.02), (1,N,C), jnp.float32)
        t = t + pos.astype(self.dtype)
        for i in range(12):
            y = nn.LayerNorm(dtype=self.dtype, name=f"n1_{i}")(t)
            qkv = nn.Dense(3*C, dtype=self.dtype, name=f"qkv_{i}")(y).reshape(Bs, N, 3, H, hd)
            q, k, v = jnp.moveaxis(qkv, 2, 0)
            q = jnp.moveaxis(q,2,1); k = jnp.moveaxis(k,2,1); v = jnp.moveaxis(v,2,1)
            if self.use_pallas:
                o = vision_attention(q, k, v)
            else:
                a = jnp.einsum("bhqd,bhkd->bhqk", q*(hd**-0.5), k, preferred_element_type=jnp.float32)
                a = jax.nn.softmax(a, -1).astype(self.dtype)
                o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
            o = jnp.moveaxis(o,1,2).reshape(Bs, N, C)
            t = t + nn.Dense(C, dtype=self.dtype, name=f"proj_{i}")(o)
            y = nn.LayerNorm(dtype=self.dtype, name=f"n2_{i}")(t)
            t = t + Mlp(3072, dtype=self.dtype, name=f"mlp_{i}")(y, deterministic=True)
        t = nn.LayerNorm(dtype=self.dtype, name="nf")(t)
        return nn.Dense(1000, dtype=jnp.float32, name="head")(t[:,0].astype(jnp.float32))

for use_pallas in (False, True):
    model = ViTP(use_pallas=use_pallas)
    params = model.init({"params": rngk}, jnp.zeros((8,224,224,3)), train=False)["params"]
    @jax.jit
    def fwdbwd(p):
        ims = device_preprocess(imgs, (0.485,0.456,0.406),(0.229,0.224,0.225))
        def loss(pp):
            return lossfn(model.apply({"params": pp}, ims, train=True), labels, None)
        l, g = jax.value_and_grad(loss)(p)
        return l + sum(jnp.sum(jnp.abs(t.astype(jnp.float32))) for t in jax.tree_util.tree_leaves(g)) * 0
    t = timed_scalar(lambda: fwdbwd(params))
    print(f"pallas={use_pallas} {t*1e3:7.1f} ms -> {B/t:6.0f} img/s")
