"""Int8 inference quantization for the dense-dominated embed/eval paths.

The reference serves embeddings through fp16 faiss-GPU and ONNX consumers
(/root/reference/engine/cbir/evaluation.py:155-168, tools/onnx_predict.py);
it has no quantized inference. On TPU the v5e MXU runs int8×int8→int32 at 2×
the bf16 FLOP rate (394 vs 197 T/s), and ViT-style backbones spend ~77% of
their inference time in `nn.Dense` matmuls (BASELINE.md roofline) — so a
weight+activation int8 path is the natural TPU-native "beats the reference"
serving lever.

Design: a `flax.linen.intercept_methods` interceptor (same mechanism as
utils/cam.py's activation capture) swaps every 2-D `nn.Dense.__call__` for

    y = (round(x/sx)·int8 @ round(W/sw)·int8) · (sx·sw) + b

with dynamic per-tensor activation scale `sx = absmax(x)/127` and static
per-output-channel weight scale `sw = absmax(W, axis=0)/127`. In-graph weight
quantization is hoisted by XLA only within a single jitted loop (bench.py's
fori_loop), NOT across the per-batch step calls the CLIs make — serving
callers therefore pass ``build_weight_cache(params)`` so kernels are
quantized exactly once up front. Everything else (LayerNorm,
softmax, the fused Pallas attention core, convs) stays in the model's own
dtype: accuracy loss is bounded by the Dense layers alone, CI-checked by
tests/test_quant.py (cosine ≥ 0.995 vs the f32 features on a real ViT).

No model changes, no converted checkpoints: any backbone in the zoo gains the
path through `make_embed_step(..., quant="int8")` / the `--quant int8` CLI
flag on validate.py / cbir_eval.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def quantize_tensor(x: Array, axis: Optional[int] = None):
    """Symmetric int8 quantization. Returns (q, scale) with
    x ≈ q.astype(f32) * scale; scale is per-tensor (axis=None) or per-slice
    along ``axis`` (kept as a broadcastable array)."""
    ax = None if axis is None else tuple(i for i in range(x.ndim) if i != axis)
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=ax, keepdims=axis is not None)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense_prequant(
    x: Array, wq: Array, sw: Array, bias: Optional[Array], out_dtype
) -> Array:
    """x [..., K] @ prequantized int8 kernel [K, N] (scale ``sw`` per output
    channel) with dynamic per-tensor activation quant + f32 dequant epilogue."""
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    xq, sx = quantize_tensor(xf)  # per-tensor activation scale
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * (sx * sw.reshape(1, -1))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype).reshape(*lead, wq.shape[1])


def int8_dense(x: Array, kernel: Array, bias: Optional[Array], out_dtype) -> Array:
    """x [..., K] @ kernel [K, N] in int8, quantizing the weight in-graph."""
    wq, sw = quantize_tensor(kernel, axis=1)  # per-output-channel
    return int8_dense_prequant(x, wq, sw, bias, out_dtype)


def build_weight_cache(params) -> dict:
    """Quantize every 2-D ``kernel`` leaf of ``params`` ONCE, keyed by the
    owning module's path ('a/b/c'). Serving callers (validate.py /
    cbir_eval.py / export.py) pass this to make_eval_step/make_embed_step as
    ``quant_cache`` so the per-batch step skips the weight absmax/round pass
    (~1.3 ms/batch on ViT-B — in-graph weight quant is only hoisted inside a
    single jitted loop like bench.py's, NOT across the CLIs' per-batch step
    calls). Build it from the SAME tree the step consumes: ``state.ema_params``
    when use_ema, else ``state.params``. Training-time eval must NOT use a
    cache (weights change every epoch)."""
    cache = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", None) for k in path]
        if keys and keys[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2:
            cache["/".join(keys[:-1])] = quantize_tensor(leaf, axis=1)
    return cache


def _make_dense_interceptor(weight_cache: Optional[dict] = None):
    def _dense_interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if type(mod) is not nn.Dense or context.method_name != "__call__":
            return next_fun(*args, **kwargs)
        params = mod.variables.get("params", {})
        kernel = params.get("kernel")
        if kernel is None or kernel.ndim != 2:
            return next_fun(*args, **kwargs)
        (x,) = args
        bias = params.get("bias") if mod.use_bias else None
        out_dtype = mod.dtype or x.dtype
        if weight_cache is not None:
            # a provided cache is a contract, not a hint: a missing key or a
            # shape mismatch means it was built from the wrong tree (e.g. raw
            # params for a use_ema step) — fail loudly instead of silently
            # serving wrong numbers or quietly re-quantizing per batch
            ent = weight_cache.get("/".join(mod.path))
            if ent is None:
                raise KeyError(
                    f"int8 weight cache has no entry for Dense {'/'.join(mod.path)!r}; "
                    "build_weight_cache must run over the param tree the step "
                    "consumes (ema_params when use_ema)"
                )
            if ent[0].shape != kernel.shape:
                raise ValueError(
                    f"int8 weight cache entry {'/'.join(mod.path)!r} has shape "
                    f"{ent[0].shape}, model kernel is {kernel.shape}: cache built "
                    "from a different model/tree"
                )
            return int8_dense_prequant(x, ent[0], ent[1], bias, out_dtype)
        return int8_dense(x, kernel, bias, out_dtype)

    return _dense_interceptor


def quantized_apply(model, *args, weight_cache: Optional[dict] = None, **kwargs):
    """`model.apply` with every 2-D nn.Dense computed in int8 (see module
    docstring). Drop-in: quantized_apply(model, variables, x, ...).
    ``weight_cache`` (build_weight_cache) skips the in-graph weight quant."""
    with nn.intercept_methods(_make_dense_interceptor(weight_cache)):
        return model.apply(*args, **kwargs)


VALID = (None, "int8")


def check_quant(quant: Optional[str]) -> Optional[str]:
    if quant in ("", "none", "None"):
        quant = None
    if quant not in VALID:
        raise ValueError(f"inference quant must be one of {VALID}, got {quant!r}")
    return quant
