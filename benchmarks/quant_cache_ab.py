"""Does prequantizing Dense kernels (ops.quant.build_weight_cache) pay on the
per-batch serving pattern?

The CLIs (validate.py / cbir_eval.py) call the jitted eval/embed step once per
batch, so in-graph weight quantization (absmax+round over every Dense kernel,
~86M params on ViT-B) executes on-device EVERY batch — XLA only hoists it
inside a single jitted loop like bench.py's fori_loop. The weight cache moves
that work to build time. This measures the per-step device time ±cache with
the profiler (wall clock through the tunnel measures dispatch, not compute —
see BASELINE.md timing methodology).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/quant_cache_ab.py
"""
import glob
import gzip
import json
import re

import numpy as np
import jax
import jax.numpy as jnp
import optax

from visiondk_tpu.engine.state import create_train_state
from visiondk_tpu.engine.steps import StepConfig, make_embed_step
from visiondk_tpu.models.factory import EmbeddingModel
from visiondk_tpu.ops.quant import build_weight_cache

BATCH = 128

rng = jax.random.key(0)
model = EmbeddingModel(
    backbone_name="vit_base_patch16_224", feat_dim=128, head_config=None,
    dtype=jnp.bfloat16,
)
x = jnp.zeros((BATCH, 224, 224, 3), jnp.float32)
evars = model.init({"params": rng}, x, method=model.embed, train=False)
state = create_train_state(evars, optax.sgd(0.0))
images = jnp.asarray(
    np.random.default_rng(0).integers(0, 255, (BATCH, 224, 224, 3)).astype(np.uint8)
)


def device_ms(step, tag):
    float(np.asarray(step(state, {"image": images})).sum())  # compile+sync
    with jax.profiler.trace(f"/tmp/prof_qc_{tag}"):
        outs = [step(state, {"image": images}) for _ in range(10)]
        float(np.asarray(outs[-1]).sum())
    tr = sorted(glob.glob(f"/tmp/prof_qc_{tag}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(tr))
    us = sum(
        e["dur"]
        for e in d["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") == 3
        and not (e["name"].startswith("jit_") or re.fullmatch(r"\d+", e["name"]))
    )
    return us / 10 / 1e3


dyn = device_ms(make_embed_step(model, StepConfig(), use_ema=False, quant="int8"), "dyn")
cache = build_weight_cache(state.params)
pre = device_ms(
    make_embed_step(model, StepConfig(), use_ema=False, quant="int8", quant_cache=cache),
    "pre",
)
print(
    f"ViT-B embed int8 per-batch device: dynamic {dyn:.2f} ms "
    f"({BATCH / dyn * 1e3:.0f} img/s) vs prequantized {pre:.2f} ms "
    f"({BATCH / pre * 1e3:.0f} img/s)  saved {dyn - pre:.2f} ms/step",
    flush=True,
)
