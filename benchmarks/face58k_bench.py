#!/usr/bin/env python
"""Real-chip proof of the reference's flagship faceX recipe scale
(configs/faceX/face.yaml: ArcFace, 58,671 classes, 128-d embeddings,
swin backbone): compile + time the full production embedding train step on
one v5e, and report HBM.

The class dim is padded 58,671 → 58,752 (lcm(128, model_axis); see
models/heads.MarginHead) — identical math, masked pad logits.

    python benchmarks/face58k_bench.py [--backbone swin_base_patch4_window7_224]
                                       [--bs 64] [--iters 10]

Timing: steps chain through state; ONE scalar fetch at the end (the tunnel's
block_until_ready does not block — see BASELINE.md methodology).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(backbone: str, bs: int, iters: int, warmup: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_train_step
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.models.factory import EmbeddingModel

    num_class = 58_671
    model = EmbeddingModel(
        backbone_name=backbone,
        feat_dim=128,
        head_config={
            "arcface": {
                "feat_dim": 128, "num_class": num_class,
                "margin_arc": 0.35, "margin_am": 0.0, "scale": 32,
            }
        },
        class_pad_multiple=128,  # trainer default for face/cbir on a model mesh
        dtype=jnp.bfloat16,
    )
    rng = jax.random.key(0)
    x = jnp.zeros((bs, 224, 224, 3), jnp.float32)
    y = jnp.zeros((bs,), jnp.int32)
    t0 = time.perf_counter()
    variables = model.init({"params": rng, "dropout": rng}, x, y, train=False)
    w = variables["params"]["head"]["weight"]
    assert w.shape == (128, 58_752), w.shape

    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(learning_rate=0.006, momentum=0.937),
    )
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, create_lossfn("ce"), StepConfig(task="embedding"), jax.random.key(1)
    )

    data = np.random.default_rng(0)
    batch = jax.device_put({
        "image": jnp.asarray(data.integers(0, 255, (bs, 224, 224, 3)).astype(np.uint8)),
        "label": jnp.asarray(data.integers(0, num_class, (bs,)).astype(np.int32)),
    })
    lam = jnp.float32(0.0)
    state, m = step(state, batch, lam)
    loss0 = float(m["loss"])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup - 1):
        state, m = step(state, batch, lam)
    float(m["loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, lam)
    loss = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters

    mem = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
        mem = {
            "hbm_in_use_gb": round(stats.get("bytes_in_use", 0) / 2**30, 3),
            "hbm_peak_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30, 3),
        }
    except Exception:
        pass
    print(json.dumps({
        "metric": f"faceX-58671cls {backbone} train step (bs={bs}, bf16)",
        "step_ms": round(dt * 1e3, 2),
        "images_per_sec": round(bs / dt, 1),
        "first_loss": round(loss0, 3),
        "loss": round(loss, 3),
        "expected_init_loss": round(float(np.log(58_671)), 3),
        "compile_s": round(compile_s, 1),
        **mem,
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="swin_base_patch4_window7_224")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    main(args.backbone, args.bs, args.iters)
