#!/usr/bin/env python
"""Per-family training-throughput sweep over the backbone zoo on one chip.

Motivation: BASELINE.md has deep rooflines for the two flagships (ViT-B,
Swin-B) but a reference user picking a backbone for TPU (the reference's
recommended list, /root/reference/configs/classification/pet.yaml:3-23) needs
the whole menu measured. This also tests the Swin-ablation's structural
claim — that 64-token windows (SwinV2's window-8 layout) map better onto the
MXU/VPU than V1's 49-token windows — with a real model instead of a thought
experiment.

Method (CLAUDE.md timing rules): full train steps are long enough for wall
clock; iterations chain through the TrainState and ONE scalar fetch at the
end forces the pipeline (block_until_ready does not block through the
tunnel). Warmup includes the compile.

Usage:
    python benchmarks/zoo_sweep.py               # full sweep
    python benchmarks/zoo_sweep.py resnet50 ...  # subset by name
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visiondk_tpu.engine.state import create_train_state
from visiondk_tpu.engine.steps import StepConfig, make_train_step
from visiondk_tpu.losses import create_lossfn
from visiondk_tpu.models.factory import VisionModel

# (name, image_size, batch, iters) — batch sized so a step is >=50 ms on the
# chip and activations fit 16 GB HBM; iters sized for a ~2 s timed window.
SWEEP = [
    ("resnet18", 224, 256, 30),
    ("resnet50", 224, 128, 20),
    ("resnet50d", 224, 128, 20),
    ("wide_resnet101_2", 224, 64, 15),
    ("resnext50_32x4d", 224, 128, 20),
    ("resnest50d_4s2x40d", 224, 128, 15),
    ("legacy_seresnet50", 224, 128, 20),
    ("mobilenetv3_large_100", 224, 256, 30),
    ("efficientnetv2_s", 224, 128, 15),
    ("efficientnetv2_m", 224, 64, 15),
    ("convnext_tiny", 224, 128, 20),
    ("convnext_base", 224, 64, 15),
    ("vit_small_patch16_224", 224, 256, 20),
    ("vit_base_patch16_224", 224, 128, 20),
    ("swin_tiny_patch4_window7_224", 224, 128, 15),
    ("swin_base_patch4_window7_224", 224, 64, 15),
    ("swinv2_tiny_window8_256", 256, 64, 15),
    ("swinv2_base_window8_256", 256, 32, 15),
]


def bench_one(name: str, imgsz: int, batch: int, iters: int, warmup: int = 3):
    model = VisionModel(backbone_name=name, num_classes=1000, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(learning_rate=0.006, momentum=0.937),
    )
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, create_lossfn("ce", label_smooth=0.05),
        StepConfig(task="classification"), jax.random.key(1),
    )
    host = np.random.default_rng(0)
    batch_dev = jax.device_put({
        "image": jnp.asarray(host.integers(0, 255, (batch, imgsz, imgsz, 3)).astype(np.uint8)),
        "label": jnp.asarray(host.integers(0, 1000, (batch,)).astype(np.int32)),
    })
    lam = jnp.float32(0.0)
    for _ in range(warmup):
        state, m = step(state, batch_dev, lam)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch_dev, lam)
    float(m["loss"])
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters * 1e3


def main():
    picks = [s for s in sys.argv[1:] if not s.startswith("-")]
    rows = [r for r in SWEEP if not picks or r[0] in picks]
    results = []
    for name, imgsz, batch, iters in rows:
        try:
            ips, ms = bench_one(name, imgsz, batch, iters)
        except Exception as e:  # keep sweeping; report the failure
            print(json.dumps({"model": name, "error": repr(e)[:200]}), flush=True)
            continue
        rec = {"model": name, "imgsz": imgsz, "batch": batch,
               "train_ips": round(ips, 1), "step_ms": round(ms, 2)}
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if results:
        width = max(len(r["model"]) for r in results)
        print(f"\n{'model':<{width}}  imgsz  bs   img/s   ms/step")
        for r in sorted(results, key=lambda r: -r["train_ips"]):
            print(f"{r['model']:<{width}}  {r['imgsz']:>5}  {r['batch']:>3}"
                  f"  {r['train_ips']:>7.1f}  {r['step_ms']:>7.2f}")


if __name__ == "__main__":
    main()
