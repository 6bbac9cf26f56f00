#!/usr/bin/env python
"""Export a trained model as a serialized, jit-compiled inference function.

The reference's deployment story is ONNX consumption (tools/onnx_predict.py:
24-40) — the exported artifact analogue on the JAX/TPU stack is a serialized
``jax.export`` StableHLO program: weights baked in, uint8 [B,H,W,3] in,
logits/embeddings out, reloadable in any process (no model code needed) via
``tools/exported_predict.py``.

    python export.py --cfgs run/exp/config.yaml --weight run/exp/best \
        --out model.stablehlo [--ema] [--batch 1] [--embed]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfgs", required=True)
    p.add_argument("--weight", required=True, help="checkpoint dir")
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--batch", type=int, default=1, help="-1 = symbolic (dynamic) batch")
    p.add_argument("--embed", action="store_true",
                   help="export the embedding head (face/cbir) instead of logits")
    p.add_argument("--quant", type=str, default=None, choices=["int8"],
                   help="bake int8 dense inference into the exported program "
                        "(ops/quant.py; ~2x MXU rate on v5e)")
    return p.parse_args()


def main(opt):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from visiondk_tpu.config import yaml_load
    from visiondk_tpu.engine import CenterProcessor, CheckpointManager
    from visiondk_tpu.engine.steps import StepConfig, make_embed_step, make_eval_step

    cfgs = yaml_load(opt.cfgs)
    weight = Path(opt.weight)
    cp = CenterProcessor(cfgs, project=str(weight.parent), train=False)

    tx = cp._build_tx(steps_per_epoch=1, discrete_per_epoch=True)
    state = cp._init_state(tx, (max(opt.batch, 1), cp.imgsz, cp.imgsz, 3))
    state, _ = CheckpointManager(weight.parent).restore(weight.name, state)

    mean, std = cp.data_processor.normalization
    scfg = StepConfig(mean=mean, std=std)
    task = cfgs["model"]["task"]
    use_embed = opt.embed or task in ("face", "cbir")
    # exported weights are fixed: prequantize Dense kernels once — the
    # StableHLO then bakes int8 kernels instead of a per-call quantize pass
    qcache = None
    quant = getattr(opt, "quant", None)
    if quant == "int8":
        from visiondk_tpu.ops.quant import build_weight_cache

        qcache = build_weight_cache(state.ema_params if opt.ema else state.params)
    step = (
        make_embed_step(cp.model, scfg, use_ema=opt.ema, quant=quant, quant_cache=qcache)
        if use_embed
        else make_eval_step(cp.model, scfg, use_ema=opt.ema, quant=quant, quant_cache=qcache)
    )

    def infer(images):
        return step(state, {"image": images})

    if opt.batch == -1:
        b = jexport.symbolic_shape("b")[0]
        spec = jax.ShapeDtypeStruct((b, cp.imgsz, cp.imgsz, 3), jnp.uint8)
    else:
        spec = jax.ShapeDtypeStruct((opt.batch, cp.imgsz, cp.imgsz, 3), jnp.uint8)

    exported = jexport.export(jax.jit(infer))(spec)
    blob = exported.serialize()
    Path(opt.out).write_bytes(blob)
    kind = "embeddings" if use_embed else "logits"
    print(
        f"exported {kind} fn to {opt.out} ({len(blob) / 1e6:.1f} MB), "
        f"input uint8 {tuple(spec.shape)}"
    )


if __name__ == "__main__":
    main(parse_opt())
