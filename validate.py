#!/usr/bin/env python
"""Standalone evaluation CLI — reference validate.py parity (validate.py:16-78).

    python validate.py --cfgs run/exp/config.yaml --weight run/exp/best [--ema]
                       [--eval_topk 5]

Classification → top-1/top-k (+ per-class table, confusion matrix path);
face → 10-fold pair accuracy; cbir → retrieval metrics dict.
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfgs", type=str, required=True)
    p.add_argument("--weight", type=str, required=True, help="checkpoint dir (e.g. run/exp/best)")
    p.add_argument("--ema", action="store_true", help="evaluate the EMA weights")
    p.add_argument("--eval_topk", type=int, default=5)
    p.add_argument("--thresh", type=float, default=None, help="multilabel threshold override")
    p.add_argument(
        "--quant", type=str, default=None, choices=["int8"],
        help="quantized inference for the dense layers (ops/quant.py)",
    )
    return p.parse_args()


def main(opt):
    import jax.numpy as jnp

    from visiondk_tpu.config import yaml_load, check
    from visiondk_tpu.engine import CenterProcessor, CheckpointManager
    from visiondk_tpu.engine import evaluation as cls_eval
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step, make_embed_step

    cfgs = yaml_load(opt.cfgs)
    task = cfgs["model"]["task"]
    weight = Path(opt.weight)

    cp = CenterProcessor(cfgs, project=str(weight.parent), train=False)
    bs = cfgs["data"]["val"]["bs"]

    # rebuild state shape and restore
    tx = cp._build_tx(steps_per_epoch=1, discrete_per_epoch=True)
    state = cp._init_state(tx, (bs, cp.imgsz, cp.imgsz, 3))
    mgr = CheckpointManager(weight.parent)
    state, meta = mgr.restore(weight.name, state)
    print(f"loaded {weight} (epoch {meta.get('epoch')}, best_fitness {meta.get('best_fitness')})")

    # serving weights are fixed: prequantize Dense kernels once instead of
    # paying the in-graph weight absmax/round pass on every batch
    qcache = None
    quant = getattr(opt, "quant", None)
    if quant == "int8":
        from visiondk_tpu.ops.quant import build_weight_cache

        qcache = build_weight_cache(state.ema_params if opt.ema else state.params)

    if task == "classification":
        eval_step = make_eval_step(
            cp.model,
            StepConfig(mean=cp.data_processor.normalization[0], std=cp.data_processor.normalization[1]),
            use_ema=opt.ema,
            quant=quant,
            quant_cache=qcache,
        )
        loader = cp.data_processor.dataloader("val", bs)
        thresh = opt.thresh if opt.thresh is not None else (
            cp.thresh if cp.loss_choice == "bce" else None
        )
        metrics = cls_eval.valuate(
            eval_step, state, loader, cfgs["model"]["num_classes"],
            thresh=thresh, lossfn=cp.lossfn,
            class_names=cp.data_processor.val_dataset.class_names,
            conm_path=weight.parent / "confusion_matrix.png",
            eval_topk=opt.eval_topk,
        )
        per_class = metrics.pop("per_class", [])
        print(metrics)
        names = cp.data_processor.val_dataset.class_names
        for row in per_class:
            row = dict(row)
            row["class"] = names[row["class"]] if row["class"] < len(names) else row["class"]
            print(row)
    else:
        embed_step = make_embed_step(
            cp.model,
            StepConfig(mean=cp.data_processor.normalization[0], std=cp.data_processor.normalization[1]),
            use_ema=opt.ema,
            quant=quant,
            quant_cache=qcache,
        )
        metrics = cp._eval_embedding(embed_step, state)
        print(metrics)


if __name__ == "__main__":
    main(parse_opt())
