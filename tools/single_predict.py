#!/usr/bin/env python
"""One-image inference (reference tools/single_predict.py:22-41).

    python tools/single_predict.py --img x.jpg --cfgs run/exp/config.yaml \
        --weight run/exp/best [--ema]
"""

from __future__ import annotations

import argparse


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--img", required=True, type=str)
    p.add_argument("--cfgs", required=True, type=str, help="run config yaml")
    p.add_argument("--weight", required=True, type=str, help="checkpoint dir")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--quant", type=str, default=None, choices=["int8"],
                   help="int8 dense inference (ops/quant.py)")
    return p.parse_args()


def main(opt):
    from pathlib import Path

    import numpy as np

    from visiondk_tpu.config import yaml_load
    from visiondk_tpu.data.datasets import read_image
    from visiondk_tpu.data.transforms import create_aug_transforms
    from visiondk_tpu.engine import CenterProcessor, CheckpointManager
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step

    cfgs = yaml_load(opt.cfgs)
    weight = Path(opt.weight)
    cp = CenterProcessor(cfgs, project=str(weight.parent), train=False)

    tx = cp._build_tx(steps_per_epoch=1, discrete_per_epoch=True)
    state = cp._init_state(tx, (1, cp.imgsz, cp.imgsz, 3))
    state, _ = CheckpointManager(weight.parent).restore(weight.name, state)

    transforms = create_aug_transforms(cp.data_cfg["val"]["augment"])
    x = np.asarray(transforms(read_image(opt.img)))[None]

    qcache = None
    quant = getattr(opt, "quant", None)
    if quant == "int8":
        from visiondk_tpu.ops.quant import build_weight_cache

        qcache = build_weight_cache(state.ema_params if opt.ema else state.params)
    eval_step = make_eval_step(
        cp.model,
        StepConfig(mean=cp.data_processor.normalization[0], std=cp.data_processor.normalization[1]),
        use_ema=opt.ema,
        quant=quant,
        quant_cache=qcache,
    )
    logits = np.asarray(eval_step(state, {"image": x}))[0]
    if cp.loss_choice == "bce":
        probs = 1.0 / (1.0 + np.exp(-logits))
    else:
        e = np.exp(logits - logits.max())
        probs = e / e.sum()

    names = cp.data_processor.val_dataset.class_names
    order = np.argsort(-probs)
    for j in order[:5]:
        name = names[j] if j < len(names) else str(j)
        print(f"{name:<20} {probs[j]:.4f}")


if __name__ == "__main__":
    main(parse_opt())
