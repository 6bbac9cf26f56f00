#!/usr/bin/env python
"""Frame-sampled video classification with prediction overlay
(reference tools/video_predict.py:32-82).

    python tools/video_predict.py --video clip.mp4 --cfgs run/exp/config.yaml \
        --weight run/exp/best [--sample 0.5] [--output]

``--output`` writes ``<video>_new.mp4`` instead of displaying.
"""

from __future__ import annotations

import argparse
import os
import random


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True, type=str)
    p.add_argument("--cfgs", required=True, type=str)
    p.add_argument("--weight", required=True, type=str)
    p.add_argument("--ema", action="store_true")
    p.add_argument("--output", action="store_true", help="write annotated mp4")
    p.add_argument("--sample", default=0.5, type=float, help="frame retain ratio")
    p.add_argument("--fps", default=25, type=int)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quant", type=str, default=None, choices=["int8"],
                   help="int8 dense inference (ops/quant.py)")
    return p.parse_args()


def main(opt):
    from pathlib import Path

    import cv2
    import numpy as np
    from PIL import Image

    from visiondk_tpu.config import yaml_load
    from visiondk_tpu.data.transforms import create_aug_transforms
    from visiondk_tpu.engine import CenterProcessor, CheckpointManager
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step

    rng = random.Random(opt.seed)
    cfgs = yaml_load(opt.cfgs)
    weight = Path(opt.weight)
    cp = CenterProcessor(cfgs, project=str(weight.parent), train=False)

    tx = cp._build_tx(steps_per_epoch=1, discrete_per_epoch=True)
    state = cp._init_state(tx, (1, cp.imgsz, cp.imgsz, 3))
    state, _ = CheckpointManager(weight.parent).restore(weight.name, state)
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
    transforms = create_aug_transforms(cp.data_cfg["val"]["augment"])
    names = cp.data_processor.val_dataset.class_names

    cap = cv2.VideoCapture(opt.video)
    writer = None
    if opt.output:
        filename = f"{os.path.splitext(opt.video)[0]}_new.mp4"
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(filename, cv2.VideoWriter_fourcc(*"mp4v"), opt.fps, (w, h))

    success, frame = cap.read()
    while success:
        if rng.random() > opt.sample:
            success, frame = cap.read()
            continue
        pil = Image.fromarray(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        x = np.asarray(transforms(pil))[None]
        logits = np.asarray(eval_step(state, {"image": x}))[0]
        e = np.exp(logits - logits.max())
        probs = e / e.sum()
        order = np.argsort(-probs)

        y = 50
        for j in order[:3]:
            name = names[j] if j < len(names) else str(j)
            cv2.putText(frame, f"{probs[j]:.2f} {name}", (5, y),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.75, (0, 0, 255), 2)
            y += 28

        if writer is not None:
            writer.write(frame)
        else:
            cv2.imshow("windows", frame)
            cv2.waitKey(int(1000 / opt.fps))
        success, frame = cap.read()

    cap.release()
    if writer is not None:
        writer.release()
        print(f"annotated video saved next to {opt.video}")


if __name__ == "__main__":
    main(parse_opt())
