#!/usr/bin/env python
"""Prediction / CAM / retrieval visualization CLI — reference visualize.py
parity (visualize.py:21-125).

Classification:
    python visualize.py --cfgs run/exp/config.yaml --weight run/exp/best \
        --data data/pets/val [--ema] [--cam] [--badcase --target_class cat] \
        [--remove_label] [--sampling 50]

CBIR:
    python visualize.py --cfgs run/exp/config.yaml --weight run/exp/Epoch_10 \
        [--max_rank 10] [--root <query/gallery root>]
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

ROOT = Path(os.path.dirname(__file__))


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfgs", required=True, help="config yaml (run dir copy)")
    p.add_argument("--weight", required=True, help="checkpoint dir (e.g. run/exp/best)")

    # classification
    p.add_argument("--data", default=None, help="target data directory")
    p.add_argument("--target_class", type=str, default=None, help="class to check")
    p.add_argument("--remove_label", action="store_true", help="no top-left text")
    p.add_argument("--no_save_image", action="store_true")
    p.add_argument("--cam", action="store_true", help="GradCAM overlay")
    p.add_argument("--cam_method", default="gradcam",
                   help="gradcam|gradcampp|xgradcam|layercam|hirescam|eigencam|"
                        "eigengradcam|ablationcam|scorecam|fullgrad")
    p.add_argument("--ema", action="store_true", help="use EMA weights")
    p.add_argument("--class_json", default=None, help="class_indices.json path (defaults to run dir)")
    p.add_argument("--badcase", action="store_true", help="organize badcases")
    p.add_argument("--sampling", default=None, type=int)

    # CBIR
    p.add_argument("--max_rank", default=10, type=int, help="top-k retrieval grid")
    p.add_argument("--root", default=None, help="override cbir data root")

    p.add_argument("--show_path", default=str(ROOT / "visualization"))
    p.add_argument("--name", default="exp")
    return p.parse_args()


def main(opt):
    import numpy as np

    from visiondk_tpu.config import increment_path, yaml_load
    from visiondk_tpu.data.datasets import PredictImageDatasets
    from visiondk_tpu.data.transforms import create_aug_transforms
    from visiondk_tpu.engine import CenterProcessor, CheckpointManager
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step, make_embed_step
    from visiondk_tpu.engine.visualizer import Visualizer
    from visiondk_tpu.utils.plots import colorstr

    visual_dir = increment_path(Path(opt.show_path) / opt.name)
    cfgs = yaml_load(opt.cfgs)
    task = cfgs["model"]["task"]
    weight = Path(opt.weight)

    cp = CenterProcessor(cfgs, project=str(weight.parent), train=False)
    tx = cp._build_tx(steps_per_epoch=1, discrete_per_epoch=True)
    state = cp._init_state(tx, (1, cp.imgsz, cp.imgsz, 3))
    state, _ = CheckpointManager(weight.parent).restore(weight.name, state)

    if task == "classification":
        if opt.badcase and opt.remove_label:
            raise ValueError("remove_label and badcase are mutually exclusive.")
        if opt.badcase and opt.target_class is None:
            raise ValueError("badcase needs --target_class for ground truth.")
        if opt.data is None:
            raise ValueError("--data is required for classification visualization")

        class_json = Path(opt.class_json or (weight.parent / "class_indices.json"))
        if class_json.is_file():
            with open(class_json, encoding="utf-8") as f:
                class_dict = {int(k): v for k, v in json.load(f).items()}
        else:
            names = cp.data_processor.val_dataset.class_names
            class_dict = dict(enumerate(names))

        mean, std = cp.data_processor.normalization
        eval_step = make_eval_step(
            cp.model, StepConfig(mean=mean, std=std), use_ema=opt.ema
        )

        def forward(x):
            return eval_step(state, {"image": x})

        transforms = create_aug_transforms(cp.data_cfg["val"]["augment"])
        raw_ds = PredictImageDatasets(
            opt.data, transforms=None, sampling=opt.sampling, target_class=opt.target_class
        )

        class _TripletDataset:
            """(raw PIL, transformed, path) like the reference dataset."""

            def __len__(self):
                return len(raw_ds)

            def __getitem__(self, i):
                from visiondk_tpu.data.datasets import read_image

                path = raw_ds.images[i]
                img = read_image(path)
                return img, np.asarray(transforms(img)), path

        cam = None
        if opt.cam:
            import jax.numpy as jnp

            from visiondk_tpu.utils.cam import ClassActivationMaper
            from visiondk_tpu.engine.steps import device_preprocess

            params = state.ema_params if opt.ema else state.params
            bstats = state.ema_batch_stats if opt.ema else state.batch_stats

            example = jnp.zeros((1, cp.imgsz, cp.imgsz, 3), jnp.float32)
            cam = ClassActivationMaper(
                cp.model,
                method=opt.cam_method,
                variables={"params": params, "batch_stats": bstats},
                example=example,
                backbone_name=cfgs["model"].get("name", ""),
            )
            _base_cam = cam

            def cam_fn(image, input_tensor):
                norm = np.asarray(
                    device_preprocess(jnp.asarray(input_tensor, jnp.float32), mean, std)
                )
                return _base_cam(image=image, input_tensor=norm)

            cam = cam_fn

        t0 = time.time()
        Visualizer.predict_images(
            forward,
            _TripletDataset(),
            visual_dir,
            class_dict,
            cp.logger,
            thresh=cp.thresh,
            remove_label=opt.remove_label,
            save_image=not opt.no_save_image,
            badcase=opt.badcase,
            cam=cam,
            target_class=opt.target_class,
        )
        cp.logger.console(
            f"\nPredicting complete ({(time.time() - t0) / 60:.3f} minutes)"
            f"\nResults saved to {colorstr('bold', str(visual_dir))}"
        )
    elif task in ("face", "cbir"):
        from visiondk_tpu.data.datasets import CBIRDatasets
        from visiondk_tpu.engine import cbir_eval

        if opt.root is not None:
            cfgs["data"]["root"] = opt.root
        mean, std = cp.data_processor.normalization
        embed_step = make_embed_step(cp.model, StepConfig(mean=mean, std=std), use_ema=opt.ema)

        val_aug = create_aug_transforms(cp.data_cfg["val"]["augment"])
        query, gallery = CBIRDatasets.build(cfgs["data"]["root"], transforms=val_aug)
        out = cbir_eval.valuate(
            embed_step, state, query, gallery,
            batch_size=cp.data_cfg["val"]["bs"],
            cutoffs=[opt.max_rank],
            vis=True,
        )
        raw = out.pop("_raw")
        print(out)
        for qi, qpath in enumerate(raw["query_images"]):
            Visualizer.visualize_results(
                str(qpath),
                raw["preds"][qi],
                list(np.asarray(raw["scores"])[qi]),
                raw["labels"][qi],
                visual_dir,
                max_rank=opt.max_rank,
            )
        print(f"retrieval grids saved to {visual_dir}")
    else:
        raise ValueError(f"Unknown task {task}")


if __name__ == "__main__":
    main(parse_opt())
