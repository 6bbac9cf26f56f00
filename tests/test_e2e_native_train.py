"""End-to-end: the engine trains THROUGH the native C++ train loader when the
config is reference-pet.yaml-shaped (photometrics lift to device, the
random_choice{letterbox, rrc} geometry stage runs in the C++ decode pool) —
and still overfits the toy dataset (SURVEY §4's integration contract)."""

import numpy as np
import pytest
from PIL import Image

from visiondk_tpu.data.native import native_available

pytestmark = [
    pytest.mark.skipif(
        not native_available(), reason="native loader not built / toolchain missing"
    ),
    # multi-minute e2e: excluded from the <5-min core gate
    pytest.mark.slow,
]


def _make_dataset(root, n_per_class=64, size=32):
    rng = np.random.default_rng(0)
    colors = {"reddish": (200, 40, 40), "blueish": (40, 40, 200)}
    for split, n in (("train", n_per_class), ("val", 8)):
        for cls, base in colors.items():
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = np.clip(
                    rng.normal(base, 25, size=(size, size, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return root


def _cfgs(root, size=32):
    norm = {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}
    return {
        "model": {
            "task": "classification",
            "name": "resnet18",
            "image_size": size,
            "num_classes": 2,
            "pretrained": False,
            "kwargs": {},
            "load_from": None,
        },
        "data": {
            "root": str(root),
            "nw": 2,
            "train": {
                "bs": 16,
                # reference pet.yaml shape: photometric (lifts to device) +
                # flip (lifts) + random_choice geometry (native C++ stage)
                "augment": [
                    {"random_color_jitter": {"brightness": 0.1}},
                    {"random_horizonflip": {"p": 0.5}},
                    {"random_choice": {"transforms": [
                        {"resize_and_padding": {"size": size, "training": True}},
                        {"random_crop_and_resize": {"size": size, "scale": [0.7, 1]}},
                    ], "p": [0.9, 0.1]}},
                    {"to_tensor": "no_params"},
                    {"normalize": norm},
                ],
                "aug_epoch": 999,
                "class_aug": None,
                "base_aug": None,
            },
            "val": {
                "bs": 16,
                "augment": [
                    {"resize_and_padding": {"size": size, "training": False}},
                    {"to_tensor": "no_params"},
                    {"normalize": norm},
                ],
            },
        },
        "hyp": {
            "epochs": 4,
            "lr0": 0.05,
            "lrf_ratio": None,
            "momentum": 0.9,
            "weight_decay": 0.0005,
            "warmup_momentum": 0.8,
            "warm_ep": 1,
            "label_smooth": 0.0,
            "loss": {"ce": True, "bce": [False, 0.5]},
            "strategy": {
                "prog_learn": False,
                "mixup": {"ratio": 0.0, "duration": 0},
                "focal": [False, 0.25, 1.5],
                "ohem": [False, 8, 0.7, 255],
            },
            "optimizer": ["sgd", False],
            "scheduler": "cosine_with_warm",
        },
    }


def test_train_through_native_loader_overfits(tmp_path, mesh8):
    import jax.numpy as jnp
    from visiondk_tpu.data.loader import NativeTrainLoader
    from visiondk_tpu.engine import CenterProcessor

    root = _make_dataset(tmp_path / "toy")
    cfgs = _cfgs(root)
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "run"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    # the config's post-split host stage must select the native loader
    assert cp.data_processor.device_augment_cfg
    loader = cp.data_processor.dataloader("train", 16)
    assert isinstance(loader, NativeTrainLoader)

    result = cp.run_classifier()
    assert result["top1"] >= 0.9, result
    assert (tmp_path / "run" / "best").exists()
