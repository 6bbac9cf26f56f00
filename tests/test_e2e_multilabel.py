"""E2E multi-label slice: CSV/BCE path with per-class thresholds, P/R/F1
fitness, and the focal-loss warmup swap (SURVEY §7 stage 6)."""

import numpy as np
import pytest
from PIL import Image

SIZE = 32


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


@pytest.fixture(scope="module")
def csv_root(tmp_path_factory):
    """Images carry red and/or blue channel signal; labels = [has_red, has_blue,
    has_green]."""
    root = tmp_path_factory.mktemp("ml")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = ["image_path,train,has_red,has_blue,has_green"]
    for split, n in (("1", 64), ("0", 16)):
        for i in range(n):
            labels = rng.integers(0, 2, 3)
            if labels.sum() == 0:
                labels[rng.integers(3)] = 1
            base = np.zeros(3)
            base[0] = 200 if labels[0] else 30
            base[2] = 200 if labels[1] else 30
            base[1] = 200 if labels[2] else 30
            arr = np.clip(rng.normal(base, 20, size=(SIZE, SIZE, 3)), 0, 255).astype(np.uint8)
            p = img_dir / f"{split}_{i}.png"
            Image.fromarray(arr).save(p)
            rows.append(f"{p},{split == '1'},{labels[0]},{labels[1]},{labels[2]}")
    csv = root / "data.csv"
    csv.write_text("\n".join(rows).replace("True", "True").replace("False", "False"))
    return csv


def _ml_cfgs(csv_path, focal=False):
    aug_tail = [
        {"resize_and_padding": {"size": SIZE, "training": False}},
        {"to_tensor": "no_params"},
        {"normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
    ]
    return {
        "model": {
            "task": "classification",
            "name": "resnet18",
            "image_size": SIZE,
            "num_classes": 3,
            "pretrained": False,
            "kwargs": {},
            "load_from": None,
        },
        "data": {
            "root": str(csv_path),
            "nw": 2,
            "train": {"bs": 16, "augment": aug_tail, "aug_epoch": 999,
                      "class_aug": None, "base_aug": None},
            "val": {"bs": 16, "augment": aug_tail},
        },
        "hyp": {
            "epochs": 4,
            "lr0": 0.03,
            "lrf_ratio": None,
            "momentum": 0.9,
            "weight_decay": 0.0005,
            "warmup_momentum": 0.8,
            "warm_ep": 1,
            "label_smooth": 0.05,
            "loss": {"ce": False, "bce": [True, 0.5]},
            "strategy": {
                "prog_learn": False,
                "mixup": {"ratio": 0.0, "duration": 0},
                "focal": [focal, 0.25, 1.5],
                "ohem": [False, 8, 0.7, 255],
            },
            "optimizer": ["sgd", False],
            "scheduler": "cosine_with_warm",
        },
    }


def test_multilabel_csv_dataset(csv_root):
    from visiondk_tpu.data.datasets import ImageDatasets

    ds = ImageDatasets(str(csv_root), "train")
    assert ds.multi_label
    assert ds.class_names == ["has_red", "has_blue", "has_green"]
    assert len(ds) == 64
    img, label = ds[0]
    assert img.shape[2] == 3 and label.shape == (3,)


def test_multilabel_bce_training(csv_root, tmp_path, mesh8):
    import jax.numpy as jnp

    from visiondk_tpu.engine import CenterProcessor

    cfgs = _ml_cfgs(csv_root)
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "ml"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    out = cp.run_classifier()
    assert {"precision", "recall", "f1score"} <= set(out), out
    assert out["best_fitness"] >= 0.8, out  # f1 fitness on a trivially separable set


def test_multilabel_focal_swap(csv_root, tmp_path, mesh8):
    import jax.numpy as jnp

    from visiondk_tpu.engine import CenterProcessor

    cfgs = _ml_cfgs(csv_root, focal=True)
    cfgs["hyp"]["epochs"] = 3
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "ml_focal"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    assert cp.focal_fn is not None
    out = cp.run_classifier()
    assert "f1score" in out
