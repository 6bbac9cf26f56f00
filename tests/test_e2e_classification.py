"""End-to-end slice: config → CenterProcessor → train → eval → checkpoint on a
tiny synthetic folder dataset over the virtual 8-device CPU mesh. The model
must overfit (top-1 → 1.0) — SURVEY §4's integration-test contract."""

import numpy as np
import pytest
from PIL import Image


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def _make_dataset(root, n_per_class=64, size=32):
    # 64/class × 2 classes / bs 16 = 8 steps/epoch: enough optimizer steps for
    # the BatchNorm running stats (momentum 0.9) to converge — with only
    # 2 steps/epoch, eval-mode stats stay ~40% at init and val collapses
    # to one class on some runs (train fits, eval 0.5 — observed flake).
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
    aug_tail = [
        {"resize_and_padding": {"size": size, "training": False}},
        {"to_tensor": "no_params"},
        {"normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
    ]
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
                "augment": [{"random_horizonflip": {"p": 0.5}}] + aug_tail,
                "aug_epoch": 999,
                "class_aug": None,
                "base_aug": None,
            },
            "val": {"bs": 16, "augment": aug_tail},
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


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    return _make_dataset(tmp_path_factory.mktemp("toy"))


def test_config_check_passes(dataset_root):
    from visiondk_tpu.config import check

    check("classification", _cfgs(dataset_root))


def test_train_overfits_and_checkpoints(dataset_root, tmp_path, mesh8):
    import jax.numpy as jnp
    from visiondk_tpu.engine import CenterProcessor

    cfgs = _cfgs(dataset_root)
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "run"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    result = cp.run_classifier()
    assert result["top1"] >= 0.9, result
    assert (tmp_path / "run" / "last").exists()
    assert (tmp_path / "run" / "best").exists()
    assert (tmp_path / "run" / "class_indices.json").exists()
    assert (tmp_path / "run" / "config.yaml").exists()


def test_resume_continues(dataset_root, tmp_path, mesh8):
    import jax.numpy as jnp
    from visiondk_tpu.engine import CenterProcessor

    cfgs = _cfgs(dataset_root)
    cfgs["hyp"]["epochs"] = 2
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "r1"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    cp.run_classifier()
    cfgs["hyp"]["epochs"] = 3
    cp2 = CenterProcessor(
        cfgs, project=str(tmp_path / "r1"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    out = cp2.run_classifier(resume="last")
    assert "top1" in out


def _pipeline_fingerprint(dp):
    """(transform type names, output spatial shape) of the live train pipeline."""
    aug = dp.train_dataset.transforms.base_transforms
    names = [type(t).__name__ for t in aug.transforms]
    img = Image.fromarray(np.zeros((48, 40, 3), np.uint8))
    out = np.asarray(aug(img))
    return names, out.shape


def test_resume_replays_strategy_state(dataset_root, tmp_path, mesh8):
    """Resuming past warm_ep / aug_epoch / a resize node reconstructs the
    augment pipeline, focal swap, and progressive size exactly as an
    uninterrupted run (the reference forgets all of these on resume,
    vision_engine.py:344-375 — matching that bug isn't the bar)."""
    import jax.numpy as jnp
    from visiondk_tpu.engine import CenterProcessor

    def cfgs(epochs):
        c = _cfgs(dataset_root)
        c["data"]["train"]["bs"] = 8
        c["hyp"]["epochs"] = epochs
        c["hyp"]["warm_ep"] = 1
        c["data"]["train"]["aug_epoch"] = 2          # weaken fires before resume point
        c["hyp"]["loss"] = {"ce": False, "bce": [True, 0.5]}
        c["hyp"]["strategy"]["focal"] = [True, 0.25, 1.5]   # swaps at warm_ep
        c["hyp"]["strategy"]["prog_learn"] = True           # nodes [1, 2, 3]
        return c

    # uninterrupted 6-epoch run
    cp_a = CenterProcessor(
        cfgs(6), project=str(tmp_path / "uninterrupted"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    cp_a.run_classifier()

    # interrupted at epoch 3, resumed to 6
    cp_b1 = CenterProcessor(
        cfgs(3), project=str(tmp_path / "interrupted"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    cp_b1.run_classifier()
    cp_b2 = CenterProcessor(
        cfgs(6), project=str(tmp_path / "interrupted"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    cp_b2.run_classifier(resume="last")

    assert _pipeline_fingerprint(cp_b2.data_processor) == _pipeline_fingerprint(
        cp_a.data_processor
    )
    # the focal swap (warm_ep=1 < resume point) was replayed: the resumed run's
    # step variants were all built with the focal loss
    assert all(k[0] == "focal" for k in cp_b2._step_cache), cp_b2._step_cache.keys()
