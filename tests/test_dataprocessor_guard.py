"""SmartDataProcessor.dataloader guard: a train dataset smaller than one
global batch (drop_last) must raise, not silently train zero steps/epoch
while still writing checkpoints."""

import numpy as np
import pytest
from PIL import Image

from visiondk_tpu.data.dataprocessor import SmartDataProcessor


def _toy_tree(root, per_class=4):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for c in ("a", "b"):
            d = root / split / c
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_class):
                arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")


def _data_cfg(root):
    return {
        "root": str(root),
        "train": {"augment": [{"to_tensor": "no_params"}], "bs": 4},
        "val": {"augment": [{"to_tensor": "no_params"}], "bs": 4},
    }


def test_empty_train_loader_raises(tmp_path):
    _toy_tree(tmp_path, per_class=4)   # 8 train images
    dp = SmartDataProcessor(_data_cfg(tmp_path), project=str(tmp_path / "run"))
    with pytest.raises(ValueError, match="train dataloader is empty"):
        dp.dataloader("train", batch_size=16)   # 16 > 8 → 0 complete batches


def test_exact_fit_is_fine(tmp_path):
    _toy_tree(tmp_path, per_class=4)
    dp = SmartDataProcessor(_data_cfg(tmp_path), project=str(tmp_path / "run"))
    loader = dp.dataloader("train", batch_size=8)
    assert len(loader) == 1
