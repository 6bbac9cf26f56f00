#!/usr/bin/env python
"""Split a flat class-folder tree into train/val layout.

Reference parity: tools/data_prepare.py:45-73 (same before/after layout):

    root/clsA/*.jpg  →  root/train/clsA/*.jpg + root/val/clsA/*.jpg

``--frac`` is either one global train fraction or one per class.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
from pathlib import Path
from typing import List


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--postfix", default="jpg", help="image extension")
    p.add_argument("--root", default="data", help="image dir")
    p.add_argument("--frac", type=float, nargs="+", required=True,
                   help="train fraction(s): one global or one per class")
    p.add_argument("--drop", action="store_true", help="remove source class dirs")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def data_split(postfix: str, root: str, frac: List[float], drop: bool, seed: int = 0) -> None:
    rng = random.Random(seed)
    root_p = Path(root)
    classes = sorted(
        d for d in os.listdir(root_p)
        if not d.startswith(".") and d not in ("train", "val") and (root_p / d).is_dir()
    )
    if len(frac) > 1:
        assert len(frac) == len(classes), (
            "with multiple fracs, give one per class (len(frac) == n_classes)"
        )
    else:
        frac = [frac[0]] * len(classes)

    for mode in ("train", "val"):
        (root_p / mode).mkdir(exist_ok=True)

    for f_train, cls in zip(frac, classes):
        for mode in ("train", "val"):
            (root_p / mode / cls).mkdir(exist_ok=True)
        files = sorted((root_p / cls).glob(f"*.{postfix}"))
        rng.shuffle(files)
        n_train = round(len(files) * f_train)
        for src in files[:n_train]:
            shutil.copy(src, root_p / "train" / cls / src.name)
        for src in files[n_train:]:
            shutil.copy(src, root_p / "val" / cls / src.name)
        if drop:
            shutil.rmtree(root_p / cls)
        print(f"{root_p / cls}  completed ({n_train} train / {len(files) - n_train} val)")


if __name__ == "__main__":
    opt = parse_opt()
    data_split(opt.postfix, opt.root, opt.frac, opt.drop, opt.seed)
