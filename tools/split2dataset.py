#!/usr/bin/env python
"""Oxford-IIIT-Pet style flat-file → class-folder train/val layout
(reference data/split2dataset.py:5-40).

Filenames like ``Abyssinian_12.jpg`` are grouped by the name part before the
final ``_``; each class is split train/val by ``--frac``.

    python tools/split2dataset.py --src images/ --dst data/pets --frac 0.8
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
from collections import defaultdict
from pathlib import Path


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="flat image dir")
    p.add_argument("--dst", required=True, help="output root (train/ + val/)")
    p.add_argument("--frac", type=float, default=0.8, help="train fraction")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def split_img_to_category(name: str) -> str:
    return name.rsplit("_", 1)[0]


def main(opt):
    rng = random.Random(opt.seed)
    src, dst = Path(opt.src), Path(opt.dst)
    groups = defaultdict(list)
    for f in sorted(os.listdir(src)):
        if f.lower().endswith((".jpg", ".jpeg", ".png")):
            groups[split_img_to_category(f)].append(f)

    for cls, files in sorted(groups.items()):
        rng.shuffle(files)
        n_train = round(len(files) * opt.frac)
        for mode, part in (("train", files[:n_train]), ("val", files[n_train:])):
            outdir = dst / mode / cls
            outdir.mkdir(parents=True, exist_ok=True)
            for f in part:
                shutil.copy(src / f, outdir / f)
        print(f"{cls}: {n_train} train / {len(files) - n_train} val")


if __name__ == "__main__":
    main(parse_opt())
