#!/usr/bin/env python
"""Split an ID-folder tree into query/gallery halves for CBIR eval.

Reference parity: tools/build_querygallery.py:40-74:

    src/ID1/*.jpg → <src>-query/ID1/* + <src>-gallery/ID1/*

Every ID keeps at least one gallery image; single-image IDs are skipped.
"""

from __future__ import annotations

import argparse
import os
import shutil
from pathlib import Path


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="data", help="image dir (one folder per ID)")
    p.add_argument("--frac", type=float, required=True, help="query fraction")
    p.add_argument("--drop", action="store_true", help="remove the source dir after")
    return p.parse_args()


def build(src: str, frac: float, drop: bool = False) -> None:
    src_p = Path(src).resolve()
    root = src_p.parent
    base = src_p.name
    ids = sorted(d for d in os.listdir(src_p) if not d.startswith(".") and (src_p / d).is_dir())

    for cid in ids:
        files = sorted(f for f in (src_p / cid).iterdir() if f.is_file())
        n = len(files)
        if n <= 1:
            continue
        n_query = max(int(n * frac), 1)
        (root / f"{base}-query" / cid).mkdir(parents=True, exist_ok=True)
        (root / f"{base}-gallery" / cid).mkdir(parents=True, exist_ok=True)
        for f in files[:n_query]:
            shutil.copy(f, root / f"{base}-query" / cid / f.name)
        for f in files[n_query:]:
            shutil.copy(f, root / f"{base}-gallery" / cid / f.name)

    if drop:
        shutil.rmtree(src_p)


if __name__ == "__main__":
    opt = parse_opt()
    build(opt.src, opt.frac, opt.drop)
