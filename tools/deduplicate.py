#!/usr/bin/env python
"""Perceptual-hash near-duplicate removal (reference tools/deduplicate.py:6-32,
which uses the external ``imagehash`` package; the hashes here are NumPy
reimplementations of its average_hash/dhash/phash).

    python tools/deduplicate.py --dirs data/images [--hash dhash] [--dry_run]
      [--feature_dir feats --feature_ext .npy]   # also drop paired features
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Iterable, List

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp")


def _gray8(img: Image.Image, size: int) -> np.ndarray:
    return np.asarray(img.convert("L").resize((size, size), Image.LANCZOS), dtype=np.float64)


def average_hash(img: Image.Image, hash_size: int = 8) -> bytes:
    px = _gray8(img, hash_size)
    return np.packbits(px > px.mean()).tobytes()


def dhash(img: Image.Image, hash_size: int = 8) -> bytes:
    px = np.asarray(
        img.convert("L").resize((hash_size + 1, hash_size), Image.LANCZOS), dtype=np.float64
    )
    return np.packbits(px[:, 1:] > px[:, :-1]).tobytes()


def phash(img: Image.Image, hash_size: int = 8, highfreq_factor: int = 4) -> bytes:
    """DCT-based perceptual hash (imagehash.phash semantics)."""
    size = hash_size * highfreq_factor
    px = _gray8(img, size)
    # orthonormal 2D DCT-II via the transform matrix (no scipy dependency)
    n = size
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    dct_m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct_m[0] /= np.sqrt(2.0)
    dct = dct_m @ px @ dct_m.T
    low = dct[:hash_size, :hash_size]
    med = np.median(low)
    return np.packbits(low > med).tobytes()


HASHES = {"average_hash": average_hash, "dhash": dhash, "phash": phash}


def find_similar_images(
    userpaths: Iterable[str],
    hashfunc=dhash,
    dry_run: bool = False,
    feature_dir: str | None = None,
    feature_ext: str = ".npy",
):
    """Keep the first image per hash; delete (or report) later duplicates."""
    files: List[str] = []
    for userpath in userpaths:
        files += [
            os.path.join(userpath, f)
            for f in os.listdir(userpath)
            if f.lower().endswith(IMG_EXTS)
        ]
    images: dict = {}
    removed = []
    for img_path in sorted(files):
        try:
            h = hashfunc(Image.open(img_path))
        except Exception as e:  # unreadable image
            print("Problem:", e, "with", img_path)
            continue
        if h in images:
            removed.append(img_path)
            if not dry_run:
                os.remove(img_path)
                if feature_dir:
                    feat = Path(feature_dir) / (Path(img_path).stem + feature_ext)
                    if feat.is_file():
                        feat.unlink()
        else:
            images.setdefault(h, []).append(img_path)
    print(f"{len(files)} images, {len(removed)} duplicates" + (" (dry run)" if dry_run else " removed"))
    return images, removed


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dirs", nargs="+", required=True)
    p.add_argument("--hash", default="dhash", choices=sorted(HASHES))
    p.add_argument("--dry_run", action="store_true")
    p.add_argument("--feature_dir", default=None, help="paired embedding dir to clean too")
    p.add_argument("--feature_ext", default=".npy")
    a = p.parse_args()
    find_similar_images(a.dirs, HASHES[a.hash], a.dry_run, a.feature_dir, a.feature_ext)
