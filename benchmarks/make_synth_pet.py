"""Synthetic Oxford-IIIT-Pet-scale dataset for the production train run.

The reference's flagship recipe trains on `wuji3/oxford-iiit-pet` (35 classes,
~3.7k train JPEGs, ~300-500 px — reference configs/classification/pet.yaml:28).
This container has no hub egress, so the production run (docs/ROUND5.md) uses
a same-shaped synthetic stand-in: 35 classes, JPEG-encoded, variable pet-like
sizes, learnable class structure (per-class hue + texture frequency with
heavy per-image noise/occluders so training is non-trivial but converges).

    python benchmarks/make_synth_pet.py --root /tmp/synthpet \
        [--n-train 100] [--n-val 10]   # per class

Decode cost is the point: JPEG sizes/quality mirror the real dataset so the
host pipeline (decode + crop/resize) is exercised at pet.yaml realism.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

N_CLASSES = 35


def class_image(rng: np.random.Generator, cls: int, h: int, w: int) -> np.ndarray:
    """Learnable but non-trivial: class decides hue + stripe frequency;
    noise, illumination gradient and random occluders decide the rest."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    hue = (cls * 47) % 255
    freq = 0.05 + 0.015 * (cls % 7)
    phase = rng.uniform(0, 2 * np.pi)
    stripes = 0.5 + 0.5 * np.sin(freq * (xx + 0.6 * yy) + phase)
    base = np.stack([
        hue + 60 * stripes,
        255 - hue + 40 * (1 - stripes),
        (hue * 1.7) % 255 + 30 * stripes,
    ], axis=-1)
    # illumination gradient + heavy noise
    grad = rng.uniform(0.6, 1.2) + rng.uniform(-0.3, 0.3) * (xx / w)
    img = base * grad[..., None] + rng.normal(0, 28, (h, w, 3))
    # 0-3 random gray occluder rectangles
    for _ in range(rng.integers(0, 4)):
        oh, ow = rng.integers(h // 8, h // 3), rng.integers(w // 8, w // 3)
        oy, ox = rng.integers(0, h - oh), rng.integers(0, w - ow)
        img[oy:oy + oh, ox:ox + ow] = rng.integers(40, 200)
    return np.clip(img, 0, 255).astype(np.uint8)


def build(root: Path, n_train: int, n_val: int, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    names = [f"breed_{i:02d}" for i in range(N_CLASSES)]
    for split, n in (("train", n_train), ("val", n_val)):
        for cls, name in enumerate(names):
            d = root / split / name
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                h = int(rng.integers(280, 500))
                w = int(rng.integers(300, 520))
                arr = class_image(rng, cls, h, w)
                Image.fromarray(arr).save(
                    d / f"{name}_{i:04d}.jpg", quality=int(rng.integers(78, 92))
                )
    n_files = sum(1 for _ in root.rglob("*.jpg"))
    print(f"{root}: {n_files} JPEGs, {N_CLASSES} classes "
          f"({n_train}/class train, {n_val}/class val)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--n-train", type=int, default=100)
    p.add_argument("--n-val", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    build(Path(a.root), a.n_train, a.n_val, a.seed)
