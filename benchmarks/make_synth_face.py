"""Synthetic face-recognition dataset for the faceX production run.

The reference's faceX recipe trains ArcFace embeddings on a folder of
identities (`root/train/<id>/*`) and evaluates LFW-protocol pair verification
from `root/val/*.jpg` + a pair file (reference engine/faceX/evaluation.py:8-17
parses name pairs resolved under <root>/val). No face data ships in this
container, so the round-5 production run uses a synthetic stand-in with the
same layout and a learnable identity structure: identity decides hue/stripe
frequency/blob constellation, heavy per-image noise + pose-ish affine jitter
decide the rest — same-id pairs stay closer than cross-id pairs, so a
from-scratch embedding can separate them in a few epochs.

    python benchmarks/make_synth_face.py --root /tmp/synthface \
        [--ids 64] [--n-train 20] [--n-val 4] [--pairs 300]

Also emits a CBIR twin under --cbir-root (query/gallery split of held-out
images of the SAME identities) so the cbir task can run the identical
production protocol from one generator.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def id_image(rng: np.random.Generator, ident: int, h: int, w: int) -> np.ndarray:
    """Identity-keyed appearance: hue + stripe frequency + a 3-blob
    constellation at id-fixed positions; per-image affine-ish jitter, noise,
    illumination, and occluders make within-id variance non-trivial."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    hue = (ident * 37) % 255
    freq = 0.04 + 0.012 * (ident % 9)
    phase = rng.uniform(0, 2 * np.pi)
    stripes = 0.5 + 0.5 * np.sin(freq * (xx + 0.5 * yy) + phase)
    img = np.stack([
        hue + 50 * stripes,
        255 - hue + 45 * (1 - stripes),
        (hue * 1.9) % 255 + 25 * stripes,
    ], axis=-1)
    # identity-fixed blob constellation, jittered per image (pose analogue)
    idr = np.random.default_rng(ident)  # id-keyed, not image-keyed
    for b in range(3):
        cy, cx = idr.uniform(0.2, 0.8, 2)
        cy = cy * h + rng.normal(0, 0.04) * h
        cx = cx * w + rng.normal(0, 0.04) * w
        r = (0.08 + 0.05 * idr.uniform()) * min(h, w)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        img[mask] = (img[mask] + [[120 + 40 * b, 30 * b, 200 - 50 * b]]) / 2
    grad = rng.uniform(0.65, 1.2) + rng.uniform(-0.25, 0.25) * (xx / w)
    img = img * grad[..., None] + rng.normal(0, 24, (h, w, 3))
    for _ in range(rng.integers(0, 3)):
        oh, ow = rng.integers(h // 9, h // 4), rng.integers(w // 9, w // 4)
        oy, ox = rng.integers(0, h - oh), rng.integers(0, w - ow)
        img[oy:oy + oh, ox:ox + ow] = rng.integers(40, 200)
    return np.clip(img, 0, 255).astype(np.uint8)


def _save(rng, ident, path: Path) -> None:
    h = int(rng.integers(200, 320))
    w = int(rng.integers(200, 320))
    Image.fromarray(id_image(rng, ident, h, w)).save(path, quality=int(rng.integers(80, 92)))


def build(root: Path, ids: int, n_train: int, n_val: int, n_pairs: int,
          cbir_root: Path | None, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    names = [f"id_{i:03d}" for i in range(ids)]

    for ident, name in enumerate(names):
        d = root / "train" / name
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n_train):
            _save(rng, ident, d / f"{name}_{i:03d}.jpg")

    # flat val dir + pair file (reference resolves names under <root>/val)
    vd = root / "val"
    vd.mkdir(parents=True, exist_ok=True)
    val_names: dict[int, list[str]] = {}
    for ident, name in enumerate(names):
        val_names[ident] = []
        for j in range(n_val):
            fn = f"{name}_v{j}.jpg"
            _save(rng, ident, vd / fn)
            val_names[ident].append(fn)
    rows = []
    for _ in range(n_pairs // 2):  # positive pairs
        ident = int(rng.integers(ids))
        a, b = rng.choice(val_names[ident], 2, replace=False)
        rows.append(f"{a} {b} 1")
    for _ in range(n_pairs - n_pairs // 2):  # negatives
        i1, i2 = rng.choice(ids, 2, replace=False)
        a = rng.choice(val_names[int(i1)])
        b = rng.choice(val_names[int(i2)])
        rows.append(f"{a} {b} 0")
    (root / "pairs.txt").write_text("\n".join(rows) + "\n")

    if cbir_root is not None:
        # CBIR twin: same identities; train/<id> fresh renders, query 1/id
        # (subset of gallery ids), gallery 3/id
        for ident, name in enumerate(names):
            d = cbir_root / "train" / name
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n_train):
                _save(rng, ident, d / f"{name}_{i:03d}.jpg")
            g = cbir_root / "gallery" / name
            g.mkdir(parents=True, exist_ok=True)
            for i in range(3):
                _save(rng, ident, g / f"{name}_g{i}.jpg")
            q = cbir_root / "query" / name
            q.mkdir(parents=True, exist_ok=True)
            _save(rng, ident, q / f"{name}_q0.jpg")

    n_files = sum(1 for _ in root.rglob("*.jpg"))
    print(f"{root}: {n_files} JPEGs, {ids} ids, {len(rows)} pairs"
          + (f"; cbir twin at {cbir_root}" if cbir_root else ""))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--ids", type=int, default=64)
    p.add_argument("--n-train", type=int, default=20)
    p.add_argument("--n-val", type=int, default=4)
    p.add_argument("--pairs", type=int, default=300)
    p.add_argument("--cbir-root", default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    build(Path(a.root), a.ids, a.n_train, a.n_val, a.pairs,
          Path(a.cbir_root) if a.cbir_root else None, a.seed)
