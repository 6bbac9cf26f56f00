#!/usr/bin/env python
"""DBSCAN/HDBSCAN clustering over saved embeddings, copying images into
per-cluster folders (reference tools/clustering.py:26-55).

    python tools/clustering.py --features feats/ --images imgs/ --out cluster/ \
        [--algo dbscan --eps 0.4 --min_samples 5] [--limit 1000]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
from pathlib import Path

import numpy as np


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--features", required=True, help="dir of per-image .npy embeddings")
    p.add_argument("--images", required=True, help="dir of images named <stem>.<ext>")
    p.add_argument("--out", required=True, help="output cluster dir")
    p.add_argument("--algo", default="dbscan", choices=["dbscan", "hdbscan"])
    p.add_argument("--eps", type=float, default=0.4)
    p.add_argument("--min_samples", type=int, default=5)
    p.add_argument("--min_cluster_size", type=int, default=10, help="hdbscan only")
    p.add_argument("--limit", type=int, default=None, help="max embeddings to load")
    p.add_argument("--image_ext", default=".jpg")
    return p.parse_args()


def main(opt):
    from sklearn.cluster import DBSCAN, HDBSCAN

    paths, X = [], []
    npys = sorted(glob.glob(os.path.join(opt.features, "*.npy")))
    if opt.limit:
        npys = npys[: opt.limit]
    for npy in npys:
        stem = Path(npy).stem
        img = os.path.join(opt.images, stem + opt.image_ext)
        if os.path.isfile(img):
            X.append(np.load(npy))
            paths.append(img)
    if not X:
        raise SystemExit("no (embedding, image) pairs found")
    X = np.stack(X)
    paths = np.asarray(paths)

    if opt.algo == "dbscan":
        db = DBSCAN(eps=opt.eps, min_samples=opt.min_samples, metric="cosine", n_jobs=-1).fit(X)
    else:
        db = HDBSCAN(
            min_cluster_size=opt.min_cluster_size,
            min_samples=opt.min_samples,
            cluster_selection_epsilon=opt.eps,
            metric="cosine",
            n_jobs=-1,
        ).fit(X)
    labels = db.labels_

    n_clusters = len(set(labels)) - (1 if -1 in labels else 0)
    print(f"Estimated number of clusters: {n_clusters}")
    print(f"Estimated number of noise points: {int((labels == -1).sum())}")

    out = Path(opt.out)
    out.mkdir(parents=True, exist_ok=True)
    for lbl in range(n_clusters):
        target = out / str(lbl)
        target.mkdir(exist_ok=True)
        for img in paths[labels == lbl]:
            shutil.copy(img, target)
    print(f"clusters written to {out}")


if __name__ == "__main__":
    main(parse_opt())
