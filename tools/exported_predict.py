#!/usr/bin/env python
"""Run inference from a serialized export — the analogue of the reference's
onnxruntime consumer (tools/onnx_predict.py:24-40): no model code, no
checkpoint, just the artifact produced by export.py.

    python tools/exported_predict.py --artifact model.stablehlo --img x.jpg \
        [--size 224]
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", required=True, help="export.py output file")
    p.add_argument("--img", required=True)
    p.add_argument("--size", type=int, default=None,
                   help="resize shorter side; defaults to the artifact's input size")
    return p.parse_args()


def main(opt):
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(open(opt.artifact, "rb").read()))
    in_shape = exported.in_avals[0].shape
    size = opt.size or int(in_shape[1])

    img = Image.open(opt.img).convert("RGB").resize((size, size))
    x = np.asarray(img, dtype=np.uint8)[None]

    out = np.asarray(exported.call(x))[0]
    if out.ndim == 1 and out.shape[0] <= 4096:
        e = np.exp(out - out.max())
        probs = e / e.sum()
        order = np.argsort(-probs)[:5]
        for j in order:
            print(f"class {j}: {probs[j]:.4f}")
    else:
        print(f"embedding[{out.shape}] norm={np.linalg.norm(out):.4f}")


if __name__ == "__main__":
    main(parse_opt())
