#!/usr/bin/env python
"""Convert a torch checkpoint (torchvision ResNet / timm ViT naming) into
this framework's parameter layout.

    python tools/convert_torch_weights.py --torch resnet50.pth --arch resnet50 \
        --out resnet50_converted.npz

Load at train time with ``model.convert_npz: resnet50_converted.npz`` in the
config, or programmatically via visiondk_tpu.models.convert.merge_converted.
"""

from __future__ import annotations

import argparse


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--torch", dest="torch_path", required=True, help=".pth / .pt state_dict")
    p.add_argument("--arch", required=True, help="e.g. resnet50, vit_base_patch16_224")
    p.add_argument("--out", required=True, help="output .npz")
    p.add_argument("--key", default=None,
                   help="sub-dict key inside the checkpoint (e.g. 'model' or 'state_dict')")
    return p.parse_args()


def main(opt):
    import torch

    from visiondk_tpu.models.convert import convert_state_dict, save_converted

    ckpt = torch.load(opt.torch_path, map_location="cpu", weights_only=False)
    if opt.key:
        ckpt = ckpt[opt.key]
    elif not all(hasattr(v, "shape") for v in ckpt.values()):
        for k in ("state_dict", "model", "model_state"):
            if k in ckpt:
                ckpt = ckpt[k]
                break
    ckpt = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
            for k, v in ckpt.items()}

    converted = convert_state_dict(ckpt, opt.arch)
    save_converted(converted, opt.out)
    n = sum(len(v) for v in converted.values())
    print(f"converted {n} tensors → {opt.out}")


if __name__ == "__main__":
    main(parse_opt())
