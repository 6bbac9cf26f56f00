"""torch → JAX weight conversion (pretrained-parity path).

The reference gets pretrained weights through timm
(models/classifier/classify_model.py:49-54; faceX/backbone/timm_wrapper.py:
16-21). This framework trains from scratch or imports existing torch
checkpoints: ``convert_state_dict`` maps torchvision-style ResNet and
timm-style ViT ``state_dict`` tensors onto our flax param/batch-stats trees
(transposing conv kernels OIHW→HWIO and linear weights [out,in]→[in,out]).

CLI: tools/convert_torch_weights.py. Merged via CheckpointManager.load_from
semantics (non-strict, shape-checked).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    try:  # torch tensor
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _conv(w) -> np.ndarray:
    return _t(w).transpose(2, 3, 1, 0)  # OIHW → HWIO


def _dense(w) -> np.ndarray:
    return _t(w).T  # [out, in] → [in, out]


def _put(flat: Dict, tree: str, path: str, value: np.ndarray) -> None:
    flat.setdefault(tree, {})[path] = value


def convert_resnet(state_dict: Dict[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """torchvision ResNet/ResNeXt/WideResNet keys → our ResNet tree
    ("/"-joined paths under 'params' and 'batch_stats')."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}

    def bn(prefix_t: str, prefix_f: str):
        sd = state_dict
        _put(out, "params", f"{prefix_f}/scale", _t(sd[f"{prefix_t}.weight"]))
        _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))
        _put(out, "batch_stats", f"{prefix_f}/mean", _t(sd[f"{prefix_t}.running_mean"]))
        _put(out, "batch_stats", f"{prefix_f}/var", _t(sd[f"{prefix_t}.running_var"]))

    if "conv1.weight" in state_dict:
        _put(out, "params", "stem_conv/kernel", _conv(state_dict["conv1.weight"]))
        bn("bn1", "stem_bn")
    for key in state_dict:
        m = re.match(r"layer(\d+)\.(\d+)\.conv(\d+)\.weight$", key)
        if m:
            s, b, i = m.groups()
            _put(out, "params", f"stage{s}_block{int(b) + 1}/conv{i}/kernel", _conv(state_dict[key]))
        m = re.match(r"layer(\d+)\.(\d+)\.bn(\d+)\.weight$", key)
        if m:
            s, b, i = m.groups()
            bn(f"layer{s}.{b}.bn{i}", f"stage{s}_block{int(b) + 1}/bn{i}")
        m = re.match(r"layer(\d+)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            s, b = m.groups()
            _put(out, "params", f"stage{s}_block{int(b) + 1}/down_conv/kernel", _conv(state_dict[key]))
            bn(f"layer{s}.{b}.downsample.1", f"stage{s}_block{int(b) + 1}/down_bn")
    if "fc.weight" in state_dict:
        _put(out, "params", "fc/kernel", _dense(state_dict["fc.weight"]))
        _put(out, "params", "fc/bias", _t(state_dict["fc.bias"]))
    return out


def convert_vit(state_dict: Dict[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """timm VisionTransformer keys → our ViT tree. timm's qkv reshape
    (B,N,3,H,D) matches ours, so no head permutation is needed."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = state_dict

    def ln(prefix_t: str, prefix_f: str):
        _put(out, "params", f"{prefix_f}/scale", _t(sd[f"{prefix_t}.weight"]))
        _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))

    def fc(prefix_t: str, prefix_f: str):
        _put(out, "params", f"{prefix_f}/kernel", _dense(sd[f"{prefix_t}.weight"]))
        if f"{prefix_t}.bias" in sd:
            _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))

    if "cls_token" in sd:
        _put(out, "params", "cls_token", _t(sd["cls_token"]))
    if "pos_embed" in sd:
        _put(out, "params", "pos_embed", _t(sd["pos_embed"]))
    if "patch_embed.proj.weight" in sd:
        _put(out, "params", "patch_embed/proj/kernel", _conv(sd["patch_embed.proj.weight"]))
        _put(out, "params", "patch_embed/proj/bias", _t(sd["patch_embed.proj.bias"]))
    blocks = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"blocks\.(\d+)\.", k))}
    )
    for i in blocks:
        ln(f"blocks.{i}.norm1", f"block{i}/norm1")
        fc(f"blocks.{i}.attn.qkv", f"block{i}/attn/qkv")
        fc(f"blocks.{i}.attn.proj", f"block{i}/attn/proj")
        ln(f"blocks.{i}.norm2", f"block{i}/norm2")
        fc(f"blocks.{i}.mlp.fc1", f"block{i}/mlp/fc1")
        fc(f"blocks.{i}.mlp.fc2", f"block{i}/mlp/fc2")
    if "norm.weight" in sd:
        ln("norm", "norm")
    if "head.weight" in sd:
        fc("head", "head")
    return out


CONVERTERS = {"resnet": convert_resnet, "vit": convert_vit}


def convert_state_dict(state_dict: Dict[str, Any], arch: str) -> Dict[str, Dict[str, np.ndarray]]:
    for prefix, fn in CONVERTERS.items():
        if arch.startswith(prefix) or arch.startswith(("resnext", "wide_resnet", "legacy_seresnet")) and prefix == "resnet":
            return fn(state_dict)
    raise ValueError(f"no converter for arch {arch!r}; have {sorted(CONVERTERS)}")


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def _unflatten(flat: Dict[str, Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def merge_converted(
    params,
    batch_stats,
    converted: Dict[str, Dict[str, np.ndarray]],
    logger=None,
    strip_prefix: str = "",
) -> Tuple[Any, Any]:
    """Non-strict shape-checked merge of converted tensors into existing
    trees (CheckpointManager.load_from semantics). ``strip_prefix`` lets a
    bare-backbone conversion land under e.g. 'backbone/'."""
    import jax.numpy as jnp

    def merge(tree, conv_flat):
        flat = _flatten(tree)
        loaded, skipped = 0, []
        new_flat = dict(flat)
        for path, val in conv_flat.items():
            tgt = f"{strip_prefix}{path}" if strip_prefix else path
            if tgt in flat and tuple(flat[tgt].shape) == tuple(val.shape):
                new_flat[tgt] = jnp.asarray(val, flat[tgt].dtype)
                loaded += 1
            else:
                skipped.append(path)
        return _unflatten(new_flat), loaded, skipped

    new_params, n_p, skip_p = merge(params, converted.get("params", {}))
    new_bs, n_b, skip_b = merge(batch_stats or {}, converted.get("batch_stats", {}))
    if logger is not None:
        logger.both(
            f"convert: loaded {n_p} params + {n_b} batch_stats tensors;"
            f" skipped {len(skip_p) + len(skip_b)} "
            f"{(skip_p + skip_b)[:8]}"
        )
    return new_params, new_bs


def save_converted(converted: Dict[str, Dict[str, np.ndarray]], path: str) -> None:
    arrays = {}
    for tree, flat in converted.items():
        for p, v in flat.items():
            arrays[f"{tree}::{p}"] = v
    np.savez(path, **arrays)


def load_converted(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    data = np.load(path)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for key in data.files:
        tree, p = key.split("::", 1)
        out.setdefault(tree, {})[p] = data[key]
    return out
