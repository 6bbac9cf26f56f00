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
from functools import partial
from typing import Any, Dict, List, Tuple

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


def _conv1x1_dense(w) -> np.ndarray:
    """torch 1x1 Conv2d weight [out, in, 1, 1] → Dense kernel [in, out]
    (for SE / head convs that we implement as Dense on pooled features)."""
    return _t(w).reshape(w.shape[0], w.shape[1]).T


def _put(flat: Dict, tree: str, path: str, value: np.ndarray) -> None:
    flat.setdefault(tree, {})[path] = value


# Shared per-module mappers (each converter aliases these via partial so the
# Dense-transpose / optional-bias / BN-stats logic lives in exactly one place).

def _bn(out, sd, prefix_t: str, prefix_f: str):
    _put(out, "params", f"{prefix_f}/scale", _t(sd[f"{prefix_t}.weight"]))
    _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))
    _put(out, "batch_stats", f"{prefix_f}/mean", _t(sd[f"{prefix_t}.running_mean"]))
    _put(out, "batch_stats", f"{prefix_f}/var", _t(sd[f"{prefix_t}.running_var"]))


def _ln(out, sd, prefix_t: str, prefix_f: str):
    _put(out, "params", f"{prefix_f}/scale", _t(sd[f"{prefix_t}.weight"]))
    _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))


def _fc(out, sd, prefix_t: str, prefix_f: str):
    _put(out, "params", f"{prefix_f}/kernel", _dense(sd[f"{prefix_t}.weight"]))
    if f"{prefix_t}.bias" in sd:
        _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))


# static buffers that carry no learned state (recomputed on our side)
_IGNORABLE = re.compile(
    r"(relative_position_index|relative_coords_table|attn_mask|num_batches_tracked)$"
)


class _SD:
    """Read-tracking view of a torch state_dict: converters consume keys
    through it, and ``unconsumed()`` lists every tensor nothing mapped — the
    loud-failure contract (silently dropping e.g. LayerScale gammas would
    produce a model that loads 'successfully' but computes garbage)."""

    def __init__(self, sd: Dict[str, Any]):
        self._sd = sd
        self.used: set = set()

    def __getitem__(self, key: str):
        self.used.add(key)
        return self._sd[key]

    def __contains__(self, key: str) -> bool:
        return key in self._sd

    def __iter__(self):
        return iter(self._sd)

    def keys(self):
        return self._sd.keys()

    def unconsumed(self) -> List[str]:
        return [k for k in self._sd if k not in self.used and not _IGNORABLE.search(k)]

    def check(self, strict: bool, family: str) -> None:
        left = self.unconsumed()
        if left and strict:
            raise ValueError(
                f"{family} converter left {len(left)} source tensors unmapped "
                f"(refusing a silent partial import): {left[:12]}"
                + (" ..." if len(left) > 12 else "")
            )


def convert_resnet(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """torchvision ResNet/ResNeXt/WideResNet keys → our ResNet tree
    ("/"-joined paths under 'params' and 'batch_stats')."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd_track = _SD(state_dict)
    bn = partial(_bn, out, sd_track)

    if "conv1.weight" in state_dict:
        _put(out, "params", "stem_conv/kernel", _conv(sd_track["conv1.weight"]))
        bn("bn1", "stem_bn")
    for key in state_dict:
        m = re.match(r"layer(\d+)\.(\d+)\.conv(\d+)\.weight$", key)
        if m:
            s, b, i = m.groups()
            _put(out, "params", f"stage{s}_block{int(b) + 1}/conv{i}/kernel", _conv(sd_track[key]))
        m = re.match(r"layer(\d+)\.(\d+)\.bn(\d+)\.weight$", key)
        if m:
            s, b, i = m.groups()
            bn(f"layer{s}.{b}.bn{i}", f"stage{s}_block{int(b) + 1}/bn{i}")
        m = re.match(r"layer(\d+)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            s, b = m.groups()
            _put(out, "params", f"stage{s}_block{int(b) + 1}/down_conv/kernel", _conv(sd_track[key]))
            bn(f"layer{s}.{b}.downsample.1", f"stage{s}_block{int(b) + 1}/down_bn")
    if "fc.weight" in state_dict:
        _put(out, "params", "fc/kernel", _dense(sd_track["fc.weight"]))
        _put(out, "params", "fc/bias", _t(sd_track["fc.bias"]))
    sd_track.check(strict, "resnet")
    return out


def convert_vit(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """timm VisionTransformer keys → our ViT tree. timm's qkv reshape
    (B,N,3,H,D) matches ours, so no head permutation is needed. Covers
    LayerScale (ls1/ls2, dinov2-style init_values) and AttentionPoolLatent
    (siglip-style attn_pool) variants."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = _SD(state_dict)

    ln, fc = partial(_ln, out, sd), partial(_fc, out, sd)

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
        # timm LayerScale (init_values set, e.g. dinov2): per-branch gammas
        if f"blocks.{i}.ls1.gamma" in sd:
            _put(out, "params", f"block{i}/ls1", _t(sd[f"blocks.{i}.ls1.gamma"]))
            _put(out, "params", f"block{i}/ls2", _t(sd[f"blocks.{i}.ls2.gamma"]))
    if "norm.weight" in sd:
        ln("norm", "norm")
    # timm AttentionPoolLatent (siglip map pooling)
    if "attn_pool.latent" in sd:
        _put(out, "params", "attn_pool/latent", _t(sd["attn_pool.latent"]))
        fc("attn_pool.q", "attn_pool/q")
        fc("attn_pool.kv", "attn_pool/kv")
        fc("attn_pool.proj", "attn_pool/proj")
        ln("attn_pool.norm", "attn_pool/norm")
        fc("attn_pool.mlp.fc1", "attn_pool/mlp/fc1")
        fc("attn_pool.mlp.fc2", "attn_pool/mlp/fc2")
    if "head.weight" in sd:
        fc("head", "head")
    sd.check(strict, "vit")
    return out


def _swin_layers_and_merges(sd: "_SD"):
    """Map timm ``layers.{s}`` structure onto our stage/merge naming.

    timm changed PatchMerging placement across versions: old (≤0.8, and the
    original Microsoft checkpoints) put ``layers.{s}.downsample`` at the END
    of stage s (→ our ``merge{s}``); new (≥0.9) applies it at the START of
    stage s (reducing stage s-1's dims → our ``merge{s-1}``). Detected by
    whether layers.0 carries downsample params."""
    blocks = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            if (m := re.match(r"layers\.(\d+)\.blocks\.(\d+)\.", k))
        }
    )
    merge_stages = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"layers\.(\d+)\.downsample\.reduction\.weight$", k))
        }
    )
    old_layout = 0 in merge_stages
    merges = {s: (s if old_layout else s - 1) for s in merge_stages}
    return blocks, merges


def convert_swin(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """timm SwinTransformer (V1) keys → our SwinTransformer tree.

    The relative-position-bias table copies through unchanged ([(2ws−1)², h];
    our static relative_position_index is computed identically to timm's
    buffer, swin.py:40-46), qkv shares the ViT [3,h,hd] layout, and
    PatchMerging concat order (x00,x10,x01,x11) matches both timm versions."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = _SD(state_dict)

    ln, fc = partial(_ln, out, sd), partial(_fc, out, sd)

    if "patch_embed.proj.weight" in sd:
        _put(out, "params", "patch_embed/kernel", _conv(sd["patch_embed.proj.weight"]))
        _put(out, "params", "patch_embed/bias", _t(sd["patch_embed.proj.bias"]))
        ln("patch_embed.norm", "patch_norm")
    blocks, merges = _swin_layers_and_merges(sd)
    for s, b in blocks:
        t = f"layers.{s}.blocks.{b}"
        f = f"stage{s}_block{b}"
        ln(f"{t}.norm1", f"{f}/norm1")
        fc(f"{t}.attn.qkv", f"{f}/attn/qkv")
        _put(
            out, "params", f"{f}/attn/relative_position_bias_table",
            _t(sd[f"{t}.attn.relative_position_bias_table"]),
        )
        fc(f"{t}.attn.proj", f"{f}/attn/proj")
        ln(f"{t}.norm2", f"{f}/norm2")
        fc(f"{t}.mlp.fc1", f"{f}/mlp/fc1")
        fc(f"{t}.mlp.fc2", f"{f}/mlp/fc2")
    for s, ours in merges.items():
        ln(f"layers.{s}.downsample.norm", f"merge{ours}/norm")
        fc(f"layers.{s}.downsample.reduction", f"merge{ours}/reduction")
    if "norm.weight" in sd:
        ln("norm", "norm")
    if "head.weight" in sd:  # old timm
        fc("head", "head")
    elif "head.fc.weight" in sd:  # new timm ClassifierHead
        fc("head.fc", "head")
    sd.check(strict, "swin")
    return out


def convert_swinv2(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """timm SwinTransformerV2 keys → our SwinTransformerV2 tree.

    V2-specific mappings: the qkv bias is reassembled from q_bias/v_bias
    (timm keeps k bias-free: cat(q_bias, 0, v_bias)); the per-head
    logit_scale copies through; the log-CPB MLP (cpb_mlp.0 / cpb_mlp.2) lands
    on cpb_fc1/cpb_fc2 — our kernel evaluates it on [N,N,2] token-pair coords
    instead of timm's (2ws−1)² grid + index lookup, which is pointwise
    identical; PatchMergingV2 is reduction→norm (2C)."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = _SD(state_dict)

    ln, fc = partial(_ln, out, sd), partial(_fc, out, sd)

    if "patch_embed.proj.weight" in sd:
        _put(out, "params", "patch_embed/kernel", _conv(sd["patch_embed.proj.weight"]))
        _put(out, "params", "patch_embed/bias", _t(sd["patch_embed.proj.bias"]))
        ln("patch_embed.norm", "patch_norm")
    blocks, merges = _swin_layers_and_merges(sd)
    for s, b in blocks:
        t = f"layers.{s}.blocks.{b}"
        f = f"stage{s}_block{b}"
        fc(f"{t}.attn.qkv", f"{f}/attn/qkv")
        if f"{t}.attn.q_bias" in sd:
            qb = _t(sd[f"{t}.attn.q_bias"])
            vb = _t(sd[f"{t}.attn.v_bias"])
            _put(
                out, "params", f"{f}/attn/qkv/bias",
                np.concatenate([qb, np.zeros_like(qb), vb]),
            )
        _put(out, "params", f"{f}/attn/logit_scale", _t(sd[f"{t}.attn.logit_scale"]))
        fc(f"{t}.attn.cpb_mlp.0", f"{f}/attn/cpb_fc1")
        fc(f"{t}.attn.cpb_mlp.2", f"{f}/attn/cpb_fc2")
        fc(f"{t}.attn.proj", f"{f}/attn/proj")
        ln(f"{t}.norm1", f"{f}/norm1")
        ln(f"{t}.norm2", f"{f}/norm2")
        fc(f"{t}.mlp.fc1", f"{f}/mlp/fc1")
        fc(f"{t}.mlp.fc2", f"{f}/mlp/fc2")
    for s, ours in merges.items():
        ln(f"layers.{s}.downsample.norm", f"merge{ours}/norm")
        fc(f"layers.{s}.downsample.reduction", f"merge{ours}/reduction")
    if "norm.weight" in sd:
        ln("norm", "norm")
    if "head.weight" in sd:
        fc("head", "head")
    elif "head.fc.weight" in sd:
        fc("head.fc", "head")
    sd.check(strict, "swinv2")
    return out


def convert_convnext(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """timm / FB-repo ConvNeXt keys → our ConvNeXt tree. Handles both naming
    generations (conv_dw|dwconv, mlp.fc1|pwconv1, head.norm|norm)."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = _SD(state_dict)

    ln, fc = partial(_ln, out, sd), partial(_fc, out, sd)

    if "stem.0.weight" in sd:
        _put(out, "params", "stem_conv/kernel", _conv(sd["stem.0.weight"]))
        _put(out, "params", "stem_conv/bias", _t(sd["stem.0.bias"]))
        ln("stem.1", "stem_norm")
    # FB repo: downsample_layers.0 is the stem, .{s} for s>=1 = [LN, conv]
    if "downsample_layers.0.0.weight" in sd:
        _put(out, "params", "stem_conv/kernel", _conv(sd["downsample_layers.0.0.weight"]))
        _put(out, "params", "stem_conv/bias", _t(sd["downsample_layers.0.0.bias"]))
        ln("downsample_layers.0.1", "stem_norm")
    blocks = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            if (m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.", k))
        }
    )
    for s, b in blocks:
        t = f"stages.{s}.blocks.{b}"
        f = f"stage{s}_block{b}"
        dw = "conv_dw" if f"{t}.conv_dw.weight" in sd else "dwconv"
        _put(out, "params", f"{f}/dwconv/kernel", _conv(sd[f"{t}.{dw}.weight"]))
        _put(out, "params", f"{f}/dwconv/bias", _t(sd[f"{t}.{dw}.bias"]))
        ln(f"{t}.norm", f"{f}/norm")
        if f"{t}.mlp.fc1.weight" in sd:
            fc(f"{t}.mlp.fc1", f"{f}/pwconv1")
            fc(f"{t}.mlp.fc2", f"{f}/pwconv2")
        else:
            fc(f"{t}.pwconv1", f"{f}/pwconv1")
            fc(f"{t}.pwconv2", f"{f}/pwconv2")
        if f"{t}.gamma" in sd:
            _put(out, "params", f"{f}/gamma", _t(sd[f"{t}.gamma"]))
    for key in list(sd.keys()):
        m = re.match(r"stages\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            s = int(m.group(1))
            ln(f"stages.{s}.downsample.0", f"downsample_norm{s}")
            _put(
                out, "params", f"downsample_conv{s}/kernel",
                _conv(sd[f"stages.{s}.downsample.1.weight"]),
            )
            _put(
                out, "params", f"downsample_conv{s}/bias",
                _t(sd[f"stages.{s}.downsample.1.bias"]),
            )
    if "head.norm.weight" in sd:  # timm NormMlpClassifierHead (pool → norm → fc)
        ln("head.norm", "head_norm")
        if "head.fc.weight" in sd:
            fc("head.fc", "head")
    elif "norm.weight" in sd:  # FB repo: final norm + head
        ln("norm", "head_norm")
        if "head.weight" in sd:
            fc("head", "head")
    sd.check(strict, "convnext")
    return out


def _bn(out, sd, prefix_t: str, prefix_f: str):
    _put(out, "params", f"{prefix_f}/scale", _t(sd[f"{prefix_t}.weight"]))
    _put(out, "params", f"{prefix_f}/bias", _t(sd[f"{prefix_t}.bias"]))
    _put(out, "batch_stats", f"{prefix_f}/mean", _t(sd[f"{prefix_t}.running_mean"]))
    _put(out, "batch_stats", f"{prefix_f}/var", _t(sd[f"{prefix_t}.running_var"]))


def convert_mobilenetv3(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """timm MobileNetV3 keys → our MobileNetV3 tree.

    timm groups blocks by stride stage (blocks.{s}.{b}); our tree is the flat
    paper table (stage{g+1}_block1), so blocks are enumerated globally in
    order. The final in-blocks ConvBnAct (blocks.{last} = the 960-ch 1×1)
    lands on head_conv/head_bn; timm's post-pool conv_head [1280,960,1,1]
    becomes the pre_head Dense. SE conv_reduce/conv_expand (1×1 convs) map to
    our Dense fc1/fc2. tf_* variants share these keys — their asymmetric
    TF-SAME padding lives in the model (tf_same=True factories), not here."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = _SD(state_dict)

    if "conv_stem.weight" in sd:
        _put(out, "params", "stem/kernel", _conv(sd["conv_stem.weight"]))
        _bn(out, sd, "bn1", "stem_bn")
    groups = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            if (m := re.match(r"blocks\.(\d+)\.(\d+)\.", k))
        }
    )
    g = 0
    for s, b in groups:
        t = f"blocks.{s}.{b}"
        if f"{t}.conv.weight" in sd:  # ConvBnAct: the trailing 1x1 expand
            _put(out, "params", "head_conv/kernel", _conv(sd[f"{t}.conv.weight"]))
            _bn(out, sd, f"{t}.bn1", "head_bn")
            continue
        f = f"stage{g + 1}_block1"
        g += 1
        if f"{t}.conv_pw.weight" in sd and f"{t}.conv_pwl.weight" in sd:
            # InvertedResidual: pw expand → dw → (se) → pwl project
            _put(out, "params", f"{f}/expand/kernel", _conv(sd[f"{t}.conv_pw.weight"]))
            _bn(out, sd, f"{t}.bn1", f"{f}/bn_expand")
            _put(out, "params", f"{f}/dw/kernel", _conv(sd[f"{t}.conv_dw.weight"]))
            _bn(out, sd, f"{t}.bn2", f"{f}/bn_dw")
            _put(out, "params", f"{f}/project/kernel", _conv(sd[f"{t}.conv_pwl.weight"]))
            _bn(out, sd, f"{t}.bn3", f"{f}/bn_project")
        else:
            # DepthwiseSeparableConv: dw → (se) → pw project (no expand)
            _put(out, "params", f"{f}/dw/kernel", _conv(sd[f"{t}.conv_dw.weight"]))
            _bn(out, sd, f"{t}.bn1", f"{f}/bn_dw")
            _put(out, "params", f"{f}/project/kernel", _conv(sd[f"{t}.conv_pw.weight"]))
            _bn(out, sd, f"{t}.bn2", f"{f}/bn_project")
        if f"{t}.se.conv_reduce.weight" in sd:
            _put(out, "params", f"{f}/se/fc1/kernel", _conv1x1_dense(sd[f"{t}.se.conv_reduce.weight"]))
            _put(out, "params", f"{f}/se/fc1/bias", _t(sd[f"{t}.se.conv_reduce.bias"]))
            _put(out, "params", f"{f}/se/fc2/kernel", _conv1x1_dense(sd[f"{t}.se.conv_expand.weight"]))
            _put(out, "params", f"{f}/se/fc2/bias", _t(sd[f"{t}.se.conv_expand.bias"]))
    if "conv_head.weight" in sd:  # post-pool 960→1280 1x1 ≡ Dense
        _put(out, "params", "pre_head/kernel", _conv1x1_dense(sd["conv_head.weight"]))
        if "conv_head.bias" in sd:
            _put(out, "params", "pre_head/bias", _t(sd["conv_head.bias"]))
    if "classifier.weight" in sd:
        _put(out, "params", "fc/kernel", _dense(sd["classifier.weight"]))
        _put(out, "params", "fc/bias", _t(sd["classifier.bias"]))
    sd.check(strict, "mobilenetv3")
    return out


def convert_efficientnetv2(
    state_dict: Dict[str, Any], strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """timm EfficientNetV2 keys → our EfficientNetV2 tree. timm's stage
    grouping (blocks.{s}.{b}) matches our stage table 1:1:
    ConvBnAct → project/bn_project, EdgeResidual (fused) → expand+project,
    InvertedResidual → expand/dw/se/project. conv_head+bn2 → head_conv/head_bn."""
    out: Dict[str, Dict[str, np.ndarray]] = {"params": {}, "batch_stats": {}}
    sd = _SD(state_dict)

    if "conv_stem.weight" in sd:
        _put(out, "params", "stem/kernel", _conv(sd["conv_stem.weight"]))
        _bn(out, sd, "bn1", "stem_bn")
    groups = sorted(
        {
            (int(m.group(1)), int(m.group(2)))
            for k in sd
            if (m := re.match(r"blocks\.(\d+)\.(\d+)\.", k))
        }
    )
    for s, b in groups:
        t = f"blocks.{s}.{b}"
        f = f"stage{s + 1}_block{b + 1}"
        if f"{t}.conv.weight" in sd:  # ConvBnAct (expand==1 fused stage)
            _put(out, "params", f"{f}/project/kernel", _conv(sd[f"{t}.conv.weight"]))
            _bn(out, sd, f"{t}.bn1", f"{f}/bn_project")
        elif f"{t}.conv_exp.weight" in sd:  # EdgeResidual (fused MBConv)
            _put(out, "params", f"{f}/expand/kernel", _conv(sd[f"{t}.conv_exp.weight"]))
            _bn(out, sd, f"{t}.bn1", f"{f}/bn_expand")
            _put(out, "params", f"{f}/project/kernel", _conv(sd[f"{t}.conv_pwl.weight"]))
            _bn(out, sd, f"{t}.bn2", f"{f}/bn_project")
        else:  # InvertedResidual (MBConv + SE)
            _put(out, "params", f"{f}/expand/kernel", _conv(sd[f"{t}.conv_pw.weight"]))
            _bn(out, sd, f"{t}.bn1", f"{f}/bn_expand")
            _put(out, "params", f"{f}/dw/kernel", _conv(sd[f"{t}.conv_dw.weight"]))
            _bn(out, sd, f"{t}.bn2", f"{f}/bn_dw")
            _put(out, "params", f"{f}/se/fc1/kernel", _conv1x1_dense(sd[f"{t}.se.conv_reduce.weight"]))
            _put(out, "params", f"{f}/se/fc1/bias", _t(sd[f"{t}.se.conv_reduce.bias"]))
            _put(out, "params", f"{f}/se/fc2/kernel", _conv1x1_dense(sd[f"{t}.se.conv_expand.weight"]))
            _put(out, "params", f"{f}/se/fc2/bias", _t(sd[f"{t}.se.conv_expand.bias"]))
            _put(out, "params", f"{f}/project/kernel", _conv(sd[f"{t}.conv_pwl.weight"]))
            _bn(out, sd, f"{t}.bn3", f"{f}/bn_project")
    if "conv_head.weight" in sd:
        _put(out, "params", "head_conv/kernel", _conv(sd["conv_head.weight"]))
        _bn(out, sd, "bn2", "head_bn")
    if "classifier.weight" in sd:
        _put(out, "params", "fc/kernel", _dense(sd["classifier.weight"]))
        _put(out, "params", "fc/bias", _t(sd["classifier.bias"]))
    sd.check(strict, "efficientnetv2")
    return out


# ordered: longer prefixes first (swinv2 before swin)
CONVERTERS = {
    "swinv2": convert_swinv2,
    "swin": convert_swin,
    "convnext": convert_convnext,
    "mobilenetv3": convert_mobilenetv3,
    "efficientnetv2": convert_efficientnetv2,
    "resnet": convert_resnet,
    "vit": convert_vit,
}


def convert_state_dict(
    state_dict: Dict[str, Any], arch: str, strict: bool = True
) -> Dict[str, Dict[str, np.ndarray]]:
    """Dispatch on architecture name (canonicalized zoo naming; a timm-
    prefix is tolerated). ``strict`` raises if any source tensor is left
    unmapped (recommended: a partial import is a silent accuracy bug, see
    ADVICE r2)."""
    name = arch
    if name.startswith("timm-"):
        name = name[len("timm-"):]
    if name.startswith("tf_"):
        # tf_* checkpoints carry identical KEYS to the non-tf variants; the
        # zoo's tf_ factories implement the matching asymmetric TF-SAME conv
        # padding + BN eps 1e-3 (backbones/mobilenet.tf_same_padding), so the
        # same converters apply — but ONLY for archs that actually have a
        # registered tf_ factory. Stripping the prefix for any other tf_ name
        # would "succeed" and load into a symmetric-padding model, the exact
        # silent shifted-activation bug the round-3 guard existed to prevent.
        from visiondk_tpu.models.backbones import BACKBONES

        if name.split(".")[0] not in BACKBONES:  # tolerate .in1k-style tags
            tf_zoo = sorted(k for k in BACKBONES if k.startswith("tf_"))
            raise ValueError(
                f"no TF-SAME-padding model factory for {arch!r}: its weights "
                f"require asymmetric TF-SAME conv geometry and would load "
                f"into a symmetric-padding model with shifted activations. "
                f"tf_ archs with registered factories: {tf_zoo}"
            )
        name = name[len("tf_"):]
    for prefix, fn in CONVERTERS.items():
        if name.startswith(prefix) or (
            name.startswith(("resnext", "wide_resnet", "legacy_seresnet"))
            and prefix == "resnet"
        ):
            return fn(state_dict, strict=strict)
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


def resize_pos_embed(src: np.ndarray, tgt_n: int) -> "np.ndarray | None":
    """Bicubically resize a [1, N, C] ViT pos_embed to ``tgt_n`` tokens (timm
    resample_abs_pos_embed semantics: prefix tokens kept, square grid
    interpolated). Returns None when the grids aren't square (caller skips)."""
    import jax

    _, n_src, c = src.shape
    for prefix in (1, 0):
        gs, gt = n_src - prefix, tgt_n - prefix
        ss, st = int(round(gs**0.5)), int(round(gt**0.5))
        if gs > 0 and gt > 0 and ss * ss == gs and st * st == gt:
            grid = src[:, prefix:].reshape(1, ss, ss, c).astype(np.float32)
            grid = jax.image.resize(grid, (1, st, st, c), method="bicubic")
            grid = np.asarray(grid).reshape(1, st * st, c)
            return np.concatenate([src[:, :prefix].astype(np.float32), grid], axis=1)
    return None


def merge_converted(
    params,
    batch_stats,
    converted: Dict[str, Dict[str, np.ndarray]],
    logger=None,
    strip_prefix: str = "",
) -> Tuple[Any, Any]:
    """Non-strict shape-checked merge of converted tensors into existing
    trees (CheckpointManager.load_from semantics). ``strip_prefix`` lets a
    bare-backbone conversion land under e.g. 'backbone/'. A pos_embed whose
    token count differs (e.g. dinov2's native 518px grid → 224px target) is
    bicubically resized instead of skipped."""
    import jax.numpy as jnp

    def merge(tree, conv_flat):
        flat = _flatten(tree)
        loaded, skipped = 0, []
        new_flat = dict(flat)
        for path, val in conv_flat.items():
            tgt = f"{strip_prefix}{path}" if strip_prefix else path
            if (
                tgt in flat
                and path.endswith("pos_embed")
                and tuple(flat[tgt].shape) != tuple(val.shape)
                and val.ndim == 3
                and flat[tgt].ndim == 3
                and val.shape[-1] == flat[tgt].shape[-1]
            ):
                resized = resize_pos_embed(np.asarray(val), int(flat[tgt].shape[1]))
                if resized is not None:
                    val = resized
                    if logger is not None:
                        logger.both(
                            f"convert: resized pos_embed {tuple(np.asarray(val).shape)}"
                        )
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
