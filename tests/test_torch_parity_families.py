"""Pretrained-import goldens for the non-ViT/ResNet families.

Same methodology as tests/test_torch_parity.py: a timm-layout torch model is
built in-test (real torch Conv2d/LayerNorm/roll/softmax semantics — the
container has no network, torch supplies the ground truth), its state_dict
runs through models/convert.py, and the converted flax model must reproduce
the torch logits. Covers the reference's DEFAULT backbone family (swin —
configs/classification/pet.yaml:25, faceX/face.yaml:28) plus swinv2,
convnext, mobilenetv3, efficientnetv2 and the vit LayerScale/siglip-pool
variants flagged in round-2 review.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def _randomize(model: "tnn.Module", seed: int) -> None:
    """Fill every learnable param and BN running stat with non-trivial values
    — but leave structural buffers (attn_mask, relative_coords_table, ...)
    alone: they are model *structure*, and randomizing them would corrupt the
    torch golden itself."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    learned = {n for n, _ in model.named_parameters()}
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
        elif k.endswith("running_mean"):
            sd[k] = 0.2 * torch.randn(v.shape, generator=gen)
        elif k not in learned:
            continue  # structural buffer
        elif k.endswith("logit_scale"):
            sd[k] = torch.log(5.0 + 5.0 * torch.rand(v.shape, generator=gen))
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=gen)
    model.load_state_dict(sd)


def _assert_logits_match(model, variables, x, golden, atol=3e-4):
    import jax.numpy as jnp

    logits = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-3, atol=atol)


def _n_learned(sd) -> int:
    """Float tensors excluding static buffers the converter recomputes."""
    from visiondk_tpu.models.convert import _IGNORABLE

    return sum(
        1
        for k, v in sd.items()
        if v.dtype == torch.float32 and not _IGNORABLE.search(k)
    )


class _Mlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


# --------------------------------------------------------------- swin (V1)


def _win_part(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _win_rev(x, ws, H, W):
    B = x.shape[0] // ((H // ws) * (W // ws))
    x = x.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _shift_mask(H, W, ws, shift):
    """Standard SW-MSA additive mask (region ids from the 3x3 slice grid)."""
    img = torch.zeros(1, H, W, 1)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    mw = _win_part(img, ws).squeeze(-1)  # [nW, ws*ws]
    mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    return mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)


def _rel_index(ws):
    coords = torch.stack(
        torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
    ).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class _SwinAttn(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, 3 * dim, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads)
        )
        self.register_buffer("relative_position_index", _rel_index(ws))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B_, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N) + mask.unsqueeze(0).unsqueeze(2)
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class _SwinBlock(tnn.Module):
    def __init__(self, dim, res, heads, ws, shift, mlp_ratio):
        super().__init__()
        if min(res) <= ws:
            ws, shift = min(res), 0
        self.res, self.ws, self.shift = res, ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _SwinAttn(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))
        if shift > 0:
            self.register_buffer("attn_mask", _shift_mask(res[0], res[1], ws, shift))

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        sc = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
        xw = self.attn(_win_part(x, self.ws), self.attn_mask if self.shift else None)
        x = _win_rev(xw, self.ws, H, W)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), (1, 2))
        x = sc + x.reshape(B, L, C)
        return x + self.mlp(self.norm2(x))


class _PatchMergingV1(tnn.Module):
    def __init__(self, res, dim):
        super().__init__()
        self.res = res
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        ).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class _PatchMergingV2(tnn.Module):
    def __init__(self, res, dim):
        super().__init__()
        self.res = res
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = tnn.LayerNorm(2 * dim)

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        ).view(B, -1, 4 * C)
        return self.norm(self.reduction(x))


class _SwinLayer(tnn.Module):
    """Old-timm BasicLayer: blocks then optional end-of-stage downsample."""

    def __init__(self, blocks, downsample=None):
        super().__init__()
        self.blocks = tnn.ModuleList(blocks)
        self.downsample = downsample

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class _PatchEmbed(tnn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, patch)
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(self.proj(x).flatten(2).transpose(1, 2))


class _TimmSwin(tnn.Module):
    def __init__(self, img=32, patch=4, dim=16, depths=(2, 2), heads=(2, 4),
                 ws=4, mlp_ratio=2.0, num_classes=5, v2=False):
        super().__init__()
        self.patch_embed = _PatchEmbed(patch, dim)
        res = img // patch
        layers = []
        d = dim
        block_cls = _SwinV2Block if v2 else _SwinBlock
        merge_cls = _PatchMergingV2 if v2 else _PatchMergingV1
        for s, depth in enumerate(depths):
            blocks = [
                block_cls(d, (res, res), heads[s], ws,
                          0 if b % 2 == 0 else ws // 2, mlp_ratio)
                for b in range(depth)
            ]
            down = merge_cls((res, res), d) if s < len(depths) - 1 else None
            layers.append(_SwinLayer(blocks, down))
            if down is not None:
                d, res = d * 2, res // 2
        self.layers = tnn.ModuleList(layers)
        self.norm = tnn.LayerNorm(d)
        self.head = tnn.Linear(d, num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        for layer in self.layers:
            x = layer(x)
        return self.head(self.norm(x).mean(1))


def test_swin_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.swin import SwinTransformer
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmSwin()
    _randomize(tmodel, seed=10)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(11).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = SwinTransformer(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, mlp_ratio=2.0, num_classes=5,
        stochastic_depth_prob=0.0,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "swin_base_patch4_window7_224")

    n_torch = _n_learned(tmodel.state_dict())
    n_flat = sum(len(v) for v in converted.values())
    assert n_flat == n_torch, (n_flat, n_torch)

    params, _ = merge_converted(variables["params"], {}, converted)
    # every converted tensor must have landed (same flat key count)
    _assert_logits_match(model, {"params": params}, x, golden)


def test_swin_new_timm_layout_maps_to_same_targets():
    """timm ≥0.9 puts downsample at the START of stage s (reducing stage s-1)
    — the converter must land it on merge{s-1}."""
    from visiondk_tpu.models.convert import convert_swin

    tmodel = _TimmSwin()
    sd = tmodel.state_dict()
    old = convert_swin(sd)
    # re-key old-layout downsample (layers.0.downsample) as new layout
    # (layers.1.downsample) — same tensors, new placement convention
    sd_new = {
        k.replace("layers.0.downsample", "layers.1.downsample"): v
        for k, v in sd.items()
    }
    new = convert_swin(sd_new)
    assert set(old["params"]) == set(new["params"])
    for k in old["params"]:
        np.testing.assert_array_equal(old["params"][k], new["params"][k])


# ------------------------------------------------------------------ swinv2


class _SwinV2Attn(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.num_heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = tnn.Parameter(torch.zeros(dim))
        self.v_bias = tnn.Parameter(torch.zeros(dim))
        self.proj = tnn.Linear(dim, dim)
        self.logit_scale = tnn.Parameter(torch.log(10 * torch.ones(heads, 1, 1)))
        self.cpb_mlp = tnn.Sequential(
            tnn.Linear(2, 512, bias=True), tnn.ReLU(inplace=True),
            tnn.Linear(512, heads, bias=False),
        )
        # log-spaced relative coords table (timm swinv2, pretrained ws=0 path)
        rng = torch.arange(-(ws - 1), ws, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(rng, rng, indexing="ij"), dim=-1).unsqueeze(0)
        table = table / max(ws - 1, 1) * 8
        table = torch.sign(table) * torch.log2(table.abs() + 1.0) / np.log2(8)
        self.register_buffer("relative_coords_table", table)
        self.register_buffer("relative_position_index", _rel_index(ws))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv_bias = torch.cat(
            (self.q_bias, torch.zeros_like(self.v_bias), self.v_bias)
        )
        qkv = (
            F.linear(x, self.qkv.weight, qkv_bias)
            .reshape(B_, N, 3, self.num_heads, -1)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        scale = torch.clamp(self.logit_scale, max=float(np.log(100.0))).exp()
        attn = attn * scale
        bias_table = self.cpb_mlp(self.relative_coords_table).view(-1, self.num_heads)
        bias = bias_table[self.relative_position_index.view(-1)].view(
            N, N, -1
        ).permute(2, 0, 1)
        attn = attn + 16 * torch.sigmoid(bias).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N) + mask.unsqueeze(0).unsqueeze(2)
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class _SwinV2Block(tnn.Module):
    def __init__(self, dim, res, heads, ws, shift, mlp_ratio):
        super().__init__()
        if min(res) <= ws:
            ws, shift = min(res), 0
        self.res, self.ws, self.shift = res, ws, shift
        self.attn = _SwinV2Attn(dim, ws, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))
        self.norm2 = tnn.LayerNorm(dim)
        if shift > 0:
            self.register_buffer("attn_mask", _shift_mask(res[0], res[1], ws, shift))

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        sc = x
        x = x.view(B, H, W, C)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
        xw = self.attn(_win_part(x, self.ws), self.attn_mask if self.shift else None)
        x = _win_rev(xw, self.ws, H, W)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), (1, 2))
        x = sc + self.norm1(x.reshape(B, L, C))  # V2 post-norm
        return x + self.norm2(self.mlp(x))


def test_swinv2_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.swinv2 import SwinTransformerV2
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmSwin(v2=True)
    _randomize(tmodel, seed=20)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(21).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = SwinTransformerV2(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, mlp_ratio=2.0, num_classes=5,
        stochastic_depth_prob=0.0,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "swinv2_base_window8_256")

    n_torch = _n_learned(tmodel.state_dict())
    n_flat = sum(len(v) for v in converted.values())
    # q_bias + v_bias fold into ONE qkv bias per block → 1 fewer per block
    n_blocks = sum(1 for k in tmodel.state_dict() if k.endswith("attn.q_bias"))
    assert n_flat == n_torch - n_blocks, (n_flat, n_torch, n_blocks)

    params, _ = merge_converted(variables["params"], {}, converted)
    _assert_logits_match(model, {"params": params}, x, golden)


# ---------------------------------------------------------------- convnext


class _LN2d(tnn.LayerNorm):
    def forward(self, x):
        return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class _ConvNeXtBlock(tnn.Module):
    def __init__(self, dim, mlp_ratio=4):
        super().__init__()
        self.conv_dw = tnn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, dim * mlp_ratio)
        self.gamma = tnn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        y = self.conv_dw(x).permute(0, 2, 3, 1)
        y = self.gamma * self.mlp(self.norm(y))
        return x + y.permute(0, 3, 1, 2)


class _ConvNeXtStage(tnn.Module):
    def __init__(self, in_dim, dim, depth, downsample):
        super().__init__()
        self.downsample = (
            tnn.Sequential(_LN2d(in_dim), tnn.Conv2d(in_dim, dim, 2, 2))
            if downsample else tnn.Identity()
        )
        self.blocks = tnn.Sequential(*[_ConvNeXtBlock(dim) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class _Head(tnn.Module):
    def __init__(self, dim, num_classes):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)
        self.fc = tnn.Linear(dim, num_classes)

    def forward(self, x):
        return self.fc(self.norm(x.mean((2, 3))))


class _TimmConvNeXt(tnn.Module):
    def __init__(self, dims=(8, 16), depths=(2, 2), num_classes=5):
        super().__init__()
        self.stem = tnn.Sequential(tnn.Conv2d(3, dims[0], 4, 4), _LN2d(dims[0]))
        self.stages = tnn.Sequential(
            *[
                _ConvNeXtStage(dims[max(s - 1, 0)], dims[s], depths[s], s > 0)
                for s in range(len(dims))
            ]
        )
        self.head = _Head(dims[-1], num_classes)

    def forward(self, x):
        return self.head(self.stages(self.stem(x)))


def test_convnext_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.convnext import ConvNeXt
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmConvNeXt()
    _randomize(tmodel, seed=30)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(31).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ConvNeXt(depths=(2, 2), dims=(8, 16), num_classes=5)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "convnext_base")

    n_torch = _n_learned(tmodel.state_dict())
    n_flat = sum(len(v) for v in converted.values())
    assert n_flat == n_torch, (n_flat, n_torch)

    params, _ = merge_converted(variables["params"], {}, converted)
    _assert_logits_match(model, {"params": params}, x, golden)


# ------------------------------------------------------------- mobilenetv3


class _TimmSE(tnn.Module):
    def __init__(self, ch, rd, act=tnn.ReLU, gate=F.hardsigmoid):
        super().__init__()
        self.conv_reduce = tnn.Conv2d(ch, rd, 1, bias=True)
        self.act1 = act()
        self.conv_expand = tnn.Conv2d(rd, ch, 1, bias=True)
        self.gate = gate

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * self.gate(s)


class _TimmDS(tnn.Module):
    """timm DepthwiseSeparableConv (exp==in): dw → se → pw project."""

    def __init__(self, ch, out, k, s, se_rd=None, act=tnn.ReLU):
        super().__init__()
        self.conv_dw = tnn.Conv2d(ch, ch, k, s, k // 2, groups=ch, bias=False)
        self.bn1 = tnn.BatchNorm2d(ch)
        self.act1 = act()
        self.se = _TimmSE(ch, se_rd) if se_rd else tnn.Identity()
        self.conv_pw = tnn.Conv2d(ch, out, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.residual = s == 1 and ch == out

    def forward(self, x):
        y = self.se(self.act1(self.bn1(self.conv_dw(x))))
        y = self.bn2(self.conv_pw(y))
        return x + y if self.residual else y


class _TimmIR(tnn.Module):
    """timm InvertedResidual: pw expand → dw → se → pwl project."""

    def __init__(self, ch, mid, out, k, s, se_rd=None, act=tnn.ReLU,
                 se_act=tnn.ReLU, se_gate=F.hardsigmoid):
        super().__init__()
        self.conv_pw = tnn.Conv2d(ch, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.act1 = act()
        self.conv_dw = tnn.Conv2d(mid, mid, k, s, k // 2, groups=mid, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid)
        self.act2 = act()
        self.se = _TimmSE(mid, se_rd, act=se_act, gate=se_gate) if se_rd else tnn.Identity()
        self.conv_pwl = tnn.Conv2d(mid, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.residual = s == 1 and ch == out

    def forward(self, x):
        y = self.act1(self.bn1(self.conv_pw(x)))
        y = self.se(self.act2(self.bn2(self.conv_dw(y))))
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.residual else y


class _TimmCBA(tnn.Module):
    def __init__(self, ch, out, k=1, s=1, act=tnn.Hardswish):
        super().__init__()
        self.conv = tnn.Conv2d(ch, out, k, s, k // 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(out)
        self.act1 = act()

    def forward(self, x):
        return self.act1(self.bn1(self.conv(x)))


class _TimmMNV3(tnn.Module):
    """timm MobileNetV3 layout: conv_stem/bn1 → blocks (last group is the
    1×1 ConvBnAct) → pool → conv_head (1×1 on pooled) → classifier."""

    def __init__(self, num_classes=5):
        super().__init__()
        self.conv_stem = tnn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(16)
        self.act1 = tnn.Hardswish()
        self.blocks = tnn.Sequential(
            tnn.Sequential(_TimmDS(16, 16, 3, 1)),
            tnn.Sequential(
                _TimmIR(16, 32, 24, 3, 2, se_rd=8),
                _TimmIR(24, 48, 24, 3, 1, act=tnn.Hardswish),
            ),
            tnn.Sequential(_TimmCBA(24, 64)),
        )
        self.conv_head = tnn.Conv2d(64, 96, 1, bias=True)
        self.act2 = tnn.Hardswish()
        self.classifier = tnn.Linear(96, num_classes)

    def forward(self, x):
        x = self.blocks(self.act1(self.bn1(self.conv_stem(x))))
        x = x.mean((2, 3), keepdim=True)
        x = self.act2(self.conv_head(x)).flatten(1)
        return self.classifier(x)


def test_mobilenetv3_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.mobilenet import MobileNetV3
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmMNV3()
    _randomize(tmodel, seed=40)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(41).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    # matching flax block table: (kernel, exp, out, SE, HS, stride)
    model = MobileNetV3(
        blocks=(
            (3, 16, 16, False, False, 1),
            (3, 32, 24, True, False, 2),
            (3, 48, 24, False, True, 1),
        ),
        last_exp=64, head_width=96, num_classes=5,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "mobilenetv3_large_100")

    n_torch = _n_learned(tmodel.state_dict())
    n_flat = sum(len(v) for v in converted.values())
    assert n_flat == n_torch, (n_flat, n_torch)

    params, bstats = merge_converted(
        variables["params"], variables["batch_stats"], converted
    )
    _assert_logits_match(
        model, {"params": params, "batch_stats": bstats}, x, golden
    )


# ---------------------------------------------------------- efficientnetv2


class _TimmEdge(tnn.Module):
    """timm EdgeResidual (fused MBConv): conv_exp (k×k) → conv_pwl."""

    def __init__(self, ch, mid, out, k, s):
        super().__init__()
        self.conv_exp = tnn.Conv2d(ch, mid, k, s, k // 2, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid)
        self.act1 = tnn.SiLU()
        self.conv_pwl = tnn.Conv2d(mid, out, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out)
        self.residual = s == 1 and ch == out

    def forward(self, x):
        y = self.bn2(self.conv_pwl(self.act1(self.bn1(self.conv_exp(x)))))
        return x + y if self.residual else y


class _TimmEffV2(tnn.Module):
    def __init__(self, num_classes=5):
        super().__init__()
        self.conv_stem = tnn.Conv2d(3, 8, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(8)
        self.act1 = tnn.SiLU()
        self.blocks = tnn.Sequential(
            tnn.Sequential(_TimmCBA(8, 8, 3, 1, act=tnn.SiLU)),
            tnn.Sequential(_TimmEdge(8, 32, 32, 3, 2)),
            tnn.Sequential(
                _TimmIR(32, 64, 32, 3, 2, se_rd=8, act=tnn.SiLU,
                        se_act=tnn.SiLU, se_gate=torch.sigmoid),
                _TimmIR(32, 64, 32, 3, 1, se_rd=8, act=tnn.SiLU,
                        se_act=tnn.SiLU, se_gate=torch.sigmoid),
            ),
        )
        self.conv_head = tnn.Conv2d(32, 48, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(48)
        self.act2 = tnn.SiLU()
        self.classifier = tnn.Linear(48, num_classes)

    def forward(self, x):
        x = self.blocks(self.act1(self.bn1(self.conv_stem(x))))
        x = self.act2(self.bn2(self.conv_head(x))).mean((2, 3))
        return self.classifier(x)


def test_efficientnetv2_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.efficientnet import EfficientNetV2
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmEffV2()
    _randomize(tmodel, seed=50)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(51).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = EfficientNetV2(
        stages=(
            ("fused", 1, 3, 1, 1, 8),
            ("fused", 1, 3, 2, 4, 32),
            ("mb", 2, 3, 2, 2, 32),
        ),
        stem_ch=8, head_ch=48, num_classes=5,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "efficientnetv2_l")

    n_torch = _n_learned(tmodel.state_dict())
    n_flat = sum(len(v) for v in converted.values())
    assert n_flat == n_torch, (n_flat, n_torch)

    params, bstats = merge_converted(
        variables["params"], variables["batch_stats"], converted
    )
    _assert_logits_match(
        model, {"params": params, "batch_stats": bstats}, x, golden
    )


# -------------------------------------------- vit variants (dinov2, siglip)


class _LS(tnn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = tnn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return self.gamma * x


class _TimmViTLSBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        from tests.test_torch_parity import _TimmAttention

        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TimmAttention(dim, heads)
        self.ls1 = _LS(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, dim * 4)
        self.ls2 = _LS(dim)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        return x + self.ls2(self.mlp(self.norm2(x)))


class _TimmViTDino(tnn.Module):
    """dinov2-style: LayerScale blocks + cls token."""

    def __init__(self, img=16, patch=8, dim=64, depth=2, heads=2, num_classes=5):
        super().__init__()
        from tests.test_torch_parity import _TimmViT

        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n + 1, dim))
        self.patch_embed = _TimmViT._PatchEmbed(patch, dim)
        self.blocks = tnn.Sequential(*[_TimmViTLSBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1) + self.pos_embed
        return self.head(self.norm(self.blocks(x))[:, 0])


def test_vit_layerscale_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.vit import VisionTransformer
    from visiondk_tpu.models.convert import convert_vit, merge_converted

    tmodel = _TimmViTDino()
    _randomize(tmodel, seed=60)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(61).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = VisionTransformer(
        patch_size=8, embed_dim=64, depth=2, num_heads=2, num_classes=5,
        init_values=1e-5,
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    converted = convert_vit(tmodel.state_dict())
    n_torch = len(tmodel.state_dict())
    assert len(converted["params"]) == n_torch

    params, _ = merge_converted(variables["params"], {}, converted)
    _assert_logits_match(model, {"params": params}, x, golden)


class _TimmAttnPoolLatent(tnn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.num_heads = heads
        self.latent = tnn.Parameter(torch.zeros(1, 1, dim))
        self.q = tnn.Linear(dim, dim)
        self.kv = tnn.Linear(dim, 2 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.norm = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        B, N, C = x.shape
        h, hd = self.num_heads, C // self.num_heads
        q = self.q(self.latent.expand(B, -1, -1)).reshape(B, 1, h, hd).transpose(1, 2)
        kv = self.kv(x).reshape(B, N, 2, h, hd).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        attn = ((q * hd**-0.5) @ k.transpose(-2, -1)).softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B, 1, C)
        x = self.proj(x)
        x = x + self.mlp(self.norm(x))
        return x[:, 0]


class _TimmViTSiglip(tnn.Module):
    """siglip-style: no cls token, AttentionPoolLatent head."""

    def __init__(self, img=16, patch=8, dim=64, depth=2, heads=2, num_classes=5):
        super().__init__()
        from tests.test_torch_parity import _TimmBlock, _TimmViT

        n = (img // patch) ** 2
        self.pos_embed = tnn.Parameter(torch.zeros(1, n, dim))
        self.patch_embed = _TimmViT._PatchEmbed(patch, dim)
        self.blocks = tnn.Sequential(*[_TimmBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)
        self.attn_pool = _TimmAttnPoolLatent(dim, heads)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.patch_embed(x) + self.pos_embed
        x = self.norm(self.blocks(x))
        return self.head(self.attn_pool(x))


def test_vit_siglip_pool_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.vit import VisionTransformer
    from visiondk_tpu.models.convert import convert_vit, merge_converted

    tmodel = _TimmViTSiglip()
    _randomize(tmodel, seed=70)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(71).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = VisionTransformer(
        patch_size=8, embed_dim=64, depth=2, num_heads=2, num_classes=5,
        class_token=False, pool="map",
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    converted = convert_vit(tmodel.state_dict())
    assert len(converted["params"]) == len(tmodel.state_dict())

    params, _ = merge_converted(variables["params"], {}, converted)
    _assert_logits_match(model, {"params": params}, x, golden)


def test_shift_mask_matches_reference_algorithm():
    """The end-to-end goldens are weakly sensitive to the SW-MSA mask at
    small random weights (softmax(±100) shifts logits ~1e-5 there), so pin
    the mask itself against an independent torch construction of the
    original region-id algorithm."""
    from visiondk_tpu.models.backbones.swin import shifted_window_mask

    for H, W, ws, shift in ((8, 8, 4, 2), (16, 12, 4, 2), (28, 28, 7, 3)):
        ours = shifted_window_mask(H, W, ws, shift)
        theirs = _shift_mask(H, W, ws, shift).numpy()
        np.testing.assert_array_equal(ours, theirs)


# ----------------------------------------------------- converter contracts


def test_converter_raises_on_unmapped_tensors():
    """strict mode: an unrecognized source tensor must fail loudly, not load
    a silently-partial model (round-2 advisor finding)."""
    from visiondk_tpu.models.convert import convert_vit

    tmodel = _TimmViTDino()
    sd = dict(tmodel.state_dict())
    sd["blocks.0.some_new_timm_param"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmapped"):
        convert_vit(sd)
    # non-strict tolerates it
    convert_vit(sd, strict=False)


def test_pos_embed_resize_on_merge():
    """A dinov2-style pos_embed trained at another resolution is bicubically
    resized to the target grid instead of being skipped."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.convert import merge_converted, resize_pos_embed

    rng = np.random.default_rng(5)
    src = rng.normal(size=(1, 17, 8)).astype(np.float32)  # cls + 4x4 grid
    tgt = jnp.zeros((1, 5, 8))  # cls + 2x2 grid
    params = {"pos_embed": tgt}
    merged, _ = merge_converted(params, {}, {"params": {"pos_embed": src}})
    got = np.asarray(merged["pos_embed"])
    assert got.shape == (1, 5, 8)
    np.testing.assert_array_equal(got[:, 0], src[:, 0])  # cls passes through
    expect = resize_pos_embed(src, 5)
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    assert not np.allclose(got[:, 1:], 0.0)


# ----------------------------------------------------- tf_same (TF-origin)


class _Conv2dSame(tnn.Conv2d):
    """timm Conv2dSame: asymmetric F.pad (extra pixel bottom/right) + valid
    conv — the geometry every tf_* checkpoint was trained with."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((-(-ih // sh) - 1) * sh + kh - ih, 0)
        pw = max((-(-iw // sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


def _boost_bn(model: "tnn.Module", seed: int) -> None:
    """_randomize's 0.1-scale BN weights attenuate a border-pixel padding
    difference ~10× per BN layer — after a few blocks the tf-vs-symmetric
    padding signal drops below the logit tolerance and the golden can't
    discriminate. O(1) BN scales/vars keep the padding path observable."""
    gen = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, tnn.BatchNorm2d):
            with torch.no_grad():
                mod.weight.copy_(1.0 + 0.1 * torch.randn(mod.weight.shape, generator=gen))
                mod.running_var.copy_(1.0 + 0.1 * torch.rand(mod.running_var.shape, generator=gen))


class _TimmIRSame(tnn.Module):
    """tf_ InvertedResidual: Conv2dSame depthwise, BN eps 1e-3, relu."""

    def __init__(self, ch, mid, out, k, s, eps=1e-3):
        super().__init__()
        self.conv_pw = tnn.Conv2d(ch, mid, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(mid, eps=eps)
        self.act1 = tnn.ReLU()
        self.conv_dw = _Conv2dSame(mid, mid, k, s, 0, groups=mid, bias=False)
        self.bn2 = tnn.BatchNorm2d(mid, eps=eps)
        self.act2 = tnn.ReLU()
        self.conv_pwl = tnn.Conv2d(mid, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out, eps=eps)
        self.residual = s == 1 and ch == out

    def forward(self, x):
        y = self.act1(self.bn1(self.conv_pw(x)))
        y = self.act2(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(y))
        return x + y if self.residual else y


class _TimmMNV3MinimalTF(tnn.Module):
    """tf_mobilenetv3_*_minimal-shaped tiny net: TF-SAME strided convs, no
    SE, relu everywhere, BN eps 1e-3 (timm _gen_mobilenet_v3 'minimal' +
    'tf_' pad/eps config)."""

    def __init__(self, num_classes=5, eps=1e-3):
        super().__init__()
        self.conv_stem = _Conv2dSame(3, 16, 3, 2, 0, bias=False)
        self.bn1 = tnn.BatchNorm2d(16, eps=eps)
        self.act1 = tnn.ReLU()

        class _DS(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_dw = tnn.Conv2d(16, 16, 3, 1, 1, groups=16, bias=False)
                self.bn1 = tnn.BatchNorm2d(16, eps=eps)
                self.act1 = tnn.ReLU()
                self.conv_pw = tnn.Conv2d(16, 16, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(16, eps=eps)

            def forward(self, x):
                return x + self.bn2(self.conv_pw(self.act1(self.bn1(self.conv_dw(x)))))

        class _CBA(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(24, 64, 1, 1, 0, bias=False)
                self.bn1 = tnn.BatchNorm2d(64, eps=eps)
                self.act1 = tnn.ReLU()

            def forward(self, x):
                return self.act1(self.bn1(self.conv(x)))

        self.blocks = tnn.Sequential(
            tnn.Sequential(_DS()),
            tnn.Sequential(
                _TimmIRSame(16, 32, 24, 3, 2, eps=eps),
                _TimmIRSame(24, 48, 24, 3, 1, eps=eps),
            ),
            tnn.Sequential(_CBA()),
        )
        self.conv_head = tnn.Conv2d(64, 96, 1, bias=True)
        self.act2 = tnn.ReLU()
        self.classifier = tnn.Linear(96, num_classes)

    def forward(self, x):
        x = self.blocks(self.act1(self.bn1(self.conv_stem(x))))
        x = x.mean((2, 3), keepdim=True)
        x = self.act2(self.conv_head(x)).flatten(1)
        return self.classifier(x)


def test_tf_mobilenetv3_minimal_converted_matches_torch_logits():
    """tf_ import parity (VERDICT round-4 item 4): the tf_same flax model
    reproduces torch logits computed with timm Conv2dSame geometry; the
    symmetric-padding model does NOT (proving the padding path is live)."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.mobilenet import MobileNetV3
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmMNV3MinimalTF()
    _randomize(tmodel, seed=60)
    _boost_bn(tmodel, seed=62)
    tmodel.eval()
    # even spatial size → stride-2 TF-SAME pads (0,1): the asymmetric case
    x = 0.5 * np.random.default_rng(61).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    blocks = (
        (3, 16, 16, False, False, 1),
        (3, 32, 24, False, False, 2),
        (3, 48, 24, False, False, 1),
    )
    converted = convert_state_dict(
        tmodel.state_dict(), "timm-tf_mobilenetv3_large_minimal_100.in1k"
    )
    n_torch = _n_learned(tmodel.state_dict())
    assert sum(len(v) for v in converted.values()) == n_torch

    model = MobileNetV3(
        blocks=blocks, last_exp=64, head_width=96, num_classes=5,
        tf_same=True, bn_eps=1e-3, relu_act=True,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params, bstats = merge_converted(
        variables["params"], variables["batch_stats"], converted
    )
    _assert_logits_match(model, {"params": params, "batch_stats": bstats}, x, golden)

    # teeth: symmetric padding (non-tf) must NOT reproduce the tf golden
    sym = MobileNetV3(
        blocks=blocks, last_exp=64, head_width=96, num_classes=5,
        bn_eps=1e-3, relu_act=True,
    )
    sv = sym.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    sp, sb = merge_converted(sv["params"], sv["batch_stats"], converted)
    sym_logits = sym.apply({"params": sp, "batch_stats": sb}, jnp.asarray(x), train=False)
    # beyond the golden tolerance (3e-4): symmetric padding would FAIL the
    # match that tf_same passes at ~1e-7
    assert np.abs(np.asarray(sym_logits) - golden).max() > 3e-4


class _TimmEffV2TF(tnn.Module):
    """tf_efficientnetv2-shaped tiny net: Conv2dSame on strided convs,
    BN eps 1e-3, SiLU."""

    def __init__(self, num_classes=5, eps=1e-3):
        super().__init__()
        self.conv_stem = _Conv2dSame(3, 8, 3, 2, 0, bias=False)
        self.bn1 = tnn.BatchNorm2d(8, eps=eps)
        self.act1 = tnn.SiLU()

        class _EdgeSame(tnn.Module):
            def __init__(self, ch, mid, out, k, s):
                super().__init__()
                self.conv_exp = _Conv2dSame(ch, mid, k, s, 0, bias=False)
                self.bn1 = tnn.BatchNorm2d(mid, eps=eps)
                self.act1 = tnn.SiLU()
                self.conv_pwl = tnn.Conv2d(mid, out, 1, bias=False)
                self.bn2 = tnn.BatchNorm2d(out, eps=eps)
                self.residual = s == 1 and ch == out

            def forward(self, x):
                y = self.bn2(self.conv_pwl(self.act1(self.bn1(self.conv_exp(x)))))
                return x + y if self.residual else y

        class _IRSame(tnn.Module):
            def __init__(self, ch, mid, out, k, s, se_rd):
                super().__init__()
                self.conv_pw = tnn.Conv2d(ch, mid, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(mid, eps=eps)
                self.act1 = tnn.SiLU()
                self.conv_dw = _Conv2dSame(mid, mid, k, s, 0, groups=mid, bias=False)
                self.bn2 = tnn.BatchNorm2d(mid, eps=eps)
                self.act2 = tnn.SiLU()
                self.se = _TimmSE(mid, se_rd, act=tnn.SiLU, gate=torch.sigmoid)
                self.conv_pwl = tnn.Conv2d(mid, out, 1, bias=False)
                self.bn3 = tnn.BatchNorm2d(out, eps=eps)
                self.residual = s == 1 and ch == out

            def forward(self, x):
                y = self.act1(self.bn1(self.conv_pw(x)))
                y = self.se(self.act2(self.bn2(self.conv_dw(y))))
                y = self.bn3(self.conv_pwl(y))
                return x + y if self.residual else y

        class _CBA(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Conv2d(8, 8, 3, 1, 1, bias=False)
                self.bn1 = tnn.BatchNorm2d(8, eps=eps)
                self.act1 = tnn.SiLU()

            def forward(self, x):
                return self.act1(self.bn1(self.conv(x)))

        self.blocks = tnn.Sequential(
            tnn.Sequential(_CBA()),
            tnn.Sequential(_EdgeSame(8, 32, 32, 3, 2)),
            tnn.Sequential(
                _IRSame(32, 64, 32, 3, 2, 8),
                _IRSame(32, 64, 32, 3, 1, 8),
            ),
        )
        self.conv_head = tnn.Conv2d(32, 48, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(48, eps=eps)
        self.act2 = tnn.SiLU()
        self.classifier = tnn.Linear(48, num_classes)

    def forward(self, x):
        x = self.blocks(self.act1(self.bn1(self.conv_stem(x))))
        x = self.act2(self.bn2(self.conv_head(x))).mean((2, 3))
        return self.classifier(x)


def test_tf_efficientnetv2_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.efficientnet import EfficientNetV2
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TimmEffV2TF()
    _randomize(tmodel, seed=70)
    _boost_bn(tmodel, seed=72)
    tmodel.eval()
    x = 0.5 * np.random.default_rng(71).normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = EfficientNetV2(
        stages=(
            ("fused", 1, 3, 1, 1, 8),
            ("fused", 1, 3, 2, 4, 32),
            ("mb", 2, 3, 2, 2, 32),
        ),
        stem_ch=8, head_ch=48, num_classes=5, tf_same=True, bn_eps=1e-3,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "tf_efficientnetv2_l")
    assert sum(len(v) for v in converted.values()) == _n_learned(tmodel.state_dict())
    params, bstats = merge_converted(
        variables["params"], variables["batch_stats"], converted
    )
    _assert_logits_match(model, {"params": params, "batch_stats": bstats}, x, golden)
