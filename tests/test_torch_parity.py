"""Pretrained-parity proof against REAL torch forwards.

The reference gets pretrained weights from timm (classify_model.py:37-54).
Our path is tools/convert_torch_weights.py → models/convert.py. These tests
validate that path against genuine torch models: a torchvision-layout
ResNet-18 and a timm-layout ViT are built in torch (real Conv2d/BatchNorm2d/
LayerNorm/GELU semantics), their state_dicts converted, and the converted
flax models must reproduce the torch logits on fixed inputs — so a real
downloaded checkpoint converts correctly by construction (the container has
no network; torch itself supplies the ground truth).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def _randomize(model: "tnn.Module", seed: int) -> None:
    """Fill every param AND BN running stat with non-trivial values so the
    conversion of each tensor kind is actually exercised."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=gen)
        elif k.endswith("running_mean"):
            sd[k] = 0.2 * torch.randn(v.shape, generator=gen)
        else:
            sd[k] = 0.1 * torch.randn(v.shape, generator=gen)
    model.load_state_dict(sd)


# ------------------------------------------------------- torchvision ResNet


class _TVBasicBlock(tnn.Module):
    """torchvision.models.resnet.BasicBlock layout (attribute names define the
    state_dict keys: conv1/bn1/conv2/bn2/downsample.0/downsample.1)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _TVResNet18(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, planes in enumerate([64, 128, 256, 512]):
            stride = 1 if i == 0 else 2
            down = None
            if stride != 1 or inplanes != planes:
                down = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )
            layer = tnn.Sequential(
                _TVBasicBlock(inplanes, planes, stride, down),
                _TVBasicBlock(planes, planes),
            )
            setattr(self, f"layer{i + 1}", layer)
            inplanes = planes
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


def test_resnet18_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones import BACKBONES
    from visiondk_tpu.models.convert import convert_state_dict, merge_converted

    tmodel = _TVResNet18(num_classes=10)
    _randomize(tmodel, seed=0)
    tmodel.eval()

    x = 0.5 * np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = BACKBONES.create("resnet18", num_classes=10)
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    converted = convert_state_dict(tmodel.state_dict(), "resnet18")
    params, bstats = merge_converted(
        variables["params"], variables["batch_stats"], converted
    )
    # every torch tensor must land (no silently-skipped keys)
    n_torch = sum(
        1 for k, v in tmodel.state_dict().items() if v.dtype == torch.float32
    )
    n_flat = len(converted["params"]) + len(converted["batch_stats"])
    assert n_flat == n_torch, (n_flat, n_torch)

    logits = model.apply(
        {"params": params, "batch_stats": bstats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-4, atol=2e-4)


# ------------------------------------------------------------- timm ViT


class _TimmAttention(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, C // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _TimmMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _TimmBlock(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _TimmAttention(dim, num_heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _TimmMlp(dim, dim * 4)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _TimmViT(tnn.Module):
    """timm VisionTransformer layout (keys: cls_token, pos_embed,
    patch_embed.proj, blocks.N.*, norm, head)."""

    class _PatchEmbed(tnn.Module):
        def __init__(self, patch, dim):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, patch, patch)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    def __init__(self, img=16, patch=8, dim=64, depth=2, heads=2, num_classes=5):
        super().__init__()
        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = tnn.Parameter(torch.zeros(1, n + 1, dim))
        self.patch_embed = self._PatchEmbed(patch, dim)
        self.blocks = tnn.Sequential(*[_TimmBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim)
        self.head = tnn.Linear(dim, num_classes)

    def forward(self, x):
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        x = self.blocks(x)
        x = self.norm(x)
        return self.head(x[:, 0])


def test_vit_converted_matches_torch_logits():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.vit import VisionTransformer
    from visiondk_tpu.models.convert import convert_vit, merge_converted

    tmodel = _TimmViT(img=16, patch=8, dim=64, depth=2, heads=2, num_classes=5)
    _randomize(tmodel, seed=2)
    tmodel.eval()

    x = 0.5 * np.random.default_rng(3).normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        golden = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = VisionTransformer(
        patch_size=8, embed_dim=64, depth=2, num_heads=2, num_classes=5
    )
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    converted = convert_vit(tmodel.state_dict())
    params, _ = merge_converted(variables["params"], {}, converted)

    n_torch = len(tmodel.state_dict())
    n_flat = len(converted["params"])
    assert n_flat == n_torch, (n_flat, n_torch)

    logits = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-4, atol=2e-4)
