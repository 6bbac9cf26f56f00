"""Model-zoo smoke tests: EVERY registered backbone initializes and runs a
forward pass (logits / feature / unpooled modes) with static shapes."""

import numpy as np
import pytest

from visiondk_tpu.models.backbones import BACKBONES


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def _size_for(name: str) -> int:
    """Smallest input each architecture admits: Swin needs the full pyramid
    (window 7 × 32x downsample → 224; SwinV2 window 8 → 256); ViT needs a
    patch multiple; CNNs run at 64."""
    if name.startswith("swinv2"):
        return 256
    if name.startswith("swin"):
        return 224
    if "patch14" in name:
        return 28
    if "patch16" in name or "patch8" in name:
        return 32
    return 64


def _batch_for(name: str) -> int:
    # the huge/large transformers are init-cost-bound on CPU; bs 1 suffices
    return 1 if any(t in name for t in ("huge", "large", "base")) else 2


@pytest.mark.parametrize("name", sorted(BACKBONES))
def test_backbone_classification_forward(name):
    import jax
    import jax.numpy as jnp

    size, bs = _size_for(name), _batch_for(name)
    model = BACKBONES.create(name, num_classes=7)
    x = jnp.zeros((bs, size, size, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (bs, 7)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_mobilenetv3_head_widths_match_timm():
    """MobileNetV3 conv_head widths (paper Table 2 / timm head_chs): small is
    576→1024, large is 960→1280 — a wrong width silently fails pretrained
    import (non-strict merge leaves pre_head/fc at random init)."""
    import jax
    import jax.numpy as jnp

    for name, want in (("mobilenetv3_small_100", (576, 1024)),
                       ("mobilenetv3_large_100", (960, 1280))):
        model = BACKBONES.create(name, num_classes=3)
        v = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 64, 64, 3)), train=False)
        assert v["params"]["pre_head"]["kernel"].shape == want, name


@pytest.mark.parametrize("name,size", [("resnet18", 64), ("mobilenetv3_small_100", 64),
                                       ("efficientnetv2_s", 64), ("vit_small_patch16_224", 64)])
def test_backbone_unpooled_feature_mode(name, size):
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones import BACKBONES

    model = BACKBONES.create(name, num_classes=0, unpooled=True)
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.ndim in (3, 4)  # token map or spatial map
    assert out.shape[0] == 2


def test_backbone_train_mode_updates_bn():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones import BACKBONES

    model = BACKBONES.create("mobilenetv3_small_100", num_classes=3)
    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    _, new_state = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(new_state["batch_stats"])
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(before, after))
    assert delta > 0.0


def test_swinv2_forward_and_unpooled():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones import BACKBONES

    model = BACKBONES.create("swinv2_tiny_window8_256", num_classes=5)
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 5)
    assert np.isfinite(np.asarray(out)).all()

    feat_model = BACKBONES.create("swinv2_tiny_window8_256", num_classes=0, unpooled=True)
    fmap = feat_model.apply(variables, x, train=False)
    assert fmap.shape == (2, 64, 768)  # 8x8 tokens, 8*embed_dim channels
