"""Committed swin conversion golden (round-2 review item 8).

tests/fixtures/swin_golden.npz holds a converted timm-layout swin
state_dict (generated from a REAL torch forward — see
test_torch_parity_families._TimmSwin, seed 1234) plus the input batch and
expected logits. This pins the converter + flax-swin numerics WITHOUT torch
in the environment, and is the one-command verification for any future
environment that gains real checkpoints:

    python -m pytest tests/test_swin_golden_fixture.py

(For a real timm checkpoint: tools/convert_torch_weights.py --arch swin_...
then model.convert_npz in the config.)
"""

from pathlib import Path

import numpy as np

FIXTURE = Path(__file__).parent / "fixtures" / "swin_golden.npz"


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def test_swin_fixture_logits_parity():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones.swin import SwinTransformer
    from visiondk_tpu.models.convert import merge_converted

    data = np.load(FIXTURE)
    x = data["__input__"]
    golden = data["__logits__"]
    converted = {}
    for key in data.files:
        if key.startswith("__"):
            continue
        tree, p = key.split("::", 1)
        converted.setdefault(tree, {})[p] = data[key]

    model = SwinTransformer(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, mlp_ratio=2.0, num_classes=5,
        stochastic_depth_prob=0.0,
    )
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    params, _ = merge_converted(variables["params"], {}, converted)

    # every fixture tensor must land (shape-checked merge skipped nothing)
    n_landed = sum(len(v) for v in converted.values())
    flat_before = jax.tree_util.tree_leaves(variables["params"])
    flat_after = jax.tree_util.tree_leaves(params)
    changed = sum(
        1 for a, b in zip(flat_before, flat_after) if not np.array_equal(a, b)
    )
    assert changed == n_landed == len(flat_after), (changed, n_landed, len(flat_after))

    logits = model.apply({"params": params}, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-3, atol=3e-4)
