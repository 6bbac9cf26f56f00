"""Int8 inference quantization (ops/quant.py): math exactness, model-level
accuracy bound, and the make_embed_step/make_eval_step wiring.

The reference has no quantized inference (fp16 faiss is its fastest serving
path); this is a beyond-reference TPU lever (2x int8 MXU rate on v5e,
measured in benchmarks/int8_micro.py). CI pins the accuracy contract the
CLI help text advertises: cosine >= 0.995 vs the unquantized features.
"""

import numpy as np
import pytest


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def _cos(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-30)


def test_quantize_tensor_roundtrip_bounds():
    import jax.numpy as jnp

    from visiondk_tpu.ops.quant import quantize_tensor

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32)) * 3.0
    q, s = quantize_tensor(w, axis=1)
    assert q.dtype == jnp.int8 and s.shape == (1, 32)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # symmetric rounding error is at most half a step per element
    assert np.max(np.abs(deq - np.asarray(w))) <= np.max(np.asarray(s)) / 2 + 1e-7
    # per-tensor variant
    q2, s2 = quantize_tensor(w)
    assert np.ndim(s2) == 0
    assert np.max(np.abs(np.asarray(q2, np.float32) * float(s2) - np.asarray(w))) <= float(s2) / 2 + 1e-7


def test_int8_dense_matches_f32_within_quant_noise():
    import jax.numpy as jnp

    from visiondk_tpu.ops.quant import int8_dense

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 48)).astype(np.float32)) * 0.1
    b = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))
    y = np.asarray(int8_dense(x, w, b, jnp.float32))
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert y.shape == ref.shape
    assert rel < 0.02, rel
    # leading dims preserved
    x3 = x.reshape(4, 4, 96)
    y3 = np.asarray(int8_dense(x3, w, None, jnp.float32))
    assert y3.shape == (4, 4, 48)
    np.testing.assert_allclose(y3.reshape(16, 48), y - np.asarray(b), rtol=0, atol=1e-5)


def test_quantized_apply_vit_logits_cosine():
    """Whole-model contract on a dense-dominated backbone: every 2-D Dense
    runs int8 and the logits stay >= 0.995 cosine to the f32 path."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones import BACKBONES
    from visiondk_tpu.ops.quant import quantized_apply

    model = BACKBONES.create("vit_small_patch16_224", num_classes=11)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    ref = model.apply(variables, x, train=False)
    q = quantized_apply(model, variables, x, train=False)
    assert q.shape == ref.shape
    assert _cos(np.asarray(q), np.asarray(ref)).min() >= 0.995


def test_embed_step_quant_int8(tmp_path):
    """make_embed_step(quant='int8'): unit-norm embeddings, close to the
    unquantized step's output."""
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_embed_step
    from visiondk_tpu.models.factory import get_model

    cfg = {
        "task": "cbir",
        "backbone": {"vit_small_patch16_224": {"feat_dim": 24, "image_size": 32}},
        "head": {
            "arcface": {
                "feat_dim": 24, "num_class": 8,
                "margin_arc": 0.35, "margin_am": 0.0, "scale": 32,
            }
        },
    }
    model = get_model(cfg, dtype=jnp.float32)
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 32, 32, 3)), jnp.zeros((2,), jnp.int32), train=False,
    )
    state = create_train_state(variables, optax.sgd(0.0))
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(3).integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
        )
    }
    base = np.asarray(make_embed_step(model, StepConfig(), use_ema=False)(state, batch))
    q = np.asarray(
        make_embed_step(model, StepConfig(), use_ema=False, quant="int8")(state, batch)
    )
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)
    assert _cos(q, base).min() >= 0.99


def test_embed_step_quant_int8_sharded(mesh8):
    """int8 Dense interceptor + the shard_map'd fused attention kernel in ONE
    sharded jit (the production serving config under a published mesh):
    embeddings stay unit-norm, match the single-device int8 output, and stay
    close to the sharded f32 path."""
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_embed_step
    from visiondk_tpu.models.factory import get_model
    from visiondk_tpu.ops.pallas import force_interpret
    from visiondk_tpu.parallel.mesh import set_current_mesh

    cfg = {
        "task": "cbir",
        "backbone": {"vit_small_patch16_224": {"feat_dim": 24, "image_size": 32}},
        "head": {
            "arcface": {
                "feat_dim": 24, "num_class": 8,
                "margin_arc": 0.35, "margin_am": 0.0, "scale": 32,
            }
        },
    }
    model = get_model(cfg, dtype=jnp.float32)
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, 32, 32, 3)), jnp.zeros((2,), jnp.int32), train=False,
    )
    state = create_train_state(variables, optax.sgd(0.0))
    imgs = np.random.default_rng(5).integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)

    with force_interpret():
        # single-device int8 baseline (no mesh published → XLA attention path)
        base_q = np.asarray(
            make_embed_step(model, StepConfig(), use_ema=False, quant="int8")(
                state, {"image": jnp.asarray(imgs)}
            )
        )
        set_current_mesh(mesh8.mesh)
        sharded = jax.device_put(imgs, mesh8.batch)
        q = np.asarray(
            make_embed_step(model, StepConfig(), use_ema=False, quant="int8")(
                state, {"image": sharded}
            )
        )
        f32 = np.asarray(
            make_embed_step(model, StepConfig(), use_ema=False)(
                state, {"image": sharded}
            )
        )
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-4)
    # same int8 math, different attention kernel (fused vs XLA): the ~4e-3
    # kernel drift moves activation absmax → different quant grids, so
    # elementwise equality is the wrong contract; direction is.
    assert _cos(q, base_q).min() >= 0.995
    assert _cos(q, f32).min() >= 0.99


def test_export_int8_roundtrip():
    """The int8 path survives jax.export serialize → deserialize → call
    (export.py --quant int8): quantization is baked into the StableHLO."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import export as jexport

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step
    from visiondk_tpu.models.factory import VisionModel

    model = VisionModel(backbone_name="resnet18", num_classes=4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    state = create_train_state(variables, optax.sgd(0.1))
    step = make_eval_step(model, StepConfig(), use_ema=False, quant="int8")

    def infer(images):
        return step(state, {"image": images})

    spec = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.uint8)
    blob = jexport.export(jax.jit(infer))(spec).serialize()
    reloaded = jexport.deserialize(bytearray(blob))
    img = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    np.testing.assert_allclose(
        np.asarray(reloaded.call(img)), np.asarray(infer(img)), rtol=1e-5, atol=1e-5
    )


def test_weight_cache_matches_in_graph_quant():
    """build_weight_cache + quantized_apply(weight_cache=...) must be
    bit-identical to the in-graph weight-quant path (same math, just hoisted),
    and the cache must cover exactly the 2-D Dense kernels."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.backbones import BACKBONES
    from visiondk_tpu.ops.quant import build_weight_cache, quantized_apply

    model = BACKBONES.create("vit_small_patch16_224", num_classes=7)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    cache = build_weight_cache(variables["params"])
    assert cache, "no Dense kernels found"
    for key, (q, s) in cache.items():
        assert q.dtype == jnp.int8, key
        assert q.ndim == 2 and s.shape == (1, q.shape[1]), key
    dynamic = quantized_apply(model, variables, x, train=False)
    cached = quantized_apply(model, variables, x, train=False, weight_cache=cache)
    np.testing.assert_array_equal(np.asarray(dynamic), np.asarray(cached))

    # a provided cache is a contract: missing keys and wrong-tree shapes must
    # fail loudly, not silently re-quantize or serve wrong numbers
    incomplete = dict(list(cache.items())[:1])
    with pytest.raises(KeyError):
        quantized_apply(model, variables, x, train=False, weight_cache=incomplete)
    other = BACKBONES.create("vit_small_patch16_224", num_classes=13)
    ov = other.init({"params": jax.random.key(1)}, x, train=False)
    with pytest.raises(ValueError):
        quantized_apply(other, ov, x, train=False, weight_cache=cache)


def test_check_quant_rejects_unknown():
    from visiondk_tpu.ops.quant import check_quant

    assert check_quant(None) is None
    assert check_quant("int8") == "int8"
    assert check_quant("none") is None
    with pytest.raises(ValueError):
        check_quant("fp4")
