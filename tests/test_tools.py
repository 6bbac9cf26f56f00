"""Tools parity tests: data splits, dedup hashes, augment grid, export."""

import os
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _mk_class_tree(root: Path, classes=("a", "b"), n=10, size=16):
    rng = np.random.default_rng(0)
    for c in classes:
        d = root / c
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(
                d / f"{c}_{i}.jpg"
            )


def test_data_prepare_split(tmp_path):
    from tools.data_prepare import data_split

    _mk_class_tree(tmp_path, n=10)
    data_split("jpg", str(tmp_path), [0.8], drop=False)
    assert len(list((tmp_path / "train" / "a").glob("*.jpg"))) == 8
    assert len(list((tmp_path / "val" / "a").glob("*.jpg"))) == 2


def test_build_querygallery(tmp_path):
    from tools.build_querygallery import build

    src = tmp_path / "data"
    _mk_class_tree(src, classes=("id1", "id2"), n=4)
    build(str(src), frac=0.25)
    assert len(list((tmp_path / "data-query" / "id1").glob("*"))) == 1
    assert len(list((tmp_path / "data-gallery" / "id1").glob("*"))) == 3


def test_dedup_hashes(tmp_path):
    from tools.deduplicate import HASHES, find_similar_images

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    Image.fromarray(base).save(d / "a.png")
    Image.fromarray(base).save(d / "a_copy.png")  # exact duplicate
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(d / "b.png")

    for name, fn in HASHES.items():
        images, removed = find_similar_images([str(d)], fn, dry_run=True)
        assert [os.path.basename(r) for r in removed] == ["a_copy.png"], name


def test_split2dataset(tmp_path):
    from tools.split2dataset import main as split_main

    src = tmp_path / "flat"
    src.mkdir()
    rng = np.random.default_rng(0)
    for cls in ("Abyssinian", "great_pyrenees"):
        for i in range(5):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
                src / f"{cls}_{i}.jpg"
            )

    class Opt:
        pass

    opt = Opt()
    opt.src, opt.dst, opt.frac, opt.seed = str(src), str(tmp_path / "out"), 0.8, 0
    split_main(opt)
    assert len(list((tmp_path / "out" / "train" / "Abyssinian").glob("*"))) == 4
    assert len(list((tmp_path / "out" / "val" / "great_pyrenees").glob("*"))) == 1


def test_augment_grid(tmp_path):
    from tools.test_augment import demo_augs

    from visiondk_tpu.data.transforms import create_aug_transforms

    t = create_aug_transforms(demo_augs())
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    )
    out = np.asarray(t(img))
    assert out.shape == (224, 224, 3)


def test_export_roundtrip(tmp_path):
    """jax.export serialize → deserialize → call parity (the ONNX-path analogue)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step
    from visiondk_tpu.models.factory import VisionModel

    import optax

    model = VisionModel(backbone_name="resnet18", num_classes=4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    state = create_train_state(variables, optax.sgd(0.1))
    step = make_eval_step(model, StepConfig(), use_ema=False)

    def infer(images):
        return step(state, {"image": images})

    spec = jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.uint8)
    exported = jexport.export(jax.jit(infer))(spec)
    blob = exported.serialize()

    reloaded = jexport.deserialize(bytearray(blob))
    img = np.random.default_rng(0).integers(0, 255, (1, 32, 32, 3)).astype(np.uint8)
    np.testing.assert_allclose(
        np.asarray(reloaded.call(img)), np.asarray(infer(img)), rtol=1e-5, atol=1e-5
    )


def test_export_symbolic_batch(tmp_path):
    """export with dynamic batch (jax.export symbolic shape) serializes and
    runs at multiple batch sizes."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import export as jexport

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_eval_step
    from visiondk_tpu.models.factory import VisionModel

    model = VisionModel(backbone_name="vit_small_patch16_224", num_classes=3)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    state = create_train_state(variables, optax.sgd(0.1))
    step = make_eval_step(model, StepConfig(), use_ema=False)

    def infer(images):
        return step(state, {"image": images})

    b = jexport.symbolic_shape("b")[0]
    spec = jax.ShapeDtypeStruct((b, 32, 32, 3), jnp.uint8)
    exported = jexport.export(jax.jit(infer))(spec)
    reloaded = jexport.deserialize(bytearray(exported.serialize()))
    for n in (1, 3):
        out = np.asarray(reloaded.call(np.zeros((n, 32, 32, 3), np.uint8)))
        assert out.shape == (n, 3)
