"""Native C++ decode pipeline tests (csrc/dataloader via ctypes)."""

import numpy as np
import pytest
from PIL import Image

from visiondk_tpu.data.native import native_available

pytestmark = [
    pytest.mark.skipif(
        not native_available(), reason="native loader not built / toolchain missing"
    ),
    # ~90 s file (decoder builds + batch decodes): excluded from the core gate
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def img_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_imgs")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, (h, w) in enumerate([(48, 64), (64, 48), (32, 32), (100, 30)]):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = d / f"img{i}.png"  # png = lossless → exact pixel comparisons
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


def test_decode_batch_shapes_and_ok(img_files):
    from visiondk_tpu.data.native import NativeDecoder

    paths, _ = img_files
    dec = NativeDecoder(32, 32, threads=4, letterbox=True)
    out, ok = dec.decode_batch(paths + ["/nonexistent.jpg"])
    assert out.shape == (5, 32, 32, 3)
    assert ok.tolist() == [True, True, True, True, False]
    assert out[4].sum() == 0  # failed row zeroed


def test_letterbox_matches_python_transform(img_files):
    """C++ letterbox ≈ ResizeAndPadding2Square (same geometry; resampling
    differs slightly)."""
    from visiondk_tpu.data.native import decode_one
    from visiondk_tpu.data.transforms import ResizeAndPadding2Square

    paths, arrays = img_files
    t = ResizeAndPadding2Square(32, training=False)
    for p, arr in zip(paths, arrays):
        ours = decode_one(p, 32, 32, letterbox=True)
        ref = np.asarray(t(Image.fromarray(arr)))
        assert ours.shape == ref.shape
        # identical zero-padding layout
        np.testing.assert_array_equal(ours == 0, ref == 0)
        # content close despite filter differences (INTER_AREA vs PIL
        # antialiased BILINEAR); random noise is the worst case for this
        diff = np.abs(ours.astype(int) - ref.astype(int))[ref != 0]
        assert diff.mean() < 20.0, diff.mean()


def test_native_eval_loader(img_files):
    from visiondk_tpu.data.loader import NativeEvalLoader

    paths, _ = img_files
    loader = NativeEvalLoader(paths, ["a", "b", "c", "d"], 32, batch_size=3)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (3, 32, 32, 3)
    assert batches[1]["valid"] == 1
    assert batches[1]["keys"] == ["d"]


def test_cbir_extract_uses_native(tmp_path):
    """The CBIR extractor takes the native path for local letterbox pipelines
    and produces identical embeddings to the PIL path (same decode geometry,
    tolerance for resampling)."""
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.data.datasets import CBIRDatasets
    from visiondk_tpu.data.transforms import create_aug_transforms
    from visiondk_tpu.engine.cbir_eval import _extract
    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_embed_step
    from visiondk_tpu.models.factory import EmbeddingModel

    rng = np.random.default_rng(0)
    for split in ("query", "gallery"):
        for cid in ("id1", "id2"):
            d = tmp_path / split / cid
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)).save(
                    d / f"{i}.png"
                )

    aug = create_aug_transforms([
        {"resize_and_padding": {"size": 32, "training": False}},
        {"to_tensor": "no_params"},
    ])
    query, gallery = CBIRDatasets.build(str(tmp_path), transforms=aug)

    model = EmbeddingModel(backbone_name="resnet18", feat_dim=8, head_config=None)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), method=model.embed, train=False
    )
    state = create_train_state(variables, optax.sgd(0.1))
    embed = make_embed_step(model, StepConfig(), use_ema=False)

    feats, keys = _extract(embed, state, query, batch_size=3)
    assert feats.shape == (4, 8)
    assert keys == query.ids


def test_native_train_loader(tmp_path):
    """NativeTrainLoader: C++ decode owns the train host stage when the live
    pipeline is plain letterbox; falls back to the PIL path per-epoch when a
    hot-swap makes it non-letterbox; shuffles per epoch."""
    from visiondk_tpu.data.datasets import ImageDatasets
    from visiondk_tpu.data.class_augmenter import ClassWiseAugmenter
    from visiondk_tpu.data.loader import NativeTrainLoader
    from visiondk_tpu.data.transforms import create_aug_transforms

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)).save(
                d / f"{i}.png"
            )

    letterbox = create_aug_transforms(
        [{"resize_and_padding": {"size": 32}}, {"to_tensor": "no_params"}]
    )
    ds = ImageDatasets(str(tmp_path), "train",
                       transforms=ClassWiseAugmenter(letterbox, None, None))
    loader = NativeTrainLoader(ds, batch_size=4, seed=0, num_workers=2)
    assert len(loader) == 3

    loader.set_epoch(0)
    b0 = list(loader)
    assert len(b0) == 3
    assert b0[0]["image"].shape == (4, 32, 32, 3)
    assert b0[0]["image"].dtype == np.uint8
    assert b0[0]["label"].dtype == np.int32

    # epoch-seeded shuffle: different epoch → different batch order
    loader.set_epoch(1)
    b1 = list(loader)
    assert not all(
        np.array_equal(x["image"], y["image"]) for x, y in zip(b0, b1)
    )
    # determinism: same epoch → identical batches
    loader.set_epoch(0)
    b0b = list(loader)
    assert all(np.array_equal(x["image"], y["image"]) for x, y in zip(b0, b0b))
    assert all(np.array_equal(x["label"], y["label"]) for x, y in zip(b0, b0b))

    # hot-swap to a non-letterbox pipeline → PIL fallback epoch, same contract
    ds.transforms = ClassWiseAugmenter(
        create_aug_transforms(
            [{"random_crop_and_resize": {"size": 32}}, {"to_tensor": "no_params"}]
        ),
        None, None,
    )
    loader.set_epoch(2)
    fb = list(loader)
    assert len(fb) == 3 and fb[0]["image"].shape == (4, 32, 32, 3)


def test_dataprocessor_picks_native_train_loader(tmp_path):
    """SmartDataProcessor returns the native train loader for a local
    letterbox config (post device-augment split)."""
    from visiondk_tpu.data.dataprocessor import SmartDataProcessor
    from visiondk_tpu.data.loader import NativeTrainLoader

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("a", "b"):
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)).save(
                    d / f"{i}.png"
                )
    cfg = {
        "root": str(tmp_path),
        "train": {
            "bs": 4,
            "augment": [
                {"random_color_jitter": {"brightness": 0.2}},  # lifts to device
                {"resize_and_padding": {"size": 32}},
                "to_tensor",
            ],
        },
        "val": {"bs": 4, "augment": [{"resize_and_padding": {"size": 32}}, "to_tensor"]},
    }
    dp = SmartDataProcessor(cfg, project=str(tmp_path / "run"))
    assert dp.device_augment_cfg  # photometric op lifted off the host
    loader = dp.dataloader("train", 4)
    assert isinstance(loader, NativeTrainLoader)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 32, 32, 3)
