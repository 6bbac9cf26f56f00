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

    # hot-swap to a native-ineligible pipeline (random_crop_and_resize is
    # native now — random_rotate is not) → PIL fallback epoch, same contract
    ds.transforms = ClassWiseAugmenter(
        create_aug_transforms(
            [
                {"random_rotate": {"degrees": 10}},
                {"resize_and_padding": {"size": 32}},
                {"to_tensor": "no_params"},
            ]
        ),
        None, None,
    )
    loader.set_epoch(2)
    fb = list(loader)
    assert len(fb) == 3 and fb[0]["image"].shape == (4, 32, 32, 3)


def test_rrc_sample_params_matches_call(img_files):
    """RandomResizedCrop.sample_params consumes the exact RNG sequence of
    __call__: replaying the params reproduces __call__'s pixels bit-exactly
    (this is what lets the native path reuse the host crop geometry)."""
    from visiondk_tpu.data.transforms import AUG_METHODS, seed_sample

    paths, arrays = img_files
    rrc = AUG_METHODS.create("random_crop_and_resize", size=32)
    saw_crop = saw_letterbox = False
    for j, arr in enumerate(arrays):
        img = Image.fromarray(arr)
        w, h = img.size
        seed_sample(7, 3, j)
        params = rrc.sample_params(w, h)
        seed_sample(7, 3, j)
        via_call = np.asarray(rrc(img))
        if params[0] == "letterbox":
            saw_letterbox = True
            ref = np.asarray(rrc.resize_and_padding(img))
        else:
            saw_crop = True
            _, l, t, cw, ch = params
            assert 0 <= l and 0 <= t and l + cw <= w and t + ch <= h
            ref = np.asarray(
                img.crop((l, t, l + cw, t + ch)).resize((32, 32), Image.BILINEAR)
            )
        np.testing.assert_array_equal(via_call, ref)
    # the fixture's (100, 30) image exercises the AR>1.5 letterbox guard
    assert saw_crop and saw_letterbox


def test_native_rrc_matches_pil_geometry(img_files):
    """decode_batch_ops with sample_params rects ≈ the PIL RRC output (same
    crop geometry; resampling filters differ)."""
    from visiondk_tpu.data.native import NativeDecoder
    from visiondk_tpu.data.transforms import AUG_METHODS, seed_sample

    paths, arrays = img_files
    rrc = AUG_METHODS.create("random_crop_and_resize", size=32)
    ops = np.zeros((len(paths), 5), np.int32)
    pil_out = []
    for j, arr in enumerate(arrays):
        img = Image.fromarray(arr)
        seed_sample(0, 0, j)
        p = rrc.sample_params(*img.size)
        if p[0] == "crop":
            ops[j] = (1, *p[1:])
        seed_sample(0, 0, j)
        pil_out.append(np.asarray(rrc(img)))
    dec = NativeDecoder(32, 32, threads=2)
    out, ok = dec.decode_batch_ops(paths, ops)
    assert ok.all()
    for j in range(len(paths)):
        diff = np.abs(out[j].astype(int) - pil_out[j].astype(int))
        # random noise is the worst case for filter differences (INTER_AREA
        # vs PIL antialiased BILINEAR); geometry mismatch would blow way past
        assert diff.mean() < 20.0, (j, diff.mean())


def test_native_train_loader_rrc_stage(tmp_path):
    """NativeTrainLoader serves a random_crop_and_resize host stage natively:
    per-epoch determinism, epoch-to-epoch variation, and per-sample crop
    geometry matching the PIL DataLoader for the same (seed, epoch, index)."""
    from visiondk_tpu.data.class_augmenter import ClassWiseAugmenter
    from visiondk_tpu.data.datasets import ImageDatasets
    from visiondk_tpu.data.loader import DataLoader, NativeTrainLoader
    from visiondk_tpu.data.transforms import create_aug_transforms

    rng = np.random.default_rng(1)
    for cls in ("a", "b"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)).save(
                d / f"{i}.png"
            )

    def make_ds():
        return ImageDatasets(
            str(tmp_path), "train",
            transforms=ClassWiseAugmenter(
                create_aug_transforms(
                    [{"random_crop_and_resize": {"size": 32}}, {"to_tensor": "no_params"}]
                ),
                None, None,
            ),
        )

    native = NativeTrainLoader(make_ds(), batch_size=4, seed=0, num_workers=2)
    native.set_epoch(0)
    nb0 = list(native)
    assert len(nb0) == 3 and nb0[0]["image"].shape == (4, 32, 32, 3)
    assert nb0[0]["image"].dtype == np.uint8

    # determinism / epoch variation
    native.set_epoch(0)
    assert all(np.array_equal(x["image"], y["image"]) for x, y in zip(nb0, list(native)))
    native.set_epoch(1)
    assert not all(np.array_equal(x["image"], y["image"]) for x, y in zip(nb0, list(native)))

    # geometry parity with the PIL path: same (seed, epoch, index) stream →
    # same crops, pixels within resampling tolerance
    pil = DataLoader(make_ds(), batch_size=4, shuffle=True, drop_last=True,
                     num_workers=2, seed=0)
    pil.set_epoch(0)
    for nb, pb in zip(nb0, pil):
        np.testing.assert_array_equal(nb["label"], pb["label"])
        diff = np.abs(nb["image"].astype(int) - pb["image"].astype(int))
        assert diff.mean() < 20.0, diff.mean()


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


def test_dataprocessor_picks_native_loader_for_rrc(tmp_path):
    """The pet.yaml-shaped train config (photometric ops + random crop) takes
    the native train loader after the device-augment split."""
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
                {"random_horizonflip": {"p": 0.5}},  # lifts to device
                {"random_crop_and_resize": {"size": 32}},
                "to_tensor",
            ],
        },
        "val": {"bs": 4, "augment": [{"resize_and_padding": {"size": 32}}, "to_tensor"]},
    }
    dp = SmartDataProcessor(cfg, project=str(tmp_path / "run"))
    assert dp.device_augment_cfg
    loader = dp.dataloader("train", 4)
    assert isinstance(loader, NativeTrainLoader)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["image"].dtype == np.uint8


def _choice_geometry_cfg(size=32, p=(0.5, 0.5)):
    """The reference pet.yaml geometry block shape (pet.yaml:56-64)."""
    return {
        "random_choice": {
            "transforms": [
                {"resize_and_padding": {"size": size, "training": True}},
                {"random_crop_and_resize": {"size": size, "scale": [0.7, 1]}},
            ],
            "p": list(p),
        }
    }


def test_native_train_stage_choice_classification():
    """native_train_stage classifies the pet.yaml geometry random_choice as
    native-eligible, and rejects mixed sizes / foreign branches."""
    from visiondk_tpu.data.transforms import create_aug_transforms, native_train_stage

    ok = create_aug_transforms([_choice_geometry_cfg(), {"to_tensor": "no_params"}])
    kind, op = native_train_stage(ok)
    assert kind == "choice" and len(op.transforms) == 2

    mixed = create_aug_transforms([
        {"random_choice": {"transforms": [
            {"resize_and_padding": {"size": 32}},
            {"random_crop_and_resize": {"size": 48}},
        ]}},
        {"to_tensor": "no_params"},
    ])
    assert native_train_stage(mixed) is None

    foreign = create_aug_transforms([
        {"random_choice": {"transforms": [
            {"resize_and_padding": {"size": 32}},
            {"random_rotate": {"degrees": 10}},
        ]}},
        {"to_tensor": "no_params"},
    ])
    assert native_train_stage(foreign) is None


def test_native_train_loader_choice_stage(tmp_path):
    """NativeTrainLoader serves the pet.yaml random_choice geometry stage:
    per-sample branch + crop drawn from the PIL path's RNG stream — labels
    identical, pixels within resampling tolerance, both branches exercised."""
    from visiondk_tpu.data.class_augmenter import ClassWiseAugmenter
    from visiondk_tpu.data.datasets import ImageDatasets
    from visiondk_tpu.data.loader import DataLoader, NativeTrainLoader
    from visiondk_tpu.data.transforms import (
        create_aug_transforms,
        native_train_stage,
        sample_native_geometry,
        seed_sample,
    )

    rng = np.random.default_rng(2)
    for cls in ("a", "b"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)).save(
                d / f"{i}.png"
            )

    def make_ds():
        return ImageDatasets(
            str(tmp_path), "train",
            transforms=ClassWiseAugmenter(
                create_aug_transforms(
                    [_choice_geometry_cfg(), {"to_tensor": "no_params"}]
                ),
                None, None,
            ),
        )

    native = NativeTrainLoader(make_ds(), batch_size=4, seed=3, num_workers=2)
    native.set_epoch(0)
    nb = list(native)
    assert len(nb) == 4 and nb[0]["image"].shape == (4, 32, 32, 3)

    pil = DataLoader(make_ds(), batch_size=4, shuffle=True, drop_last=True,
                     num_workers=2, seed=3)
    pil.set_epoch(0)
    for n, p in zip(nb, pil):
        np.testing.assert_array_equal(n["label"], p["label"])
        diff = np.abs(n["image"].astype(int) - p["image"].astype(int))
        assert diff.mean() < 20.0, diff.mean()

    # both branches occur across the epoch for this seed (p=0.5 each, 16
    # samples) — checked by replaying each sample's draw
    _, op = native_train_stage(
        getattr(native.dataset.transforms, "base_transforms", None)
    )
    modes = set()
    for i in range(16):
        seed_sample(3, 0, i)
        modes.add(sample_native_geometry(op, 48, 40)[0])
    assert modes == {0, 1}


def test_dataprocessor_native_for_pet_yaml_shape(tmp_path):
    """The FULL reference pet.yaml train augment shape (photometric
    random_choice + flip + geometry random_choice + markers) takes the
    native train loader after the device-augment split."""
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
    norm = {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}
    cfg = {
        "root": str(tmp_path),
        "train": {
            "bs": 4,
            "augment": [
                {"random_choice": {"transforms": [
                    {"random_color_jitter": {"brightness": 0.1, "contrast": 0.1,
                                             "saturation": 0.1, "hue": 0.1}},
                    {"random_cutout": {"n_holes": 3, "length": 12, "prob": 0.1,
                                       "color": [0, 255]}},
                    {"random_gaussianblur": {"kernel_size": 5}},
                    {"random_autocontrast": {"p": 0.5}},
                ]}},
                {"random_horizonflip": {"p": 0.5}},
                _choice_geometry_cfg(size=32, p=(0.9, 0.1)),
                {"to_tensor": "no_params"},
                {"normalize": norm},
            ],
        },
        "val": {"bs": 4, "augment": [
            {"resize_and_padding": {"size": 32, "training": False}},
            {"to_tensor": "no_params"},
            {"normalize": norm},
        ]},
    }
    dp = SmartDataProcessor(cfg, project=str(tmp_path / "run"))
    assert dp.device_augment_cfg  # photometrics + flip lifted
    loader = dp.dataloader("train", 4)
    assert isinstance(loader, NativeTrainLoader)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["image"].dtype == np.uint8
