"""Registry portability: every reference augment name builds with
reference-style params and runs (reference dataset/transforms.py:16-45
``__all__``, :402-528 registry factories), the reference pet.yaml augment
block compiles unmodified, and the approximated photometric ops are pinned
to their torchvision/PIL semantics (transforms.py:417-423, :511-513)."""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from visiondk_tpu.data import transforms as T


def _img(w=48, h=32, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8))


# Reference registry (dataset/transforms.py:16-45 __all__ minus the two
# factory helpers), each with params in the reference's own style.
REFERENCE_REGISTRY = [
    ("color_jitter", dict(brightness=0.1, contrast=0.1, saturation=0.1, hue=0.1)),
    ("random_color_jitter", dict(prob=0.5, brightness=0.1, contrast=0.1, saturation=0.1, hue=0.1)),
    ("random_horizonflip", dict(p=0.5)),
    ("random_verticalflip", dict(p=0.5)),
    ("random_doubleflip", dict(prob=0.5)),
    ("random_crop", dict(size=24)),
    ("random_augment", dict(num_ops=2, magnitude=9, num_magnitude_bins=31)),
    ("center_crop", dict(size=24)),
    ("resize", dict(size=32)),
    ("resize_and_padding", dict(size=32, training=True)),
    ("centercrop_resize", dict(center_size=24, re_size=32)),
    ("random_cutout", dict(n_holes=1, length=8, ratio=0.2, prob=1.0, color=(0, 255))),
    ("random_localgaussian", dict(prob=1.0, ksize=(7, 7))),
    ("random_cutaddnoise", dict(n_holes=1, length=8, prob=1.0)),
    ("random_affine", dict(degrees=10.0, translate=(0.1, 0.1), scale=(0.9, 1.1), shear=5.0)),
    ("to_tensor", "no_params"),
    ("to_tensor_without_div", "no_params"),
    ("normalize", dict(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))),
    ("random_gaussianblur", dict(prob=1.0, kernel_size=3, sigma=(0.1, 2.0))),
    ("random_autocontrast", dict(p=0.5)),
    ("random_adjustsharpness", dict(sharpness_factor=2, p=0.5)),
    ("random_rotate", dict(degrees=10)),
    ("random_invert", dict(p=0.5)),
    ("random_equalize", dict(p=0.5)),
    ("random_augmix", dict(severity=3)),
    ("random_grayscale", dict(p=0.5)),
    ("random_crop_and_resize", dict(size=32, scale=(0.7, 1))),
    ("pad2square", dict(pad_value=0, mode="average")),
]


@pytest.mark.parametrize("name,params", REFERENCE_REGISTRY, ids=[n for n, _ in REFERENCE_REGISTRY])
def test_reference_registry_name_builds_and_runs(name, params):
    T.seed_sample("registry", name)
    t = T._build_one(name, params)
    out = t(_img())
    assert isinstance(out, (Image.Image, np.ndarray))


def test_reference_pet_yaml_augment_block_compiles():
    """The reference pet.yaml train augment block (configs/classification/
    pet.yaml:55-90), reconstructed key-for-key, must compile and run."""
    size = 32
    cfg = [
        {"random_choice": {"transforms": [
            {"random_color_jitter": {"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0.1}},
            {"random_cutout": {"n_holes": 3, "length": 12, "prob": 0.1, "color": [0, 255]}},
            {"random_gaussianblur": {"kernel_size": 5}},
            {"random_rotate": {"degrees": 10}},
            {"random_autocontrast": {"p": 0.5}},
            {"random_adjustsharpness": {"p": 0.5}},
            {"random_augmix": {"severity": 3}},
        ]}},
        {"random_horizonflip": {"p": 0.5}},
        {"random_choice": {"transforms": [
            {"resize_and_padding": {"size": size, "training": True}},
            {"random_crop_and_resize": {"size": size, "scale": [0.7, 1]}},
        ], "p": [0.9, 0.1]}},
        {"to_tensor": "no_params"},
        {"normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
    ]
    pipe = T.create_aug_transforms(cfg)
    T.seed_sample("pet", 0)
    out = pipe(_img(80, 60))
    assert isinstance(out, np.ndarray) and out.shape == (size, size, 3) and out.dtype == np.uint8
    assert T.extract_normalization(pipe)[0] == (0.485, 0.456, 0.406)


def test_cutout_reference_geometry_and_color():
    """ratio=0 → exact length×length block; color range (5,5) → solid 5s;
    h_range/w_range pin the center (reference Cutout, transforms.py:63-109)."""
    T.seed_sample("cutout", 0)
    t = T.Cutout(n_holes=1, length=8, ratio=0.0, h_range=(16, 17), w_range=(20, 21), prob=1.0, color=(5, 5))
    arr = np.asarray(t(Image.new("RGB", (48, 32), (200, 100, 50))))
    ys, xs = np.where((arr == 5).all(-1))
    assert ys.min() == 12 and ys.max() == 19  # y=16 → top-left 16-4=12, height 8
    assert xs.min() == 16 and xs.max() == 23
    # everything else untouched
    assert (arr[0, 0] == (200, 100, 50)).all()


def test_cutaddnoise_noisy_src(tmp_path):
    src = tmp_path / "noise"
    src.mkdir()
    noise = np.zeros((16, 16, 3), np.uint8)
    noise[...] = (1, 2, 3)
    Image.fromarray(noise).save(src / "n.jpg", quality=100)
    T.seed_sample("noise", 0)
    t = T.CutAddNoise(n_holes=1, length=64, noisy_src=str(src), prob=1.0)
    out = np.asarray(t(Image.new("RGB", (32, 32), (200, 200, 200))))
    # some pixels must come from the noise image (JPEG-roundtripped ≈ (1,2,3))
    assert (np.abs(out.astype(int) - [1, 2, 3]).sum(-1) < 15).any()


def test_cutaddnoise_refuses_empty_src(tmp_path):
    with pytest.raises(ValueError):
        T.CutAddNoise(noisy_src=str(tmp_path))


def test_pad2square_modes():
    img = Image.new("RGB", (10, 6), (9, 9, 9))
    avg = np.asarray(T.Pad2Square(pad_value=(1, 2, 3), mode="average")(img))
    assert avg.shape == (10, 10, 3)
    assert (avg[0, 0] == (1, 2, 3)).all() and (avg[5, 5] == (9, 9, 9)).all()
    # centered: rows 2..7 hold the image
    assert (avg[2, 0] == (9, 9, 9)).all() and (avg[1, 0] == (1, 2, 3)).all()
    edge = np.asarray(T.Pad2Square(pad_value=(1, 2, 3), mode="edge")(img))
    # pasted at bottom-right: last row is image, first rows are fill
    assert (edge[-1, -1] == (9, 9, 9)).all() and (edge[0, 0] == (1, 2, 3)).all()
    with pytest.raises(ValueError):
        T.Pad2Square(mode="corner")


def test_doubleflip_choice_semantics():
    """random_doubleflip picks exactly ONE of (vflip, hflip) — an asymmetric
    image can never come back double-flipped (reference transforms.py:316-323)."""
    arr = np.arange(12 * 12 * 3, dtype=np.uint8).reshape(12, 12, 3)
    img = Image.fromarray(arr)
    both = np.asarray(img.transpose(Image.FLIP_LEFT_RIGHT).transpose(Image.FLIP_TOP_BOTTOM))
    t = T.RandomDoubleFlipChoice(prob=0.5)
    for i in range(64):
        T.seed_sample("dflip", i)
        out = np.asarray(t(img))
        assert not np.array_equal(out, both)


def test_to_tensor_without_div_reaches_device_unscaled():
    import jax.numpy as jnp

    from visiondk_tpu.engine.steps import device_preprocess

    t = T.ToTensorNoDiv()
    out = t(Image.new("RGB", (8, 8), (100, 150, 200)))
    assert out.dtype == np.float32 and out[0, 0, 0] == 100.0
    dev = device_preprocess(jnp.asarray(out[None]), (0.0, 0.0, 0.0), (1.0, 1.0, 1.0))
    # float input skips the /255 — reference 0..255-scale normalize semantics
    assert float(dev[0, 0, 0, 0]) == 100.0


def test_affine_translate_exact():
    """Integer translate with identity rot/scale/shear is an exact pixel shift
    (torchvision affine convention)."""
    arr = np.zeros((16, 16, 3), np.uint8)
    arr[4, 4] = (255, 255, 255)
    out = np.asarray(T._pil_affine(Image.fromarray(arr), translate=(3, 2), fill=0))
    assert (out[6, 7] == 255).all()
    assert out.sum() == 255 * 3


def test_affine_rotate_180():
    arr = np.zeros((17, 17, 3), np.uint8)
    arr[2, 3] = (255, 255, 255)
    out = np.asarray(T._pil_affine(Image.fromarray(arr), angle=180.0, fill=0))
    # lands exactly on the mirrored pixel center; PIL bilinear may round to 254
    assert (out[14, 13] >= 250).all()
    assert out.sum() <= 255 * 3 + 16  # and nowhere else


def test_random_affine_scalar_params_tolerated():
    """The reference registers random_affine with scalar defaults
    (transforms.py:507); scalars must not crash (0 → disabled)."""
    t = T.RandomAffine(degrees=0.0, translate=0.0, scale=0.0, shear=0.0)
    T.seed_sample("affine", 1)
    out = np.asarray(t(_img(16, 16)))
    assert np.array_equal(out, np.asarray(_img(16, 16)))  # identity


def test_randaugment_magnitude_table():
    """Magnitude bins must match torchvision's _augmentation_space at
    magnitude=9, bins=31."""
    ra = T.RandAugment(num_ops=2, magnitude=9, num_magnitude_bins=31)
    t = 9 / 30
    assert np.isclose(ra._magnitude("ShearX", 100, 100), 0.3 * t)
    assert np.isclose(ra._magnitude("TranslateX", 331, 100), 150.0 * t)
    assert np.isclose(ra._magnitude("Rotate", 100, 100), 30.0 * t)
    assert np.isclose(ra._magnitude("Brightness", 100, 100), 0.9 * t)
    assert ra._magnitude("Posterize", 100, 100) == 8 - round(9 / 7.5)
    assert np.isclose(ra._magnitude("Solarize", 100, 100), 255.0 * (1 - t))


def test_randaugment_all_ops_run():
    ra = T.RandAugment()
    img = _img(32, 32)
    for op in ra._OPS:
        out = ra._apply(img, op, ra._magnitude(op, 32, 32) or 1.0)
        assert out.size == img.size


def test_gaussianblur_sigma_semantics():
    """PIL GaussianBlur radius == the Gaussian's standard deviation: blurring
    an impulse must reproduce the closed-form 2D Gaussian (so drawing
    radius ~ U(sigma) matches torchvision's sigma semantics,
    reference transforms.py:511-513)."""
    sigma = 2.0
    n = 33
    arr = np.zeros((n, n), np.uint8)
    arr[n // 2, n // 2] = 255
    out = np.asarray(
        Image.fromarray(arr).filter(T.ImageFilter.GaussianBlur(radius=sigma)), dtype=np.float64
    )
    yy, xx = np.mgrid[:n, :n] - n // 2
    expected = 255.0 * np.exp(-(xx**2 + yy**2) / (2 * sigma**2)) / (2 * np.pi * sigma**2)
    # normalized cross-correlation ≈ 1 when the kernel shape matches (PIL
    # implements Gaussian as matched-variance box passes — ~0.991 vs the
    # closed form; a wrong sigma scale drops this below 0.9)
    num = (out * expected).sum()
    den = np.sqrt((out**2).sum() * (expected**2).sum())
    assert num / den > 0.98
    # and the fixed-sigma path uses exactly that sigma
    T.seed_sample("blur", 0)
    t = T.RandomGaussianBlur(prob=1.0, sigma=sigma)
    direct = np.asarray(t(Image.fromarray(arr)))
    ref = np.asarray(Image.fromarray(arr).filter(T.ImageFilter.GaussianBlur(radius=sigma)))
    assert np.array_equal(direct, ref)


def test_color_jitter_hue_semantics():
    """Hue shift h rotates the HSV uint8 hue channel by round(h·255) mod 256
    (torchvision PIL-backend adjust_hue math)."""
    base = Image.new("RGB", (8, 8), (200, 30, 30))  # hue ≈ 0
    h_before = int(np.asarray(base.convert("HSV"))[0, 0, 0])
    t = T.RandomColorJitter(hue=0.2, p=1.0)
    # replay the transform's RNG draws: p-gate random(), then _hue's uniform
    # (shuffle of a 1-op list consumes nothing)
    T.seed_sample("hue", 3)
    r = T.rng()
    r.random()
    drawn = r.uniform(-0.2, 0.2)
    T.seed_sample("hue", 3)
    out = t(base)
    h_after = int(np.asarray(out.convert("HSV"))[0, 0, 0])
    want = (h_before + int(drawn * 255)) % 256
    # RGB→HSV→RGB→HSV roundtrip can move quantized hue by ±2
    circ = min((h_after - want) % 256, (want - h_after) % 256)
    assert circ <= 2, (h_after, want, drawn)


def test_brightness_contrast_saturation_factors():
    """ImageEnhance math: brightness scales linearly; saturation at factor 0
    is grayscale; contrast at factor 1 is identity."""
    from PIL import ImageEnhance

    img = Image.new("RGB", (4, 4), (100, 150, 200))
    bright = np.asarray(ImageEnhance.Brightness(img).enhance(1.5))
    assert tuple(bright[0, 0]) == (150, 225, 255)  # clipped
    gray = np.asarray(ImageEnhance.Color(img).enhance(0.0))
    assert gray[0, 0, 0] == gray[0, 0, 1] == gray[0, 0, 2]
    same = np.asarray(ImageEnhance.Contrast(img).enhance(1.0))
    assert np.array_equal(same, np.asarray(img))


def test_localgaussian_blurs_inside_leaves_corner():
    T.seed_sample("lg", 0)
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (64, 64, 3), np.uint8)
    t = T.LocalGaussian(prob=1.0, ksize=(7, 7), h_range=(20, 40), w_range=(20, 40))
    out = np.asarray(t(Image.fromarray(arr)))
    assert out.shape == arr.shape
    assert not np.array_equal(out, arr)  # something changed
    assert np.array_equal(out[:4, :4], arr[:4, :4])  # far corner untouched


def test_legacy_names_still_build():
    """Pre-round-4 spellings/params keep working (configs in the wild)."""
    for name, params in [
        ("random_cutout", dict(n_holes=3, length=12, prob=0.1, color=(0, 255))),
        ("random_gaussianblur", dict(kernel_size=5)),
        ("random_double_flip", dict(p=0.5)),
        ("pad_if_need", dict(size=32)),
        ("random_localgaussian", dict(radius=4, length=16, prob=1.0)),
    ]:
        T.seed_sample("legacy", name)
        out = T._build_one(name, params)(_img())
        assert out is not None
