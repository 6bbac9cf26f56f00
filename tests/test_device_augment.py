"""Device augmentation stage (ops/device_augment) — per-op equivalence vs the
host/PIL implementations (VERDICT round-4 item 2's done-criterion), split
logic, and train-step integration.

Host counterparts: visiondk_tpu/data/transforms.py (themselves pinned to
reference dataset/transforms.py:63-162,403-528 semantics by
tests/test_transform_registry.py).
"""

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp
from PIL import Image, ImageEnhance, ImageOps

from visiondk_tpu.ops import device_augment as da


@pytest.fixture(scope="module")
def rand_img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def grad_img():
    yy, xx = np.mgrid[0:64, 0:48]
    return np.stack([(xx * 3) % 256, (yy * 2 + xx) % 256, (yy * 4) % 256], -1).astype(
        np.uint8
    )


def _assert_close(dev, ref, atol=1, frac=1.0, name=""):
    dev = np.asarray(dev).astype(np.int32)
    ref = np.asarray(ref).astype(np.int32)
    diff = np.abs(dev - ref)
    ok = (diff <= atol).mean()
    assert ok >= frac, f"{name}: only {ok:.4f} of pixels within {atol} (max {diff.max()})"


# ------------------------------------------------------------ pointwise ≡ PIL


@pytest.mark.parametrize("factor", [0.3, 0.85, 1.0, 1.4])
def test_brightness_exact(rand_img, factor):
    _assert_close(
        da.adjust_brightness(jnp.asarray(rand_img, jnp.float32), factor),
        ImageEnhance.Brightness(Image.fromarray(rand_img)).enhance(factor),
        atol=0,
    )


@pytest.mark.parametrize("factor", [0.5, 1.0, 1.3])
def test_contrast_saturation_sharpness_exact(rand_img, factor):
    pim = Image.fromarray(rand_img)
    jim = jnp.asarray(rand_img, jnp.float32)
    _assert_close(da.adjust_contrast(jim, factor), ImageEnhance.Contrast(pim).enhance(factor), atol=0)
    _assert_close(da.adjust_saturation(jim, factor), ImageEnhance.Color(pim).enhance(factor), atol=0)
    _assert_close(da.adjust_sharpness(jim, factor), ImageEnhance.Sharpness(pim).enhance(factor), atol=0)


def test_lut_ops_exact(rand_img):
    pim = Image.fromarray(rand_img)
    jim = jnp.asarray(rand_img, jnp.float32)
    _assert_close(da.autocontrast(jim), ImageOps.autocontrast(pim), atol=0)
    _assert_close(da.equalize(jim), ImageOps.equalize(pim), atol=0)
    _assert_close(da.invert(jim), ImageOps.invert(pim), atol=0)
    _assert_close(da.posterize(jim, 3), ImageOps.posterize(pim, 3), atol=0)
    _assert_close(da.solarize(jim, 128.0), ImageOps.solarize(pim, 128), atol=0)
    _assert_close(da.grayscale(jim), pim.convert("L").convert("RGB"), atol=0)


def test_autocontrast_constant_channel_identity():
    img = jnp.full((8, 8, 3), 77.0)
    assert np.array_equal(np.asarray(da.autocontrast(img)), np.asarray(img))
    assert np.array_equal(np.asarray(da.equalize(img)), np.asarray(img))


@pytest.mark.parametrize("shift", [0.05, -0.1, 0.3])
def test_hue_matches_host_hsv_roundtrip(rand_img, shift):
    """Host hue op (data/transforms.py RandomColorJitter): PIL HSV int16
    shift. f32 vs C-float sextant boundaries → ≥99% within 1 LSB."""
    hsv = np.array(Image.fromarray(rand_img).convert("HSV"), dtype=np.int16)
    hsv[..., 0] = (hsv[..., 0] + int(shift * 255)) % 256
    ref = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    _assert_close(
        da.adjust_hue(jnp.asarray(rand_img, jnp.float32), shift), ref,
        atol=1, frac=0.99, name="hue",
    )


# ------------------------------------------------------------- geometry ≡ PIL


@pytest.mark.parametrize("angle", [10.0, -37.5, 90.0, 7.3])
def test_rotate_bilinear(rand_img, grad_img, angle):
    for img in (rand_img, grad_img):
        _assert_close(
            da.rotate(jnp.asarray(img, jnp.float32), angle),
            Image.fromarray(img).rotate(angle, Image.BILINEAR),
            atol=1, name=f"rotate {angle}",
        )


def test_rotate_nearest(grad_img):
    _assert_close(
        da.rotate(jnp.asarray(grad_img, jnp.float32), 15.0, "nearest"),
        Image.fromarray(grad_img).rotate(15.0, Image.NEAREST),
        atol=0,
    )


def test_affine_translate_shear(grad_img):
    from visiondk_tpu.data.transforms import _pil_affine

    pim = Image.fromarray(grad_img)
    jim = jnp.asarray(grad_img, jnp.float32)
    m = da.inverse_affine_matrix((64, 48), 0.0, (5.0, -3.0))
    _assert_close(da.affine_transform(jim, m), _pil_affine(pim, translate=(5, -3)), atol=0)
    m = da.inverse_affine_matrix((64, 48), 0.0, (0.0, 0.0), 1.0, (10.0, 0.0), center=(0, 0))
    _assert_close(
        da.affine_transform(jim, m, "nearest"),
        _pil_affine(pim, shear=(10.0, 0.0), interpolation=Image.NEAREST, center=(0, 0)),
        atol=0,
    )
    # combined rotation+scale+shear, bilinear
    m = da.inverse_affine_matrix((64, 48), 12.0, (2.0, 1.0), 1.1, (5.0, -3.0))
    _assert_close(
        da.affine_transform(jim, m),
        _pil_affine(pim, angle=12.0, translate=(2, 1), scale=1.1, shear=(5.0, -3.0)),
        atol=1, frac=0.999, name="affine combined",
    )


@pytest.mark.parametrize("sigma", [0.5, 1.7])
def test_gaussian_blur_closed_form(rand_img, sigma):
    """torchvision GaussianBlur math: truncated normalized kernel, separable,
    reflect padding — checked against a float64 numpy closed form."""
    k, half = 5, 2
    d = np.arange(-half, half + 1)
    kern = np.exp(-0.5 * (d / sigma) ** 2)
    kern /= kern.sum()

    def refl(i, n):
        i = np.abs(i)
        return np.where(i >= n, 2 * (n - 1) - i, i)

    out = rand_img.astype(np.float64)
    for ax in (0, 1):
        n = out.shape[ax]
        idx = refl(np.arange(n)[:, None] + d[None, :], n)
        out = np.tensordot(np.take(out, idx, axis=ax), kern, axes=([ax + 1], [0]))
    ref = np.clip(np.floor(out + 0.5), 0, 255)
    _assert_close(
        da.gaussian_blur(jnp.asarray(rand_img, jnp.float32), sigma, k), ref, atol=1
    )


def test_cutout_geometry(rand_img):
    """Host Cutout (data/transforms.py, reference transforms.py:63-109):
    top-left = max(0, center − length//2), solid color, far edge clips."""
    img = jnp.asarray(rand_img, jnp.float32)
    length = 20
    out = np.asarray(
        da.cutout_holes(
            img,
            centers_yx=jnp.asarray([[10.0, 40.0]]),
            hole_h=jnp.float32(length),
            hole_w=jnp.float32(16.0),
            colors=jnp.asarray([[7.0, 8.0, 9.0]]),
            length=length,
        )
    )
    y1, x1 = max(0, 10 - length // 2), max(0, 40 - length // 2)
    ref = rand_img.astype(np.float32).copy()
    ref[y1 : y1 + length, x1 : x1 + 16] = [7.0, 8.0, 9.0]
    assert np.array_equal(out, ref)


def test_random_crop_static(rand_img):
    img = jnp.asarray(rand_img, jnp.float32)
    out = da.random_crop_static(img, jax.random.key(0), 32, 24)
    assert out.shape == (32, 24, 3)
    # crop content must be a contiguous window of the source
    o = np.asarray(out).astype(np.uint8)
    found = any(
        np.array_equal(o, rand_img[t : t + 32, l : l + 24])
        for t in range(64 - 32 + 1)
        for l in range(48 - 24 + 1)
    )
    assert found


# --------------------------------------------------------------- compiled ops


def test_color_jitter_applies_all_components(rand_img):
    fn = da._compile_one(
        "random_color_jitter",
        {"brightness": 0.5, "contrast": 0.5, "saturation": 0.5, "hue": 0.2},
    )
    out = fn(jax.random.key(3), jnp.asarray(rand_img, jnp.float32))
    o = np.asarray(out)
    assert o.shape == rand_img.shape
    assert (o >= 0).all() and (o <= 255).all()
    assert not np.array_equal(o, rand_img)


def test_gate_probability_zero_and_one(rand_img):
    img = jnp.asarray(rand_img, jnp.float32)
    never = da._compile_one("random_invert", {"p": 0.0})
    always = da._compile_one("random_invert", {"p": 1.0})
    assert np.array_equal(np.asarray(never(jax.random.key(0), img)), rand_img)
    assert np.array_equal(np.asarray(always(jax.random.key(0), img)), 255 - rand_img)


def test_flip_gate_statistics(rand_img):
    """hflip(p=0.5) across many keys fires ≈ half the time."""
    img = jnp.asarray(rand_img, jnp.float32)
    fn = da._compile_one("random_horizonflip", {"p": 0.5})
    flipped = rand_img[:, ::-1]
    hits = 0
    for i in range(200):
        o = np.asarray(fn(jax.random.key(i), img)).astype(np.uint8)
        if np.array_equal(o, flipped):
            hits += 1
        else:
            assert np.array_equal(o, rand_img)
    assert 60 <= hits <= 140


def test_random_doubleflip_choose_one(rand_img):
    """Reference choose-one semantics: output ∈ {orig, hflip, vflip} — never
    both flips."""
    img = jnp.asarray(rand_img, jnp.float32)
    fn = da._compile_one("random_doubleflip", 0.5)
    seen = set()
    variants = {
        "orig": rand_img,
        "h": rand_img[:, ::-1],
        "v": rand_img[::-1],
        "hv": rand_img[::-1, ::-1],
    }
    for i in range(60):
        o = np.asarray(fn(jax.random.key(i), img)).astype(np.uint8)
        for name, v in variants.items():
            if np.array_equal(o, v):
                seen.add(name)
                break
    assert "hv" not in seen
    assert {"h", "v"} & seen


def test_augmix_and_randaugment_run(rand_img):
    img = jnp.asarray(rand_img, jnp.float32)
    for name, params in (
        ("random_augmix", {"severity": 3}),
        ("random_augment", {"num_ops": 2, "magnitude": 9}),
    ):
        fn = da._compile_one(name, params)
        out = np.asarray(jax.jit(fn)(jax.random.key(1), img))
        assert out.shape == rand_img.shape
        assert (out >= 0).all() and (out <= 255).all()
        assert not np.array_equal(out, rand_img)


# ------------------------------------------------------------------ splitting


PET_AUG = yaml.safe_load(
    """
- random_choice:
    transforms:
      - random_color_jitter: {brightness: 0.1, contrast: 0.1, saturation: 0.1, hue: 0.1}
      - random_cutout: {n_holes: 3, length: 12, prob: 0.1, color: [0, 255]}
      - random_gaussianblur: {kernel_size: 5}
      - random_rotate: {degrees: 10}
      - random_autocontrast: {p: 0.5}
      - random_adjustsharpness: {p: 0.5}
      - random_augmix: {severity: 3}
- random_horizonflip: {p: 0.5}
- random_choice:
    transforms:
      - resize_and_padding: {size: 224, training: True}
      - random_crop_and_resize: {size: 224, scale: [0.7, 1]}
    p: [0.9, 0.1]
- to_tensor: no_params
- normalize: {mean: [0.485, 0.456, 0.406], std: [0.229, 0.224, 0.225]}
"""
)


def test_split_pet_yaml_block():
    """The reference pet.yaml augment block splits into host geometry +
    device photometric/flip."""
    host, dev = da.split_device_pipeline(PET_AUG)
    assert [da._item_name(i) for i in host] == ["random_choice", "to_tensor", "normalize"]
    assert [da._item_name(i) for i in dev] == ["random_choice", "random_horizonflip"]


def test_split_no_geometry_keeps_host():
    """A pipeline with no host spatial op can't batch variable-size images —
    nothing lifts."""
    cfg = [{"random_horizonflip": {"p": 0.5}}, "to_tensor"]
    host, dev = da.split_device_pipeline(cfg)
    assert dev == [] and host == cfg


def test_split_host_only_ops_stay():
    cfg = [
        {"random_cutaddnoise": {"noisy_src": "/tmp/nonexistent_noise"}},
        {"resize": 224},
        "to_tensor",
    ]
    host, dev = da.split_device_pipeline(cfg)
    assert dev == []
    assert [da._item_name(i) for i in host] == ["random_cutaddnoise", "resize", "to_tensor"]


def test_make_device_augment_deterministic_and_batched():
    cfg = [{"random_color_jitter": {"brightness": 0.4}}, {"random_horizonflip": {"p": 0.5}}]
    fn = da.make_device_augment(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    )
    o1 = np.asarray(jax.jit(fn)(jax.random.key(5), imgs))
    o2 = np.asarray(jax.jit(fn)(jax.random.key(5), imgs))
    o3 = np.asarray(jax.jit(fn)(jax.random.key(6), imgs))
    assert o1.dtype == np.uint8 and o1.shape == imgs.shape
    assert np.array_equal(o1, o2)
    assert not np.array_equal(o1, o3)
    # per-sample keys: identical input rows get different augmentations
    same = jnp.asarray(np.broadcast_to(np.asarray(imgs[0]), imgs.shape))
    os = np.asarray(jax.jit(fn)(jax.random.key(7), same))
    assert any(not np.array_equal(os[i], os[0]) for i in range(1, 8))


def test_float_batch_raises():
    """A non-uint8 batch reaching a compiled device stage is a wiring bug
    (split_device_pipeline refuses to lift for to_tensor_without_div
    pipelines) — fail loudly instead of silently skipping every augment
    (ADVICE r4 high)."""
    fn = da.make_device_augment([{"random_horizonflip": {"p": 1.0}}])
    imgs = jnp.ones((2, 8, 8, 3), jnp.float32)
    with pytest.raises(TypeError, match="uint8"):
        fn(jax.random.key(0), imgs)


def test_split_refuses_to_tensor_without_div():
    """Pipelines ending in to_tensor_without_div keep ALL augments on host:
    lifting them would strip them from the host cfg while the device stage
    can't run on the resulting f32 batch (ADVICE r4 high)."""
    cfg = [
        {"random_horizonflip": {"p": 0.5}},
        {"random_color_jitter": {"brightness": 0.4}},
        {"resize_and_padding": {"size": 32}},
        "to_tensor_without_div",
        {"normalize": {"mean": [0, 0, 0], "std": [1, 1, 1]}},
    ]
    host, device = da.split_device_pipeline(cfg)
    assert device == []
    assert host == cfg


def test_set_device_pipeline_size_progressive_resize():
    """Progressive resize must rewrite a lifted random_crop's static size —
    otherwise the first milestone dynamic-slices beyond the shrunken operand
    (ADVICE r4 medium)."""
    cfg = [{"random_horizonflip": {"p": 0.5}}, {"random_crop": {"size": 32}}]
    fn = da.make_device_augment(cfg)
    big = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    assert fn(jax.random.key(0), big).shape == (2, 32, 32, 3)

    changed = da.set_device_pipeline_size(cfg, 16)
    assert changed
    assert cfg[1] == {"random_crop": {"size": 16}}
    fn2 = da.make_device_augment(cfg)
    small = jnp.zeros((2, 16, 16, 3), jnp.uint8)
    assert fn2(jax.random.key(0), small).shape == (2, 16, 16, 3)

    # scalar-param spelling and random_choice nesting are rewritten too
    cfg2 = [
        {"random_choice": {"transforms": [{"random_crop": {"size": 48}}]}},
        {"random_crop": 48},
    ]
    assert da.set_device_pipeline_size(cfg2, 24)
    assert cfg2[0]["random_choice"]["transforms"][0] == {"random_crop": {"size": 24}}
    assert cfg2[1] == {"random_crop": {"size": 24}}

    # size-free pipelines report unchanged (trainer skips the rebuild)
    cfg3 = [{"random_horizonflip": {"p": 0.5}}]
    assert not da.set_device_pipeline_size(cfg3, 24)


def test_lift_reorder_distribution():
    """Quantifies the documented lift reordering deviation (docs/PARITY.md
    "Known intentional differences" #6).

    (a) Flips commute with a uniform random crop in distribution: the
        mean image over many draws of host-order flip→crop equals
        crop→flip within Monte-Carlo tolerance.
    (b) Cutout does NOT commute: lifted (post-crop) cutout holes are always
        fully visible, while reference-order (pre-crop) holes can be
        partially or fully cropped away.
    """
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8).astype(np.float64)
    H, S = 24, 16
    n_draws = 400
    offs = rng.integers(0, H - S + 1, size=(n_draws, 2))
    flips = rng.random(n_draws) < 0.5

    # (a) flip→crop vs crop→flip mean images
    acc_a = np.zeros((S, S, 3))
    acc_b = np.zeros((S, S, 3))
    for (oy, ox), f in zip(offs, flips):
        flipped = img[:, ::-1] if f else img
        acc_a += flipped[oy:oy + S, ox:ox + S]
        cropped = img[oy:oy + S, ox:ox + S]
        acc_b += cropped[:, ::-1] if f else cropped
    # same marginal distribution ⇒ same mean; MC std of a mean of uniforms
    # over 400 draws is ~74/sqrt(400) ≈ 3.7 per channel — allow 5 sigma
    assert np.abs(acc_a / n_draws - acc_b / n_draws).mean() < 12.0

    # (b) cutout visible-hole-area distributions
    L = 8
    centers = rng.integers(0, H, size=(n_draws, 2))

    def hole_area_host(cy, cx, oy, ox):
        y1, y2 = max(cy - L // 2, 0), min(cy + L // 2, H)
        x1, x2 = max(cx - L // 2, 0), min(cx + L // 2, H)
        vy = max(0, min(y2, oy + S) - max(y1, oy))
        vx = max(0, min(x2, ox + S) - max(x1, ox))
        return vy * vx

    host_areas = np.array([
        hole_area_host(cy, cx, oy, ox)
        for (cy, cx), (oy, ox) in zip(centers, offs)
    ])
    # lifted: same cutout math on the S×S crop (centers uniform in-crop)
    lifted_centers = rng.integers(0, S, size=(n_draws, 2))
    lifted_areas = np.array([
        (min(cy + L // 2, S) - max(cy - L // 2, 0))
        * (min(cx + L // 2, S) - max(cx - L // 2, 0))
        for cy, cx in lifted_centers
    ])
    assert (lifted_areas > 0).all()          # hole always visible post-crop
    assert (host_areas == 0).any()           # reference order can lose it
    assert lifted_areas.mean() > host_areas.mean()  # documented direction


# ---------------------------------------------------------------- integration


def test_dataprocessor_split_gating(tmp_path):
    """SmartDataProcessor: auto split on; device_augment:false off;
    class_aug present → off."""
    from visiondk_tpu.data.dataprocessor import SmartDataProcessor

    root = tmp_path / "data"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for cls in ("a", "b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(
                    rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")

    base_cfg = {
        "root": str(root),
        "train": {
            "bs": 2,
            "augment": [
                {"random_color_jitter": {"brightness": 0.2}},
                {"resize_and_padding": {"size": 32}},
                "to_tensor",
            ],
        },
        "val": {"bs": 2, "augment": [{"resize_and_padding": {"size": 32}}, "to_tensor"]},
    }

    dp = SmartDataProcessor(dict(base_cfg), project=str(tmp_path / "p1"))
    assert [da._item_name(i) for i in dp.device_augment_cfg] == ["random_color_jitter"]
    assert [da._item_name(i) for i in dp.train_pipeline_cfg] == [
        "resize_and_padding", "to_tensor",
    ]

    off = dict(base_cfg)
    off["train"] = dict(base_cfg["train"], device_augment=False)
    dp_off = SmartDataProcessor(off, project=str(tmp_path / "p2"))
    assert dp_off.device_augment_cfg == []

    cls_aug = dict(base_cfg)
    cls_aug["train"] = dict(base_cfg["train"], class_aug={0: [0]})
    dp_cls = SmartDataProcessor(cls_aug, project=str(tmp_path / "p3"))
    assert dp_cls.device_augment_cfg == []


def test_train_step_with_device_augment():
    """make_train_step with a device stage: runs, is deterministic given the
    step counter, and actually perturbs the inputs (loss differs from the
    augment-free step on the same batch)."""
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_train_step
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.models.factory import VisionModel

    model = VisionModel(backbone_name="resnet18", num_classes=4, dtype=jnp.float32)
    rng = jax.random.key(0)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    tx = optax.sgd(0.01)
    lossfn = create_lossfn("ce")
    cfg = StepConfig(task="classification")

    aug_fn = da.make_device_augment(
        [{"random_color_jitter": {"brightness": 0.9}}, {"random_cutout": {"length": 12, "prob": 1.0}}]
    )
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
        ),
        "label": jnp.asarray([0, 1, 2, 3], jnp.int32),
    }
    lam = jnp.float32(0.0)

    step_aug = make_train_step(model, tx, lossfn, cfg, jax.random.key(1),
                               donate=False, device_augment=aug_fn)
    step_plain = make_train_step(model, tx, lossfn, cfg, jax.random.key(1), donate=False)
    state = create_train_state(variables, tx)
    _, m_aug = step_aug(state, batch, lam)
    _, m_aug2 = step_aug(state, batch, lam)
    _, m_plain = step_plain(state, batch, lam)
    assert float(m_aug["loss"]) == pytest.approx(float(m_aug2["loss"]))
    assert float(m_aug["loss"]) != pytest.approx(float(m_plain["loss"]), rel=1e-6)


# ------------------------------------------------------------- group execution


def test_group_mode_deterministic_and_per_sample_draws():
    """Group-scan execution (round 5): deterministic per key, per-sample
    draws still differ within a group for elementwise ops."""
    cfg = [{"random_color_jitter": {"brightness": 0.4}}, {"random_horizonflip": {"p": 0.5}}]
    fn = da.make_device_augment(cfg, group_size=4)
    imgs = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    )
    o1 = np.asarray(jax.jit(fn)(jax.random.key(5), imgs))
    o2 = np.asarray(jax.jit(fn)(jax.random.key(5), imgs))
    o3 = np.asarray(jax.jit(fn)(jax.random.key(6), imgs))
    assert o1.dtype == np.uint8 and o1.shape == imgs.shape
    assert np.array_equal(o1, o2) and not np.array_equal(o1, o3)
    # identical rows inside ONE group still get different jitter draws
    same = jnp.asarray(np.broadcast_to(np.asarray(imgs[0]), imgs.shape))
    os_ = np.asarray(jax.jit(fn)(jax.random.key(7), same))
    assert any(not np.array_equal(os_[i], os_[0]) for i in range(1, 4))


def test_group_choice_shares_branch_within_group():
    """random_choice draws once per group: with two maximally-distinct
    branches (invert vs identity-ish flip p=0), all samples of a group land
    on the same branch."""
    cfg = [{"random_choice": {"transforms": [
        {"random_invert": {"p": 1.0}},
        {"random_horizonflip": {"p": 0.0}},
    ]}}]
    fn = da.make_device_augment(cfg, group_size=4)
    base = np.full((8, 8, 8, 3), 10, np.uint8)
    out = np.asarray(fn(jax.random.key(0), jnp.asarray(base)))
    for g in range(2):
        grp = out[g * 4:(g + 1) * 4]
        inverted = (grp == 245).all()
        identity = (grp == 10).all()
        assert inverted or identity, grp[..., 0, 0]


def test_group_size_one_is_per_sample():
    """group_size=1: every sample draws its own branch (exact reference
    semantics) — across 32 samples both branches must appear."""
    cfg = [{"random_choice": {"transforms": [
        {"random_invert": {"p": 1.0}},
        {"random_horizonflip": {"p": 0.0}},
    ]}}]
    fn = da.make_device_augment(cfg, group_size=1)
    base = np.full((32, 4, 4, 3), 10, np.uint8)
    out = np.asarray(fn(jax.random.key(1), jnp.asarray(base)))
    per_sample = out.reshape(32, -1)
    kinds = {tuple(np.unique(r)) for r in per_sample}
    assert (10,) in kinds and (245,) in kinds


def test_group_augmix_and_randaugment_run():
    """Group variants of the heavy composite ops compile and produce valid
    uint8 output (the pet.yaml chain shape)."""
    cfg = [
        {"random_choice": {"transforms": [
            {"random_augmix": {"severity": 3}},
            {"random_augment": {"num_ops": 2, "magnitude": 9}},
            {"random_rotate": {"degrees": 10}},
        ]}},
        {"random_horizonflip": {"p": 0.5}},
    ]
    fn = da.make_device_augment(cfg, group_size=4)
    imgs = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (8, 24, 24, 3), dtype=np.uint8)
    )
    out = np.asarray(jax.jit(fn)(jax.random.key(2), imgs))
    assert out.shape == imgs.shape and out.dtype == np.uint8
    assert not np.array_equal(out, np.asarray(imgs))


def test_group_mode_sharded_runs(mesh8):
    """Under a live sharded mesh the stage runs per device via shard_map —
    same shape/dtype, deterministic, executes without SPMD errors."""
    from visiondk_tpu.parallel.mesh import with_current_mesh

    cfg = [{"random_choice": {"transforms": [
        {"random_invert": {"p": 1.0}},
        {"random_color_jitter": {"brightness": 0.3}},
    ]}}, {"random_horizonflip": {"p": 0.5}}]
    imgs = jnp.asarray(
        np.random.default_rng(4).integers(0, 256, (16, 16, 16, 3), dtype=np.uint8)
    )
    with with_current_mesh(mesh8.mesh):
        fn = da.make_device_augment(cfg, group_size=2)
        sharded = jax.device_put(imgs, mesh8.batch)
        o1 = np.asarray(jax.jit(fn)(jax.random.key(9), sharded))
        o2 = np.asarray(jax.jit(fn)(jax.random.key(9), sharded))
    assert o1.shape == imgs.shape and o1.dtype == np.uint8
    assert np.array_equal(o1, o2)


def test_affine_transform_group_matches_per_sample(grad_img):
    """affine_transform_group (shared matrix, batched-minor gather) must be
    bit-equal to the per-sample affine_transform for the same matrix."""
    imgs = np.stack([grad_img, grad_img[::-1].copy(), 255 - grad_img], 0).astype(np.float32)
    jimgs = jnp.asarray(imgs)
    for interp in ("bilinear", "nearest"):
        m = da.inverse_affine_matrix((64, 48), 12.0, (2.0, 1.0), 1.1, (5.0, -3.0))
        grp = np.asarray(da.affine_transform_group(jimgs, m, interp))
        ref = np.stack(
            [np.asarray(da.affine_transform(jimgs[i], m, interp)) for i in range(3)], 0
        )
        assert np.array_equal(grp, ref), interp
    # rotate_group == rotate at the same angle
    grp = np.asarray(da.rotate_group(jimgs, 33.0))
    ref = np.stack([np.asarray(da.rotate(jimgs[i], 33.0)) for i in range(3)], 0)
    assert np.array_equal(grp, ref)
