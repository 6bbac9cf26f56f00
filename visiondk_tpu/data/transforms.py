"""Host-side augmentation registry.

Parity with the reference transform registry (dataset/transforms.py:51-61
``@register_method`` → ``AUG_METHODS`` → ``create_AugTransforms`` :530-557)
including its custom ops (Cutout :63-109, CutAddNoise :111-162, LocalGaussian
:248-314, PadIfNeed :207-246, ResizeAndPadding2Square letterbox :325-388,
aspect-aware RandomResizedCrop :390-400, RandomDoubleFlip :316-323) — written
on PIL/NumPy, no torchvision.

TPU split of responsibilities (BASELINE.json north star): host workers do
decode + geometry (resize/crop/flip/letterbox) and the cheap photometric ops;
``to_tensor`` yields **uint8 HWC** and ``normalize`` is a *marker* — the
/255 + mean/std arithmetic runs fused on device (engine/steps.device_preprocess),
as does mixup. A pipeline compiled by ``create_aug_transforms`` is a callable
``PIL → PIL|ndarray`` plus the recorded normalization constants.

Pipelines are *data* (rebuilt from config at any epoch), so the reference's
hot-swap strategies (warmup val-augments, aug weakening, progressive resize —
dataset/dataprocessor.py:30-39, vision_engine.py:181-222) are cheap host-side
re-compiles of this spec with the device stage untouched.
"""

from __future__ import annotations

import random
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

from visiondk_tpu.registry import Registry

AUG_METHODS = Registry("augment")

# ---------------------------------------------------------------- determinism
# Augmentations draw randomness from a thread-local RNG seeded per sample by
# the DataLoader (seed, epoch, index) — reproducible batches regardless of
# which worker thread handles which sample. (The reference inherits torch's
# per-worker seeding; with thread workers the global `random` would race.)

import threading
import zlib

_TLS = threading.local()


def rng():
    """The current thread's seeded Random (global `random` if unseeded)."""
    return getattr(_TLS, "rng", random)


def np_rng():
    g = getattr(_TLS, "np_rng", None)
    return g if g is not None else np.random.default_rng()


def seed_sample(*parts) -> None:
    """Deterministically seed this thread's RNGs from hashable parts."""
    s = zlib.crc32(repr(parts).encode())
    _TLS.rng = random.Random(s)
    _TLS.np_rng = np.random.default_rng(s)

# Transforms that alter spatial geometry — the set progressive learning and
# GradCAM replay care about (reference transforms.py:564).
SPATIAL_TRANSFORMS = {
    "resize",
    "center_crop",
    "random_crop",
    "resize_and_padding",
    "random_crop_and_resize",
    "pad_if_need",
    "random_horizonflip",
    "random_verticalflip",
    "random_double_flip",
    "random_rotate",
}


class Transform:
    """Base: callable with a ``name`` for pipeline introspection."""

    name = "transform"

    def __call__(self, img):
        raise NotImplementedError

    def __repr__(self):
        return f"{self.__class__.__name__}()"


class Compose(Transform):
    name = "compose"

    def __init__(self, transforms: Sequence[Callable]):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"


class RandomChoice(Transform):
    name = "random_choice"

    def __init__(self, transforms: Sequence[Callable], p: Optional[Sequence[float]] = None):
        self.transforms = list(transforms)
        self.p = list(p) if p is not None else None

    def __call__(self, img):
        t = rng().choices(self.transforms, weights=self.p, k=1)[0]
        return t(img)


def _to_pil(img) -> Image.Image:
    if isinstance(img, Image.Image):
        return img
    return Image.fromarray(np.asarray(img))


# ---------------------------------------------------------------- geometry


@AUG_METHODS.register(name="resize")
class Resize(Transform):
    name = "resize"

    def __init__(self, size: Union[int, Sequence[int]]):
        self.size = size

    def __call__(self, img):
        img = _to_pil(img)
        if isinstance(self.size, int):
            w, h = img.size
            if w < h:
                return img.resize((self.size, int(self.size * h / w)), Image.BILINEAR)
            return img.resize((int(self.size * w / h), self.size), Image.BILINEAR)
        return img.resize((self.size[1], self.size[0]), Image.BILINEAR)


@AUG_METHODS.register(name="center_crop")
class CenterCrop(Transform):
    name = "center_crop"

    def __init__(self, size: Union[int, Sequence[int]]):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        img = _to_pil(img)
        w, h = img.size
        th, tw = self.size
        left = max((w - tw) // 2, 0)
        top = max((h - th) // 2, 0)
        return img.crop((left, top, left + tw, top + th))


@AUG_METHODS.register(name="random_crop")
class RandomCrop(Transform):
    name = "random_crop"

    def __init__(self, size: Union[int, Sequence[int]]):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        img = _to_pil(img)
        w, h = img.size
        th, tw = self.size
        if w == tw and h == th:
            return img
        left = rng().randint(0, max(w - tw, 0))
        top = rng().randint(0, max(h - th, 0))
        return img.crop((left, top, left + tw, top + th))


@AUG_METHODS.register(name="resize_and_padding")
class ResizeAndPadding2Square(Transform):
    """Letterbox: resize longest side to ``size``, pad short side to square
    (reference transforms.py:325-388). ``training=False`` records padding for
    exact inversion (CAM un-letterboxing)."""

    name = "resize_and_padding"

    def __init__(self, size: int, training: bool = True):
        self.size = size
        self.training = training
        self.last_pad = (0, 0)  # (pad_w, pad_h) for reverse

    def __call__(self, img):
        img = _to_pil(img)
        w, h = img.size
        scale = self.size / max(w, h)
        nw, nh = max(int(round(w * scale)), 1), max(int(round(h * scale)), 1)
        img = img.resize((nw, nh), Image.BILINEAR)
        pad_w, pad_h = self.size - nw, self.size - nh
        self.last_pad = (pad_w, pad_h)
        if pad_w == 0 and pad_h == 0:
            return img
        canvas = Image.new(img.mode, (self.size, self.size), 0)
        canvas.paste(img, (pad_w // 2, pad_h // 2))
        return canvas

    def reverse(self, arr: np.ndarray, orig_size: Tuple[int, int]) -> np.ndarray:
        """Undo letterbox on an HxW (heatmap) array back to original size."""
        pad_w, pad_h = self.last_pad
        h, w = arr.shape[:2]
        arr = arr[pad_h // 2 : h - (pad_h - pad_h // 2), pad_w // 2 : w - (pad_w - pad_w // 2)]
        img = Image.fromarray((arr * 255).astype(np.uint8) if arr.dtype != np.uint8 else arr)
        img = img.resize(orig_size, Image.BILINEAR)
        return np.asarray(img)


@AUG_METHODS.register(name="random_crop_and_resize")
class RandomResizedCrop(Transform):
    """RandomResizedCrop with the reference's aspect-ratio guard: images with
    AR > 1.5 fall back to letterbox (transforms.py:390-400)."""

    name = "random_crop_and_resize"

    def __init__(self, size: int, scale: Sequence[float] = (0.08, 1.0), ratio: Sequence[float] = (3 / 4, 4 / 3)):
        self.size = size
        self.scale = tuple(scale)
        self.ratio = tuple(ratio)
        self.resize_and_padding = ResizeAndPadding2Square(size, training=True)

    def __call__(self, img):
        img = _to_pil(img)
        w, h = img.size
        ar = max(w, h) / max(min(w, h), 1)
        if ar > 1.5:
            return self.resize_and_padding(img)
        area = w * h
        for _ in range(10):
            target_area = area * rng().uniform(*self.scale)
            log_ratio = (np.log(self.ratio[0]), np.log(self.ratio[1]))
            aspect = float(np.exp(rng().uniform(*log_ratio)))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = rng().randint(0, w - cw)
                top = rng().randint(0, h - ch)
                img2 = img.crop((left, top, left + cw, top + ch))
                return img2.resize((self.size, self.size), Image.BILINEAR)
        return CenterCrop(min(w, h))(img).resize((self.size, self.size), Image.BILINEAR)


@AUG_METHODS.register(name="pad_if_need")
class PadIfNeed(Transform):
    name = "pad_if_need"

    def __init__(self, size: Union[int, Sequence[int]], fill: int = 0):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.fill = fill

    def __call__(self, img):
        img = _to_pil(img)
        w, h = img.size
        th, tw = self.size
        pad_w, pad_h = max(tw - w, 0), max(th - h, 0)
        if pad_w == 0 and pad_h == 0:
            return img
        canvas = Image.new(img.mode, (max(w, tw), max(h, th)), self.fill)
        canvas.paste(img, (pad_w // 2, pad_h // 2))
        return canvas


@AUG_METHODS.register(name="random_horizonflip")
class RandomHorizontalFlip(Transform):
    name = "random_horizonflip"

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img):
        if rng().random() < self.p:
            return _to_pil(img).transpose(Image.FLIP_LEFT_RIGHT)
        return _to_pil(img)


@AUG_METHODS.register(name="random_verticalflip")
class RandomVerticalFlip(Transform):
    name = "random_verticalflip"

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img):
        if rng().random() < self.p:
            return _to_pil(img).transpose(Image.FLIP_TOP_BOTTOM)
        return _to_pil(img)


@AUG_METHODS.register(name="random_double_flip")
class RandomDoubleFlip(Transform):
    """Random H then random V flip (reference transforms.py:316-323)."""

    name = "random_double_flip"

    def __init__(self, p: float = 0.5):
        self.h = RandomHorizontalFlip(p)
        self.v = RandomVerticalFlip(p)

    def __call__(self, img):
        return self.v(self.h(img))


@AUG_METHODS.register(name="random_rotate")
class RandomRotate(Transform):
    name = "random_rotate"

    def __init__(self, degrees: float = 10.0, expand: bool = False):
        self.degrees = degrees
        self.expand = expand

    def __call__(self, img):
        angle = rng().uniform(-self.degrees, self.degrees)
        return _to_pil(img).rotate(angle, Image.BILINEAR, expand=self.expand)


# ---------------------------------------------------------------- photometric


@AUG_METHODS.register(name="random_color_jitter")
class RandomColorJitter(Transform):
    name = "random_color_jitter"

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0, p: float = 1.0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p = p

    @staticmethod
    def _factor(v):
        return rng().uniform(max(0.0, 1.0 - v), 1.0 + v)

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() > self.p:
            return img
        ops = []
        if self.brightness:
            ops.append(lambda im: ImageEnhance.Brightness(im).enhance(self._factor(self.brightness)))
        if self.contrast:
            ops.append(lambda im: ImageEnhance.Contrast(im).enhance(self._factor(self.contrast)))
        if self.saturation:
            ops.append(lambda im: ImageEnhance.Color(im).enhance(self._factor(self.saturation)))
        if self.hue:
            def _hue(im):
                h = rng().uniform(-self.hue, self.hue)
                hsv = np.array(im.convert("HSV"), dtype=np.int16)
                hsv[..., 0] = (hsv[..., 0] + int(h * 255)) % 256
                return Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
            ops.append(_hue)
        rng().shuffle(ops)
        for op in ops:
            img = op(img)
        return img


@AUG_METHODS.register(name="random_gaussianblur")
class RandomGaussianBlur(Transform):
    name = "random_gaussianblur"

    def __init__(self, kernel_size: int = 5, p: float = 0.5):
        self.radius = max(kernel_size // 2, 1)
        self.p = p

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() < self.p:
            return img.filter(ImageFilter.GaussianBlur(radius=rng().uniform(0.1, self.radius)))
        return img


@AUG_METHODS.register(name="random_autocontrast")
class RandomAutocontrast(Transform):
    name = "random_autocontrast"

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img):
        img = _to_pil(img)
        return ImageOps.autocontrast(img) if rng().random() < self.p else img


@AUG_METHODS.register(name="random_adjustsharpness")
class RandomAdjustSharpness(Transform):
    name = "random_adjustsharpness"

    def __init__(self, sharpness_factor: float = 2.0, p: float = 0.5):
        self.factor = sharpness_factor
        self.p = p

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() < self.p:
            return ImageEnhance.Sharpness(img).enhance(self.factor)
        return img


@AUG_METHODS.register(name="random_equalize")
class RandomEqualize(Transform):
    name = "random_equalize"

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img):
        img = _to_pil(img)
        return ImageOps.equalize(img) if rng().random() < self.p else img


@AUG_METHODS.register(name="random_grayscale")
class RandomGrayscale(Transform):
    name = "random_grayscale"

    def __init__(self, p: float = 0.1):
        self.p = p

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() < self.p:
            return img.convert("L").convert("RGB")
        return img


@AUG_METHODS.register(name="random_augmix")
class RandomAugMix(Transform):
    """AugMix-style mixing of short augmentation chains (severity-scaled),
    matching the reference's use of torchvision AugMix at a given severity."""

    name = "random_augmix"

    def __init__(self, severity: int = 3, width: int = 3, alpha: float = 1.0):
        self.severity = severity
        self.width = width
        self.alpha = alpha

    def _op(self, img):
        s = self.severity
        choice = rng().randrange(6)
        if choice == 0:
            return ImageOps.autocontrast(img)
        if choice == 1:
            return ImageOps.equalize(img)
        if choice == 2:
            return ImageOps.posterize(img, max(8 - s, 1))
        if choice == 3:
            return img.rotate(rng().uniform(-3 * s, 3 * s), Image.BILINEAR)
        if choice == 4:
            return ImageOps.solarize(img, 256 - 26 * s)
        return ImageEnhance.Sharpness(img).enhance(rng().uniform(0.1, 1.9))

    def __call__(self, img):
        img = _to_pil(img)
        ws = np_rng().dirichlet([self.alpha] * self.width)
        m = np_rng().beta(self.alpha, self.alpha)
        mix = np.zeros(np.array(img).shape, dtype=np.float32)
        for i in range(self.width):
            aug = img
            for _ in range(rng().randint(1, 3)):
                aug = self._op(aug)
            mix += ws[i] * np.asarray(aug, dtype=np.float32)
        out = (1 - m) * np.asarray(img, dtype=np.float32) + m * mix
        return Image.fromarray(np.clip(out, 0, 255).astype(np.uint8))


# ---------------------------------------------------------------- occlusion


@AUG_METHODS.register(name="random_cutout")
class Cutout(Transform):
    """n_holes square cutouts filled with a random value in ``color`` range,
    each applied with prob (reference transforms.py:63-109)."""

    name = "random_cutout"

    def __init__(self, n_holes: int = 1, length: int = 16, prob: float = 0.5, color=(0, 255)):
        self.n_holes = n_holes
        self.length = length
        self.prob = prob
        self.color = color

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() > self.prob:
            return img
        arr = np.array(img)
        h, w = arr.shape[:2]
        for _ in range(self.n_holes):
            y, x = rng().randint(0, h - 1), rng().randint(0, w - 1)
            y1, y2 = max(y - self.length // 2, 0), min(y + self.length // 2, h)
            x1, x2 = max(x - self.length // 2, 0), min(x + self.length // 2, w)
            arr[y1:y2, x1:x2] = rng().randint(self.color[0], self.color[1])
        return Image.fromarray(arr)


@AUG_METHODS.register(name="random_cutaddnoise")
class CutAddNoise(Transform):
    """Paste uniform-noise patches (reference transforms.py:111-162)."""

    name = "random_cutaddnoise"

    def __init__(self, n_holes: int = 1, length: int = 16, prob: float = 0.5):
        self.n_holes = n_holes
        self.length = length
        self.prob = prob

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() > self.prob:
            return img
        arr = np.array(img)
        h, w = arr.shape[:2]
        for _ in range(self.n_holes):
            y, x = rng().randint(0, h - 1), rng().randint(0, w - 1)
            y1, y2 = max(y - self.length // 2, 0), min(y + self.length // 2, h)
            x1, x2 = max(x - self.length // 2, 0), min(x + self.length // 2, w)
            noise = np_rng().integers(0, 256, size=arr[y1:y2, x1:x2].shape, dtype=np.uint8)
            arr[y1:y2, x1:x2] = noise
        return Image.fromarray(arr)


@AUG_METHODS.register(name="random_localgaussian")
class LocalGaussian(Transform):
    """Blur a random local patch (reference transforms.py:248-314 uses
    seamlessClone; here: blend a blurred crop back in)."""

    name = "random_localgaussian"

    def __init__(self, radius: int = 4, length: int = 32, prob: float = 0.5):
        self.radius = radius
        self.length = length
        self.prob = prob

    def __call__(self, img):
        img = _to_pil(img)
        if rng().random() > self.prob:
            return img
        w, h = img.size
        x = rng().randint(0, max(w - self.length, 0))
        y = rng().randint(0, max(h - self.length, 0))
        box = (x, y, min(x + self.length, w), min(y + self.length, h))
        patch = img.crop(box).filter(ImageFilter.GaussianBlur(self.radius))
        img = img.copy()
        img.paste(patch, box)
        return img


# ---------------------------------------------------------------- terminal markers


@AUG_METHODS.register(name="to_tensor")
class ToTensor(Transform):
    """PIL → HWC uint8 ndarray. (The /255 conversion happens on device.)"""

    name = "to_tensor"

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, img):
        arr = np.asarray(_to_pil(img).convert("RGB"), dtype=np.uint8)
        return arr


@AUG_METHODS.register(name="normalize")
class Normalize(Transform):
    """Marker: records mean/std for the fused device preprocessing stage.
    Host pass-through."""

    name = "normalize"

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        self.mean = tuple(mean)
        self.std = tuple(std)

    def __call__(self, img):
        return img


# ---------------------------------------------------------------- compiler


def _build_one(name: str, params: Any) -> Callable:
    if name == "random_choice":
        inner = [
            _build_one(*next(iter(t.items()))) for t in params["transforms"]
        ]
        return RandomChoice(inner, p=params.get("p"))
    if params in (None, "no_params"):
        return AUG_METHODS.create(name)
    if isinstance(params, dict):
        return AUG_METHODS.create(name, **params)
    if isinstance(params, (list, tuple)):
        return AUG_METHODS.create(name, *params)
    return AUG_METHODS.create(name, params)


def create_aug_transforms(augment_cfg: List[Dict[str, Any]]) -> Compose:
    """Compile the nested YAML augment spec (incl. nested random_choice trees)
    into a Compose (reference create_AugTransforms, transforms.py:530-557)."""
    out = []
    for item in augment_cfg or []:
        if isinstance(item, str):
            out.append(_build_one(item, None))
        else:
            (name, params), = item.items()
            out.append(_build_one(name, params))
    return Compose(out)


def extract_normalization(pipeline: Compose) -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Find the Normalize marker's constants (identity if absent)."""
    for t in pipeline.transforms:
        if isinstance(t, Normalize):
            return t.mean, t.std
        if isinstance(t, RandomChoice):
            for inner in t.transforms:
                if isinstance(inner, Normalize):
                    return inner.mean, inner.std
    return (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)


def is_plain_letterbox(pipeline: Compose) -> Optional[int]:
    """If the pipeline is deterministic letterbox-to-square (+ to_tensor /
    normalize markers only), return its size — the native C++ decode path can
    then take over the whole host stage. Otherwise None."""
    size = None
    for t in getattr(pipeline, "transforms", []):
        if isinstance(t, ResizeAndPadding2Square):
            size = t.size
        elif isinstance(t, (ToTensor, Normalize)):
            continue
        else:
            return None
    return size


def set_pipeline_size(pipeline: Compose, size: int) -> Compose:
    """Progressive learning: rewrite all spatial sizes in a compiled pipeline
    (reference auto_prog/create_AugSequence, vision_engine.py:181-222)."""

    def _walk(ts):
        for t in ts:
            if isinstance(t, (RandomChoice, Compose)):
                _walk(t.transforms)
            elif isinstance(t, (Resize, ResizeAndPadding2Square, RandomResizedCrop)):
                t.size = size
                if isinstance(t, RandomResizedCrop):
                    t.resize_and_padding.size = size
            elif isinstance(t, (CenterCrop, RandomCrop, PadIfNeed)):
                t.size = (size, size)

    _walk(pipeline.transforms)
    return pipeline
