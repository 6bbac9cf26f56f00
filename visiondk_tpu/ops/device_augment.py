"""Device-side (jitted) randomized augmentation stage.

The reference runs every per-pixel augmentation in host PIL inside the torch
DataLoader workers (reference dataset/transforms.py:63-162, 248-314, 403-528).
On TPU the host is the bottleneck (BASELINE.md "pipeline-fed train"), so this
module moves the randomized per-pixel work onto the chip: the host keeps
decode + geometry-to-static-size only, and a single jitted batch function —
keyed by ``fold_in(rng, step)`` and fused ahead of normalize in
``engine/steps.make_train_step`` — applies flips, color jitter, cutout, blur,
RandAugment, AugMix, ... on the uint8 batch.

Semantics contract (tested in tests/test_device_augment.py):

- Each op reproduces its host/PIL counterpart's *math* given the same draw
  (PIL integer luma, Blend truncation, autocontrast/equalize LUTs, HSV
  round-trip, inverse-affine sampling) to ±1 LSB on ≥99% of pixels.
- ``split_device_pipeline`` LIFTS photometric/occlusion/flip ops past the
  final host geometry stage: in the reference pipeline order they run on the
  variable-size decoded image, here they run on the post-resize batch. This
  is a distribution-level equivalence, not per-sample equality — pixel-length
  parameters (cutout ``length``) now count post-resize pixels, which is
  arguably better defined (the reference's effective hole size varies with
  the source image resolution). Lifting is opt-out via
  ``data.train.device_augment: false``.
- PIL quantizes to uint8 after every op; device ops do the same (each op
  returns integral f32 values in [0, 255]).

Every op is a sample-level ``(key, img_f32[H,W,C]) -> img_f32`` closure;
``make_device_augment`` vmaps the chain over the batch with split keys. All
ops are elementwise/per-sample, so the stage shards trivially over the
``data`` mesh axis inside the sharded train step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
SampleFn = Callable[[Array, Array], Array]  # (key, img f32 [H,W,C]) -> img


# =============================================================== PIL primitives


def _pil_luma(img: Array) -> Array:
    """PIL RGB→L: (19595·R + 38470·G + 7471·B + 0x8000) >> 16 (exact in f32:
    every partial sum < 2^24)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return jnp.floor((19595.0 * r + 38470.0 * g + 7471.0 * b + 32768.0) / 65536.0)


def _blend(degenerate: Array, img: Array, factor: Array) -> Array:
    """PIL Image.blend / ImageEnhance: out = d + factor·(img−d), truncated to
    uint8 (Blend.c casts the float straight to UINT8) and clipped."""
    out = degenerate + factor * (img - degenerate)
    return jnp.clip(jnp.floor(out), 0.0, 255.0)


def adjust_brightness(img: Array, factor: Array) -> Array:
    """ImageEnhance.Brightness: blend with black."""
    return _blend(jnp.zeros_like(img), img, factor)


def adjust_saturation(img: Array, factor: Array) -> Array:
    """ImageEnhance.Color: blend with L-grayscale."""
    gray = jnp.broadcast_to(_pil_luma(img)[..., None], img.shape)
    return _blend(gray, img, factor)


def adjust_contrast(img: Array, factor: Array) -> Array:
    """ImageEnhance.Contrast: blend with solid int(mean(L)+0.5) gray."""
    lum = _pil_luma(img)
    # integer-exact sum (f32 accumulates exactly only below 2^24)
    total = jnp.sum(lum.astype(jnp.int32))
    n = lum.size
    mean = jnp.floor(total.astype(jnp.float32) / n + 0.5)
    return _blend(jnp.full_like(img, mean), img, factor)


_SMOOTH_KERNEL = np.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0


def _filter3x3(img: Array, kernel: np.ndarray) -> Array:
    """PIL ImageFilter 3×3: float accumulate, round-half-up, clip — and the
    1-pixel border is copied from the source unfiltered."""
    k = jnp.asarray(kernel, jnp.float32)
    # [H,W,C] -> NCHW conv with SAME padding
    x = img.transpose(2, 0, 1)[:, None]  # [C,1,H,W]
    w = k[None, None]  # [1,1,3,3]
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME")[:, 0].transpose(1, 2, 0)
    y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
    h, wd = img.shape[:2]
    row = jnp.arange(h)[:, None, None]
    col = jnp.arange(wd)[None, :, None]
    border = (row == 0) | (row == h - 1) | (col == 0) | (col == wd - 1)
    return jnp.where(border, img, y)


def adjust_sharpness(img: Array, factor: Array) -> Array:
    """ImageEnhance.Sharpness: blend with SMOOTH-filtered degenerate."""
    return _blend(_filter3x3(img, _SMOOTH_KERNEL), img, factor)


def autocontrast(img: Array) -> Array:
    """ImageOps.autocontrast(cutoff=0): per-channel lut stretching [lo,hi] to
    [0,255]; identity when hi ≤ lo."""
    lo = jnp.min(img, axis=(0, 1))  # [C]
    hi = jnp.max(img, axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
    out = jnp.floor(img * scale - lo * scale)  # PIL: int(ix*scale + offset)
    out = jnp.clip(out, 0.0, 255.0)
    return jnp.where(hi > lo, out, img)


def equalize(img: Array) -> Array:
    """ImageOps.equalize: per-channel histogram lut
    ``lut[i] = (step//2 + Σ_{j<i} h[j]) // step`` with
    ``step = (N − h[last_present]) // 255``; identity when step == 0 or only
    one value present."""

    def one(ch: Array) -> Array:
        v = ch.astype(jnp.int32).reshape(-1)
        hist = jnp.zeros((256,), jnp.int32).at[v].add(1)
        present = hist > 0
        hi = jnp.max(jnp.where(present, jnp.arange(256), -1))
        n_values = jnp.sum(present.astype(jnp.int32))
        step = (v.size - hist[hi]) // 255
        csum = jnp.cumsum(hist) - hist  # exclusive
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        out = lut[v].reshape(ch.shape).astype(jnp.float32)
        return jnp.where((step > 0) & (n_values > 1), out, ch)

    return jnp.stack([one(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def posterize(img: Array, bits: int) -> Array:
    mask = ~(2 ** (8 - int(bits)) - 1) & 0xFF
    return (img.astype(jnp.int32) & mask).astype(jnp.float32)


def solarize(img: Array, threshold: Array) -> Array:
    return jnp.where(img >= threshold, 255.0 - img, img)


def invert(img: Array) -> Array:
    return 255.0 - img


def grayscale(img: Array) -> Array:
    return jnp.broadcast_to(_pil_luma(img)[..., None], img.shape)


# -------------------------------------------------------------------- HSV / hue


def _rgb_to_hsv(img: Array) -> Tuple[Array, Array, Array]:
    """PIL Convert.c rgb2hsv (uint8 H/S/V): float ratios, (int) truncation."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.maximum(r, jnp.maximum(g, b))
    minc = jnp.minimum(r, jnp.minimum(g, b))
    v = maxc
    cr = jnp.maximum(maxc - minc, 1e-12)
    s = (maxc - minc) / jnp.maximum(maxc, 1e-12)
    rc = (maxc - r) / cr
    gc = (maxc - g) / cr
    bc = (maxc - b) / cr
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.mod(h / 6.0 + 1.0, 1.0)
    uh = jnp.clip(jnp.floor(h * 255.0), 0.0, 255.0)
    us = jnp.clip(jnp.floor(s * 255.0), 0.0, 255.0)
    gray = maxc == minc
    return jnp.where(gray, 0.0, uh), jnp.where(gray, 0.0, us), v


def _hsv_to_rgb(uh: Array, us: Array, uv: Array) -> Array:
    """PIL Convert.c hsv2rgb: fh = h/255·6, i = floor(fh), p/q/t rounded
    half-up."""
    fh = uh / 255.0 * 6.0
    i = jnp.floor(fh)
    f = fh - i
    fs = us / 255.0
    p = jnp.clip(jnp.floor(uv * (1.0 - fs) + 0.5), 0.0, 255.0)
    q = jnp.clip(jnp.floor(uv * (1.0 - fs * f) + 0.5), 0.0, 255.0)
    t = jnp.clip(jnp.floor(uv * (1.0 - fs * (1.0 - f)) + 0.5), 0.0, 255.0)
    idx = jnp.mod(i, 6.0)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [uv, q, p, p, t], uv)
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [t, uv, uv, q, p], p)
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4], [p, p, t, uv, uv], q)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.where(us[..., None] == 0, uv[..., None] * jnp.ones_like(rgb), rgb)


def adjust_hue(img: Array, shift_frac: Array) -> Array:
    """Host RandomColorJitter hue op (data/transforms.py): PIL HSV round-trip
    with ``H = (H + int(h·255)) % 256`` on int16 values."""
    uh, us, uv = _rgb_to_hsv(img)
    shift = jnp.trunc(shift_frac * 255.0)  # python int() truncates toward 0
    uh = jnp.mod(uh + shift, 256.0)
    return _hsv_to_rgb(uh, us, uv)


# ------------------------------------------------------------------- geometry


def flip_h(img: Array) -> Array:
    return img[:, ::-1]


def flip_v(img: Array) -> Array:
    return img[::-1]


def _reflect_index(i: Array, n: int) -> Array:
    """torchvision 'reflect' padding index (mirror without edge repeat)."""
    i = jnp.abs(i)
    return jnp.where(i >= n, 2 * (n - 1) - i, i)


def gaussian_blur(img: Array, sigma: Array, kernel_size: int) -> Array:
    """torchvision GaussianBlur math (the reference wraps
    T.GaussianBlur(kernel_size, sigma), dataset/transforms.py:511-513):
    truncated normalized gaussian kernel, separable, reflect padding.
    ``sigma`` is traced (per-sample); the kernel is built in-graph."""
    k = int(kernel_size)
    half = k // 2
    d = jnp.arange(-half, half + 1, dtype=jnp.float32)
    kern = jnp.exp(-0.5 * jnp.square(d / jnp.maximum(sigma, 1e-12)))
    kern = kern / jnp.sum(kern)

    def conv_axis(x: Array, axis: int) -> Array:
        n = x.shape[axis]
        idx = _reflect_index(jnp.arange(n)[:, None] + jnp.arange(-half, half + 1)[None, :], n)
        shifted = jnp.take(x, idx, axis=axis)  # [..., n, k, ...]
        return jnp.tensordot(shifted, kern, axes=([axis + 1], [0]))

    out = conv_axis(conv_axis(img, 0), 1)
    # torchvision runs on float then rounds back to uint8 on conversion
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)


def affine_transform(
    img: Array,
    matrix: Sequence[Array],
    interpolation: str = "bilinear",
    fill: float = 0.0,
) -> Array:
    """PIL Image.transform(AFFINE) sampling: the output→input ``matrix``
    (a,b,c,d,e,f) is evaluated at output centers (x+0.5, y+0.5); bilinear
    samples at (xin−0.5, yin−0.5) with ``fill`` outside; nearest truncates."""
    h, w = img.shape[:2]
    a, b, c, d, e, f = [jnp.asarray(m, jnp.float32) for m in matrix]
    ys, xs = jnp.mgrid[0:h, 0:w]
    xx = xs.astype(jnp.float32) + 0.5
    yy = ys.astype(jnp.float32) + 0.5
    xin = a * xx + b * yy + c
    yin = d * xx + e * yy + f
    inside = (xin >= 0) & (xin < w) & (yin >= 0) & (yin < h)
    if interpolation == "nearest":
        xi = jnp.clip(jnp.floor(xin), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(yin), 0, h - 1).astype(jnp.int32)
        out = img[yi, xi]
        return jnp.where(inside[..., None], out, fill)
    # bilinear at center-aligned coords; PIL clamps edge taps (BILINEAR_BODY
    # reuses the border row/col for x==-1 / x==size-1), so no tap masking —
    # the fill applies only where the pre-shift coordinate is outside
    xf = xin - 0.5
    yf = yin - 0.5
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    wx = xf - x0
    wy = yf - y0
    out = jnp.zeros_like(img)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        yi = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
        wgt = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
        out = out + wgt[..., None] * img[yi, xi]
    out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    return jnp.where(inside[..., None], out, fill)


def affine_transform_group(
    imgs: Array,
    matrix: Sequence[Array],
    interpolation: str = "bilinear",
    fill: float = 0.0,
) -> Array:
    """``affine_transform`` for a group [N,H,W,C] with one SHARED matrix.

    Why it exists: the per-sample form's ``img[yi, xi]`` is a per-pixel 2D
    gather, which the TPU executes element-at-a-time — measured **250 ms per
    bs-128 batch** for one rotate at 224px (benchmarks/device_aug_micro.py).
    With a group-shared matrix the taps are identical across the group, so
    the batch+channel dims ride the gather's contiguous minor dimension
    ([H·W, N·C] rows): same PIL sampling math, ~2 orders of magnitude fewer
    index operations."""
    n, h, w, c = imgs.shape
    a, b, c0, d, e, f = [jnp.asarray(m, jnp.float32) for m in matrix]
    ys, xs = jnp.mgrid[0:h, 0:w]
    xx = xs.astype(jnp.float32) + 0.5
    yy = ys.astype(jnp.float32) + 0.5
    xin = a * xx + b * yy + c0
    yin = d * xx + e * yy + f
    inside = (xin >= 0) & (xin < w) & (yin >= 0) & (yin < h)
    flat = imgs.transpose(1, 2, 0, 3).reshape(h * w, n * c)

    def tap(yi: Array, xi: Array) -> Array:
        return jnp.take(flat, (yi * w + xi).reshape(-1), axis=0)  # [HW, N·C]

    if interpolation == "nearest":
        xi = jnp.clip(jnp.floor(xin), 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(jnp.floor(yin), 0, h - 1).astype(jnp.int32)
        out = tap(yi, xi)
    else:
        xf = xin - 0.5
        yf = yin - 0.5
        x0 = jnp.floor(xf)
        y0 = jnp.floor(yf)
        wx = xf - x0
        wy = yf - y0
        out = jnp.zeros((h * w, n * c), imgs.dtype)
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            yi = jnp.clip(y0 + dy, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(x0 + dx, 0, w - 1).astype(jnp.int32)
            wgt = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
            out = out + wgt.reshape(-1, 1) * tap(yi, xi)
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
    out = out.reshape(h, w, n, c).transpose(2, 0, 1, 3)
    return jnp.where(inside[None, ..., None], out, fill)


def rotate_group(imgs: Array, angle: Array, interpolation: str = "bilinear") -> Array:
    """``rotate`` for a group with one shared angle (see affine_transform_group)."""
    m = inverse_affine_matrix(imgs.shape[1:3], -jnp.asarray(angle, jnp.float32))
    return affine_transform_group(imgs, m, interpolation)


def inverse_affine_matrix(
    size: Tuple[int, int],
    angle: Array,
    translate: Tuple[Array, Array] = (0.0, 0.0),
    scale: Array = 1.0,
    shear: Tuple[Array, Array] = (0.0, 0.0),
    center: Optional[Tuple[float, float]] = None,
) -> List[Array]:
    """jnp version of transforms._inverse_affine_matrix (torchvision math):
    output→input coefficients for rotation about ``center`` + translate +
    scale + shear. Angles in degrees; all params may be traced."""
    h, w = size
    cx, cy = center if center is not None else (w * 0.5, h * 0.5)
    rot = jnp.deg2rad(jnp.asarray(angle, jnp.float32))
    sx = jnp.deg2rad(jnp.asarray(shear[0], jnp.float32))
    sy = jnp.deg2rad(jnp.asarray(shear[1], jnp.float32))
    tx = jnp.asarray(translate[0], jnp.float32)
    ty = jnp.asarray(translate[1], jnp.float32)
    scale = jnp.asarray(scale, jnp.float32)

    a = jnp.cos(rot - sy) / jnp.cos(sy)
    b = -jnp.cos(rot - sy) * jnp.tan(sx) / jnp.cos(sy) - jnp.sin(rot)
    c = jnp.sin(rot - sy) / jnp.cos(sy)
    d = -jnp.sin(rot - sy) * jnp.tan(sx) / jnp.cos(sy) + jnp.cos(rot)

    m = [d / scale, -b / scale, jnp.float32(0.0), -c / scale, a / scale, jnp.float32(0.0)]
    m[2] = m[2] + m[0] * (-cx - tx) + m[1] * (-cy - ty) + cx
    m[5] = m[5] + m[3] * (-cx - tx) + m[4] * (-cy - ty) + cy
    return m


def rotate(img: Array, angle: Array, interpolation: str = "bilinear") -> Array:
    """PIL Image.rotate(angle, expand=False): CCW rotation about the center.
    PIL/torchvision rotate is the NEGATED angle in the inverse-affine
    convention (torchvision F.rotate passes -angle to
    _get_inverse_affine_matrix)."""
    m = inverse_affine_matrix(img.shape[:2], -jnp.asarray(angle, jnp.float32))
    return affine_transform(img, m, interpolation)


def cutout_holes(
    img: Array,
    centers_yx: Array,  # [n, 2] f32
    hole_h: Array,
    hole_w: Array,
    colors: Array,  # [n, C] f32
    length: int,
) -> Array:
    """Host Cutout geometry (data/transforms.py Cutout, reference
    transforms.py:63-109): top-left = max(0, center − length//2), region
    [y1:y1+hole_h, x1:x1+hole_w] painted a solid color (far edge clips)."""
    h, w = img.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    out = img
    for i in range(centers_yx.shape[0]):
        y1 = jnp.maximum(centers_yx[i, 0] - length // 2, 0.0)
        x1 = jnp.maximum(centers_yx[i, 1] - length // 2, 0.0)
        mask = (ys >= y1) & (ys < y1 + hole_h) & (xs >= x1) & (xs < x1 + hole_w)
        out = jnp.where(mask[..., None], colors[i], out)
    return out


def random_crop_static(img: Array, key: Array, th: int, tw: int) -> Array:
    """Uniform-offset crop to a static (th, tw) via dynamic_slice."""
    h, w = img.shape[:2]
    ky, kx = jax.random.split(key)
    top = jax.random.randint(ky, (), 0, max(h - th, 0) + 1)
    left = jax.random.randint(kx, (), 0, max(w - tw, 0) + 1)
    return jax.lax.dynamic_slice(img, (top, left, 0), (th, tw, img.shape[2]))


# ============================================================= op compilation
#
# Each compiler takes the YAML params of the same-named registry transform
# (data/transforms.py) and returns a sample-level (key, img) -> img closure.


def _gate(p: float, fn: SampleFn) -> SampleFn:
    """Apply ``fn`` with probability ``p`` (host ops gate on rng().random())."""
    if p >= 1.0:
        return fn

    def wrapped(key, img):
        kg, kf = jax.random.split(key)
        return jnp.where(jax.random.uniform(kg) < p, fn(kf, img), img)

    return wrapped


def _c_random_horizonflip(p: float = 0.5) -> SampleFn:
    return _gate(float(p), lambda key, img: flip_h(img))


def _c_random_verticalflip(p: float = 0.5) -> SampleFn:
    return _gate(float(p), lambda key, img: flip_v(img))


def _c_random_double_flip(p: float = 0.5) -> SampleFn:
    hf = _c_random_horizonflip(p)
    vf = _c_random_verticalflip(p)

    def fn(key, img):
        k1, k2 = jax.random.split(key)
        return vf(k2, hf(k1, img))

    return fn


def _c_random_doubleflip(prob=0.5) -> SampleFn:
    """Reference choose-one semantics: pick vflip(0.5) or hflip(0.5)."""
    p = tuple(prob) if isinstance(prob, (list, tuple)) else (prob, prob)
    w = jnp.asarray(p, jnp.float32)

    def fn(key, img):
        kc, kf = jax.random.split(key)
        idx = jax.random.choice(kc, 2, p=w / jnp.sum(w))
        do = jax.random.uniform(kf) < 0.5
        flipped = jnp.where(idx == 0, flip_v(img), flip_h(img))
        return jnp.where(do, flipped, img)

    return fn


def _c_random_invert(p: float = 0.5) -> SampleFn:
    return _gate(float(p), lambda key, img: invert(img))


def _c_random_grayscale(p: float = 0.1) -> SampleFn:
    return _gate(float(p), lambda key, img: grayscale(img))


def _c_random_autocontrast(p: float = 0.5) -> SampleFn:
    return _gate(float(p), lambda key, img: autocontrast(img))


def _c_random_equalize(p: float = 0.5) -> SampleFn:
    return _gate(float(p), lambda key, img: equalize(img))


def _c_random_adjustsharpness(sharpness_factor: float = 2.0, p: float = 0.5) -> SampleFn:
    f = float(sharpness_factor)
    return _gate(float(p), lambda key, img: adjust_sharpness(img, f))


def _c_color_jitter_core(brightness, contrast, saturation, hue) -> SampleFn:
    """Shared body of [random_]color_jitter: factor ~ U(max(0,1−v), 1+v) per
    enabled component, applied in a random order (host shuffles its op list)."""
    enabled: List[Tuple[str, float]] = []
    for name, v in (
        ("brightness", brightness),
        ("contrast", contrast),
        ("saturation", saturation),
        ("hue", hue),
    ):
        if v:
            enabled.append((name, float(v)))
    if not enabled:
        return lambda key, img: img

    def make_branch(name: str, v: float):
        def branch(key, img):
            if name == "hue":
                shift = jax.random.uniform(key, minval=-v, maxval=v)
                return adjust_hue(img, shift)
            factor = jax.random.uniform(key, minval=max(0.0, 1.0 - v), maxval=1.0 + v)
            if name == "brightness":
                return adjust_brightness(img, factor)
            if name == "contrast":
                return adjust_contrast(img, factor)
            return adjust_saturation(img, factor)

        return branch

    branches = [make_branch(n, v) for n, v in enabled]

    def fn(key, img):
        kp, kf = jax.random.split(key)
        order = jax.random.permutation(kp, len(branches))
        keys = jax.random.split(kf, len(branches))
        for step in range(len(branches)):
            idx = order[step]
            img = jax.lax.switch(idx, branches, keys[step], img)
        return img

    return fn


def _c_random_color_jitter(
    brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0, p: float = 1.0,
    prob: Optional[float] = None,
) -> SampleFn:
    gate_p = float(p if prob is None else prob)
    return _gate(gate_p, _c_color_jitter_core(brightness, contrast, saturation, hue))


def _c_color_jitter(brightness=0.1, contrast=0.1, saturation=0.1, hue=0.1) -> SampleFn:
    return _c_color_jitter_core(brightness, contrast, saturation, hue)


def _c_random_gaussianblur(
    prob: float = 0.5, kernel_size: int = 3, sigma=(0.1, 2.0), p: Optional[float] = None
) -> SampleFn:
    gate_p = float(prob if p is None else p)
    k = int(kernel_size)

    def body(key, img):
        if isinstance(sigma, (list, tuple)):
            s = jax.random.uniform(key, minval=float(sigma[0]), maxval=float(sigma[1]))
        else:
            s = jnp.float32(float(sigma))
        return gaussian_blur(img, s, k)

    return _gate(gate_p, body)


def _rotate_range(degrees) -> Tuple[float, float]:
    """Normalize the YAML ``degrees`` (scalar => symmetric range) — shared by
    the per-sample and group rotate compilers so they cannot diverge."""
    if isinstance(degrees, (int, float)):
        return (-float(degrees), float(degrees))
    return (float(degrees[0]), float(degrees[1]))


def _affine_spec(degrees, translate, scale, shear, fill, center):
    """Normalize random_affine's params (torchvision conventions) once —
    shared by the per-sample and group affine compilers."""
    deg = (
        (-float(degrees), float(degrees))
        if isinstance(degrees, (int, float))
        else tuple(float(d) for d in degrees)
    )
    trans = tuple(translate) if isinstance(translate, (list, tuple)) else None
    sc = tuple(scale) if isinstance(scale, (list, tuple)) else None
    if isinstance(shear, (int, float)):
        sh = (-float(shear), float(shear), 0.0, 0.0) if shear else (0.0, 0.0, 0.0, 0.0)
    elif len(shear) == 2:
        sh = (float(shear[0]), float(shear[1]), 0.0, 0.0)
    else:
        sh = tuple(float(s) for s in shear)
    fill_v = float(fill if isinstance(fill, (int, float)) else fill[0])
    ctr = tuple(center) if center is not None else None
    return deg, trans, sc, sh, fill_v, ctr


def _draw_affine_matrix(key, h, w, deg, trans, sc, sh, ctr):
    """One random_affine parameter draw -> inverse matrix (same stream split
    in both the per-sample and group compilers)."""
    ka, kt, ks, ksh = jax.random.split(key, 4)
    angle = jax.random.uniform(ka, minval=deg[0], maxval=deg[1])
    if trans is not None:
        kx, ky = jax.random.split(kt)
        dx = jnp.floor(
            jax.random.uniform(kx, minval=-trans[0] * w, maxval=trans[0] * w) + 0.5
        )
        dy = jnp.floor(
            jax.random.uniform(ky, minval=-trans[1] * h, maxval=trans[1] * h) + 0.5
        )
    else:
        dx = dy = jnp.float32(0.0)
    scl = (
        jax.random.uniform(ks, minval=sc[0], maxval=sc[1]) if sc is not None
        else jnp.float32(1.0)
    )
    k1, k2 = jax.random.split(ksh)
    shx = jax.random.uniform(k1, minval=sh[0], maxval=sh[1])
    shy = jax.random.uniform(k2, minval=sh[2], maxval=sh[3])
    return inverse_affine_matrix((h, w), angle, (dx, dy), scl, (shx, shy), ctr)


def _c_random_rotate(degrees=10.0, expand: bool = False) -> SampleFn:
    if expand:
        raise _NotLiftable("random_rotate(expand=True) changes the output shape")
    lo, hi = _rotate_range(degrees)

    def fn(key, img):
        angle = jax.random.uniform(key, minval=lo, maxval=hi)
        return rotate(img, angle)

    return fn


def _c_random_affine(degrees=0.0, translate=0.0, scale=0.0, shear=0.0, fill=0,
                     center=None) -> SampleFn:
    deg, trans, sc, sh, fill_v, ctr = _affine_spec(
        degrees, translate, scale, shear, fill, center
    )

    def fn(key, img):
        h, w = img.shape[:2]
        m = _draw_affine_matrix(key, h, w, deg, trans, sc, sh, ctr)
        return affine_transform(img, m, "bilinear", fill_v)

    return fn


def _c_random_cutout(
    n_holes: int = 1,
    length: int = 200,
    ratio: float = 0.2,
    h_range: Optional[Sequence[int]] = None,
    w_range: Optional[Sequence[int]] = None,
    prob: float = 0.5,
    color: Sequence[int] = (0, 0),
) -> SampleFn:
    n_holes = int(n_holes)
    length = int(length)
    c_lo, c_hi = int(color[0]), int(color[1])

    def body(key, img):
        h, w = img.shape[:2]
        hr = tuple(h_range) if h_range is not None else (0, h)
        wr = tuple(w_range) if w_range is not None else (0, w)
        kw, kc, ky, kx = jax.random.split(key, 4)
        # mask width jittered once per sample (host: per __call__)
        mask_w = jnp.floor(
            jax.random.uniform(kw, minval=1.0 - ratio, maxval=1.0 + ratio) * length
        )
        # host: rng().randint(lo, hi) inclusive per channel per hole
        colors = jax.random.randint(
            kc, (n_holes, img.shape[2]), c_lo, c_hi + 1
        ).astype(jnp.float32)
        ys = jax.random.randint(ky, (n_holes,), hr[0], max(hr[1], hr[0] + 1)).astype(jnp.float32)
        xs = jax.random.randint(kx, (n_holes,), wr[0], max(wr[1], wr[0] + 1)).astype(jnp.float32)
        centers = jnp.stack([ys, xs], axis=1)
        return cutout_holes(img, centers, jnp.float32(length), mask_w, colors, length)

    return _gate(float(prob), body)


def _c_random_cutaddnoise(
    n_holes: int = 1,
    length: int = 200,
    noisy_src: Optional[str] = None,
    h_range: Optional[Sequence[int]] = None,
    w_range: Optional[Sequence[int]] = None,
    prob: float = 0.5,
) -> SampleFn:
    if noisy_src:
        raise _NotLiftable("random_cutaddnoise with noisy_src reads files (host-only)")
    n_holes = int(n_holes)
    length = int(length)

    def body(key, img):
        h, w = img.shape[:2]
        hr = tuple(h_range) if h_range is not None else (0, h)
        wr = tuple(w_range) if w_range is not None else (0, w)
        kn, ky, kx = jax.random.split(key, 3)
        noise = jax.random.randint(kn, img.shape, 0, 256).astype(jnp.float32)
        ys_ = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs_ = jnp.arange(w, dtype=jnp.float32)[None, :]
        out = img
        yc = jax.random.randint(ky, (n_holes,), hr[0], max(hr[1], hr[0] + 1))
        xc = jax.random.randint(kx, (n_holes,), wr[0], max(wr[1], wr[0] + 1))
        for i in range(n_holes):
            y1 = jnp.maximum(yc[i] - length // 2, 0).astype(jnp.float32)
            x1 = jnp.maximum(xc[i] - length // 2, 0).astype(jnp.float32)
            y2 = jnp.minimum(yc[i] + length // 2, h).astype(jnp.float32)
            x2 = jnp.minimum(xc[i] + length // 2, w).astype(jnp.float32)
            mask = (ys_ >= y1) & (ys_ < y2) & (xs_ >= x1) & (xs_ < x2)
            out = jnp.where(mask[..., None], noise, out)
        return out

    return _gate(float(prob), body)


def _c_random_crop(size) -> SampleFn:
    th, tw = (int(size), int(size)) if isinstance(size, (int, float)) else (
        int(size[0]), int(size[1])
    )
    return lambda key, img: random_crop_static(img, key, th, tw)


# ------------------------------------------------------------------ AugMix


def _c_random_augmix(severity: int = 3, width: int = 3, alpha: float = 1.0) -> SampleFn:
    """Host RandomAugMix (data/transforms.py): ``width`` chains of 1–3 ops
    drawn from {autocontrast, equalize, posterize, rotate, solarize,
    sharpness}, dirichlet-weighted sum, beta-blended with the original."""
    s = int(severity)
    width = int(width)
    alpha = float(alpha)

    def op_switch(key, img):
        kc, kp = jax.random.split(key)
        choice = jax.random.randint(kc, (), 0, 6)
        branches = [
            lambda k, im: autocontrast(im),
            lambda k, im: equalize(im),
            lambda k, im: posterize(im, max(8 - s, 1)),
            lambda k, im: rotate(im, jax.random.uniform(k, minval=-3.0 * s, maxval=3.0 * s)),
            lambda k, im: solarize(im, jnp.float32(256 - 26 * s)),
            lambda k, im: adjust_sharpness(im, jax.random.uniform(k, minval=0.1, maxval=1.9)),
        ]
        return jax.lax.switch(choice, branches, kp, img)

    def fn(key, img):
        kws, kb, kc = jax.random.split(key, 3)
        ws = jax.random.dirichlet(kws, jnp.full((width,), alpha))
        m = jax.random.beta(kb, alpha, alpha)
        mix = jnp.zeros_like(img)
        keys = jax.random.split(kc, width)
        for i in range(width):
            kd, kops = jax.random.split(keys[i])
            depth = jax.random.randint(kd, (), 1, 4)  # host randint(1,3) inclusive
            aug = img
            opkeys = jax.random.split(kops, 3)
            for d in range(3):
                nxt = op_switch(opkeys[d], aug)
                aug = jnp.where(d < depth, nxt, aug)
            mix = mix + ws[i] * aug
        out = (1.0 - m) * img + m * mix
        # host: np.clip(out, 0, 255).astype(np.uint8) — truncation
        return jnp.floor(jnp.clip(out, 0.0, 255.0))

    return fn


# --------------------------------------------------------------- RandAugment


_RA_OPS = (
    "Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
    "Brightness", "Color", "Contrast", "Sharpness", "Posterize",
    "Solarize", "AutoContrast", "Equalize",
)


def _c_random_augment(num_ops: int = 2, magnitude: int = 9, num_magnitude_bins: int = 31) -> SampleFn:
    """RandAugment with torchvision's augmentation space (host RandAugment in
    data/transforms.py; reference transforms.py:479-481). Geometric ops use
    NEAREST like torchvision's default. Translate magnitudes are computed from
    the (post-resize) trace-time image size."""
    num_ops = int(num_ops)
    magnitude = int(magnitude)
    bins = int(num_magnitude_bins)
    t = magnitude / (bins - 1)
    post_bits = 8 - int(round(magnitude / ((bins - 1) / 4)))

    def build_branches(h: int, w: int):
        mag_shear = 0.3 * t
        mag_tx = 150.0 / 331.0 * w * t
        mag_ty = 150.0 / 331.0 * h * t
        mag_rot = 30.0 * t
        mag_enh = 0.9 * t
        sol_thresh = 255.0 * (1.0 - t)

        def signed(k, mag):
            return jnp.where(jax.random.uniform(k) < 0.5, -mag, mag)

        def shear(axis):
            def op(k, im):
                m = signed(k, mag_shear)
                deg = jnp.rad2deg(jnp.arctan(m))
                sh = (deg, jnp.float32(0.0)) if axis == 0 else (jnp.float32(0.0), deg)
                mat = inverse_affine_matrix((h, w), 0.0, (0.0, 0.0), 1.0, sh, (0, 0))
                return affine_transform(im, mat, "nearest")

            return op

        def translate(axis):
            def op(k, im):
                m = jnp.floor(signed(k, mag_tx if axis == 0 else mag_ty) + 0.5)
                tr = (m, jnp.float32(0.0)) if axis == 0 else (jnp.float32(0.0), m)
                mat = inverse_affine_matrix((h, w), 0.0, tr, 1.0, (0.0, 0.0))
                return affine_transform(im, mat, "nearest")

            return op

        return [
            lambda k, im: im,  # Identity
            shear(0),
            shear(1),
            translate(0),
            translate(1),
            lambda k, im: rotate(im, signed(k, mag_rot), "nearest"),
            lambda k, im: adjust_brightness(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: adjust_saturation(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: adjust_contrast(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: adjust_sharpness(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: posterize(im, max(post_bits, 0)),
            lambda k, im: solarize(im, jnp.float32(int(sol_thresh))),
            lambda k, im: autocontrast(im),
            lambda k, im: equalize(im),
        ]

    def fn(key, img):
        h, w = img.shape[:2]
        branches = build_branches(h, w)
        keys = jax.random.split(key, num_ops)
        for i in range(num_ops):
            kc, kp = jax.random.split(keys[i])
            op_idx = jax.random.randint(kc, (), 0, len(branches))
            img = jax.lax.switch(op_idx, branches, kp, img)
        return img

    return fn


# ------------------------------------------------------------- random_choice


class _NotLiftable(Exception):
    """Raised by a compiler when the op's params make it host-only."""


_COMPILERS: Dict[str, Callable[..., SampleFn]] = {
    "random_horizonflip": _c_random_horizonflip,
    "random_verticalflip": _c_random_verticalflip,
    "random_double_flip": _c_random_double_flip,
    "random_doubleflip": _c_random_doubleflip,
    "random_invert": _c_random_invert,
    "random_grayscale": _c_random_grayscale,
    "random_autocontrast": _c_random_autocontrast,
    "random_equalize": _c_random_equalize,
    "random_adjustsharpness": _c_random_adjustsharpness,
    "random_color_jitter": _c_random_color_jitter,
    "color_jitter": _c_color_jitter,
    "random_gaussianblur": _c_random_gaussianblur,
    "random_rotate": _c_random_rotate,
    "random_affine": _c_random_affine,
    "random_cutout": _c_random_cutout,
    "random_cutaddnoise": _c_random_cutaddnoise,
    "random_crop": _c_random_crop,
    "random_augmix": _c_random_augmix,
    "random_augment": _c_random_augment,
}


GroupFn = Callable[[Array, Array], Array]  # (key, imgs f32 [N,H,W,C]) -> imgs


def _vmap_group(fn: SampleFn) -> GroupFn:
    """Lift a sample-level op to a group: independent per-sample keys, so
    elementwise/per-sample draws keep exact reference semantics."""

    def gfn(key: Array, imgs: Array) -> Array:
        return jax.vmap(fn)(jax.random.split(key, imgs.shape[0]), imgs)

    return gfn


def _compile_group(name: str, params: Any) -> GroupFn:
    """Group-level compiler: branch CHOICES (random_choice / AugMix /
    RandAugment op draws) are made once per group and dispatched through a
    real ``lax.switch`` — outside any vmap, only the chosen branch executes.
    Everything else is the vmapped sample op (per-sample draws unchanged).

    Why: ``vmap(lax.switch)`` lowers to select-over-all-branches, so the
    per-sample choice semantics execute EVERY branch for EVERY sample — the
    pet.yaml chain (7-way photometric choice incl. AugMix, itself 9 nested
    6-way switches) measured 8.5 s/step on a v5e at bs 128 (~15 img/s).
    Group-level switch executes one branch per group: exact per-sample
    semantics at group_size=1, and at group_size>1 a documented
    distribution-level trade (docs/PARITY.md) — samples sharing a group
    share the branch draw (not the branch's internal per-sample draws).
    """
    if name == "random_choice":
        inner = [
            _compile_group(*next(iter(t.items()))) for t in params["transforms"]
        ]
        p = params.get("p")
        w = jnp.asarray(
            [1.0] * len(inner) if p is None else [float(x) for x in p], jnp.float32
        )

        def choice_fn(key: Array, imgs: Array) -> Array:
            kc, kf = jax.random.split(key)
            idx = jax.random.choice(kc, len(inner), p=w / jnp.sum(w))
            return jax.lax.switch(idx, inner, kf, imgs)

        return choice_fn
    group_fn = _GROUP_COMPILERS.get(name)
    if group_fn is not None:
        # same params dispatch as _compile_one: a scalar/list YAML spelling
        # (e.g. ``random_rotate: 15``) must not silently fall to defaults
        return _call_compiler(group_fn, params)
    return _vmap_group(_compile_one(name, params))


def _c_group_rotate(degrees=10.0, expand: bool = False) -> GroupFn:
    """random_rotate with a per-GROUP angle via the shared-index resampler
    (per-sample angles force per-pixel 2D gathers: 250 ms/bs-128 measured)."""
    if expand:
        raise _NotLiftable("random_rotate(expand=True) changes the output shape")
    lo, hi = _rotate_range(degrees)

    def fn(key: Array, imgs: Array) -> Array:
        angle = jax.random.uniform(key, minval=lo, maxval=hi)
        return rotate_group(imgs, angle)

    return fn


def _c_group_affine(degrees=0.0, translate=0.0, scale=0.0, shear=0.0, fill=0,
                    center=None) -> GroupFn:
    """random_affine with per-GROUP parameter draws (same reason as rotate)."""
    deg, trans, sc, sh, fill_v, ctr = _affine_spec(
        degrees, translate, scale, shear, fill, center
    )

    def fn(key: Array, imgs: Array) -> Array:
        h, w = imgs.shape[1:3]
        m = _draw_affine_matrix(key, h, w, deg, trans, sc, sh, ctr)
        return affine_transform_group(imgs, m, "bilinear", fill_v)

    return fn


def _c_group_augmix(severity: int = 3, width: int = 3, alpha: float = 1.0) -> GroupFn:
    """AugMix with group-level op/depth draws and per-sample mixing weights:
    ws ~ Dirichlet and m ~ Beta stay per sample (cheap, elementwise); the
    chain's op choices and depth are drawn per group and run through real
    switch/cond so only the chosen ops execute (vs 9×6 select-all evals per
    sample in the vmapped form)."""
    s = int(severity)
    width = int(width)
    alpha = float(alpha)

    def group_op_switch(key: Array, imgs: Array) -> Array:
        kc, kp = jax.random.split(key)
        choice = jax.random.randint(kc, (), 0, 6)

        def per_sample(fn):
            return lambda k, im: jax.vmap(fn)(jax.random.split(k, im.shape[0]), im)

        branches = [
            lambda k, im: jax.vmap(autocontrast)(im),
            lambda k, im: jax.vmap(equalize)(im),
            lambda k, im: jax.vmap(lambda x: posterize(x, max(8 - s, 1)))(im),
            # rotation angle per GROUP: per-sample angles force per-pixel
            # 2D gathers (250 ms/bs-128, benchmarks/device_aug_micro.py)
            lambda k, im: rotate_group(
                im, jax.random.uniform(k, minval=-3.0 * s, maxval=3.0 * s)
            ),
            lambda k, im: jax.vmap(lambda x: solarize(x, jnp.float32(256 - 26 * s)))(im),
            per_sample(
                lambda k, x: adjust_sharpness(x, jax.random.uniform(k, minval=0.1, maxval=1.9))
            ),
        ]
        return jax.lax.switch(choice, branches, kp, imgs)

    def fn(key: Array, imgs: Array) -> Array:
        n = imgs.shape[0]
        kws, kb, kc = jax.random.split(key, 3)
        ws = jax.random.dirichlet(kws, jnp.full((width,), alpha), shape=(n,))  # [n,w]
        m = jax.random.beta(kb, alpha, alpha, shape=(n,))
        mix = jnp.zeros_like(imgs)
        keys = jax.random.split(kc, width)
        for i in range(width):
            kd, kops = jax.random.split(keys[i])
            depth = jax.random.randint(kd, (), 1, 4)  # host randint(1,3) inclusive
            aug = imgs
            opkeys = jax.random.split(kops, 3)
            for d in range(3):
                aug = jax.lax.cond(
                    d < depth,
                    lambda a, k=opkeys[d]: group_op_switch(k, a),
                    lambda a: a,
                    aug,
                )
            mix = mix + ws[:, i, None, None, None] * aug
        mm = m[:, None, None, None]
        out = (1.0 - mm) * imgs + mm * mix
        # host: np.clip(out, 0, 255).astype(np.uint8) — truncation
        return jnp.floor(jnp.clip(out, 0.0, 255.0))

    return fn


def _c_group_randaugment(
    num_ops: int = 2, magnitude: int = 9, num_magnitude_bins: int = 31
) -> GroupFn:
    """RandAugment with group-level op draws (per-sample magnitudes/signs
    stay per sample inside the chosen branch)."""
    num_ops = int(num_ops)
    magnitude = int(magnitude)
    bins = int(num_magnitude_bins)
    t = magnitude / (bins - 1)
    post_bits = 8 - int(round(magnitude / ((bins - 1) / 4)))

    def build_branches(h: int, w: int):
        mag_shear = 0.3 * t
        mag_tx = 150.0 / 331.0 * w * t
        mag_ty = 150.0 / 331.0 * h * t
        mag_rot = 30.0 * t
        mag_enh = 0.9 * t
        sol_thresh = 255.0 * (1.0 - t)

        def signed(k, mag):
            return jnp.where(jax.random.uniform(k) < 0.5, -mag, mag)

        # geometry branches draw their sign per GROUP and resample through
        # the shared-index path (per-sample 2D gathers: 250 ms/bs-128)
        def shear(axis):
            def op(k, im):
                m = signed(k, mag_shear)
                deg = jnp.rad2deg(jnp.arctan(m))
                sh = (deg, jnp.float32(0.0)) if axis == 0 else (jnp.float32(0.0), deg)
                mat = inverse_affine_matrix((h, w), 0.0, (0.0, 0.0), 1.0, sh, (0, 0))
                return affine_transform_group(im, mat, "nearest")

            return op

        def translate(axis):
            def op(k, im):
                m = jnp.floor(signed(k, mag_tx if axis == 0 else mag_ty) + 0.5)
                tr = (m, jnp.float32(0.0)) if axis == 0 else (jnp.float32(0.0), m)
                mat = inverse_affine_matrix((h, w), 0.0, tr, 1.0, (0.0, 0.0))
                return affine_transform_group(im, mat, "nearest")

            return op

        sample_branches = [
            lambda k, im: im,  # Identity
            lambda k, im: adjust_brightness(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: adjust_saturation(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: adjust_contrast(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: adjust_sharpness(im, 1.0 + signed(k, mag_enh)),
            lambda k, im: posterize(im, max(post_bits, 0)),
            lambda k, im: solarize(im, jnp.float32(int(sol_thresh))),
            lambda k, im: autocontrast(im),
            lambda k, im: equalize(im),
        ]
        group_branches = [
            shear(0),
            shear(1),
            translate(0),
            translate(1),
            lambda k, im: rotate_group(im, signed(k, mag_rot), "nearest"),
        ]
        # torchvision order: Identity, ShearX/Y, TranslateX/Y, Rotate, then
        # the photometric ops (uniform draw over all 14)
        return (
            [_vmap_group(sample_branches[0])]
            + group_branches
            + [_vmap_group(b) for b in sample_branches[1:]]
        )

    def fn(key: Array, imgs: Array) -> Array:
        h, w = imgs.shape[1:3]
        branches = build_branches(h, w)
        keys = jax.random.split(key, num_ops)
        for i in range(num_ops):
            kc, kp = jax.random.split(keys[i])
            op_idx = jax.random.randint(kc, (), 0, len(branches))
            imgs = jax.lax.switch(op_idx, branches, kp, imgs)
        return imgs

    return fn


# ops whose GROUP form differs from vmap(sample form): group-level branch /
# parameter draws (see _compile_group's docstring)
_GROUP_COMPILERS: Dict[str, Callable[..., GroupFn]] = {
    "random_augmix": _c_group_augmix,
    "random_augment": _c_group_randaugment,
    "random_rotate": _c_group_rotate,
    "random_affine": _c_group_affine,
}


def _call_compiler(fn: Callable, params: Any):
    """YAML params -> compiler call, one dispatch for both the per-sample and
    group registries (``name: no_params``, ``name: {k: v}``, ``name: [a, b]``,
    ``name: scalar`` all mean what they say in either mode)."""
    if params in (None, "no_params"):
        return fn()
    if isinstance(params, dict):
        return fn(**params)
    if isinstance(params, (list, tuple)):
        return fn(*params)
    return fn(params)


def _compile_one(name: str, params: Any) -> SampleFn:
    if name == "random_choice":
        inner = [
            _compile_one(*next(iter(t.items()))) for t in params["transforms"]
        ]
        p = params.get("p")
        w = jnp.asarray(
            [1.0] * len(inner) if p is None else [float(x) for x in p], jnp.float32
        )

        def choice_fn(key, img):
            kc, kf = jax.random.split(key)
            idx = jax.random.choice(kc, len(inner), p=w / jnp.sum(w))
            return jax.lax.switch(idx, inner, kf, img)

        return choice_fn
    fn = _COMPILERS.get(name)
    if fn is None:
        raise _NotLiftable(f"{name} has no device implementation")
    return _call_compiler(fn, params)


# =============================================================== pipeline split


def _item_name(item) -> str:
    return item if isinstance(item, str) else next(iter(item.keys()))


def _item_params(item):
    return None if isinstance(item, str) else next(iter(item.values()))


def _is_marker(name: str) -> bool:
    return name in ("to_tensor", "to_tensor_without_div", "normalize")


def is_liftable(item) -> bool:
    """True when this YAML augment item compiles to a device op."""
    name = _item_name(item)
    if name == "random_choice":
        return all(is_liftable(t) for t in (_item_params(item) or {}).get("transforms", []))
    if name not in _COMPILERS:
        return False
    try:
        # validate BOTH compilers: the trainer may build either the vmapped
        # per-sample form or the group form (make_device_augment group_size),
        # and an op lifted here must compile in whichever mode runs
        _compile_one(name, _item_params(item))
        _compile_group(name, _item_params(item))
        return True
    except _NotLiftable:
        return False
    except Exception:
        return False


def split_device_pipeline(
    augment_cfg: List[Any],
) -> Tuple[List[Any], List[Any]]:
    """Partition a train augment spec into (host_cfg, device_cfg).

    Liftable ops (photometric / occlusion / flips / device-expressible
    geometry jitters) move to the device stage IN THEIR ORIGINAL RELATIVE
    ORDER; everything else (decode-adjacent geometry to the static size,
    markers) stays host, also in order. Lifted ops that preceded the final
    geometry op now run after it — a distribution-level equivalence (see
    module docstring). Returns (augment_cfg, []) when nothing lifts.
    """
    # to_tensor_without_div pipelines feed the device stage float32 0..255
    # batches; the lifted ops assume uint8 input semantics, and a silent
    # no-op there would drop every lifted augment (ADVICE r4 high) — keep
    # the whole pipeline on host instead.
    if any(_item_name(i) == "to_tensor_without_div" for i in augment_cfg or []):
        return list(augment_cfg or []), []
    host: List[Any] = []
    device: List[Any] = []
    for item in augment_cfg or []:
        name = _item_name(item)
        if _is_marker(name):
            host.append(item)
        elif is_liftable(item):
            device.append(item)
        else:
            host.append(item)
    # a device stage with no host geometry cannot batch variable-size images
    host_has_spatial = any(
        not _is_marker(_item_name(i)) for i in host
    )
    if not device or not host_has_spatial:
        return list(augment_cfg or []), []
    return host, device


def _largest_group_count(batch: int, group_size: int) -> int:
    """Number of groups: the largest divisor-of-batch group size that is
    ≤ ``group_size`` wins (static shapes need groups × size == batch)."""
    size = max(min(group_size, batch), 1)
    while batch % size:
        size -= 1
    return batch // size


def make_device_augment(
    device_cfg: List[Any], group_size: Optional[int] = 8
) -> Optional[Callable[[Array, Array], Array]]:
    """Compile a lifted device spec into ``fn(key, uint8 [B,H,W,3]) -> uint8``.

    Execution model (TPU-native): the batch is split into groups of
    ``group_size`` consecutive samples and a ``lax.scan`` walks the groups,
    applying the op chain with REAL ``lax.switch`` control flow — only the
    drawn branch of a random_choice/AugMix/RandAugment executes. The naive
    per-sample form (``group_size=None``, vmap over samples) lowers every
    switch to select-over-all-branches and measured 8.5 s/step for the
    pet.yaml chain at bs 128 on a v5e (~560× the geometry-only stage).

    - ``group_size=1``: exact reference semantics (every sample draws its own
      branch) — scan length B.
    - ``group_size>1`` (default 8): samples in a group share BRANCH draws
      (per-sample draws inside the branch are unchanged); the loader's
      epoch-seeded shuffle re-forms groups every epoch. Documented
      distribution-level trade, docs/PARITY.md "Known intentional
      differences". Config knob: ``data.train.device_augment_group_size``.
    - ``group_size=None``: legacy vmapped per-sample form (kept for A/B).

    When a mesh with a sharded 'data' axis is live (parallel.mesh
    .current_mesh), the stage runs under ``shard_map`` so the scan walks
    per-device LOCAL groups in parallel (a global scan would serialize
    devices: each group lives on one device). Keys fold in the device index.
    Per-group keys come from one split of ``key``; each op folds its index so
    adding/removing ops doesn't correlate draws. The fn is shape-polymorphic
    across (progressive-resize) input sizes — jit re-traces per shape.
    """
    if not device_cfg:
        return None

    if group_size is None:
        ops = [_compile_one(_item_name(i), _item_params(i)) for i in device_cfg]

        def sample_fn(key: Array, img_u8: Array) -> Array:
            img = img_u8.astype(jnp.float32)
            for i, op in enumerate(ops):
                img = op(jax.random.fold_in(key, i), img)
            return jnp.clip(jnp.round(img), 0.0, 255.0).astype(jnp.uint8)

        def augment_local(key: Array, images: Array) -> Array:
            keys = jax.random.split(key, images.shape[0])
            return jax.vmap(sample_fn)(keys, images)
    else:
        gops = [_compile_group(_item_name(i), _item_params(i)) for i in device_cfg]

        def augment_local(key: Array, images: Array) -> Array:
            b, h, w, c = images.shape
            n_groups = _largest_group_count(b, group_size)
            x = images.astype(jnp.float32).reshape(n_groups, b // n_groups, h, w, c)
            keys = jax.random.split(key, n_groups)

            def body(carry, kx):
                k, imgs = kx
                for i, op in enumerate(gops):
                    imgs = op(jax.random.fold_in(k, i), imgs)
                return carry, imgs

            _, y = jax.lax.scan(body, None, (keys, x))
            out = jnp.clip(jnp.round(y), 0.0, 255.0).astype(jnp.uint8)
            return out.reshape(b, h, w, c)

    def batch_fn(key: Array, images: Array) -> Array:
        if images.dtype != jnp.uint8:
            # split_device_pipeline never lifts for non-uint8-producing host
            # pipelines (to_tensor_without_div); reaching here means a host
            # path fed the wrong dtype — failing loudly beats silently
            # skipping every lifted augment (ADVICE r4 high).
            raise TypeError(
                f"device augment stage expects a uint8 batch, got "
                f"{images.dtype}; the host pipeline that produced this batch "
                f"should not have had its augments lifted"
            )
        from visiondk_tpu.parallel.mesh import current_mesh

        mesh = current_mesh()
        if mesh is not None and dict(mesh.shape).get("data", 1) > 1:
            from jax.sharding import PartitionSpec as P

            def local(k: Array, im: Array) -> Array:
                return augment_local(
                    jax.random.fold_in(k, jax.lax.axis_index("data")), im
                )

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )(key, images)
        return augment_local(key, images)

    return batch_fn


def set_device_pipeline_size(device_cfg: List[Any], size: int) -> bool:
    """Progressive resolution for the LIFTED stage: rewrite static spatial
    sizes carried by device ops (today only ``random_crop``), mirroring what
    ``data.transforms.set_pipeline_size`` does to the host pipeline. Without
    this a lifted random_crop keeps its full-resolution size and
    ``lax.dynamic_slice``s beyond the shrunken operand at the first
    progressive milestone (ADVICE r4 medium). Mutates ``device_cfg`` in
    place; returns True when anything changed (caller must then rebuild the
    compiled fn via ``make_device_augment``)."""
    changed = False

    def _walk(items: List[Any]) -> None:
        nonlocal changed
        for i, item in enumerate(items):
            name = _item_name(item)
            if name == "random_choice":
                _walk((_item_params(item) or {}).get("transforms", []))
            elif name == "random_crop":
                params = _item_params(item)
                if isinstance(params, dict):
                    if params.get("size") != size:
                        params["size"] = size
                        changed = True
                else:
                    items[i] = {"random_crop": {"size": size}}
                    changed = True

    _walk(device_cfg or [])
    return changed


def describe_split(host_cfg: List[Any], device_cfg: List[Any]) -> str:
    h = ", ".join(_item_name(i) for i in host_cfg) or "-"
    d = ", ".join(_item_name(i) for i in device_cfg) or "-"
    return f"host: [{h}] | device(jit): [{d}]"
