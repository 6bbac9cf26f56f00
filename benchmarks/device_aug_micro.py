"""Device-augment stage microbenchmark (round 5): per-variant and per-op
device cost of the lifted pet.yaml chain at bs 128 / 224px on one chip.

Timing methodology (CLAUDE.md): the whole timed loop lives inside ONE jitted
``lax.fori_loop`` dispatch chaining the uint8 batch through the stage, and a
single scalar is fetched at the end — wall clock of a single tunneled
dispatch measures RTT, not compute.

    python benchmarks/device_aug_micro.py [--ops] [--group-sizes]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # repo root

import jax
import jax.numpy as jnp
import numpy as np

PET_CHAIN = [
    {"random_choice": {"transforms": [
        {"random_color_jitter": {"brightness": 0.1, "contrast": 0.1,
                                 "saturation": 0.1, "hue": 0.1}},
        {"random_cutout": {"n_holes": 3, "length": 12, "prob": 0.1,
                           "color": [0, 255]}},
        {"random_gaussianblur": {"kernel_size": 5}},
        {"random_rotate": {"degrees": 10}},
        {"random_autocontrast": {"p": 0.5}},
        {"random_adjustsharpness": {"p": 0.5}},
        {"random_augmix": {"severity": 3}},
    ]}},
    {"random_horizonflip": {"p": 0.5}},
]


def time_stage(fn, batch, iters=20) -> float:
    """ms per invocation of fn(key, batch) — fori_loop-chained, one fetch."""

    @jax.jit
    def loop(x):
        def body(i, im):
            return fn(jax.random.fold_in(jax.random.key(7), i), im)

        return jax.lax.fori_loop(0, iters, body, x).astype(jnp.int32).sum()

    x = jnp.asarray(batch)
    float(loop(x))  # compile + warm
    t0 = time.perf_counter()
    float(loop(x))
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> None:
    from visiondk_tpu.ops.device_augment import (
        _compile_group,
        _vmap_group,
        _compile_one,
        make_device_augment,
    )

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (128, 224, 224, 3), dtype=np.uint8)
    out = {}

    if "--ops" in sys.argv:
        ops = [
            ("flip", "random_horizonflip", {"p": 0.5}),
            ("color_jitter", "random_color_jitter",
             {"brightness": 0.1, "contrast": 0.1, "saturation": 0.1, "hue": 0.1}),
            ("cutout", "random_cutout",
             {"n_holes": 3, "length": 12, "prob": 0.1, "color": [0, 255]}),
            ("blur", "random_gaussianblur", {"kernel_size": 5}),
            ("rotate_persample", "random_rotate", {"degrees": 10}),
            ("rotate_group8", "random_rotate", {"degrees": 10}),
            ("equalize_group8", "random_equalize", {"p": 1.0}),
            ("autocontrast", "random_autocontrast", {"p": 0.5}),
            ("sharpness", "random_adjustsharpness", {"p": 0.5}),
            ("augmix_group8", "random_augmix", {"severity": 3}),
        ]
        for label, name, params in ops:
            if label.endswith("group8"):
                g = _compile_group(name, params)

                def stage(key, im, g=g):
                    x = im.astype(jnp.float32).reshape(16, 8, 224, 224, 3)
                    ks = jax.random.split(key, 16)
                    _, y = jax.lax.scan(lambda c, kx: (c, g(kx[0], kx[1])), None, (ks, x))
                    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8).reshape(im.shape)
            else:
                fn = _compile_one(name, params)
                gf = _vmap_group(fn)

                def stage(key, im, gf=gf):
                    y = gf(key, im.astype(jnp.float32))
                    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)
            ms = time_stage(stage, batch)
            out[label] = round(ms, 2)
            print(f"{label:>16}: {ms:8.2f} ms/batch", flush=True)
    elif "--group-sizes" in sys.argv:
        for gs in (1, 4, 8, 16, 32, None):
            fn = make_device_augment([dict(x) for x in PET_CHAIN], group_size=gs)
            ms = time_stage(fn, batch, iters=6 if gs is None else 20)
            out[f"group_{gs}"] = round(ms, 2)
            print(f"group_size={str(gs):>4}: {ms:8.2f} ms/batch "
                  f"({128 / ms * 1000:.0f} img/s stage-only)", flush=True)
    else:
        fn = make_device_augment([dict(x) for x in PET_CHAIN], group_size=8)
        ms = time_stage(fn, batch)
        out["pet_chain_group8"] = round(ms, 2)
        print(f"pet chain (group 8): {ms:.2f} ms/batch", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
