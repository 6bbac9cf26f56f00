#!/usr/bin/env python
"""Headline benchmark: ViT-B/16 training + embedding-extraction throughput on
one chip (BASELINE.json north star: images/sec/chip, >5× the CPU baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against CPU_BASELINE_IPS — the same train step
measured on this machine's CPU host (see BASELINE.md "self-measured" note);
the north-star target is vs_baseline > 5.
"""

from __future__ import annotations

import json
import time

# Self-measured on the dev host CPU (ViT-B/16 bf16 train step, batch 32):
# see BASELINE.md. Re-measure with `python bench.py --cpu`.
CPU_BASELINE_IPS = 2.6


def build(batch: int, dtype_name: str = "bfloat16", device_augment=None):
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_train_step, make_embed_step
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.models.factory import VisionModel, EmbeddingModel

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = VisionModel(backbone_name="vit_base_patch16_224", num_classes=1000, dtype=dtype)
    rng = jax.random.key(0)
    x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)

    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(learning_rate=0.006, momentum=0.937),
    )
    state = create_train_state(variables, tx)
    cfg = StepConfig(task="classification")
    step = make_train_step(
        model, tx, create_lossfn("ce", label_smooth=0.05), cfg, jax.random.key(1),
        device_augment=device_augment,
    )

    embed_model = EmbeddingModel(
        backbone_name="vit_base_patch16_224",
        feat_dim=128,
        head_config=None,
        dtype=dtype,
    )
    evars = embed_model.init({"params": rng}, x, method=embed_model.embed, train=False)
    embed_state = create_train_state(evars, tx)
    embed = make_embed_step(embed_model, cfg, use_ema=False)
    return state, step, embed_state, embed


def run(batch=128, train_iters=20, embed_iters=20, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(batch, 224, 224, 3)).astype(np.uint8)
    labels = rng.integers(0, 1000, size=(batch,)).astype(np.int32)
    batch_dev = jax.device_put({"image": jnp.asarray(images), "label": jnp.asarray(labels)})

    state, step, embed_state, embed = build(batch)

    # NOTE: on the tunneled TPU backend block_until_ready does not actually
    # block; a device→host scalar fetch is the only reliable sync. Like the
    # embed loop below, the whole timed train run is ONE jitted fori_loop
    # dispatch: a Python-side step loop (even chained through `state`) goes
    # tunnel-bound whenever per-step dispatch RTT exceeds the ~100 ms device
    # step — measured 1270 → 948 img/s across one day on an identical chip
    # purely from tunnel weather. Weights/rng advance per iteration so no
    # loop-invariant hoisting is possible; the constant batch is fine because
    # host input feeding is measured separately (--pipeline).
    from functools import partial as _partial

    lam = jnp.float32(0.0)

    @_partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
    def train_n(st, b, iters):
        def body(_, carry):
            st, _loss = carry
            st, m = step(st, b, lam)
            return (st, m["loss"])

        return jax.lax.fori_loop(0, iters, body, (st, jnp.float32(0.0)))

    # compile + warm with the SAME static iters (a different count would
    # recompile inside the timed region)
    state, last = train_n(state, batch_dev, train_iters)
    float(last)
    t0 = time.perf_counter()
    state, last = train_n(state, batch_dev, train_iters)
    float(last)
    train_ips = batch * train_iters / (time.perf_counter() - t0)

    # One dispatch for the whole embed loop: per-iteration dispatch through
    # the tunnel costs ~50ms wall — more than the ~31ms device step — so a
    # Python-side loop measures the tunnel, not the chip. The fori_loop
    # carries acc into the input (loop-carried dependency, can't be hoisted).
    from functools import partial as _partial

    @_partial(jax.jit, static_argnums=(2,))
    def embed_n(es, images, iters):
        def body(_, acc):
            # data-dependent no-op (acc stays finite → flag is 0) so the loop
            # body can't be hoisted as loop-invariant
            flag = (acc[0, 0] > 1e30).astype(images.dtype)
            f = embed(es, {"image": images ^ flag})
            return acc + f

        return jax.lax.fori_loop(0, iters, body, jnp.zeros((batch, 128), jnp.float32))

    ebatch = batch_dev["image"]
    float(embed_n(embed_state, ebatch, embed_iters).sum())  # compile + warm
    t0 = time.perf_counter()
    float(embed_n(embed_state, ebatch, embed_iters).sum())
    embed_ips = batch * embed_iters / (time.perf_counter() - t0)

    # headline = harmonic blend of the two phases (train-dominated workload)
    value = train_ips
    print(
        json.dumps(
            {
                "metric": "ViT-B/16 train images/sec/chip (bf16, bs=%d); embed_extract=%.1f im/s" % (batch, embed_ips),
                "value": round(value, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(value / CPU_BASELINE_IPS, 2),
            }
        )
    )


def run_embed_quant(batch=128, iters=20, backbone="vit_base_patch16_224", label="ViT-B/16"):
    """A/B: bf16 vs int8-dense embedding extraction (ops/quant.py) on the
    chip. Same fori_loop chaining as run() — one dispatch per variant."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from functools import partial as _partial

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_embed_step
    from visiondk_tpu.models.factory import EmbeddingModel

    rng = jax.random.key(0)
    x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    model = EmbeddingModel(
        backbone_name=backbone, feat_dim=128, head_config=None,
        dtype=jnp.bfloat16,
    )
    evars = model.init({"params": rng}, x, method=model.embed, train=False)
    es = create_train_state(evars, optax.sgd(0.0))
    images = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (batch, 224, 224, 3)).astype(np.uint8)
    )
    out = {}
    feats = {}
    for tag, quant in (("bf16", None), ("int8", "int8")):
        embed = make_embed_step(model, StepConfig(), use_ema=False, quant=quant)

        @_partial(jax.jit, static_argnums=(2,))
        def embed_n(es, images, iters, _embed=embed):
            def body(_, acc):
                flag = (acc[0, 0] > 1e30).astype(images.dtype)
                f = _embed(es, {"image": images ^ flag})
                return acc + f

            return jax.lax.fori_loop(0, iters, body, jnp.zeros((batch, 128), jnp.float32))

        feats[tag] = np.asarray(embed(es, {"image": images}))
        float(embed_n(es, images, iters).sum())  # compile + warm
        t0 = time.perf_counter()
        float(embed_n(es, images, iters).sum())
        out[tag] = batch * iters / (time.perf_counter() - t0)
    cos = float(
        np.min(
            (feats["bf16"] * feats["int8"]).sum(-1)
            / np.maximum(
                np.linalg.norm(feats["bf16"], axis=-1) * np.linalg.norm(feats["int8"], axis=-1),
                1e-30,
            )
        )
    )
    print(
        json.dumps(
            {
                "metric": "%s embed images/sec/chip int8 (bs=%d)" % (label, batch),
                "value": round(out["int8"], 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(out["int8"] / out["bf16"], 3),
                "bf16_ips": round(out["bf16"], 1),
                "min_cosine_vs_bf16": round(cos, 5),
            }
        )
    )


def _make_toy_imagenet(root, n_classes=8, per_class=64, size=(500, 375)):
    """Disk JPEG fixture matching BASELINE.md's host-decode conditions."""
    import os

    import numpy as np
    from PIL import Image

    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = os.path.join(root, "train", f"class_{c}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (size[1], size[0], 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"), quality=85)
    open(marker, "w").close()


PIPELINE_AUG = [
    # pet.yaml-shaped train augment: photometric choice + flip + geometry
    {
        "random_choice": {
            "transforms": [
                {"random_color_jitter": {"brightness": 0.1, "contrast": 0.1,
                                         "saturation": 0.1, "hue": 0.1}},
                {"random_cutout": {"n_holes": 3, "length": 12, "prob": 0.5,
                                   "color": [0, 255]}},
                {"random_gaussianblur": {"kernel_size": 5}},
                {"random_autocontrast": {"p": 0.5}},
                {"random_adjustsharpness": {"p": 0.5}},
            ]
        }
    },
    {"random_horizonflip": {"p": 0.5}},
    {"random_crop_and_resize": {"size": 224}},
    {"to_tensor": "no_params"},
]


def h2d_probe(n=6, batch=128):
    """Tunnel/PCIe H2D ceiling of THIS moment: completion rate of ``n``
    consecutive uint8 batch transfers (MB/s). The dev-chip tunnel link drifts
    18–32 MB/s across a day — which IS the pipeline-fed throughput ceiling
    (124–214 img/s at bs-128/224px batches), so every trial records the
    concurrently-measured ceiling next to its img/s (BASELINE.md round 5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(3)
    bufs = [rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8) for _ in range(2)]
    mb = bufs[0].nbytes / 1e6
    x = jax.device_put(bufs[0])  # warm the path
    float(jnp.asarray(x).ravel()[0])
    outs = []
    t0 = time.perf_counter()
    for i in range(n):
        outs.append(jax.device_put(bufs[i % 2]))
    float(jnp.stack([o.ravel()[0].astype(jnp.float32) for o in outs]).sum())
    return n * mb / (time.perf_counter() - t0)


def pipeline_setup(batch=128, steps=20, warmup=2, workers=8, device_aug=False,
                   native=False):
    """Build one pipeline variant (loader + jitted step) and return a
    ``measure()`` closure so ``--pipeline-ab`` can interleave repeated trials
    of all variants within one process (the tunnel H2D ceiling and the
    one-core host both drift minute-to-minute — back-to-back variant blocks
    would confound variant with weather).

    Variants: ``device_aug=True`` applies the round-4 split (photometric /
    occlusion ops lift into the jitted step, host keeps decode+crop/resize);
    ``native=True`` additionally serves the host stage from the C++ decode
    pool (NativeTrainLoader — the loader SmartDataProcessor picks in
    production when the stage is native-eligible).
    """
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.data.datasets import ImageDatasets
    from visiondk_tpu.data.loader import DataLoader, NativeTrainLoader
    from visiondk_tpu.data.transforms import create_aug_transforms
    from visiondk_tpu.ops.device_augment import (
        make_device_augment,
        split_device_pipeline,
    )

    root = "/tmp/vdk_bench_data"
    _make_toy_imagenet(root)
    host_cfg, device_cfg = (
        split_device_pipeline(PIPELINE_AUG) if device_aug else (PIPELINE_AUG, [])
    )
    aug = create_aug_transforms(host_cfg)
    augment_fn = make_device_augment(device_cfg) if device_cfg else None
    ds = ImageDatasets(root, "train", transforms=aug)
    if native:
        loader = NativeTrainLoader(
            ds, batch, seed=0, num_workers=workers, prefetch=6
        )
    else:
        loader = DataLoader(
            ds, batch, shuffle=True, drop_last=True, num_workers=workers, prefetch=6
        )

    state_box = [None]  # built lazily on first measure(); reused after

    def batches(n):
        epoch = 0
        got = 0
        while got < n:
            loader.set_epoch(epoch)
            for b in loader:
                yield b
                got += 1
                if got >= n:
                    return
            epoch += 1

    def measure():
        # loader-only drain — one untimed pass first so the page cache and
        # thread pool are warm (matching the train-fed pass's conditions)
        for b in batches(2):
            pass
        t0 = time.perf_counter()
        for b in batches(steps):
            pass
        loader_ips = batch * steps / (time.perf_counter() - t0)

        if state_box[0] is None:
            state, step, *_ = build(batch, device_augment=augment_fn)
            state_box[0] = (state, step)
        state, step = state_box[0]
        lam = jnp.float32(0.0)
        n = 0
        t_start = time.perf_counter()  # warmup=0: timed from the first step
        for i, b in enumerate(batches(steps + warmup)):
            dev = jax.device_put(
                {"image": jnp.asarray(b["image"]), "label": jnp.asarray(b["label"])}
            )
            state, m = step(state, dev, lam)
            if i == warmup - 1:
                float(m["loss"])  # flush warmup/compile before timing
                t_start = time.perf_counter()
            elif i >= warmup:
                n += 1
        float(m["loss"])
        state_box[0] = (state, step)
        total = time.perf_counter() - t_start
        return batch * n / total, loader_ips

    return measure


def run_pipeline(batch=128, steps=20, warmup=2, workers=8, device_aug=False,
                 native=False):
    """One-shot variant of ``pipeline_setup``: end-to-end train throughput fed
    by the REAL input pipeline (disk JPEG → DataLoader host decode+augment →
    device step) next to a loader-only drain, printed as one JSON line."""
    train_ips, loader_ips = pipeline_setup(
        batch, steps, warmup, workers, device_aug, native
    )()
    tag = "device-aug" if device_aug else "host-aug"
    if native:
        tag += "+native"
    print(
        json.dumps(
            {
                "metric": "pipeline train images/sec (disk→DataLoader→step, %s, bs=%d)"
                % (tag, batch),
                "value": round(train_ips, 2),
                "unit": "images/sec",
                "vs_baseline": round(train_ips / max(loader_ips, 1e-9), 3),
                "loader_only_ips": round(loader_ips, 2),
            }
        )
    )
    return train_ips, loader_ips


def _with_retries(fn, attempts=3, delay=30):
    """The tunneled TPU backend occasionally throws transient HTTP 500 /
    FailedPrecondition errors (CLAUDE.md); retry before giving up so a
    single flaky dispatch doesn't zero out a recorded benchmark run."""
    import sys

    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — backend error types vary
            if i == attempts - 1:
                raise
            print(
                f"# transient backend error ({type(e).__name__}); "
                f"retry {i + 1}/{attempts - 1} in {delay}s",
                file=sys.stderr,
            )
            time.sleep(delay)


if __name__ == "__main__":
    import sys

    if "--cpu" in sys.argv:
        # env-var override is too late here: sitecustomize already imported
        # jax with JAX_PLATFORMS=axon (CLAUDE.md); the config route works as
        # long as no backend has been initialized yet
        import jax

        jax.config.update("jax_platforms", "cpu")
        run(batch=8, train_iters=3, embed_iters=3, warmup=1)
    elif "--pipeline-ab" in sys.argv:
        # A/B/C: full-host augments vs device-augment split vs split + C++
        # native decode (the production loader choice). K interleaved trials
        # (A,B,C, A,B,C, …) with a concurrent H2D-ceiling probe per round:
        # the one-core host and the tunnel link both drift, so medians + IQR
        # over interleaved rounds are the only comparable numbers (round-5
        # VERDICT item 3 — single-run values swung 30% run-to-run).
        k = 5
        for a in sys.argv:
            if a.startswith("--trials="):
                k = int(a.split("=", 1)[1])
        variants = [
            ("host_aug", dict(device_aug=False)),
            ("device_aug", dict(device_aug=True)),
            ("device_aug_native", dict(device_aug=True, native=True)),
        ]
        measures = {n: pipeline_setup(**kw) for n, kw in variants}
        fed = {n: [] for n, _ in variants}
        drain = {n: [] for n, _ in variants}
        h2d = []
        for n, _ in variants:  # untimed warmup round: compiles + page cache
            _with_retries(measures[n])
        for t in range(k):
            h2d.append(_with_retries(h2d_probe))
            for n, _ in variants:
                ips, d = _with_retries(measures[n])
                fed[n].append(ips)
                drain[n].append(d)
                print(f"# trial {t + 1}/{k} {n}: {ips:.1f} img/s "
                      f"(drain {d:.1f}, h2d {h2d[-1]:.1f} MB/s)", flush=True)

        def med_iqr(xs):
            import numpy as np

            q1, q2, q3 = np.percentile(xs, [25, 50, 75])
            return round(float(q2), 1), round(float(q3 - q1), 1)

        stats = {n: med_iqr(fed[n]) for n in fed}
        host_med = stats["host_aug"][0]
        nat_med = stats["device_aug_native"][0]
        out = {
            "metric": "pipeline A/B device-aug+native speedup "
                      f"(median of {k} interleaved trials)",
            "value": nat_med,
            "unit": "images/sec",
            "vs_baseline": round(nat_med / max(host_med, 1e-9), 3),
            "h2d_ceiling_mbps": med_iqr(h2d),
        }
        for n in fed:
            out[f"{n}_med_iqr"] = stats[n]
            out[f"{n}_drain_med_iqr"] = med_iqr(drain[n])
        print(json.dumps(out))
    elif "--pipeline-native" in sys.argv:
        _with_retries(lambda: run_pipeline(device_aug=True, native=True))
    elif "--pipeline-devaug" in sys.argv:
        _with_retries(lambda: run_pipeline(device_aug=True))
    elif "--pipeline" in sys.argv:
        _with_retries(run_pipeline)
    elif "--bs256" in sys.argv:
        _with_retries(lambda: run(batch=256))
    elif "--embed-int8-swin" in sys.argv:
        _with_retries(
            lambda: run_embed_quant(
                backbone="swin_base_patch4_window7_224", label="Swin-B"
            )
        )
    elif "--embed-int8" in sys.argv:
        _with_retries(run_embed_quant)
    else:
        _with_retries(run)
