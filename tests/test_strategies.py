"""Strategy-knob tests: SAM, mixup, layer-wise LR, progressive resize."""

import numpy as np
import pytest


def test_sam_perturb_matches_reference_formula():
    """e(w) = rho * |w|*g / ||w*g|| elementwise with w^2 factor (adaptive SAM,
    reference engine/optimizer.py:44-56)."""
    import jax.numpy as jnp

    from visiondk_tpu.engine.optim import SAMConfig, sam_perturb

    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))}
    grads = {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
             "b": jnp.asarray(rng.normal(size=(5,)).astype(np.float32))}
    cfg = SAMConfig(rho=0.05, adaptive=True)
    out = sam_perturb(params, grads, cfg)

    pa, ga = np.asarray(params["a"]), np.asarray(grads["a"])
    pb, gb = np.asarray(params["b"]), np.asarray(grads["b"])
    norm = np.sqrt((np.abs(pa) * ga).__pow__(2).sum() + (np.abs(pb) * gb).__pow__(2).sum())
    expect_a = pa + (pa**2) * ga * (0.05 / (norm + 1e-12))
    np.testing.assert_allclose(np.asarray(out["a"]), expect_a, rtol=1e-5)


def test_sam_step_trains():
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.optim import SAMConfig
    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_train_step
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.models.factory import VisionModel

    model = VisionModel(backbone_name="resnet18", num_classes=2)
    rng = jax.random.key(0)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng}, x, train=False)
    tx = optax.sgd(0.05, momentum=0.9)
    state = create_train_state(variables, tx)
    step = make_train_step(
        model, tx, create_lossfn("ce"),
        StepConfig(sam=SAMConfig()), jax.random.key(1),
    )
    data = np.random.default_rng(0)
    images = (data.normal([[200, 40, 40]], 25, size=(8, 32, 32, 3))).clip(0, 255).astype(np.uint8)
    images[4:] = (data.normal([[40, 40, 200]], 25, size=(4, 32, 32, 3))).clip(0, 255).astype(np.uint8)
    labels = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    losses = []
    for _ in range(15):
        state, m = step(state, batch, jnp.float32(0.0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses


def test_mixup_loss_matches_manual():
    """Step loss with mixup λ equals λ·CE(y) + (1−λ)·CE(y_perm) given the
    step's deterministic permutation RNG."""
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, device_preprocess, make_train_step
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.models.factory import VisionModel

    model = VisionModel(backbone_name="resnet18", num_classes=3)
    rng = jax.random.key(0)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng}, x, train=False)
    tx = optax.sgd(0.0)  # lr 0: params unchanged → comparable forward
    state = create_train_state(variables, tx)
    lossfn = create_lossfn("ce")
    base_rng = jax.random.key(7)
    cfg = StepConfig(mixup=True)
    step = make_train_step(model, tx, lossfn, cfg, base_rng, donate=False)

    data = np.random.default_rng(0)
    images = data.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    labels = data.integers(0, 3, (8,)).astype(np.int32)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}
    lam = 0.3
    _, metrics = step(state, batch, jnp.float32(lam))

    # manual recomputation with the same fold_in(0) permutation
    perm_rng, _ = jax.random.split(jax.random.fold_in(base_rng, 0))
    perm = jax.random.permutation(perm_rng, 8)
    ims = device_preprocess(batch["image"], cfg.mean, cfg.std)
    mixed = lam * ims + (1 - lam) * jnp.take(ims, perm, axis=0)
    logits, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        mixed, train=True, mutable=["batch_stats"],
    )
    expect = lam * lossfn(logits, batch["label"], None) + (1 - lam) * lossfn(
        logits, jnp.take(batch["label"], perm, axis=0), None
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(expect), rtol=1e-5)


def test_layer_wise_lr_head_multiplier():
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.optim import create_optimizer

    params = {
        "backbone": {"w": jnp.ones((4, 4))},
        "head": {"w": jnp.ones((4, 4))},
    }
    tx = create_optimizer(
        "sgd", lambda c: 0.1, 0.0, lambda c: 0.0, layer_wise_lr=True
    )
    opt_state = tx.init(params)
    grads = {"backbone": {"w": jnp.ones((4, 4))}, "head": {"w": jnp.ones((4, 4))}}
    updates, _ = tx.update(grads, opt_state, params)
    bb = float(np.asarray(updates["backbone"]["w"]).mean())
    hd = float(np.asarray(updates["head"]["w"]).mean())
    assert abs(hd / bb - 10.0) < 1e-4, (bb, hd)


def test_progressive_resize_rewrites_pipeline():
    from PIL import Image

    from visiondk_tpu.data.transforms import create_aug_transforms, set_pipeline_size

    pipe = create_aug_transforms([
        {"random_choice": {"transforms": [
            {"resize_and_padding": {"size": 64}},
            {"random_crop_and_resize": {"size": 64}},
        ]}},
        {"to_tensor": "no_params"},
    ])
    set_pipeline_size(pipe, 32)
    img = Image.fromarray(np.zeros((80, 60, 3), np.uint8))
    out = np.asarray(pipe(img))
    assert out.shape[:2] == (32, 32)


def test_backbone_freeze_masks_updates():
    """backbone_freeze: only classifier ('fc') params receive updates."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.engine.optim import create_optimizer
    from visiondk_tpu.models.backbones import BACKBONES

    model = BACKBONES.create("resnet18", num_classes=2)
    variables = model.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)), train=False)
    params = variables["params"]
    tx = create_optimizer(
        "sgd", lambda c: 0.1, 0.0, lambda c: 0.0, backbone_freeze=True
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, leaf in flat:
        parts = [str(getattr(p, "key", "")) for p in path]
        moved = float(jnp.abs(leaf).sum())
        if "fc" in parts:
            assert moved > 0, parts
        else:
            assert moved == 0, parts


def test_bn_freeze_keeps_running_stats():
    """bn_freeze: BN uses running stats in train mode and never updates them."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.factory import get_model

    cfg = {"task": "classification", "name": "resnet18", "num_classes": 2,
           "kwargs": {}, "bn_freeze": True}
    model = get_model(cfg)
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    out, new_state = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(new_state.get("batch_stats", {}))
    delta = sum(float(jnp.abs(a - b).sum()) for a, b in zip(before, after)) if after else 0.0
    assert delta == 0.0


def test_gradient_accumulation_matches_full_batch():
    """hyp.accumulate (optax.MultiSteps in trainer._build_tx): k mini-batch
    grads averaged per applied update == one full-batch step (CE mean over
    equal halves is linear; BN-free model so no stat divergence)."""
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_train_step
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.models.backbones import BACKBONES

    model = BACKBONES.create("vit_small_patch16_224", num_classes=5)
    rng = jax.random.key(0)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)

    data = np.random.default_rng(1)
    images = jnp.asarray(data.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8))
    labels = jnp.asarray(data.integers(0, 5, (8,)).astype(np.int32))
    lossfn = create_lossfn("ce")
    cfg = StepConfig()
    lam = jnp.float32(0.0)

    tx_full = optax.sgd(0.1, momentum=0.9)
    s_full = create_train_state(variables, tx_full)
    step_full = make_train_step(model, tx_full, lossfn, cfg, jax.random.key(2), donate=False)
    s_full, _ = step_full(s_full, {"image": images, "label": labels}, lam)

    tx_acc = optax.MultiSteps(optax.sgd(0.1, momentum=0.9), every_k_schedule=2)
    s_acc = create_train_state(variables, tx_acc)
    step_acc = make_train_step(model, tx_acc, lossfn, cfg, jax.random.key(2), donate=False)
    s_acc, _ = step_acc(s_acc, {"image": images[:4], "label": labels[:4]}, lam)
    mid = jax.tree_util.tree_leaves(s_acc.params)
    base = jax.tree_util.tree_leaves(variables["params"])
    # first mini-step: grads buffered, params untouched
    assert all(np.array_equal(a, b) for a, b in zip(mid, base))
    # EMA must not tick on the buffered mini-step (or its horizon shrinks k×)
    assert int(s_acc.ema_updates) == 0
    for a, b in zip(jax.tree_util.tree_leaves(s_acc.ema_params),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b, dtype=np.float32))
    s_acc, _ = step_acc(s_acc, {"image": images[4:], "label": labels[4:]}, lam)

    for a, b in zip(jax.tree_util.tree_leaves(s_acc.params),
                    jax.tree_util.tree_leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # ...and after the applied update the EMA matches the full-batch run's
    # exactly (same count, same decay, same params)
    assert int(s_acc.ema_updates) == int(s_full.ema_updates) == 1
    for a, b in zip(jax.tree_util.tree_leaves(s_acc.ema_params),
                    jax.tree_util.tree_leaves(s_full.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_accumulate_config_validation():
    import pytest as _pytest

    from visiondk_tpu.config.checks import check_cfgs_common

    base = {
        "hyp": {
            "loss": {"ce": True},
            "optimizer": ["sgd", False],
            "scheduler": "cosine_with_warm",
            "warm_ep": 1,
            "epochs": 5,
            "accumulate": 0,
        },
        "data": {"train": {"augment": []}, "val": {"augment": []}},
        "model": {"name": "resnet18", "image_size": 32, "num_classes": 2},
    }
    with _pytest.raises(ValueError, match="accumulate"):
        check_cfgs_common(base)


def test_accumulate_schedule_calibration():
    """With hyp.accumulate=k the LR schedule runs on APPLIED updates
    (fractional steps_per_epoch/k — no floor), and the logging hook
    _lr_fn accepts MINI-step counts."""
    import jax.numpy as jnp

    from visiondk_tpu.engine.schedules import create_scheduler
    from visiondk_tpu.engine.trainer import CenterProcessor

    cp = object.__new__(CenterProcessor)
    cp.hyp_cfg = {
        "scheduler": "cosine_with_warm", "warm_ep": 1, "epochs": 10,
        "lr0": 1.0, "lrf_ratio": 0.1, "momentum": 0.9,
        "warmup_momentum": 0.8, "weight_decay": 0.0, "accumulate": 4,
    }
    cp.opt_name = "sgd"
    cp.layer_wise = None
    cp.model_cfg = {}
    cp._build_tx(steps_per_epoch=10, discrete_per_epoch=False)

    ref = create_scheduler("cosine_with_warm", 1, 10, 1.0, 0.1)
    # mini-count 50 = applied 12 = epoch 12/2.5 = 4.8 (spe_applied=10/4=2.5,
    # NOT floor→2 which would evaluate at epoch 6)
    np.testing.assert_allclose(
        float(cp._lr_fn(50)), float(ref(jnp.float32(12 / 2.5))), rtol=1e-6
    )
    # flat within one accumulation group (same applied count)
    assert float(cp._lr_fn(48)) == float(cp._lr_fn(51))
    # end of training lands exactly at the schedule end, not past it
    np.testing.assert_allclose(
        float(cp._lr_fn(100)), float(ref(jnp.float32(10.0))), rtol=1e-6
    )


def test_sam_local_perturb_m_sharpness(mesh8):
    """SAM per-device first-grad parity (reference train.py:157-159: first
    backward under model.no_sync() → per-rank ε; second backward DDP-averaged).
    On the 8-device mesh: (a) the local-ε step matches a hand-computed
    per-shard two-pass exactly, (b) it differs from the global-ε step."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from visiondk_tpu.engine.optim import SAMConfig, sam_perturb
    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import (
        StepConfig, device_preprocess, make_train_step,
    )
    from visiondk_tpu.losses import create_lossfn
    from visiondk_tpu.parallel.mesh import set_current_mesh

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(4, dtype=jnp.float32)(x.mean(axis=(1, 2)))

    model = Tiny()
    rng = jax.random.key(0)
    x = jnp.zeros((16, 8, 8, 3), jnp.float32)
    variables = model.init({"params": rng}, x, train=False)
    lossfn = create_lossfn("ce")
    lr = 0.1
    tx = optax.sgd(lr)
    cfg_local = StepConfig(sam=SAMConfig(rho=0.05, adaptive=True, local_perturb=True))
    cfg_global = StepConfig(sam=SAMConfig(rho=0.05, adaptive=True, local_perturb=False))

    data = np.random.default_rng(0)
    images = data.integers(0, 255, (16, 8, 8, 3)).astype(np.uint8)
    labels = data.integers(0, 4, (16,)).astype(np.int32)
    batch = {"image": jnp.asarray(images), "label": jnp.asarray(labels)}

    set_current_mesh(mesh8.mesh)  # published at build time → local path active
    step_local = make_train_step(model, tx, lossfn, cfg_local, jax.random.key(1), donate=False)
    step_global = make_train_step(model, tx, lossfn, cfg_global, jax.random.key(1), donate=False)
    state = create_train_state(variables, tx)
    s_local, m_local = step_local(state, batch, jnp.float32(0.0))
    s_global, m_global = step_global(state, batch, jnp.float32(0.0))
    set_current_mesh(None)

    # (b) per-device ε ≠ global ε → different updates
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s_local.params, s_global.params
    )
    assert max(jax.tree_util.tree_leaves(d)) > 1e-7, d

    # (a) hand-computed per-shard two-pass (8 shards × 2 samples)
    ims = device_preprocess(batch["image"], cfg_local.mean, cfg_local.std)

    def loss_of(params, imgs, labs):
        return lossfn(model.apply({"params": params}, imgs, train=True), labs, None)

    shard_grads = []
    for s in range(8):
        sl = slice(2 * s, 2 * s + 2)
        g1 = jax.grad(loss_of)(state.params, ims[sl], batch["label"][sl])
        perturbed = sam_perturb(state.params, g1, cfg_local.sam)
        g2 = jax.grad(loss_of)(perturbed, ims[sl], batch["label"][sl])
        shard_grads.append(g2)
    mean_g2 = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / len(gs), *shard_grads
    )
    expect = jax.tree_util.tree_map(lambda p, g: p - lr * g, state.params, mean_g2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        s_local.params, expect,
    )

    # the global-ε step matches the single-perturbation math
    g1 = jax.grad(loss_of)(state.params, ims, batch["label"])
    perturbed = sam_perturb(state.params, g1, cfg_global.sam)
    g2 = jax.grad(loss_of)(perturbed, ims, batch["label"])
    expect_g = jax.tree_util.tree_map(lambda p, g: p - lr * g, state.params, g2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        ),
        s_global.params, expect_g,
    )
