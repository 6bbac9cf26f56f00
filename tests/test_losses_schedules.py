"""Loss and schedule parity vs torch reference semantics."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from visiondk_tpu.losses import losses as L
from visiondk_tpu.engine.schedules import create_scheduler


def _logits(B=16, C=7, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(B, C)).astype(np.float32), rng.integers(0, C, size=B)


def test_ce_label_smoothing_matches_torch():
    logits, labels = _logits()
    for s in (0.0, 0.05, 0.2):
        ours = float(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), s))
        ref = float(
            nn.CrossEntropyLoss(label_smoothing=s)(
                torch.tensor(logits), torch.tensor(labels, dtype=torch.long)
            )
        )
        assert abs(ours - ref) < 1e-5, (s, ours, ref)


def test_ce_smoothing_over_padded_classes():
    """Margin heads pad the class dim and mask pad logits to −1e9
    (models/heads.py); smoothing must spread its mass over the REAL classes
    only (valid_class, wired by trainer.py), or every pad column adds
    ~ls/C·1e9 to each sample's loss."""
    logits, labels = _logits(B=8, C=5, seed=3)
    pad = np.full((8, 3), -1e9, np.float32)  # 5 real + 3 pad columns
    padded = np.concatenate([logits, pad], axis=1)
    for s in (0.05, 0.2):
        exact = float(
            nn.CrossEntropyLoss(label_smoothing=s)(
                torch.tensor(logits), torch.tensor(labels, dtype=torch.long)
            )
        )
        ours = float(
            L.softmax_cross_entropy(
                jnp.asarray(padded), jnp.asarray(labels), s, valid_class=5
            )
        )
        assert abs(ours - exact) < 1e-5, (s, ours, exact)
        # without valid_class the pad mass lands on −1e9 columns: the loss
        # explodes by ~ls·(3/8)·1e9 — the bug this parameter exists to prevent
        broken = float(L.softmax_cross_entropy(jnp.asarray(padded), jnp.asarray(labels), s))
        assert broken > 1e6
    # no smoothing: pads are softmax-zero, valid_class is a no-op either way
    a = float(L.softmax_cross_entropy(jnp.asarray(padded), jnp.asarray(labels), 0.0, valid_class=5))
    b = float(L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.0))
    assert abs(a - b) < 1e-5


def test_bce_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    targets = (rng.random((8, 5)) > 0.5).astype(np.float32)
    ours = float(L.sigmoid_binary_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    ref = float(nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(targets)))
    assert abs(ours - ref) < 1e-6


def test_focal_matches_reference_formula():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    targets = (rng.random((8, 5)) > 0.5).astype(np.float32)
    alpha, gamma = 0.25, 1.5
    ours = float(L.sigmoid_focal(jnp.asarray(logits), jnp.asarray(targets), alpha, gamma))

    lt, tt = torch.tensor(logits), torch.tensor(targets)
    loss = nn.BCEWithLogitsLoss(reduction="none")(lt, tt)
    p = torch.sigmoid(lt)
    p_t = tt * p + (1 - tt) * (1 - p)
    af = tt * alpha + (1 - tt) * (1 - alpha)
    ref = float((loss * af * (1 - p_t) ** gamma).mean())
    assert abs(ours - ref) < 1e-6


def test_sample_weight_masks_rows():
    logits, labels = _logits()
    w = np.zeros(16, np.float32)
    w[:4] = 1.0
    ours = float(
        L.softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 0.0, jnp.asarray(w))
    )
    ref = float(
        nn.CrossEntropyLoss()(
            torch.tensor(logits[:4]), torch.tensor(labels[:4], dtype=torch.long)
        )
    )
    assert abs(ours - ref) < 1e-5


def _torch_lr_trace(name, warm_ep, epochs, lr0, lrf_ratio):
    from torch.optim.lr_scheduler import LinearLR, CosineAnnealingLR, SequentialLR

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr0)
    r = 0.1 if lrf_ratio is None else lrf_ratio
    if name == "cosine":
        sched = CosineAnnealingLR(opt, T_max=epochs, eta_min=r * lr0)
    elif name == "linear":
        sched = LinearLR(opt, start_factor=1, end_factor=r, total_iters=epochs)
    elif name == "cosine_with_warm":
        sched = SequentialLR(
            opt,
            [
                LinearLR(opt, start_factor=0.1, end_factor=1, total_iters=warm_ep),
                CosineAnnealingLR(opt, T_max=epochs - warm_ep, eta_min=r * lr0),
            ],
            milestones=[warm_ep],
        )
    else:
        sched = SequentialLR(
            opt,
            [
                LinearLR(opt, start_factor=0.1, end_factor=1, total_iters=warm_ep),
                LinearLR(opt, start_factor=1, end_factor=r, total_iters=epochs - warm_ep),
            ],
            milestones=[warm_ep],
        )
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    return np.asarray(out)


@pytest.mark.parametrize("name,warm", [("cosine", 0), ("linear", 0), ("cosine_with_warm", 2), ("linear_with_warm", 2)])
def test_schedules_match_torch(name, warm):
    epochs, lr0 = 12, 0.006
    sched = create_scheduler(name, warm, epochs, lr0, None)
    ours = np.asarray([float(sched(t)) for t in range(epochs)])
    ref = _torch_lr_trace(name, warm, epochs, lr0, None)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-8)
