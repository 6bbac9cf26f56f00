"""EMA ramp-decay and OHEM masked-loss parity."""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from visiondk_tpu.models.ema import ema_decay, init_ema, update_ema
from visiondk_tpu.engine.steps import OHEMConfig, ohem_mask


def test_ema_decay_ramp():
    for updates in (1, 10, 100, 2000, 100000):
        ours = float(ema_decay(jnp.asarray(updates)))
        ref = 0.9999 * (1 - math.exp(-updates / 2000))
        assert abs(ours - ref) < 1e-6


def test_ema_update_matches_reference_recurrence():
    tree = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
    ema = init_ema(tree)
    live = {"w": jnp.arange(4.0) * 2, "b": jnp.zeros(2)}
    updates = jnp.asarray(5)
    new = update_ema(ema, live, updates)
    d = 0.9999 * (1 - math.exp(-5 / 2000))
    np.testing.assert_allclose(
        np.asarray(new["w"]), d * np.arange(4.0) + (1 - d) * np.arange(4.0) * 2, rtol=1e-6
    )


def _torch_ohem(logits, labels, min_kept, thresh, ignore_index=255):
    # independent re-implementation of reference structure/sampler.py
    logits = torch.tensor(logits)
    labels = torch.tensor(labels, dtype=torch.long)
    prob = F.softmax(logits, dim=1)
    valid1 = labels != ignore_index
    prob_v = prob[valid1]
    tmp = prob_v.gather(1, labels[valid1].unsqueeze(1)).squeeze(1)
    sort_prob, sort_idx = tmp.sort()
    min_thresh = sort_prob[min(min_kept, sort_prob.numel() - 1)]
    threshold = max(float(min_thresh), thresh)
    temp_valid = sort_prob < threshold
    valid_indices = sort_idx[temp_valid]
    valid2 = torch.zeros_like(labels, dtype=torch.bool)
    valid2[valid_indices] = True
    return (valid1 & valid2).numpy()


def test_ohem_mask_matches_reference():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(32, 10)).astype(np.float32) * 3
    labels = rng.integers(0, 10, size=32).astype(np.int32)
    cfg = OHEMConfig(min_kept=8, thresh=0.7)
    ours = np.asarray(ohem_mask(jnp.asarray(logits), jnp.asarray(labels), cfg))
    ref = _torch_ohem(logits, labels, 8, 0.7)
    np.testing.assert_array_equal(ours.astype(bool), ref)
