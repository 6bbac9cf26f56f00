"""Golden-parity tests: margin-head logits vs the reference formulas
re-implemented independently in torch (CPU). Catches any drift in the fused
JAX ops' math."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from visiondk_tpu.ops import margin_heads as mh


def _rand(B=8, D=16, C=10, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(D, C)).astype(np.float32)
    f = rng.normal(size=(B, D)).astype(np.float32) * 3.0
    y = rng.integers(0, C, size=(B,)).astype(np.int32)
    return w, f, y


def torch_arcface(w, f, y, m_arc=0.35, m_am=0.0, s=32.0):
    w = torch.tensor(w)
    f = torch.tensor(f)
    y = torch.tensor(y, dtype=torch.long)
    kernel = F.normalize(w, dim=0)
    feats = F.normalize(f)
    cos = torch.mm(feats, kernel).clamp(-1, 1)
    sin = torch.sqrt(1.0 - cos.pow(2))
    cos_m = cos * math.cos(m_arc) - sin * math.sin(m_arc)
    cos_m = torch.where(cos > math.cos(math.pi - m_arc), cos_m, cos - m_am)
    out = cos.clone()
    idx = torch.zeros_like(cos).scatter_(1, y.view(-1, 1), 1).bool()
    out[idx] = cos_m[idx]
    return (out * s).numpy()


def torch_circle(w, f, y, margin=0.25, gamma=256.0):
    w = torch.tensor(w)
    f = torch.tensor(f)
    y = torch.tensor(y, dtype=torch.long)
    cos = torch.mm(F.normalize(f), F.normalize(w, dim=0)).clamp(-1, 1)
    alpha_p = torch.clamp_min(1 + margin - cos.detach(), 0.0)
    alpha_n = torch.clamp_min(cos.detach() + margin, 0.0)
    logit_p = alpha_p * (cos - (1 - margin))
    logit_n = alpha_n * (cos - margin)
    out = logit_n.clone()
    idx = torch.zeros_like(cos).scatter_(1, y.view(-1, 1), 1).bool()
    out[idx] = logit_p[idx]
    return (out * gamma).numpy()


def torch_mv(w, f, y, is_am=False, margin=0.35, mvw=1.12, s=32.0):
    w = torch.tensor(w)
    f = torch.tensor(f)
    y = torch.tensor(y, dtype=torch.long)
    cos = torch.mm(F.normalize(f), F.normalize(w, dim=0))
    B = y.shape[0]
    gt = cos[torch.arange(B), y].view(-1, 1)
    if is_am:
        mask = cos > gt - margin
        final_gt = torch.where(gt > margin, gt - margin, gt)
    else:
        sin = torch.sqrt(1.0 - gt.pow(2))
        cos_m = gt * math.cos(margin) - sin * math.sin(margin)
        mask = cos > cos_m
        final_gt = torch.where(gt > 0, cos_m, gt)
    hard = cos[mask]
    cos = cos.clone()
    cos[mask] = mvw * hard + mvw - 1.0
    cos.scatter_(1, y.view(-1, 1), final_gt)
    return (cos * s).numpy()


def torch_magface(w, f, y, m_am=0.0, s=32.0, l_a=10.0, u_a=110.0, l_m=0.45, u_m=0.8, lam=20.0):
    w = torch.tensor(w)
    f = torch.tensor(f)
    y = torch.tensor(y, dtype=torch.long)
    x_norm = torch.norm(f, dim=1, keepdim=True).clamp(l_a, u_a)
    ada = (u_m - l_m) / (u_a - l_a) * (x_norm - l_a) + l_m
    cos_ada, sin_ada = torch.cos(ada), torch.sin(ada)
    loss_g = x_norm / u_a**2 + 1.0 / x_norm
    cos = torch.mm(F.normalize(f), F.normalize(w, dim=0)).clamp(-1, 1)
    sin = torch.sqrt(1.0 - cos.pow(2))
    cos_m = cos * cos_ada - sin * sin_ada
    min_cos = torch.cos(math.pi - ada)
    cos_m = torch.where(cos > min_cos, cos_m, cos - m_am)
    out = cos.clone()
    idx = torch.zeros_like(cos).scatter_(1, y.view(-1, 1), 1).bool()
    out[idx] = cos_m[idx]
    return (out * s).numpy(), (lam * loss_g).mean().item()


def test_arcface_matches_reference_math():
    w, f, y = _rand()
    ours, aux = mh.arcface_logits(jnp.asarray(w), jnp.asarray(f), jnp.asarray(y))
    ref = torch_arcface(w, f, y)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
    assert float(aux) == 0.0


def test_circle_matches_reference_math():
    w, f, y = _rand(seed=1)
    ours, _ = mh.circle_logits(jnp.asarray(w), jnp.asarray(f), jnp.asarray(y))
    ref = torch_circle(w, f, y)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("is_am", [False, True])
def test_mv_softmax_matches_reference_math(is_am):
    w, f, y = _rand(seed=2)
    ours, _ = mh.mv_softmax_logits(
        jnp.asarray(w), jnp.asarray(f), jnp.asarray(y), is_am=is_am
    )
    ref = torch_mv(w, f, y, is_am=is_am)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_magface_matches_reference_math():
    w, f, y = _rand(seed=3)
    ours, aux = mh.magface_logits(jnp.asarray(w), jnp.asarray(f), jnp.asarray(y))
    ref, ref_aux = torch_magface(w, f, y)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(aux), ref_aux, rtol=1e-4)


def test_weight_init_unit_columns():
    import jax

    w = mh.init_margin_weight(jax.random.key(0), 64, 100)
    norms = np.linalg.norm(np.asarray(w), axis=0)
    np.testing.assert_allclose(norms, np.ones(100), rtol=1e-5)
