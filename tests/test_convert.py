"""torch→JAX weight converter tests: numeric parity of the tensor-layout
rules (conv OIHW→HWIO, linear transpose, BN stats) and the npz round-trip.
End-to-end logits parity against REAL torch models lives in
tests/test_torch_parity.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_conv_bn_linear_numeric_parity():
    """torch functional ops vs flax modules loaded with converted tensors."""
    import jax.numpy as jnp
    import torch.nn.functional as F
    from flax import linen as nn

    from visiondk_tpu.models.convert import _conv, _dense, _t

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 5, 3)).astype(np.float32)  # NHWC
    xt = torch.tensor(x.transpose(0, 3, 1, 2))  # NCHW

    # conv
    wt = torch.tensor(rng.normal(size=(4, 3, 3, 3)).astype(np.float32))
    yt = F.conv2d(xt, wt, padding=1).numpy().transpose(0, 2, 3, 1)
    conv = nn.Conv(4, (3, 3), padding=1, use_bias=False)
    yj = conv.apply({"params": {"kernel": jnp.asarray(_conv(wt))}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-5)

    # batchnorm (eval mode with running stats)
    gamma = torch.tensor(rng.normal(size=(4,)).astype(np.float32))
    beta = torch.tensor(rng.normal(size=(4,)).astype(np.float32))
    mean = torch.tensor(rng.normal(size=(4,)).astype(np.float32))
    var = torch.tensor(rng.uniform(0.5, 2.0, size=(4,)).astype(np.float32))
    zt = F.batch_norm(torch.tensor(yt.transpose(0, 3, 1, 2)), mean, var, gamma, beta, False)
    bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    zj = bn.apply(
        {
            "params": {"scale": jnp.asarray(_t(gamma)), "bias": jnp.asarray(_t(beta))},
            "batch_stats": {"mean": jnp.asarray(_t(mean)), "var": jnp.asarray(_t(var))},
        },
        jnp.asarray(yt),
    )
    np.testing.assert_allclose(np.asarray(zj), zt.numpy().transpose(0, 2, 3, 1), atol=1e-4)

    # linear
    wl = torch.tensor(rng.normal(size=(7, 4)).astype(np.float32))
    bl = torch.tensor(rng.normal(size=(7,)).astype(np.float32))
    feats = zt.mean(dim=(2, 3))
    lt = F.linear(feats, wl, bl).numpy()
    dense = nn.Dense(7)
    lj = dense.apply(
        {"params": {"kernel": jnp.asarray(_dense(wl)), "bias": jnp.asarray(_t(bl))}},
        jnp.asarray(feats.numpy()),
    )
    np.testing.assert_allclose(np.asarray(lj), lt, atol=1e-4)


def _resnet18_state_dict(num_classes=5):
    """Synthetic torchvision-resnet18-shaped state_dict."""
    rng = np.random.default_rng(0)
    sd = {}

    def add_conv(name, o, i, k):
        sd[name] = torch.tensor(rng.normal(size=(o, i, k, k)).astype(np.float32) * 0.05)

    def add_bn(prefix, c):
        for suffix, val in (
            ("weight", np.ones(c)), ("bias", np.zeros(c)),
            ("running_mean", np.zeros(c)), ("running_var", np.ones(c)),
        ):
            sd[f"{prefix}.{suffix}"] = torch.tensor(val.astype(np.float32))

    add_conv("conv1.weight", 64, 3, 7)
    add_bn("bn1", 64)
    chans = [64, 128, 256, 512]
    for s, c in enumerate(chans, start=1):
        in_c = chans[s - 2] if s > 1 else 64
        for b in range(2):
            cin = in_c if b == 0 else c
            add_conv(f"layer{s}.{b}.conv1.weight", c, cin, 3)
            add_bn(f"layer{s}.{b}.bn1", c)
            add_conv(f"layer{s}.{b}.conv2.weight", c, c, 3)
            add_bn(f"layer{s}.{b}.bn2", c)
            if b == 0 and s > 1:
                add_conv(f"layer{s}.{b}.downsample.0.weight", c, cin, 1)
                add_bn(f"layer{s}.{b}.downsample.1", c)
    sd["fc.weight"] = torch.tensor(rng.normal(size=(num_classes, 512)).astype(np.float32) * 0.05)
    sd["fc.bias"] = torch.tensor(np.zeros(num_classes, np.float32))
    return sd


def test_tf_checkpoints_dispatch_only_for_registered_tf_factories():
    # tf_* state_dicts have IDENTICAL keys to the non-tf variants, and the
    # tf_ model factories implement the asymmetric TF-SAME padding their
    # weights require (backbones/mobilenet.tf_same_padding). The dispatcher
    # therefore routes tf_ names to the family converters ONLY when a
    # matching tf_ factory is registered — converting e.g. tf_resnet18 would
    # "succeed" into a symmetric-padding model with silently shifted
    # activations (ADVICE r4 low #4).
    import pytest

    from visiondk_tpu.models.convert import convert_state_dict

    sd = _resnet18_state_dict()
    with pytest.raises(ValueError, match="TF-SAME"):
        convert_state_dict(sd, "tf_resnet18")
    # registered tf_ factories (with or without a timm tag) still dispatch:
    # golden logit tests live in tests/test_torch_parity_families.py
    from visiondk_tpu.models.backbones import BACKBONES

    assert "tf_efficientnetv2_l" in BACKBONES
    assert "tf_mobilenetv3_large_minimal_100" in BACKBONES


def test_tf_same_padding_geometry():
    """TF-SAME: even-input stride-2 k3 pads (0,1) (bottom/right only);
    stride-1 odd kernels stay symmetric."""
    from visiondk_tpu.models.backbones.mobilenet import tf_same_padding

    assert tf_same_padding(224, 224, 3, 2) == ((0, 1), (0, 1))
    assert tf_same_padding(225, 224, 3, 2) == ((1, 1), (0, 1))
    assert tf_same_padding(224, 224, 3, 1) == ((1, 1), (1, 1))
    assert tf_same_padding(224, 224, 5, 1) == ((2, 2), (2, 2))
    assert tf_same_padding(112, 112, 5, 2) == ((1, 2), (1, 2))


def test_npz_roundtrip(tmp_path):
    from visiondk_tpu.models.convert import convert_state_dict, load_converted, save_converted

    sd = _resnet18_state_dict()
    converted = convert_state_dict(sd, "resnet18")
    p = str(tmp_path / "w.npz")
    save_converted(converted, p)
    loaded = load_converted(p)
    assert set(loaded) == set(converted)
    assert set(loaded["params"]) == set(converted["params"])
    np.testing.assert_array_equal(
        loaded["params"]["stem_conv/kernel"], converted["params"]["stem_conv/kernel"]
    )
