"""CAM + Visualizer tests (reference utils/cam.py, engine/procedure/visualizer.py)."""

import numpy as np
import pytest
from PIL import Image


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


class _Logger:
    def console(self, *a):
        pass


def _make_imgs(tmp_path, n=4, size=32):
    tmp_path.mkdir(parents=True, exist_ok=True)
    paths = []
    rng = np.random.default_rng(0)
    for i in range(n):
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    return paths


@pytest.fixture(scope="module")
def small_model():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.factory import VisionModel

    model = VisionModel(backbone_name="resnet18", num_classes=4)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    return model, variables, x


@pytest.mark.parametrize(
    "method",
    ["gradcam", "gradcampp", "xgradcam", "layercam", "eigencam",
     "ablationcam", "scorecam"],
)
def test_cam_methods(small_model, method):
    from visiondk_tpu.utils.cam import ClassActivationMaper

    model, variables, x = small_model
    cam = ClassActivationMaper(
        model, method=method, variables=variables, example=x, backbone_name="resnet18"
    )
    assert "stage4_block" in cam.target_path

    img = np.zeros((32, 32, 3), np.uint8)
    overlay = cam(image=img, input_tensor=np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32))
    assert overlay.shape == (32, 32, 3)
    assert overlay.dtype == np.uint8


def test_cam_vit_token_map():
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.factory import VisionModel
    from visiondk_tpu.utils.cam import ClassActivationMaper

    model = VisionModel(backbone_name="vit_small_patch16_224", num_classes=3)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False)
    cam = ClassActivationMaper(
        model, method="gradcam", variables=variables, example=x, backbone_name="vit_small_patch16_224"
    )
    assert cam.target_path.endswith("norm1")
    overlay = cam(image=np.zeros((32, 32, 3), np.uint8), input_tensor=np.zeros((1, 32, 32, 3), np.float32))
    assert overlay.shape == (32, 32, 3)


def test_cam_swin_token_map_no_cls():
    """Swin token maps are exact H*W squares with NO cls token: _to_spatial
    must reshape directly instead of dropping a first row (which skews the
    whole map)."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.models.factory import VisionModel
    from visiondk_tpu.utils.cam import ClassActivationMaper, _to_spatial

    fm = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sp = _to_spatial(fm, drop_cls=True)  # 16 = 4x4 exact -> no drop
    assert sp.shape == (4, 4, 4)
    assert np.array_equal(sp.reshape(16, 4), fm)

    model = VisionModel(backbone_name="swin_tiny_patch4_window7_224", num_classes=3)
    x = jnp.zeros((1, 56, 56, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, x, train=False
    )
    cam = ClassActivationMaper(
        model, method="gradcam", variables=variables, example=x,
        backbone_name="swin_tiny_patch4_window7_224",
    )
    assert cam.target_path.endswith("norm1")
    overlay = cam(image=np.zeros((56, 56, 3), np.uint8), input_tensor=np.zeros((1, 56, 56, 3), np.float32))
    assert overlay.shape == (56, 56, 3)


def test_predict_images_badcase(tmp_path):
    from visiondk_tpu.engine.visualizer import Visualizer

    paths = _make_imgs(tmp_path / "data", 4)
    (tmp_path / "data").mkdir(exist_ok=True)

    class DS:
        def __len__(self):
            return len(paths)

        def __getitem__(self, i):
            img = Image.open(paths[i])
            return img, np.asarray(img), paths[i]

    # forward: always predicts class 1 ("dog")
    def forward(x):
        return np.array([[0.1, 5.0, 0.2]])

    out = tmp_path / "vis"
    Visualizer.predict_images(
        forward, DS(), out, {0: "cat", 1: "dog", 2: "bird"}, _Logger(),
        thresh=0, badcase=True, target_class="cat", save_image=True,
    )
    # all predicted dog, target cat → all badcases moved
    assert len(list((out / "bad_case").glob("*.jpg"))) == 4
    assert len(list((out / "labels").glob("*.txt"))) == 4
    txt = (out / "labels" / "img_0.txt").read_text().splitlines()
    assert txt[0].split()[0] == "dog"


def test_visualize_results_grid(tmp_path):
    from visiondk_tpu.engine.visualizer import Visualizer

    d = tmp_path / "g" / "id1"
    d.mkdir(parents=True)
    paths = _make_imgs(d, 6)
    out = Visualizer.visualize_results(
        paths[0], paths[1:6], [0.9, 0.8, 0.7, 0.6, 0.5], paths[1:3], tmp_path / "vis",
        max_rank=5,
    )
    assert out.is_file()


def test_fullgrad_cam(small_model):
    """FullGrad: aggregates |bias × grad| over every conv/BN bias layer plus
    the input-gradient term (reference utils/cam.py:30, the 9th method)."""
    from visiondk_tpu.utils.cam import ClassActivationMaper, discover_bias_layers

    model, variables, x = small_model
    layers = discover_bias_layers(model, variables, x)
    # resnet18 has BN after every conv: stem + 8 blocks x >=2 + downsamples
    assert len(layers) >= 10, sorted(layers)
    for path, (shape, bias) in layers.items():
        assert len(shape) == 4, (path, shape)
        assert bias.shape == (shape[-1],), (path, shape, bias.shape)

    cam = ClassActivationMaper(
        model, method="fullgrad", variables=variables, example=x,
        backbone_name="resnet18",
    )
    img = np.zeros((32, 32, 3), np.uint8)
    overlay = cam(
        image=img,
        input_tensor=np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32),
    )
    assert overlay.shape == (32, 32, 3)
    assert overlay.dtype == np.uint8
    # saliency is non-degenerate: overlay differs from the plain image
    assert overlay.std() > 0


def test_cam_methods_cover_reference_list():
    """The reference imports 9 methods (utils/cam.py:22-31); all are offered."""
    from visiondk_tpu.utils.cam import CAM_METHODS

    reference_nine = {
        "gradcam", "hirescam", "scorecam", "gradcampp", "ablationcam",
        "xgradcam", "eigencam", "fullgrad", "eigengradcam",
    }
    assert reference_nine.issubset(set(CAM_METHODS))
