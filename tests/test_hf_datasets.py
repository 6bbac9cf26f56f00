"""HuggingFace dataset backend, exercised offline with in-memory
``datasets.Dataset`` objects (the third source backend — reference
dataset/basedataset.py:95-119 — previously untested because the container
has no network; the ``datasets`` lib itself is importable offline)."""

import json

import numpy as np
import pytest
from PIL import Image

hfds = pytest.importorskip("datasets")


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


def _pil(seed, size=(8, 8)):
    rng = np.random.default_rng(seed)
    return Image.fromarray(rng.integers(0, 255, size=(*size, 3), dtype=np.uint8))


@pytest.fixture()
def hf_classification(monkeypatch):
    feats = hfds.Features(
        {"image": hfds.Image(), "label": hfds.ClassLabel(names=["cat", "dog"])}
    )
    train = hfds.Dataset.from_dict(
        {"image": [_pil(i) for i in range(6)], "label": [0, 1, 0, 1, 1, 0]},
        features=feats,
    )
    val = hfds.Dataset.from_dict(
        {"image": [_pil(10 + i) for i in range(4)], "label": [0, 1, 1, 0]},
        features=feats,
    )

    def fake_load_dataset(root, split=None):
        assert root == "someorg/toy-pets"
        if split == "train":
            return train
        if split == "validation":
            return val
        raise ValueError(f"unknown split {split}")

    monkeypatch.setattr(hfds, "load_dataset", fake_load_dataset)
    return train, val


def test_imagedatasets_hf_backend(hf_classification, tmp_path):
    from visiondk_tpu.data.datasets import ImageDatasets, smooth_labels

    ds = ImageDatasets(
        "someorg/toy-pets", mode="train", project=str(tmp_path), training=True,
        label_transforms=lambda l: smooth_labels(l, 2, 0.1),
    )
    assert ds.class_names == ["cat", "dog"]
    assert len(ds) == 6
    img, label = ds[0]
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    np.testing.assert_allclose(label, [0.95, 0.05])  # smoothed one-hot

    # class_indices.json contract: written at train time
    with open(tmp_path / "class_indices.json") as f:
        assert json.load(f) == {"0": "cat", "1": "dog"}

    dist = dict(ds.tell_data_distribution())
    assert dist == {"cat": 3, "dog": 3}


def test_imagedatasets_hf_val_split_and_reload(hf_classification, tmp_path):
    from visiondk_tpu.data.datasets import ImageDatasets

    # pre-seed a run dir whose class order differs from the dataset's
    (tmp_path / "class_indices.json").write_text('{"0": "dog", "1": "cat"}')
    ds = ImageDatasets(
        "someorg/toy-pets", mode="val", project=str(tmp_path), training=False
    )
    assert len(ds) == 4
    # eval reloads the persisted mapping (reference basedataset.py:121-138)
    assert ds.class_names == ["dog", "cat"]


def test_imagedatasets_hf_split_fallback(monkeypatch):
    """No 'validation' split → falls back to 'test' (datasets.py:147-148)."""
    feats = hfds.Features(
        {"image": hfds.Image(), "label": hfds.ClassLabel(names=["a", "b"])}
    )
    test_split = hfds.Dataset.from_dict(
        {"image": [_pil(30)], "label": [1]}, features=feats
    )

    def fake_load_dataset(root, split=None):
        if split == "test":
            return test_split
        raise ValueError("no such split")

    monkeypatch.setattr(hfds, "load_dataset", fake_load_dataset)
    from visiondk_tpu.data.datasets import ImageDatasets

    ds = ImageDatasets("org/name", mode="val", training=False)
    assert len(ds) == 1 and ds.labels == [1]


def test_cbirdatasets_hf_backend(monkeypatch):
    from visiondk_tpu.data.datasets import CBIRDatasets

    feats = hfds.Features({"image": hfds.Image(), "class_name": hfds.Value("string")})
    q = hfds.Dataset.from_dict(
        {"image": [_pil(40), _pil(41)], "class_name": ["x", "y"]}, features=feats
    )
    g = hfds.Dataset.from_dict(
        {"image": [_pil(42 + i) for i in range(4)],
         "class_name": ["x", "x", "y", "z"]},
        features=feats,
    )

    def fake_load_dataset(root, split=None):
        return {"query": q, "gallery": g}[split]

    monkeypatch.setattr(hfds, "load_dataset", fake_load_dataset)
    query, gallery = CBIRDatasets.build("org/retrieval-set")
    assert query.ids == ["x", "y"] and gallery.ids == ["x", "x", "y", "z"]
    img, qid = query[0]
    assert img.shape == (8, 8, 3) and qid == "x"
    assert gallery.positives_for("x") == [0, 1]


def test_cbir_hf_end_to_end_eval(monkeypatch):
    """The HF-backed CBIR datasets run through the full valuate path
    (embed → sharded search → metrics) with a trivial embedding."""
    from visiondk_tpu.data.datasets import CBIRDatasets
    from visiondk_tpu.engine import cbir_eval

    feats = hfds.Features({"image": hfds.Image(), "class_name": hfds.Value("string")})
    # deterministic solid-color images: same color ⇒ same embedding
    def solid(v):
        return Image.fromarray(np.full((4, 4, 3), v, np.uint8))

    q = hfds.Dataset.from_dict(
        {"image": [solid(10), solid(200)], "class_name": ["dark", "light"]},
        features=feats,
    )
    g = hfds.Dataset.from_dict(
        {"image": [solid(12), solid(198), solid(90)],
         "class_name": ["dark", "light", "mid"]},
        features=feats,
    )
    monkeypatch.setattr(hfds, "load_dataset", lambda root, split=None: {"query": q, "gallery": g}[split])
    query, gallery = CBIRDatasets.build("org/x")

    def embed_step(state, batch):
        x = batch["image"].astype(np.float32).mean(axis=(1, 2, 3), keepdims=False)
        e = np.stack([x, 255.0 - x], axis=1)
        return e / np.linalg.norm(e, axis=1, keepdims=True)

    out = cbir_eval.valuate(
        embed_step, None, query, gallery, batch_size=2, cutoffs=(1,),
        metrics=("mrr", "recall"),
    )
    assert out["MRR@1"] == 1.0 and out["Recall@1"] == 1.0


def test_combined_distribution_table():
    """Train+val combined table parity (reference basedataset.py:256-306)."""
    from visiondk_tpu.data.datasets import tell_data_distribution

    class FakeDS:
        def __init__(self, pairs):
            self._pairs = pairs

        def tell_data_distribution(self):
            return self._pairs

    rows, table = tell_data_distribution(
        {"train": FakeDS([("cat", 10), ("dog", 4)]), "val": FakeDS([("cat", 2), ("dog", 1)])}
    )
    assert rows == [("cat", {"train": 10, "val": 2}), ("dog", {"train": 4, "val": 1})]
    assert "Train Samples" in table and "Val Samples" in table
    lines = table.splitlines()
    assert any("total" in l and "14" in l and "3" in l for l in lines)
    # val absent (embedding tasks): single column, no crash
    rows2, table2 = tell_data_distribution({"train": FakeDS([("x", 3)]), "val": None})
    assert rows2 == [("x", {"train": 3})]
    assert "Val" not in table2


def test_unverifiable_hf_class_count_fails_loudly(monkeypatch):
    """Offline/unreachable hub must hard-error on the num_classes check
    (reference utils/checks.py:140-143 asserts eagerly) unless the config
    explicitly opts out via data.allow_unverified_classes (VERDICT r4
    weak #4)."""
    import pytest

    from visiondk_tpu.config import checks

    monkeypatch.setattr(
        checks, "_count_local_classes", lambda root: (_ for _ in ()).throw(AssertionError)
    )
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("HF_DATASETS_OFFLINE", "1")
    with pytest.raises(ValueError, match="allow_unverified_classes"):
        checks._check_num_classes(35, "no-such-org/no-such-dataset", "classification")
    with pytest.warns(UserWarning, match="allow_unverified_classes"):
        checks._check_num_classes(
            35, "no-such-org/no-such-dataset", "classification",
            allow_unverified=True,
        )
