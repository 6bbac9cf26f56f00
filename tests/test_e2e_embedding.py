"""End-to-end embedding-task slices: face (pair verification) and CBIR
(retrieval eval) training through CenterProcessor.run_embedding on the
virtual 8-device CPU mesh — SURVEY §7 stage 7 coverage."""

import numpy as np
import pytest
from PIL import Image

SIZE = 32
N_IDS = 4


def _id_color(i):
    # well-separated colors so a tiny model can embed them apart
    return [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40)][i]


def _write_img(path, base, rng):
    arr = np.clip(rng.normal(base, 20, size=(SIZE, SIZE, 3)), 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def face_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("face")
    rng = np.random.default_rng(0)
    for i in range(N_IDS):
        d = root / "train" / f"id{i}"
        d.mkdir(parents=True)
        for n in range(16):
            _write_img(d / f"{n}.png", _id_color(i), rng)
    val = root / "val"
    val.mkdir()
    names = []
    for i in range(N_IDS):
        for n in range(2):
            name = f"id{i}_{n}.png"
            _write_img(val / name, _id_color(i), rng)
            names.append((name, i))
    # 20 pairs (multiple of 10): 10 positive, 10 negative
    pairs = []
    prng = np.random.default_rng(1)
    while len(pairs) < 10:
        i = int(prng.integers(N_IDS))
        pairs.append((f"id{i}_0.png", f"id{i}_1.png", 1))
    while len(pairs) < 20:
        i, j = prng.integers(N_IDS, size=2)
        if i != j:
            pairs.append((f"id{i}_0.png", f"id{j}_1.png", 0))
    with open(root / "pairs.txt", "w") as f:
        for a, b, l in pairs:
            f.write(f"{a} {b} {l}\n")
    return root


def _embed_cfgs(root, task, extra_val=None):
    aug_tail = [
        {"resize_and_padding": {"size": SIZE, "training": False}},
        {"to_tensor": "no_params"},
        {"normalize": {"mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]}},
    ]
    val = {"bs": 16, "augment": aug_tail}
    if extra_val:
        val.update(extra_val)
    return {
        "model": {
            "task": task,
            "load_from": None,
            "backbone": {"resnet18": {"feat_dim": 16, "image_size": SIZE}},
            "head": {
                "arcface": {
                    "feat_dim": 16,
                    "num_class": N_IDS,
                    "margin_arc": 0.35,
                    "margin_am": 0.0,
                    "scale": 32,
                }
            },
        },
        "data": {
            "root": str(root),
            "nw": 2,
            "train": {
                "bs": 16,
                "augment": [{"random_horizonflip": {"p": 0.5}}] + aug_tail,
                "aug_epoch": 999,
            },
            "val": val,
        },
        "hyp": {
            "epochs": 3,
            "lr0": 0.02,
            "lrf_ratio": None,
            "momentum": 0.9,
            "weight_decay": 0.0005,
            "warmup_momentum": 0.8,
            "warm_ep": 1,
            "label_smooth": 0.0,
            "loss": {"ce": True},
            "optimizer": ["sgd", False],
            "scheduler": "cosine_with_warm",
        },
    }


@pytest.mark.slow  # ~60 s; the cbir test below is the core-tier fast e2e
def test_face_training_and_pair_eval(face_root, tmp_path, mesh8):
    import jax.numpy as jnp

    from visiondk_tpu.engine import CenterProcessor

    cfgs = _embed_cfgs(face_root, "face", extra_val={"pair_txt": str(face_root / "pairs.txt")})
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "face_run"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    metrics = cp.run_embedding(save_freq=3)
    assert 0.0 <= metrics["mean"] <= 1.0
    assert metrics["mean"] >= 0.8, metrics  # trivially separable identities
    assert (tmp_path / "face_run" / "Epoch_3").exists()
    assert (tmp_path / "face_run" / "metrics.jsonl").exists()

    # best-checkpoint selection: fitness (pair-accuracy mean) is tracked, not
    # frozen at 0.0 — the best ckpt exists and records the achieved fitness
    import json

    assert (tmp_path / "face_run" / "best").exists()
    with open(tmp_path / "face_run" / "best" / "meta.json") as f:
        meta = json.load(f)
    assert meta["best_fitness"] == pytest.approx(metrics["mean"])
    with open(tmp_path / "face_run" / "Epoch_3" / "meta.json") as f:
        epoch_meta = json.load(f)
    assert epoch_meta["fitness"]["mean"] == pytest.approx(metrics["mean"])


@pytest.fixture(scope="module")
def cbir_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cbir")
    rng = np.random.default_rng(0)
    for i in range(N_IDS):
        d = root / "train" / f"id{i}"
        d.mkdir(parents=True)
        for n in range(16):
            _write_img(d / f"{n}.png", _id_color(i), rng)
        for split, count in (("query", 1), ("gallery", 3)):
            d = root / split / f"id{i}"
            d.mkdir(parents=True)
            for n in range(count):
                _write_img(d / f"{n}.png", _id_color(i), rng)
    return root


def test_cbir_training_and_retrieval_eval(cbir_root, tmp_path, mesh8):
    import jax.numpy as jnp

    from visiondk_tpu.engine import CenterProcessor

    cfgs = _embed_cfgs(cbir_root, "cbir")
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "cbir_run"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    metrics = cp.run_embedding(save_freq=3)
    assert "MRR@1" in metrics, metrics
    recall_keys = sorted(k for k in metrics if k.startswith("Recall"))
    assert recall_keys, metrics
    assert metrics[recall_keys[-1]] >= 0.5, metrics
    assert metrics["MRR@1"] >= 0.5, metrics


@pytest.mark.slow  # ~120 s
def test_embedding_resume(cbir_root, tmp_path, mesh8):
    """run_embedding --resume continues from the saved epoch
    (vision_engine.py:494-507 parity)."""
    import jax.numpy as jnp

    from visiondk_tpu.engine import CenterProcessor

    cfgs = _embed_cfgs(cbir_root, "cbir")
    cfgs["hyp"]["epochs"] = 2
    cp = CenterProcessor(
        cfgs, project=str(tmp_path / "r"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    cp.run_embedding(save_freq=1)
    assert (tmp_path / "r" / "last").exists()

    cfgs["hyp"]["epochs"] = 3
    cp2 = CenterProcessor(
        cfgs, project=str(tmp_path / "r"), train=True, mesh=mesh8,
        compute_dtype=jnp.float32,
    )
    metrics = cp2.run_embedding(resume="last", save_freq=1)
    assert "MRR@1" in metrics
    assert (tmp_path / "r" / "Epoch_3").exists()


def test_cbir_gallery_embedding_cache(cbir_root, tmp_path, mesh8):
    """gallery_cache memmap: first eval writes it, second eval reuses it
    without re-embedding the gallery; stale caches (row mismatch) are ignored
    (reference memmap path, cbir/evaluation.py:111-151)."""
    import jax
    import jax.numpy as jnp

    from visiondk_tpu.data.datasets import CBIRDatasets
    from visiondk_tpu.data.transforms import create_aug_transforms
    from visiondk_tpu.engine import cbir_eval
    from visiondk_tpu.engine.state import create_train_state
    from visiondk_tpu.engine.steps import StepConfig, make_embed_step
    from visiondk_tpu.models.factory import get_model
    import optax

    cfgs = _embed_cfgs(cbir_root, "cbir")
    model = get_model(cfgs["model"], dtype=jnp.float32)
    rng = jax.random.key(0)
    variables = model.init(
        {"params": rng, "dropout": rng},
        jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2,), jnp.int32), train=False,
    )
    state = create_train_state(variables, optax.sgd(0.0))
    base_step = make_embed_step(model, StepConfig(), use_ema=False)
    calls = {"n": 0}

    def counting_step(state, batch):
        calls["n"] += 1
        return base_step(state, batch)

    aug = create_aug_transforms(cfgs["data"]["val"]["augment"])
    query, gallery = CBIRDatasets.build(str(cbir_root), transforms=aug)
    cache = str(tmp_path / "gallery.emb")

    m1 = cbir_eval.valuate(counting_step, state, query, gallery,
                           batch_size=8, gallery_cache=cache)
    calls_first = calls["n"]
    assert (tmp_path / "gallery.emb").exists()
    assert (tmp_path / "gallery.emb.meta.json").exists()

    m2 = cbir_eval.valuate(counting_step, state, query, gallery,
                           batch_size=8, gallery_cache=cache)
    # second pass embeds only the query set
    assert calls["n"] - calls_first < calls_first
    for k in m1:
        assert m1[k] == pytest.approx(m2[k]), (k, m1[k], m2[k])

    # stale cache (wrong row count) is ignored, not blindly loaded
    emb = cbir_eval.load_embedding_cache(cache)
    cbir_eval.save_embedding_cache(cache, emb[:-1])
    assert cbir_eval.load_embedding_cache(cache, expected_rows=emb.shape[0]) is None
