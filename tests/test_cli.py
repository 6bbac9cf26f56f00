"""CLI smoke tests: main → validate → single_predict → export flow through
the actual entry-point functions (argv-level contract)."""

import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_e2e_classification import _cfgs, _make_dataset


import pytest as _pytest_tier

# multi-minute file (measured via --durations, docs/ROUND4.md): excluded
# from the <5-min core gate (pytest -m "not slow")
pytestmark = _pytest_tier.mark.slow


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory, mesh8):
    """Train 2 epochs through main.main and return the run dir."""
    import main as main_cli

    root = _make_dataset(tmp_path_factory.mktemp("cli_toy"))
    cfgs = _cfgs(root)
    cfgs["hyp"]["epochs"] = 2
    cfg_path = tmp_path_factory.mktemp("cfg") / "toy.yaml"
    cfg_path.write_text(yaml.safe_dump(cfgs))

    project = tmp_path_factory.mktemp("runs") / "exp"
    opt = SimpleNamespace(
        cfgs=str(cfg_path), resume=None, load_from=None, print_freq=50,
        save_freq=1, project=str(project), seed=0, model_parallel=1,
        distill=False, trace=False, multihost=False,
    )
    main_cli.main(opt)
    run_dir = project if project.exists() else Path(str(project))
    assert (run_dir / "best").exists()
    return run_dir


def test_validate_cli(trained_run, capsys):
    import validate as validate_cli

    opt = SimpleNamespace(
        cfgs=str(trained_run / "config.yaml"),
        weight=str(trained_run / "best"),
        ema=True, eval_topk=2, thresh=None,
    )
    validate_cli.main(opt)
    out = capsys.readouterr().out
    assert "top1" in out


def test_single_predict_cli(trained_run, capsys):
    from tools import single_predict

    cfg = yaml.safe_load((trained_run / "config.yaml").read_text())
    val_dir = Path(cfg["data"]["root"]) / "val"
    img = next(val_dir.rglob("*.png"))
    opt = SimpleNamespace(
        img=str(img), cfgs=str(trained_run / "config.yaml"),
        weight=str(trained_run / "best"), ema=True,
    )
    single_predict.main(opt)
    out = capsys.readouterr().out
    assert "reddish" in out or "blueish" in out


def test_export_cli(trained_run, tmp_path, capsys):
    import export as export_cli

    out_path = tmp_path / "m.hlo"
    opt = SimpleNamespace(
        cfgs=str(trained_run / "config.yaml"), weight=str(trained_run / "best"),
        out=str(out_path), ema=True, batch=1, embed=False,
    )
    export_cli.main(opt)
    assert out_path.stat().st_size > 0

    from jax import export as jexport

    exported = jexport.deserialize(bytearray(out_path.read_bytes()))
    x = np.zeros(exported.in_avals[0].shape, np.uint8)
    logits = np.asarray(exported.call(x))
    assert logits.shape == (1, 2)


def test_metrics_jsonl_written(trained_run):
    lines = (trained_run / "metrics.jsonl").read_text().splitlines()
    tags = {json.loads(l)["tag"] for l in lines}
    assert {"Train_loss", "Val_top1"} <= tags, tags


def test_visualize_cli(trained_run, tmp_path):
    import visualize as visualize_cli

    cfg = yaml.safe_load((trained_run / "config.yaml").read_text())
    val_dir = Path(cfg["data"]["root"]) / "val"
    opt = SimpleNamespace(
        cfgs=str(trained_run / "config.yaml"), weight=str(trained_run / "best"),
        data=str(val_dir), target_class=None, remove_label=False,
        no_save_image=False, cam=True, cam_method="gradcam", ema=True,
        class_json=None, badcase=False, sampling=3, max_rank=5, root=None,
        show_path=str(tmp_path / "viz"), name="exp",
    )
    visualize_cli.main(opt)
    out_dir = next((tmp_path / "viz").glob("exp*"))
    pngs = list(out_dir.glob("*.png"))
    assert len(pngs) == 3, pngs
    # CAM overlay doubles the width
    from PIL import Image as PILImage

    im = PILImage.open(pngs[0])
    assert im.width == 64 and im.height == 32, im.size
