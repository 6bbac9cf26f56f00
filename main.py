#!/usr/bin/env python
"""Train CLI — reference main.py parity.

    python main.py --cfgs configs/classification/pet.yaml [--resume last]
                   [--print_freq 50] [--save_freq 1]

Differences from the reference (main.py:18-63): no torchrun/NCCL — the device
mesh is discovered from the JAX runtime (all local chips; multi-host via
``jax.distributed`` env). ``--sync_bn`` is gone because batch-sharded BN
already reduces globally (SyncBN semantics by construction).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def parse_opt():
    p = argparse.ArgumentParser()
    p.add_argument("--cfgs", type=str, required=True, help="configs/*/*.yaml path")
    p.add_argument("--resume", nargs="?", const="last", default=None,
                   help="resume from checkpoint name in the run dir (default: last)")
    p.add_argument("--load_from", default=None, help="fine-tune init checkpoint")
    p.add_argument("--print_freq", type=int, default=50)
    p.add_argument("--save_freq", type=int, default=1, help="embedding eval/ckpt cadence")
    p.add_argument("--project", default="run/exp", help="run directory (auto-incremented)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_parallel", type=int, default=1,
                   help="mesh 'model' axis size for partial-FC head sharding")
    p.add_argument("--distill", action="store_true",
                   help="config has student/teacher sections; train with KD")
    p.add_argument("--trace", action="store_true",
                   help="capture a jax.profiler trace into <project>/trace")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host TPU pod)")
    return p.parse_args()


def main(opt):
    from visiondk_tpu.config import yaml_load, check, increment_path
    from visiondk_tpu.engine import CenterProcessor, DistillCenterProcessor
    from visiondk_tpu.parallel import build_mesh, initialize_distributed

    if opt.multihost:
        initialize_distributed()

    cfgs = yaml_load(opt.cfgs)
    main_cfg = cfgs["student"] if opt.distill else cfgs
    task = main_cfg["model"]["task"]
    check(task, main_cfg)
    if opt.load_from:
        main_cfg["model"]["load_from"] = opt.load_from

    if opt.resume:
        project = Path(opt.project)  # resume into the existing run dir
    else:
        project = increment_path(Path(opt.project))

    mesh = build_mesh(model=opt.model_parallel)
    if opt.distill:
        cp = DistillCenterProcessor(
            cfgs, project=str(project), train=True, mesh=mesh, seed=opt.seed
        )
    else:
        cp = CenterProcessor(cfgs, project=str(project), train=True, mesh=mesh, seed=opt.seed)
    if opt.trace:
        import jax

        jax.profiler.start_trace(str(project / "trace"))
    try:
        if task == "classification":
            cp.run_classifier(resume=opt.resume)
        else:
            cp.run_embedding(
                resume=opt.resume, save_freq=opt.save_freq, print_freq=opt.print_freq
            )
    finally:
        if opt.trace:
            import jax

            jax.profiler.stop_trace()


if __name__ == "__main__":
    main(parse_opt())
