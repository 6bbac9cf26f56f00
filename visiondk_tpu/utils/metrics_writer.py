"""Scalar metrics writer: TensorBoard when available, JSONL always.

Parity surface: the reference's ``SummaryWriter`` usage for embedding training
(engine/procedure/train.py:87-88,240-241,251-252,260-261 — Train_loss,
Train_lr, Val_mean/Val_std, Val_<metric>). The JSONL stream
(``metrics.jsonl`` in the run dir) is the machine-readable record the
reference lacks.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional, Union


class MetricsWriter:
    def __init__(self, logdir: Union[str, Path], use_tensorboard: bool = True):
        self.logdir = Path(logdir)
        self.logdir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.logdir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.logdir / "tb"))
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        rec = {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
