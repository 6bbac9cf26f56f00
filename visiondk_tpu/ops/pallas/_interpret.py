"""Interpret-mode switch for the pallas kernels.

Tests and the multichip dryrun run the fused kernels on the virtual CPU mesh
by passing ``interpret=True`` to every pallas_call (the classic traced
interpreter — pure jax ops, safe inside shard_map). The newer
``pltpu.force_tpu_interpret_mode`` simulates TPU cores with thread barriers
and deadlocks under shard_map on a multi-device host platform, so the kernels
read this flag instead.
"""

from __future__ import annotations

import contextlib

_forced = False


def interpret_forced() -> bool:
    return _forced


@contextlib.contextmanager
def force_interpret():
    """Run pallas kernels interpreted and open the TPU-only gates in the
    model layers (models/layers.py) — CPU-mesh testing of the fused path."""
    global _forced
    prev = _forced
    _forced = True
    try:
        yield
    finally:
        _forced = prev
