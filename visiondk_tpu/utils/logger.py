"""Dual-channel (console/file) logger.

Capability parity with the reference's ``SmartLogger`` (utils/logger.py:5-54):
singleton per filename, ``console`` / ``log`` / ``both`` channels, dict
messages rendered as YAML. In a multi-process (multi-host TPU) setting, only
process 0 should construct one with a filename — mirroring the reference's
rank-0-only logging.
"""

from __future__ import annotations

import logging
import sys
from typing import Any, Optional

import yaml


class SmartLogger:
    _instances = {}

    def __new__(cls, filename: Optional[str] = None, level: int = 1):
        key = filename or "<console>"
        if key not in cls._instances:
            cls._instances[key] = super().__new__(cls)
            cls._instances[key]._initialized = False
        return cls._instances[key]

    def __init__(self, filename: Optional[str] = None, level: int = 1):
        if self._initialized:
            return
        self._initialized = True
        self.filename = filename
        self.level = level

        self._console = logging.getLogger(f"visiondk.console.{id(self)}")
        self._console.setLevel(logging.INFO)
        self._console.propagate = False
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter("%(message)s"))
        self._console.addHandler(h)

        self._file = None
        if filename is not None:
            self._file = logging.getLogger(f"visiondk.file.{id(self)}")
            self._file.setLevel(logging.INFO)
            self._file.propagate = False
            fh = logging.FileHandler(filename)
            fh.setFormatter(logging.Formatter("%(asctime)s | %(message)s"))
            self._file.addHandler(fh)

    @staticmethod
    def _render(msg: Any) -> str:
        if isinstance(msg, dict):
            return yaml.safe_dump(msg, sort_keys=False).rstrip()
        return str(msg)

    def console(self, *msgs: Any) -> None:
        for m in msgs:
            self._console.info(self._render(m))

    def log(self, *msgs: Any) -> None:
        if self._file is not None:
            for m in msgs:
                self._file.info(self._render(m))

    def both(self, *msgs: Any) -> None:
        self.console(*msgs)
        self.log(*msgs)
