"""Structured metrics writer (jsonl).

Replaces the reference's print-based logging + log file
(Torch_multi/config.py:264-296 log_config) and the TDAA `lrs` scalar
streaming (main_run_sstune_TestVer.py:585-601, :689-691): every scalar the
reference tracks (mask/sum/dis losses, lr, per-epoch SDR, classifier acc)
lands as one JSON line per step/epoch, greppable and plottable.
"""

from __future__ import annotations

import json
import time
from typing import IO, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self.path = path
        self.echo = echo
        self._fh: Optional[IO] = open(path, "a") if path else None
        self._t0 = time.time()

    def write(self, kind: str, step: int, **scalars) -> dict:
        rec = {"kind": kind, "step": int(step),
               "wall_s": round(time.time() - self._t0, 3)}
        for k, v in scalars.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                v = round(v, 6)
            rec[k] = v
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.echo:
            print(line)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
