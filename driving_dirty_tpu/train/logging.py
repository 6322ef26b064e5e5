"""Scalar + image logging: JSONL always, TensorBoard when available.

The reference logs through Lightning's `{'loss': ..., 'log': {...}}` dict
protocol into TensorBoard plus periodic image grids (SURVEY.md §5.5). Here the
Trainer pushes the same step-dict into this logger; images are pulled from
device only at the logging cadence so the step loop never syncs.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", buffering=1)
        self._tb = None
        # DD_NO_TB=1 keeps TensorBoard (and the full TensorFlow runtime that
        # torch.utils.tensorboard imports when TF is installed) out of the
        # process; the JSONL stream still records everything.
        if use_tensorboard and not os.environ.get("DD_NO_TB"):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log_scalars(self, scalars: dict, step: int, prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            val = float(np.asarray(v))
            rec[key] = val
            if self._tb is not None:
                self._tb.add_scalar(key, val, step)
        self._jsonl.write(json.dumps(rec) + "\n")

    def log_image(self, name: str, image, step: int):
        """image: [H, W, C] float in [0, 1] (host numpy)."""
        if self._tb is not None:
            arr = np.asarray(image)
            if arr.ndim == 2:
                arr = arr[..., None]
            self._tb.add_image(name, arr, step, dataformats="HWC")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
