"""Logging + lightweight metric journaling (TensorBoard-free).

``create_logger`` matches the reference helper (file + stream handlers,
reference utils/utils_func.py:209-221).  ``MetricWriter`` replaces the
reference's TensorBoard SummaryWriter with an append-only ``metrics.jsonl``
(one JSON object per scalar event) — trivially greppable/plottable and no
extra dependency.
"""
from __future__ import annotations

import json
import logging
import os
import time


def create_logger(filename: str = "train.log", filemode: str = "a",
                  fmt: str = "%(asctime)s - %(message)s",
                  level=logging.DEBUG) -> logging.Logger:
    logger = logging.getLogger(os.path.abspath(filename))
    logger.setLevel(level)
    logger.handlers.clear()
    formatter = logging.Formatter(fmt)
    fh = logging.FileHandler(filename, mode=filemode)
    fh.setFormatter(formatter)
    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    logger.addHandler(fh)
    logger.addHandler(sh)
    logger.propagate = False
    return logger


class MetricWriter:
    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._f = open(self.path, "a")

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()
