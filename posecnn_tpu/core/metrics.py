"""Structured metrics logging (reference had only stdout prints, SURVEY §5).

Writes one CSV under the output dir (JSONL mirroring is opt-in — the two
formats carried identical content and doubled the committed-artifact noise;
round-2 advisor). Optional TensorBoard export if `tensorboardX`/`tf.summary`
is importable (not required).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: Optional[str] = None, name: str = "train", jsonl: bool = False):
        self.output_dir = output_dir
        self._jsonl = None
        self._csv = None
        self._csv_writer = None
        self._csv_fields = None
        self._csv_path = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            if jsonl:
                self._jsonl = open(os.path.join(output_dir, f"{name}_metrics.jsonl"), "a")
            self._csv_path = os.path.join(output_dir, f"{name}_metrics.csv")

    def log(self, step: int, metrics: Dict[str, float], echo: bool = False):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._csv_path:
            if self._csv_writer is None:
                self._csv_fields = list(rec.keys())
                new = not os.path.exists(self._csv_path) or os.path.getsize(self._csv_path) == 0
                self._csv = open(self._csv_path, "a", newline="")
                self._csv_writer = csv.DictWriter(self._csv, fieldnames=self._csv_fields, extrasaction="ignore")
                if new:
                    self._csv_writer.writeheader()
            self._csv_writer.writerow(rec)
            self._csv.flush()
        if echo:
            print(" ".join(f"{k}={v:.5g}" for k, v in rec.items() if k != "time"))

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._csv:
            self._csv.close()
