"""Training observability: scalar logging (tensorboard + jsonl) and step timing.

The reference logged train loss/lr/time and flattened per-language eval BLEU to
tensorboard, rank-0 gated (main.py:255-278, 606-607, 782-789).  Here every
scalar goes to BOTH a tensorboardX event file (when importable) and a plain
`metrics.jsonl` (always), and `StepTimer` provides steps/sec / samples/sec
without device syncs.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping

import jax


class MetricLogger:
    def __init__(self, output_dir: str, enabled: bool | None = None):
        self.enabled = (
            enabled if enabled is not None else jax.process_index() == 0
        )
        self.tb = None
        self._jsonl = None
        if self.enabled:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
            try:
                from tensorboardX import SummaryWriter

                self.tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:
                self.tb = None

    def log(self, step: int, scalars: Mapping[str, float], prefix: str = "") -> None:
        if not self.enabled:
            return
        flat = {
            (f"{prefix}/{k}" if prefix else k): float(v) for k, v in scalars.items()
        }
        self._jsonl.write(json.dumps({"step": int(step), **flat}) + "\n")
        self._jsonl.flush()
        if self.tb is not None:
            for k, v in flat.items():
                self.tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self.tb is not None:
            self.tb.close()


class StepTimer:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1) -> None:
        self.steps += n

    def rates(self, samples_per_step: int) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        sps = self.steps / dt
        return {"steps_per_sec": sps, "samples_per_sec": sps * samples_per_step}
