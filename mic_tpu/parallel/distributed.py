"""Multi-host (multi-process) bootstrap.

The reference was process-index *aware* (rank-0 gating at main.py:395-399,
606, 858) but never initialized a process group and loaded the full dataset
in every process — single-host only by construction (SURVEY.md §2c).  Here
multi-host is first-class:

- `initialize_from_env()` wires `jax.distributed.initialize` from environment
  variables (called by the train CLI before any backend touch);
- the data pipeline shards each global batch per process
  (`CaptionLoader(process_shard=...)`, loader.py) and the trainer reassembles
  global arrays with `jax.make_array_from_process_local_data`
  (trainer.py:_put_batch) — params/grad collectives ride ICI within a slice,
  DCN across slices, all emitted by GSPMD from shardings.

Environment contract (set by your launcher on every host):
  MIC_TPU_COORDINATOR   host:port of process 0 (required to opt in)
  MIC_TPU_NUM_PROCESSES total process count      (optional on TPU pods,
  MIC_TPU_PROCESS_ID    this process's rank       where JAX auto-detects)

On Cloud TPU pods you may instead export MIC_TPU_DISTRIBUTED=1 and let
`jax.distributed.initialize()` auto-detect everything from the TPU metadata.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def initialize_from_env(env: Optional[dict] = None) -> bool:
    """Call `jax.distributed.initialize` if the environment opts in.

    Returns True when a process group was initialized. Must run before the
    first backend initialization (i.e. before `jax.devices()` or any jit).
    """
    env = os.environ if env is None else env
    coordinator = env.get("MIC_TPU_COORDINATOR")
    auto = env.get("MIC_TPU_DISTRIBUTED", "") == "1"
    if not coordinator and not auto:
        return False

    import jax

    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if "MIC_TPU_NUM_PROCESSES" in env:
        kwargs["num_processes"] = int(env["MIC_TPU_NUM_PROCESSES"])
    if "MIC_TPU_PROCESS_ID" in env:
        kwargs["process_id"] = int(env["MIC_TPU_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True
