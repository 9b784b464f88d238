"""Device-mesh construction for SPMD training and inference.

The reference scaled with `jax.pmap` over a flat 8-device axis (main.py:732-738)
— pure data parallelism, replicated params.  Here the mesh is 2-D from day one:

  ("data", "model"):  batch is sharded over "data"; attention heads, MLP hidden,
  the 250k-row shared embedding and the logits vocab dim shard over "model".

With tp=1 this degenerates to the reference's DP (and that is the parity
target); raising tp is a sharding-rule change, not a code change.  Collectives
(grad all-reduce over ICI, logits psum for the vocab-sharded LM head) are
inserted by GSPMD from the shardings — no hand-written comms.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    dp: int = -1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. dp=-1 means all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        if n % tp != 0:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    try:
        from jax.experimental import mesh_utils

        device_array = mesh_utils.create_device_mesh((dp, tp), devices=devices)
    except Exception:
        device_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(device_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1, devices=jax.devices()[:1])
