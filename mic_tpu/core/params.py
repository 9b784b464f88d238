"""Param-tree dtype utilities shared by serving entry points."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_serving_params(params, dtype=jnp.bfloat16):
    """Cast every floating leaf to the serving compute dtype, ONCE.

    Production serving keeps weights RESIDENT in the compute dtype: the
    in-generate cast (models/captioner.py) becomes a no-op XLA elides, and
    the f32 master tree (~2.4 GB at the flagship config) leaves HBM —
    measured +1%/+2.4% captions/s/chip bf16/int8 at B=256, and it makes
    B=512 fit (PERFORMANCE.md round-3 measurements).  Integer leaves
    (e.g. pre-quantized int8 weights) pass through untouched.

    Used by bench.py and tools/profile_serving.py; training keeps f32
    masters and never calls this.
    """
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params,
    )
