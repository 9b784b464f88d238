"""Rule-based parameter sharding: param-path regex -> PartitionSpec.

t5x-style: a small ordered rule table maps parameter tree paths to trailing-dim
partition specs; specs are left-padded with None to each leaf's rank, so the
same rule covers a stacked (L, d_in, d_out) scan layer and an unstacked
(d_in, d_out) dense.  A divisibility guard drops the "model" axis from any dim
the mesh cannot split evenly (e.g. vocab 250054 splits by 2 but not by 4),
falling back to replication for that dim instead of crashing.

Tensor-parallel layout (Megatron-style, collectives inserted by GSPMD):
  q/k/v kernels     (D, D)   -> shard output dim  (heads over "model")
  o kernel          (D, D)   -> shard input dim   (psum after)
  fc1               (D, F)   -> shard output dim
  fc2               (F, D)   -> shard input dim
  shared embedding  (V, D)   -> shard vocab rows  (tied LM head -> vocab-
                                sharded logits, psum on gather)
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mic_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (path regex, trailing-dims spec). First match wins; default = replicate.
DEFAULT_RULES: Tuple[Tuple[str, Tuple[Optional[str], ...]], ...] = (
    (r"shared/embedding$", (MODEL_AXIS, None)),
    (r"lm_head/kernel$", (None, MODEL_AXIS)),
    (r"final_logits_bias$", (MODEL_AXIS,)),
    (r"(self_attn|cross_attn|attn)/(q|k|v)/kernel$", (None, MODEL_AXIS)),
    (r"(self_attn|cross_attn|attn)/(q|k|v)/bias$", (MODEL_AXIS,)),
    (r"(self_attn|cross_attn|attn)/o/kernel$", (MODEL_AXIS, None)),
    (r"fc1/kernel$", (None, MODEL_AXIS)),
    (r"fc1/bias$", (MODEL_AXIS,)),
    (r"fc2/kernel$", (MODEL_AXIS, None)),
    (r"patch_embed/kernel$", (None, MODEL_AXIS)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for(
    path: str,
    shape: Sequence[int],
    model_axis_size: int,
    rules=DEFAULT_RULES,
) -> P:
    for pattern, trailing in rules:
        if re.search(pattern, path):
            ndim = len(shape)
            spec = [None] * (ndim - len(trailing)) + list(trailing)
            # divisibility guard: replicate any dim the mesh can't split
            spec = [
                ax if (ax is None or shape[i] % model_axis_size == 0) else None
                for i, ax in enumerate(spec)
            ]
            return P(*spec)
    return P()


def param_specs(params: Any, model_axis_size: int, rules=DEFAULT_RULES):
    """Pytree of PartitionSpec matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_str(path), leaf.shape, model_axis_size, rules),
        params,
    )


def param_shardings(params: Any, mesh: Mesh, rules=DEFAULT_RULES):
    specs = param_specs(params, mesh.shape[MODEL_AXIS], rules)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_RULES):
    """Place (or re-place) a param pytree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading dim over "data" and replicate over "model"."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
