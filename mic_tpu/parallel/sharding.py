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

FSDP (opt-in, `fsdp=True` / TrainConfig.fsdp): after the TP rules, every
leaf's largest still-replicated divisible dim also shards over "data"
(ZeRO-3 — GSPMD all-gathers weights just-in-time and reduce-scatters
grads; adam moments follow the same specs, so per-device state memory
drops ~1/dp).
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


def _add_fsdp_axis(spec, shape: Sequence[int], fsdp_axis_size: int):
    """ZeRO-3-style weight sharding: split the LARGEST still-replicated,
    evenly-divisible dim of this leaf over the "data" axis (on top of any
    tensor-parallel axes the rules assigned).  GSPMD then all-gathers each
    weight just-in-time for its matmul and reduce-scatters its gradient —
    per-device param+optimizer memory drops ~1/dp with no step-math change.
    Ties break toward the trailing dim (minor-most memory layout: an
    all-gather on the last dim is a contiguous-lane concat)."""
    if fsdp_axis_size <= 1:
        return spec
    best = -1
    for i, (ax, n) in enumerate(zip(spec, shape)):
        if ax is None and n % fsdp_axis_size == 0 and n >= fsdp_axis_size:
            if best < 0 or n >= shape[best]:
                best = i
    if best < 0:
        return spec
    spec = list(spec)
    spec[best] = DATA_AXIS
    return spec


def spec_for(
    path: str,
    shape: Sequence[int],
    model_axis_size: int,
    rules=DEFAULT_RULES,
    fsdp_axis_size: int = 1,
) -> P:
    ndim = len(shape)
    spec = [None] * ndim
    for pattern, trailing in rules:
        if re.search(pattern, path):
            spec = [None] * (ndim - len(trailing)) + list(trailing)
            # divisibility guard: replicate any dim the mesh can't split
            spec = [
                ax if (ax is None or shape[i] % model_axis_size == 0) else None
                for i, ax in enumerate(spec)
            ]
            break
    spec = _add_fsdp_axis(spec, shape, fsdp_axis_size)
    # normalize fully-replicated specs to P() (semantically identical to
    # P(None, ...); keeps spec equality checks and cache keys stable)
    if all(ax is None for ax in spec):
        return P()
    return P(*spec)


def param_specs(params: Any, model_axis_size: int, rules=DEFAULT_RULES,
                fsdp_axis_size: int = 1):
    """Pytree of PartitionSpec matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(
            _path_str(path), leaf.shape, model_axis_size, rules,
            fsdp_axis_size=fsdp_axis_size),
        params,
    )


def param_shardings(params: Any, mesh: Mesh, rules=DEFAULT_RULES,
                    fsdp: bool = False):
    specs = param_specs(params, mesh.shape[MODEL_AXIS], rules,
                        fsdp_axis_size=mesh.shape[DATA_AXIS] if fsdp else 1)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs)


def shard_params(params: Any, mesh: Mesh, rules=DEFAULT_RULES,
                 fsdp: bool = False):
    """Place (or re-place) a param pytree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh, rules, fsdp=fsdp)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading dim over "data" and replicate over "model"."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
