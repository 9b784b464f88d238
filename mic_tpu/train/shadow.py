"""Compute-dtype shadow params: kill the per-step f32->bf16 weight casts.

The model casts every weight leaf to the compute dtype at its use site
(nn/layers.py dense/embed, models/clip_vit.py); under jit those casts
hoist into one full sweep over the ~2.4 GB f32 master tree per train
step.  Round-4 profiling (tools/profile_train.py, per-device batch 128)
measured the sweep at ~4.5 ms/step: the (250054, 1024) embedding convert
alone is 2.3 ms, the stacked-slab kernel converts another ~2.2 ms.

A persistent compute-dtype SHADOW of the bf16-consumed leaves removes the
sweep: the FusedAdamW update fusion emits ``cast(new_p)`` as one extra
output per leaf (the updated value is already in registers, so the cast
costs only its 2-byte write — largely hidden under the demb GEMM for the
embedding), the shadow rides in ``TrainState.shadow`` through the donated
step, and the loss computes from the shadow.

Numerics: a shadow leaf is exactly ``astype(master)`` — the same rounding
the model's per-use casts apply — and ``use_shadow``'s custom_vjp routes
each cotangent to the f32 master through the same ``astype`` the autodiff
transpose of the per-use cast applied.  Leaves the model consumes in f32
keep the master array: LayerNorm scale/bias (layers.layer_norm computes in
f32), ``final_logits_bias`` (fused_ce casts it to f32), and the shared
embedding (the input-side lookup gathers f32 rows; the CE kernels take the
bf16 shadow separately via ``emb_cast`` — ops/fused_ce.py — while gradients
flow to the f32 master).  Step outputs agree with the per-use-cast step to
within XLA's EXCESS-PRECISION noise: XLA's allow-excess-precision pass
sometimes elides an f32->bf16->f32 convert chain in the cast-per-use
program (computing with unrounded weights where the program asked for
bf16); the materialized shadow pins the bf16 rounding everywhere, which is
if anything the more faithful bf16 semantics.  tests/test_shadow.py pins
loss/grads/trajectories against the non-shadow step and the shadow's own
exact invariants.

The shadow never reaches checkpoints (the trainer strips it on save and
rebuilds it on restore — it is a pure cast of the params).

Reference context: the reference trained the same tied-embedding model
with HF Flax modules whose per-use ``param.astype(self.dtype)`` casts
have exactly this hidden cost (/root/reference/main.py:684-704 step
semantics; modeling_clip_vision_mbart.py dtype plumbing).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def shadow_spec(params: Any, compute_dtype=jnp.bfloat16) -> Any:
    """Bool mirror tree: True = shadow this leaf at ``compute_dtype``,
    False = pass the f32 master through (LN leaves, final_logits_bias,
    non-float leaves, leaves already at the compute dtype)."""
    compute_dtype = jnp.dtype(compute_dtype)

    def walk(node, name=""):
        if isinstance(node, dict):
            if "scale" in node and "kernel" not in node and "kernel_q" not in node:
                # layer norm {scale, bias}: consumed in f32 (layers.layer_norm)
                return {k: False for k in node}
            return {k: walk(v, k) for k, v in node.items()}
        if name == "final_logits_bias":
            return False  # consumed as f32 by the CE loss (ops/fused_ce.py)
        if not jnp.issubdtype(node.dtype, jnp.floating):
            return False
        if jnp.dtype(node.dtype) == compute_dtype:
            return False  # already compute dtype; alias, don't duplicate
        return True

    return walk(params)


def cast_shadow(params: Any, spec: Any, compute_dtype=jnp.bfloat16) -> Any:
    """Build the initial shadow: astype(master) where spec is True, the
    master array itself where False (zero-cost alias)."""
    return jax.tree.map(
        lambda p, sh: p.astype(compute_dtype) if sh else p, params, spec
    )


@jax.custom_vjp
def _use(params, shadow):
    return shadow


def _use_fwd(params, shadow):
    # residuals only carry dtypes/shapes for the backward casts; both trees
    # are alive in the step anyway (the optimizer reads params, the state
    # carries shadow), so this adds no memory
    return shadow, (params, shadow)


def _use_bwd(res, ct):
    params, shadow = res
    # the cotangent arrives in the shadow leaf's dtype — exactly the tensor
    # the autodiff transpose of the per-use astype would convert; cast it to
    # the master dtype (a no-op for passthrough leaves)
    ct_params = jax.tree.map(lambda c, p: c.astype(p.dtype), ct, params)
    # the shadow is state, never differentiated: its zero cotangent flows to
    # a closure constant and is dead-code-eliminated by XLA
    ct_shadow = jax.tree.map(jnp.zeros_like, shadow)
    return ct_params, ct_shadow


_use.defvjp(_use_fwd, _use_bwd)


def shadowed_params(params: Any, shadow: Optional[Any]) -> Any:
    """The compute-params tree for the loss: shadow leaves where cast, f32
    masters where passthrough.  The shared embedding is always swapped back
    to the f32 master — the input-side lookup gathers f32 rows bit-equal to
    cast-then-gather (nn/layers.embed), and the CE kernels take the bf16
    shadow separately via ``ce_embedding``.  Gradients route to ``params``.
    """
    if shadow is None:
        return params
    if (
        isinstance(shadow, dict)
        and isinstance(shadow.get("shared"), dict)
        and "embedding" in shadow["shared"]
    ):
        shadow = dict(
            shadow,
            shared=dict(
                shadow["shared"], embedding=params["shared"]["embedding"]
            ),
        )
    return _use(params, shadow)


def ce_embedding(shadow: Optional[Any]):
    """The pre-cast (V, D) compute-dtype embedding for fused_lm_loss's
    ``emb_cast`` — or None when no shadow rides the state."""
    if shadow is None:
        return None
    if isinstance(shadow, dict) and isinstance(shadow.get("shared"), dict):
        emb = shadow["shared"].get("embedding")
        if emb is not None and jnp.issubdtype(emb.dtype, jnp.floating):
            return emb
    return None
