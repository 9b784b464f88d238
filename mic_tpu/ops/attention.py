"""Scaled dot-product attention with pluggable implementations.

``impl="xla"`` is the default everywhere: at the reference's sequence lengths
(50 encoder patch tokens, 64 decoder tokens — SURVEY.md §5) a single fused XLA
softmax-attention is already MXU/VPU-bound and fits VMEM, so a hand-written
kernel buys nothing.  ``impl="pallas"`` switches to the Pallas flash-attention
kernel (mic_tpu/ops/flash_attention.py) for longer sequences where the O(T²)
score matrix stops fitting on chip.

Conventions:
- q, k, v: (batch, seq, heads, head_dim). q must already carry any scaling
  (callers multiply q by head_dim**-0.5 to match mBART/CLIP numerics).
- mask: optional boolean (batch, 1, q_len, kv_len); True = attend.
- softmax is computed in float32, the output is cast back to q.dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.knobs import experimental

_NEG_INF = jnp.finfo(jnp.float32).min


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "xla",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
):
    # attention-weight dropout (HF FlaxMBartAttention / FlaxCLIPAttention
    # semantics: inverted dropout on the post-softmax weights). The flash
    # kernel never materializes the score matrix, so an active dropout rate
    # or a weights request falls back to XLA — both only arise at configs
    # where the (Tq, Tk) matrix fits on chip anyway.
    active_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if impl == "pallas" and not active_dropout and not return_weights:
        from mic_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)
    # Short-sequence Pallas kernel (ops/small_attention.py): at Tq=Tk<=64 /
    # Dh=64 (both towers' full-sequence attention) XLA's bqhd lowering costs
    # ~50 ms/step of layout copies + pathological batched-tiny-GEMM emitters
    # in the train step; the kernel reads the projections' natural row-major
    # layout and runs fwd AND bwd in Pallas.  OPT-IN (MIC_TPU_EXPERIMENTAL=small_attn):
    # first end-to-end train measurement was a wash (382.2 vs the 389.2
    # XLA-chain baseline, within the ~4% run-to-run spread) — see
    # PERFORMANCE.md; stays off until a same-session A/B shows a win.
    if (
        not active_dropout
        and not return_weights
        and experimental("small_attn", "0") == "1"
        and jax.default_backend() == "tpu"
    ):
        from mic_tpu.ops import small_attention

        if small_attention.supports(q, k, v, mask, 0.0, False):
            return small_attention.small_t_attention(q, k, v, mask)
    return _xla_attention(
        q, k, v, mask, dropout_rate if active_dropout else 0.0, dropout_rng,
        return_weights,
    )


def _xla_attention(q, k, v, mask, dropout_rate=0.0, dropout_rng=None,
                   return_weights=False):
    dtype = q.dtype
    if experimental("attn_bhtd") == "1" and not return_weights:
        # layout experiment: hand XLA operands already in the batched-GEMM
        # (B, H, T, D) order instead of letting it insert its own
        # transposes around the bqhd einsums — the train profile shows
        # ~40 ms/step of batch-minor <-> row-major relayout copies
        # (PERFORMANCE.md train budget "layout copies" row)
        return _xla_attention_bhtd(q, k, v, mask, dropout_rate, dropout_rng)
    # (B, H, Tq, Tk) scores in f32 so bf16 runs keep a stable softmax
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    weights = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights = weights.astype(dtype)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=dtype)
    if return_weights:
        return out, weights
    return out


def _xla_attention_bhtd(q, k, v, mask, dropout_rate=0.0, dropout_rng=None):
    """Same math as _xla_attention with explicitly (B, H, T, D)-ordered
    operands (one cheap sublane transpose per tensor; D stays in lanes) so
    every einsum is a plain (B*H)-batched GEMM with no implicit relayout."""
    dtype = q.dtype
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)
    weights = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights = weights.astype(dtype)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0).astype(dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=dtype
    )
    return out.transpose(0, 2, 1, 3)
