"""Functional neural-net primitives over explicit param pytrees.

Every layer is a pair of pure functions: ``init_*(key, ...) -> params`` and an
apply function ``f(params, x, ...) -> y``.  Params are plain nested dicts of
``jnp.ndarray`` — no module classes, no variable collections.  This keeps the
whole model a transparent pytree that `jax.jit`/`jax.sharding` and the
checkpointing layer can see through, and makes layer stacking with `lax.scan`
(see :mod:`mic_tpu.nn.stacked`) trivial.

Numerics notes:
- LayerNorm statistics and softmax are always computed in float32 regardless of
  the compute dtype (bfloat16-safe).
- ``dense`` kernels are stored ``(in, out)``; HF-torch kernels ``(out, in)``
  are transposed on import (mic_tpu/io/hf_import.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Params = dict


# ---------------------------------------------------------------------------
# initializers


def init_dense(key, d_in: int, d_out: int, std: float = 0.02, use_bias: bool = True) -> Params:
    kkey, _ = jax.random.split(key)
    p = {"kernel": jax.random.normal(kkey, (d_in, d_out), jnp.float32) * std}
    if use_bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def init_embed(key, vocab: int, dim: int, std: float = 0.02) -> Params:
    return {"embedding": jax.random.normal(key, (vocab, dim), jnp.float32) * std}


# ---------------------------------------------------------------------------
# apply fns


def dense(params: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    dtype = dtype or x.dtype
    if "kernel_q" in params and params["kernel_q"].ndim == 2:
        # int8 weights: NATIVE int8 x int8 MXU dot with dynamic per-token
        # activation quant — the scales hit the int32 accumulator in the dot
        # epilogue, so no dequantized weight copy exists for XLA to hoist out
        # of the decode loop (the bf16-dequant formulation measured parity
        # for exactly that reason; a pallas dequant GEMM measured slower,
        # 75.4 vs 81.8 — per-call dispatch broke XLA's fusions).
        from mic_tpu.ops.quant import int8_dense_native

        return int8_dense_native(params, x, dtype)
    if "kernel_q" in params:  # stacked (L, in, out) inside a layer scan:
        # dequant-then-dot (scan xs slices arrive per-layer but keep rank 3)
        kernel = (
            params["kernel_q"].astype(dtype)
            * params["kernel_scale"].astype(dtype)[..., None, :]
        )
    else:
        kernel = params["kernel"].astype(dtype)
    y = jnp.dot(x.astype(dtype), kernel, preferred_element_type=dtype)
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    return y


def layer_norm(params: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(dtype)


def embed(params: Params, ids: jnp.ndarray, dtype=None) -> jnp.ndarray:
    if "embedding_q" in params:  # int8 table: gather rows, then dequant
        rows = jnp.take(params["embedding_q"], ids, axis=0)
        scale = jnp.take(params["embedding_scale"], ids, axis=0)
        dtype = dtype or jnp.float32
        return rows.astype(dtype) * scale.astype(dtype)[..., None]
    table = params["embedding"]
    # gather THEN cast: bit-equal to cast-then-gather (the cast is
    # elementwise) but touches only the looked-up rows — casting the full
    # (250054, 1024) table costs ~2.3 ms/step in training, and the
    # cast-first transpose scatters bf16 rows into a table-sized bf16
    # zeros buffer (round-4 train profile).  Gather-first also accumulates
    # colliding row grads in f32 instead of bf16.
    rows = jnp.take(table, ids, axis=0)
    if dtype is not None:
        rows = rows.astype(dtype)
    return rows


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    # CLIP's activation: x * sigmoid(1.702 x)
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "quick_gelu": quick_gelu,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout; identity when rng is None (deterministic) or rate==0."""
    if rng is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    # named so remat="masks" (save_only_these_names) can keep the bool mask
    # across the per-layer checkpoint instead of re-deriving the rng stream
    from jax.ad_checkpoint import checkpoint_name
    mask = checkpoint_name(mask, "dropout_mask")
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# head reshapes


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, num_heads, d // num_heads)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, t, h, hd = x.shape
    return x.reshape(b, t, h * hd)
