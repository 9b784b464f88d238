"""Int8 weight-only quantization for the decode path (opt-in).

Beam-search decoding is weight-streaming bound: every step re-reads the
decoder + LM-head weights from HBM.  Storing them as int8 with per-output-
channel float scales halves that traffic; dequantization (a cast + a
row-broadcast multiply) fuses into the matmuls.  Activations stay bf16 and
training is untouched — quantization happens once per `generate` call on a
throwaway copy of the params.

Format: a dense {"kernel": (in, out)} becomes
    {"kernel_q": int8 (in, out), "kernel_scale": f32 (out,)}
and the shared embedding {"embedding": (V, D)} becomes
    {"embedding_q": int8 (V, D), "embedding_scale": f32 (V,)}   (per-row:
the row axis is the vocab, which is both the lookup key and the LM-head
output channel).

mic_tpu/nn/layers.dense and .embed understand both formats transparently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_array(w: jnp.ndarray, axis: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel int8: returns (int8 values, f32 scales along axis)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def quantize_params_for_decode(
    params: dict, subtrees: tuple = ("decoder", "shared")
) -> dict:
    """Quantize the dense kernels and shared embedding of the DECODE-path
    subtrees (the weights re-read every autoregressive step). The vision
    tower runs once per call and stays full precision; LayerNorms, biases
    and position embeddings stay f32."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if (
                isinstance(child, dict)
                and "kernel" in child
                and getattr(child["kernel"], "ndim", 0) == 3
            ):
                # stacked (L, in, out) kernels: scale per (L, out)
                q, s = quantize_array(child["kernel"], axis=1)
                new = {"kernel_q": q, "kernel_scale": s}
                if "bias" in child:
                    new["bias"] = child["bias"]
                out[name] = new
            elif (
                isinstance(child, dict)
                and "kernel" in child
                and getattr(child["kernel"], "ndim", 0) == 2
            ):
                q, s = quantize_array(child["kernel"], axis=0)
                new = {"kernel_q": q, "kernel_scale": s}
                if "bias" in child:
                    new["bias"] = child["bias"]
                out[name] = new
            elif name == "shared" and isinstance(child, dict) and "embedding" in child:
                q, s = quantize_array(child["embedding"], axis=1)
                out[name] = {"embedding_q": q, "embedding_scale": s}
            else:
                out[name] = rec(child)
        return out

    out = dict(params)
    for key in subtrees:
        if key == "shared" and "shared" in params:
            out["shared"] = rec({"shared": params["shared"]})["shared"]
        elif key in params:
            out[key] = rec(params[key])
    return out


def quantize_rows_dynamic(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row (per-token) int8 activation quantization.

    Returns (int8 values, f32 scales (..., 1)).  Pairs with int8 weights to
    feed the MXU a NATIVE int8 x int8 dot: the v5e MXU runs int8 at 2x bf16
    throughput and, more importantly for decode, the weights stream from HBM
    at half the bytes — the scales multiply the int32 accumulator in the dot
    epilogue, so there is no dequantized weight copy for XLA to hoist out of
    the decode loop (the bf16-dequant formulation measured throughput parity
    precisely because of that hoist)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_dense_native(
    params: dict, x: jnp.ndarray, dtype
) -> jnp.ndarray:
    """x (..., in) @ int8 kernel (in, out) as a native int8 MXU dot."""
    xq, xs = quantize_rows_dynamic(x)
    acc = jax.lax.dot_general(
        xq, params["kernel_q"],
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * params["kernel_scale"]
    y = y.astype(dtype)
    if "bias" in params:
        y = y + params["bias"].astype(dtype)
    return y


def dequant_dense(params: dict, dtype) -> jnp.ndarray:
    """(in, out) bf16 kernel view of a quantized dense (fuses into matmuls)."""
    return (
        params["kernel_q"].astype(dtype)
        * params["kernel_scale"].astype(dtype)[..., None, :]
    )


def dequant_embedding(params: dict, dtype) -> jnp.ndarray:
    return (
        params["embedding_q"].astype(dtype)
        * params["embedding_scale"].astype(dtype)[:, None]
    )
