"""Pallas kernel: fused beam-grouped cross-attention for the decode loop.

Cross-attention during decoding is the second-largest consumer of the
per-step HBM budget after the self-attention cache: every layer re-reads the
per-image encoder K/V ((B, S, H*Dh) x2, ~26 MB/layer at the flagship
batch-128 enc-50 config) and the XLA lowering of
nn/attention.py::mha_cross_grouped round-trips its f32 score/weight tensors
through HBM — profiled ~1.13 ms/step of the 8.45 ms batch-128 decode step.

This kernel runs the whole score/softmax/weight pipeline of one layer's
cross-attention in VMEM, per image: the same block-diagonal-Qmat
formulation as ops/lazy_attention.py (one full-width MXU matmul computes
every per-head dot in the merged 1024-lane layout), with no mask and no
per-step rows — the encoder K/V are read-only and every source position is
live for every beam.  Being read-only, the cross cache is loop-INVARIANT:
there is no cache write in the decode loop, so the custom-call/
dynamic-update-slice copy hazard that sank the fused SELF-attention default
(PERFORMANCE.md "measured dead ends") cannot occur here.

The int8 variant streams half the bytes: the cross K/V are quantized ONCE
after the encoder runs (per-(image, position, head) scales,
ops/quant.py::quantize_rows_dynamic) and dequantized in-VMEM per use; the
scales multiply the SMALL score/weight tiles.

Reference behavior being replaced: HF FlaxMBartAttention's cross branch
re-ran the K/V projections AND the dense-score attention every step
(/root/reference/models/flax_clip_vision_mbart/modeling_clip_vision_mbart.py
decoder layers); mic_tpu already hoisted the projections (mbart_decoder.py
init_cross_cache) — this fuses the remaining per-step math.

Off-TPU callers use the XLA path; tests run this kernel in interpret mode
against it (tests/test_cross_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mic_tpu.ops.lazy_attention import _attend_tiles


def _kernel_bf16(beams, heads, head_dim, k_ref, v_ref, q_ref, o_ref):
    o_ref[0] = _attend_tiles(
        k_ref[0], v_ref[0], q_ref[0], None, None, None, None, None,
        beams, heads, head_dim, o_ref.dtype,
    )


def _kernel_q8(beams, heads, head_dim,
               k_ref, ks_ref, v_ref, vs_ref, q_ref, o_ref):
    o_ref[0] = _attend_tiles(
        k_ref[0].astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
        q_ref[0], None, None, None, ks_ref[0], vs_ref[0],
        beams, heads, head_dim, o_ref.dtype,
    )


def supports(num_heads: int, head_dim: int) -> bool:
    """The kernel wants the merged lane dim (H*Dh) 128-aligned."""
    return (num_heads * head_dim) % 128 == 0


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def fused_cross_attention(
    q: jnp.ndarray,        # (B, K, HD) — query, already head_dim**-0.5-scaled
    enc_k,                 # (B, S, H, Dh) / merged (B, S, HD) bf16 —
    enc_v,                 # or int8 dict {"q": (B,S,HD) int8, "s": (B,S,H)}
    beams: int,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, K, HD): softmax(q @ k^T) @ v per head, all S positions live —
    the exact math of nn/attention.py::mha_cross_grouped (mask=None)."""
    b, k, hd = q.shape
    head_dim = hd // num_heads
    quant = isinstance(enc_k, dict)

    def merge(kv):  # (B, S[, H, Dh]) -> (B, S, HD)
        return kv.reshape(b, kv.shape[1], hd)

    if quant:
        k2, v2 = merge(enc_k["q"]), merge(enc_v["q"])
        ks = enc_k["s"].reshape(b, -1, num_heads)
        vs = enc_v["s"].reshape(b, -1, num_heads)
    else:
        k2, v2 = merge(enc_k), merge(enc_v)
    s = k2.shape[1]

    kern = functools.partial(
        _kernel_q8 if quant else _kernel_bf16, k, num_heads, head_dim
    )
    row_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    in_specs = [row_spec((s, hd))]
    args = [k2]
    if quant:
        in_specs.append(row_spec((s, num_heads)))
        args.append(ks)
    in_specs.append(row_spec((s, hd)))
    args.append(v2)
    if quant:
        in_specs.append(row_spec((s, num_heads)))
        args.append(vs)
    in_specs.append(row_spec((k, hd)))
    args.append(q.astype(jnp.bfloat16))

    kv_bytes = (1 if quant else 2) * 2 * s * hd
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=row_spec((k, hd)),
        out_shape=jax.ShapeDtypeStruct((b, k, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * (2 * s * hd * k * num_heads),
            bytes_accessed=b * kv_bytes,
            transcendentals=b * s * k * num_heads,
        ),
    )(*args)
