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

from mic_tpu.core.knobs import experimental

from mic_tpu.ops.lazy_attention import _attend_tiles, _tile_consts


def _cross_group(batch: int) -> int:
    """Images per grid cell.  The round-2 single-image kernel lost to XLA
    (0.526 vs 0.367 ms/layer at B=128) almost entirely on per-cell fixed
    overhead (~0.65 us measured for the lazy-attention kernel — at B=256
    that is ~0.17 ms/layer of pure grid overhead); grouping G images per
    cell with the constant masks hoisted amortizes it the same way the v3
    DMA kernel's G=8 ladder does.  MIC_TPU_EXPERIMENTAL=cross_g=<G> overrides."""
    raw = experimental("cross_g")
    if raw:
        try:
            g = int(raw)
        except ValueError:
            g = 0
        if g > 0 and batch % g == 0:
            return g
    for g in (16, 8, 4, 2, 1):
        if batch % g == 0:
            return g
    return 1


def _kernel_bf16(G, beams, heads, head_dim, k_ref, v_ref, q_ref, o_ref):
    consts = _tile_consts(beams, heads, head_dim)
    for g in range(G):
        o_ref[g] = _attend_tiles(
            k_ref[g], v_ref[g], q_ref[g], None, None, None, None, None,
            beams, heads, head_dim, o_ref.dtype, consts,
        )


def _kernel_q8(G, beams, heads, head_dim,
               k_ref, ks_ref, v_ref, vs_ref, q_ref, o_ref):
    consts = _tile_consts(beams, heads, head_dim)
    for g in range(G):
        o_ref[g] = _attend_tiles(
            k_ref[g].astype(jnp.bfloat16), v_ref[g].astype(jnp.bfloat16),
            q_ref[g], None, None, None, ks_ref[g], vs_ref[g],
            beams, heads, head_dim, o_ref.dtype, consts,
        )


def supports(num_heads: int, head_dim: int) -> bool:
    """The kernel wants the merged lane dim (H*Dh) 128-aligned."""
    return (num_heads * head_dim) % 128 == 0


# ---------------------------------------------------------------------------
# v2: manual-DMA cross-attention kernel.
#
# The blocked-pipeline kernel above moves its (G, S, HD) K/V blocks at only
# ~48 GB/s at the flagship shape (measured ~1.0 ms/layer for a 52 MB stream,
# any G in {4, 8, 16}) — the auto-pipelined 50-sublane blocks never reach
# stream rate.  This variant drives the stream with the same explicit
# double-buffered DMA structure as the v3 lazy-attention kernel
# (ops/lazy_attention.py): grid cells run sequentially, cell i computes from
# scratch slot i%2 while cell i+1's planes stream into the other slot, one
# contiguous (G*S_pad, HD) DMA per plane per cell.
#
# The encoder axis is PADDED to a multiple of 8 (in-kernel sublane slices
# must be 8-aligned): padded K/V rows are zeros, and a constant liveness
# mask (iota < real_s) rides the existing ancestry-mask slot of
# _attend_tiles, so padded positions contribute exp(NEG) == 0 to the
# softmax — bit-exact vs the unpadded math.
# ---------------------------------------------------------------------------


def _kernel_cross_dma(G, beams, heads, head_dim, real_s,
                      k_hbm, v_hbm, q_ref, o_ref, kbuf, vbuf, ksem, vsem):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    s_pad, hd = kbuf.shape[2], kbuf.shape[3]

    def start(cell, slot):
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(cell * G, G)], kbuf.at[slot], ksem.at[slot]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(cell * G, G)], vbuf.at[slot], vsem.at[slot]
        ).start()

    def wait(cell, slot):
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(cell * G, G)], kbuf.at[slot], ksem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(cell * G, G)], vbuf.at[slot], vsem.at[slot]
        ).wait()

    @pl.when(i == 0)
    def _first():
        start(0, 0)

    @pl.when(i + 1 < n)
    def _prefetch():
        start(i + 1, (i + 1) % 2)

    slot = i % 2
    wait(i, slot)

    consts = _tile_consts(beams, heads, head_dim)
    if real_s == s_pad:
        am = None
    else:
        # liveness mask over the padded encoder rows (int8, the
        # _attend_tiles mask convention): row s live iff s < real_s
        am = (
            jax.lax.broadcasted_iota(jnp.int32, (s_pad, beams), 0) < real_s
        ).astype(jnp.int8)
    for g in range(G):
        o_ref[g] = _attend_tiles(
            kbuf[slot, g], vbuf[slot, g], q_ref[g], None, None, am,
            None, None, beams, heads, head_dim, o_ref.dtype, consts,
        )


def _cross_dma_group(batch: int, per_image_bytes: int) -> int:
    """Images per grid cell for the DMA kernel (cf. lazy_attention._dma_group;
    the cross planes are small, so the ladder reaches higher).
    MIC_TPU_EXPERIMENTAL=cross_g=<G> overrides."""
    raw = experimental("cross_g")
    if raw:
        try:
            g = int(raw)
        except ValueError:
            g = 0
        if g > 0 and batch % g == 0:
            return g
    for g in (32, 16, 8, 4, 2, 1):
        if batch % g == 0 and g * per_image_bytes <= 4 * 1024 * 1024:
            return g
    return 1


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def fused_cross_attention_dma(
    q: jnp.ndarray,        # (B, K, HD) — query, already head_dim**-0.5-scaled
    enc_k: jnp.ndarray,    # (B, S_pad, HD) bf16, MERGED + 8-aligned-padded
    enc_v: jnp.ndarray,    # (padded rows must be zeros)
    real_s: int,           # live encoder length (<= S_pad)
    beams: int,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, K, HD): mha_cross_grouped's exact math (mask=None) with the
    K/V stream driven by explicit double-buffered DMA."""
    b, k, hd = q.shape
    head_dim = hd // num_heads
    s_pad = enc_k.shape[1]
    if s_pad % 16 != 0:
        raise ValueError(f"S_pad must be 16-aligned (bf16 tile), got {s_pad}")
    G = _cross_dma_group(b, s_pad * hd * 2)

    kern = functools.partial(
        _kernel_cross_dma, G, k, num_heads, head_dim, real_s
    )
    blk = lambda shape: pl.BlockSpec(  # noqa: E731
        (G,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)

    scratch = 2 * 2 * G * s_pad * hd * 2
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=max(scratch + 8 * 1024 * 1024, 16 * 1024 * 1024)
    )
    return pl.pallas_call(
        kern,
        grid=(b // G,),
        in_specs=[any_spec, any_spec, blk((k, hd))],
        out_specs=blk((k, hd)),
        out_shape=jax.ShapeDtypeStruct((b, k, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, G, s_pad, hd), enc_k.dtype),
            pltpu.VMEM((2, G, s_pad, hd), enc_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * (2 * s_pad * hd * k * num_heads),
            bytes_accessed=b * 2 * 2 * s_pad * hd,
            transcendentals=b * s_pad * k * num_heads,
        ),
    )(enc_k, enc_v, q.astype(jnp.bfloat16))


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

    G = _cross_group(b)
    kern = functools.partial(
        _kernel_q8 if quant else _kernel_bf16, G, k, num_heads, head_dim
    )
    row_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        (G,) + shape, lambda i: (i,) + (0,) * len(shape),
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
        grid=(b // G,),
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
