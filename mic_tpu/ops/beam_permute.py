"""Pallas kernel: beam-reorder the stacked KV cache at HBM-DMA speed.

Beam search must permute each batch group's K cache rows every step
(~0.8 GB per array at the flagship config).  XLA's lowerings for this move
data at ~26% of HBM bandwidth (measured: flat axis-1 gather 15.0 ms,
one-hot einsum 15.2 ms, beam-axis take_along_axis 20.1 ms for 2x805 MB).
This kernel instead issues one async HBM->HBM DMA per (layer, batch, beam)
row — no compute, no VMEM staging, no layout changes — with the beam indices
scalar-prefetched into SMEM so the copy targets are known before the body runs.

Falls back to jnp.take_along_axis off-TPU (tests run on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(num_beams: int, idx_ref, src_ref, dst_ref, sems):
    # One strided DMA per (batch, beam) covering ALL layers: issue count is
    # B*K (512 at the flagship config) instead of L*B*K small copies — DMA
    # issue overhead, not bandwidth, dominates otherwise.
    b = pl.program_id(0)
    dmas = []
    for n in range(num_beams):
        src_row = idx_ref[b, n]
        dma = pltpu.make_async_copy(
            src_ref.at[:, b, src_row], dst_ref.at[:, b, n], sems.at[n]
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


def beam_permute_matmul(
    kv: jnp.ndarray, beam_indices: jnp.ndarray, num_beams: int
) -> jnp.ndarray:
    """Beam permute as ONE matmul over the batch axis.

    XLA carries the decode-loop cache batch-minor (layout {1,4,3,2,0}: the
    B*K axis is the lane dimension).  A gather or a b-batched einsum forces
    row-major layout copies around itself (profiled ~3.8 ms/step); contracting
    the batch axis against a block-diagonal (B*K, B*K) one-hot matrix instead
    is a plain MXU matmul whose operand layout IS the one the loop already
    uses — no copies, ~50 GFLOP (trivial), bandwidth-bound streaming."""
    L, BK, T, H, Dh = kv.shape
    K = num_beams
    B = BK // K
    src_rows = (
        jnp.arange(B, dtype=jnp.int32)[:, None] * K + beam_indices.astype(jnp.int32)
    ).reshape(-1)                                     # source row for new col n
    P = jnp.zeros((BK, BK), kv.dtype).at[src_rows, jnp.arange(BK)].set(1)
    out = jnp.tensordot(kv, P, axes=[[1], [0]],
                        preferred_element_type=kv.dtype)  # (L, T, H, Dh, BK)
    return jnp.moveaxis(out, -1, 1)


def beam_permute_matmul_prefix(
    kv: jnp.ndarray,
    beam_indices: jnp.ndarray,
    num_beams: int,
    prefix_len: jnp.ndarray,
) -> jnp.ndarray:
    """Length-bucketed beam permute: only the first `prefix_len` time columns
    hold live tokens, so a `lax.switch` over quarter-length buckets permutes
    just the covering prefix and writes it back (the stale tail is never read:
    attention masks positions >= index, and column j is overwritten at step j).
    MEASURED NEGATIVE at the flagship config (64.6 vs 88.5 captions/s/chip):
    the lax.switch branch's dynamic_update_slice cannot alias the while-loop
    carry, so every step pays a full-cache copy on top of the prefix permute.
    Kept for reference; the default path uses the full matmul permute."""
    t = kv.shape[2]
    buckets = sorted({max(t // 4, 1), max(t // 2, 1), max(3 * t // 4, 1), t})

    def make_branch(b):
        def branch(kv):
            pre = jax.lax.slice_in_dim(kv, 0, b, axis=2)
            per = beam_permute_matmul(pre, beam_indices, num_beams)
            if b == t:
                return per
            return jax.lax.dynamic_update_slice_in_dim(kv, per, 0, axis=2)

        return branch

    which = jnp.sum(prefix_len > jnp.asarray(buckets, jnp.int32))
    which = jnp.clip(which, 0, len(buckets) - 1)
    return jax.lax.switch(which, [make_branch(b) for b in buckets], kv)


@functools.partial(jax.jit, static_argnums=(2,))
def beam_permute(kv: jnp.ndarray, beam_indices: jnp.ndarray, num_beams: int) -> jnp.ndarray:
    """kv: (L, B*K, T, H, Dh); beam_indices: (B, K) within-group source beams.

    Returns kv with, for every batch group b, row n replaced by row
    beam_indices[b, n] of the same group."""
    L, BK, T, H, Dh = kv.shape
    K = num_beams
    B = BK // K

    if jax.default_backend() != "tpu":
        grouped = kv.reshape(L, B, K, T, H, Dh)
        idx = beam_indices[None, :, :, None, None, None]
        return jnp.take_along_axis(grouped, idx, axis=2).reshape(kv.shape)

    f = T * H * Dh
    # keep two whole trailing dims (f//128, 128) so slicing a beam row never
    # cuts into the TPU (sublane, lane) tiling of the memref
    assert f % 128 == 0, f
    src = kv.reshape(L, B, K, f // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(src.shape, src.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(beam_indices.astype(jnp.int32), src)
    return out.reshape(kv.shape)
