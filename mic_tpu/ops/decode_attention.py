"""Pallas fused decode-step self-attention with in-place cache update.

Motivation (PERFORMANCE.md per-step budget): at max_length 64 the decode loop
streams the ENTIRE self-attention cache through XLA's scan xs/ys every step
(reads for attention + a full double-buffered rewrite) even though only
`index+1` time columns are live and only one column changes.  XLA-level
attempts to avoid this (post-scan column write, bucketed prefix ops) lose to
carry-aliasing copies.  A Pallas kernel sidesteps both problems:

- the new K/V column is DMA'd into the cache buffer, which is ALIASED
  input->output (`input_output_aliases`), so the cache never moves;
- attention reads only ceil((index+1)/CHUNK) cache chunks via manual DMAs in
  a traced-bound `fori_loop` — unread tail chunks never leave HBM;
- online-softmax accumulation in f32 VMEM scratch.

The kernel takes the whole stacked (L, B, T, H, Dh) cache plus the layer id
(scalar-prefetched), so the layer scan carries the cache untouched.

Off-TPU the public wrapper falls back to exact XLA ops (CPU tests).

STATUS: correctness-verified in interpret mode (tests/test_decode_attention.py)
and integrated behind MIC_TPU_FUSED_DECODE=1, but the TPU compile currently
fails in Mosaic ("unsupported shape cast"): splitting the tile-aligned
(H*Dh//128, 128) view back into (H, Dh)=(16, 64) inside the kernel is an
unsupported relayout.  The fix (round 2) is to keep ALL kernel math in the
merged 128-lane layout: per-head score sums become a (128, heads_per_row)
masked-sum matmul, probability broadcast becomes a 64-lane repeat, and the
accumulator stays merged end-to-end — no shape casts anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(chunk, n_heads, head_dim, info_ref, q_ref, ks_ref, vs_ref, ck_in, cv_in,
            o_ref, ck_hbm, cv_hbm, kbuf, vbuf, sems):
    # ck_hbm/cv_hbm are the OUTPUT refs, aliased onto the inputs: all reads
    # and the column write go through them (the input refs are not touched,
    # so the kernel is correct both under true aliasing and under interpret
    # mode's copy-on-alias emulation)
    del ck_in, cv_in
    l = info_ref[0]
    t = info_ref[1]
    i = pl.program_id(0)
    bb = q_ref.shape[0]
    b0 = i * bb

    # 1. write this step's K/V column into the cache (in-place, aliased)
    wk = pltpu.make_async_copy(
        ks_ref, ck_hbm.at[l, pl.ds(b0, bb), pl.ds(t, 1)], sems.at[4]
    )
    wv = pltpu.make_async_copy(
        vs_ref, cv_hbm.at[l, pl.ds(b0, bb), pl.ds(t, 1)], sems.at[5]
    )
    wk.start()
    wv.start()

    q = q_ref[:].astype(jnp.float32).reshape(
        q_ref.shape[0], 1, n_heads, head_dim
    )                                          # (BB, 1, H, Dh)
    n_chunks = t // chunk + 1                  # chunks covering positions 0..t

    def body(m_s, l_s, acc_s):
        def get(slot, c, which):
            buf, src = (kbuf, ck_hbm) if which == 0 else (vbuf, cv_hbm)
            return pltpu.make_async_copy(
                src.at[l, pl.ds(b0, bb), pl.ds(c * chunk, chunk)],
                buf.at[slot],
                sems.at[2 * which + slot],  # per-(kind, slot) semaphore
            )

        wk.wait()
        wv.wait()
        get(0, 0, 0).start()
        get(0, 0, 1).start()

        m_s[:] = jnp.full_like(m_s, NEG_INF)
        l_s[:] = jnp.zeros_like(l_s)
        acc_s[:] = jnp.zeros_like(acc_s)

        def step(c, carry):
            slot = c % 2
            nxt = (c + 1) % 2

            @pl.when(c + 1 < n_chunks)
            def _prefetch():
                get(nxt, c + 1, 0).start()
                get(nxt, c + 1, 1).start()

            get(slot, c, 0).wait()
            get(slot, c, 1).wait()
            # static-index reads per parity (Mosaic: no >2D dynamic gather)
            k = jax.lax.cond(slot == 0, lambda: kbuf[0], lambda: kbuf[1])
            v = jax.lax.cond(slot == 0, lambda: vbuf[0], lambda: vbuf[1])
            k = k.astype(jnp.float32).reshape(bb, chunk, n_heads, head_dim)
            v = v.astype(jnp.float32).reshape(bb, chunk, n_heads, head_dim)
            # scores: VPU mul + reduce over Dh -> (BB, H, 1, CT)
            s = jnp.sum(q * k, axis=-1).transpose(0, 2, 1)[:, :, None, :]
            pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
            s = jnp.where(pos <= t, s, NEG_INF)

            m_prev = m_s[:]                       # (BB, H, 1, 1)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(s <= NEG_INF / 2, 0.0, p)
            alpha = jnp.exp(m_prev - m_new)
            l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            # (BB,H,CT,1) * (BB,H,CT,Dh) summed over CT -> (BB,H,1,Dh)
            # (reshape/expand_dims, not int-indexing: Mosaic lowers mixed
            # advanced indexing as an unsupported >2D gather)
            p_cols = jnp.expand_dims(p.reshape(p.shape[0], p.shape[1], -1), -1)
            pv = jnp.expand_dims(
                jnp.sum(p_cols * v.transpose(0, 2, 1, 3), axis=2), 2
            )
            acc_s[:] = acc_s[:] * alpha + pv
            m_s[:] = m_new
            return carry

        jax.lax.fori_loop(0, n_chunks, step, 0)
        safe = jnp.where(l_s[:] == 0.0, 1.0, l_s[:])
        out = (acc_s[:] / safe).transpose(0, 2, 1, 3)   # (BB, 1, H, Dh)
        o_ref[:] = out.reshape(o_ref.shape).astype(o_ref.dtype)

    h, dh = n_heads, head_dim
    pl.run_scoped(
        body,
        pltpu.VMEM((bb, h, 1, 1), jnp.float32),
        pltpu.VMEM((bb, h, 1, 1), jnp.float32),
        pltpu.VMEM((bb, h, 1, dh), jnp.float32),
    )


def decode_attention(
    q: jnp.ndarray,        # (B, 1, H, Dh) pre-scaled query
    k_step: jnp.ndarray,   # (B, 1, H, Dh) this step's key
    v_step: jnp.ndarray,
    cache_k: jnp.ndarray,  # (L, B, T, H, Dh) — returned updated (aliased)
    cache_v: jnp.ndarray,
    layer_idx: jnp.ndarray,  # scalar int32
    index: jnp.ndarray,      # scalar int32 — position of the current token
    *,
    chunk: int = 16,
    block_b: int = 64,
):
    """Returns (attn_out (B,1,H,Dh), cache_k, cache_v) with the step K/V
    written at [layer_idx, :, index] and attention over positions 0..index."""
    L, B, T, H, Dh = cache_k.shape

    if jax.default_backend() != "tpu":  # exact fallback
        ck = jax.lax.dynamic_update_slice(
            cache_k, k_step[None], (layer_idx, 0, index, 0, 0)
        )
        cv = jax.lax.dynamic_update_slice(
            cache_v, v_step[None], (layer_idx, 0, index, 0, 0)
        )
        kl = jax.lax.dynamic_index_in_dim(ck, layer_idx, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(cv, layer_idx, 0, keepdims=False)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       kl.astype(jnp.float32))
        valid = (jnp.arange(T) <= index)[None, None, None, :]
        s = jnp.where(valid, s, NEG_INF)
        w = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vl.astype(jnp.float32))
        return out.astype(q.dtype), ck, cv

    bb = min(block_b, B)
    # tile-aligned views: merge (H, Dh) and re-split as (H*Dh//128, 128) so
    # HBM slices never cut into the (sublane, lane) tiling (Dh=64 < 128)
    hd = H * Dh
    # interpret-mode tests use tiny heads where hd < 128; tiling is moot there
    cols = 128 if hd % 128 == 0 else Dh
    rows = hd // cols
    qv = q.reshape(B, 1, rows, cols)
    ksv = k_step.reshape(B, 1, rows, cols)
    vsv = v_step.reshape(B, 1, rows, cols)
    ckv = cache_k.reshape(L, B, T, rows, cols)
    cvv = cache_v.reshape(L, B, T, rows, cols)
    info = jnp.stack([layer_idx.astype(jnp.int32), index.astype(jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, 1, rows, cols), lambda i, info: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, rows, cols), lambda i, info: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1, rows, cols), lambda i, info: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1, rows, cols), lambda i, info: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bb, chunk, rows, cols), cache_k.dtype),
            pltpu.VMEM((2, bb, chunk, rows, cols), cache_v.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    out, ck, cv = pl.pallas_call(
        functools.partial(_kernel, chunk, H, Dh),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(qv.shape, q.dtype),
            jax.ShapeDtypeStruct(ckv.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cvv.shape, cache_v.dtype),
        ],
        input_output_aliases={4: 1, 5: 2},  # cache_k/cache_v in-place
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(info, qv, ksv, vsv, ckv, cvv)
    return (
        out.reshape(q.shape),
        ck.reshape(cache_k.shape),
        cv.reshape(cache_v.shape),
    )
