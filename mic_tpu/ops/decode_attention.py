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

STATUS (measured): correct on real TPU at flagship shapes (bf16 tolerance,
in-place column write lands, untouched layers preserved) after reworking all
kernel math into the merged tile-aligned (H*Dh//128, 128) layout (per-head
score sums = masked-sum MXU matmul, per-head scalars lane-broadcast with
static slices — Mosaic rejects minor-dim shape casts).  END-TO-END IT LOSES:
14.1 vs 88.5 captions/s/chip — the serialized per-chunk DMA round-trips and
the scan-carry interaction cost far more than the cache-prefix savings.
Kept behind MIC_TPU_FUSED_DECODE=1 as a documented reference; the XLA
ys-threaded cache remains the default.
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
    #
    # ALL math stays in the tile-aligned merged (rows, cols=128) layout: a
    # 128-lane row holds `hp = cols // head_dim` heads side by side. Per-head
    # score sums are a (cols, hp) masked-sum matmul; per-head scalars are
    # broadcast back to lanes with static slices + broadcasts. No shape casts
    # of minor dims anywhere (Mosaic rejects those).
    del ck_in, cv_in
    l = info_ref[0]
    t = info_ref[1]
    i = pl.program_id(0)
    bb = q_ref.shape[0]
    rows, cols = q_ref.shape[2], q_ref.shape[3]
    hp = cols // head_dim
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

    q = q_ref[:]                               # (BB, 1, R, C), input dtype
    n_chunks = t // chunk + 1                  # chunks covering positions 0..t
    # per-head lane-sum matrix: M[j, p] = 1 iff lane j belongs to head slot p
    lane = jax.lax.broadcasted_iota(jnp.int32, (cols, hp), 0)
    slot = jax.lax.broadcasted_iota(jnp.int32, (cols, hp), 1)
    # same dtype as the product so the MXU dot accumulates in f32 from
    # narrow inputs without materializing f32 chunk-sized temporaries
    head_sum = (lane // head_dim == slot).astype(q_ref.dtype)   # (C, HP)

    def lanes(x):
        """(..., R, HP) per-head scalars -> (..., R, C) lane-broadcast."""
        parts = [
            jnp.broadcast_to(x[..., p : p + 1], x.shape[:-1] + (head_dim,))
            for p in range(hp)
        ]
        return jnp.concatenate(parts, axis=-1) if hp > 1 else parts[0]

    def body(m_s, l_s, acc_s):
        def get(slot_, c, which):
            buf, src = (kbuf, ck_hbm) if which == 0 else (vbuf, cv_hbm)
            return pltpu.make_async_copy(
                src.at[l, pl.ds(b0, bb), pl.ds(c * chunk, chunk)],
                buf.at[slot_],
                sems.at[2 * which + slot_],
            )

        wk.wait()
        wv.wait()
        get(0, 0, 0).start()
        get(0, 0, 1).start()

        m_s[:] = jnp.full_like(m_s, NEG_INF)       # (BB, 1, R, HP)
        l_s[:] = jnp.zeros_like(l_s)               # (BB, 1, R, HP)
        acc_s[:] = jnp.zeros_like(acc_s)           # (BB, 1, R, C)

        def step(c, carry):
            slot_ = c % 2
            nxt = (c + 1) % 2

            @pl.when(c + 1 < n_chunks)
            def _prefetch():
                get(nxt, c + 1, 0).start()
                get(nxt, c + 1, 1).start()

            get(slot_, c, 0).wait()
            get(slot_, c, 1).wait()
            k = jax.lax.cond(slot_ == 0, lambda: kbuf[0], lambda: kbuf[1])
            v = jax.lax.cond(slot_ == 0, lambda: vbuf[0], lambda: vbuf[1])

            prod = q * k                           # (BB, CT, R, C) input dtype
            s_ = jax.lax.dot_general(              # (BB, CT, R, HP)
                prod, head_sum, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos = c * chunk + jax.lax.broadcasted_iota(jnp.int32, s_.shape, 1)
            s_ = jnp.where(pos <= t, s_, NEG_INF)

            m_prev = m_s[:]
            m_new = jnp.maximum(m_prev, jnp.max(s_, axis=1, keepdims=True))
            p = jnp.exp(s_ - m_new)
            p = jnp.where(s_ <= NEG_INF / 2, 0.0, p)
            alpha = jnp.exp(m_prev - m_new)        # (BB, 1, R, HP)
            l_s[:] = l_s[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jnp.sum(
                lanes(p).astype(v.dtype) * v, axis=1, keepdims=True
            ).astype(jnp.float32)                                # (BB, 1, R, C)
            acc_s[:] = acc_s[:] * lanes(alpha) + pv
            m_s[:] = m_new
            return carry

        jax.lax.fori_loop(0, n_chunks, step, 0)
        safe = jnp.where(l_s[:] == 0.0, 1.0, l_s[:])
        o_ref[:] = (acc_s[:] / lanes(safe)).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((bb, 1, rows, hp), jnp.float32),
        pltpu.VMEM((bb, 1, rows, hp), jnp.float32),
        pltpu.VMEM((bb, 1, rows, cols), jnp.float32),
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
    chunk: int = 8,
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
