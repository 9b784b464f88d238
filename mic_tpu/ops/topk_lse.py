"""Pallas kernel: per-row top-k + logsumexp over the vocab in ONE pass.

The beam/greedy step needs, per row of the (B*K, 250054) logits: the top
(2K+1) candidate logits+ids and the row logsumexp (to turn selected logits
into log-probs).  XLA runs that as a TopK custom-call plus a separate
reduce plus a layout copy of the vocab-wide tensor (~3.3 ms/step profiled at
the flagship config).  This kernel streams the logits once, maintaining
per-row online (max, sumexp) and a running top-k merged block-by-block with
K-step select-and-mask (all VPU work on VMEM-resident tiles), and emits
(top-k log-probs, ids) directly — the vocab axis never leaves the chip again.

Off-TPU falls back to plain XLA ops (used by CPU tests for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _select_topk(s: jnp.ndarray, base_idx, k: int):
    """K-step select-and-mask top-k of s (N, W) -> vals (N, k) f32, idx (N, k).
    base_idx: scalar offset or (N, W) explicit indices."""
    n, w = s.shape
    if isinstance(base_idx, jnp.ndarray) and base_idx.ndim == 2:
        col_ids = base_idx  # explicit per-element ids (merge step)
    else:  # scalar block offset (possibly traced)
        col_ids = base_idx + jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    vals, idxs = [], []
    cur = s
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    for _ in range(k):
        m = jnp.max(cur, axis=-1, keepdims=True)            # (N, 1)
        is_max = cur == m
        # leftmost argmax via masked min (Mosaic argmax is f32-only)
        first = jnp.min(jnp.where(is_max, pos, w), axis=-1)   # (N,)
        sel = pos == first[:, None]
        vals.append(m[:, 0])
        # masked-sum extraction (Mosaic cannot lower row-wise dynamic gathers)
        idxs.append(jnp.sum(jnp.where(sel, col_ids, 0), axis=-1))
        cur = jnp.where(sel, NEG_INF, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1).astype(jnp.int32)


def _kernel(vocab, k, x_ref, lp_ref, idx_ref, m_scr, l_scr, tv_scr, ti_scr):
    jv = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(jv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        tv_scr[:] = jnp.full_like(tv_scr, NEG_INF)
        ti_scr[:] = jnp.zeros_like(ti_scr)

    s = x_ref[:].astype(jnp.float32)                        # (BN, BV)
    bn, bv = s.shape
    base = jv * bv
    if vocab % bv != 0:  # mask the padded vocab tail
        col = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < vocab, s, NEG_INF)

    # online logsumexp
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.where(s <= NEG_INF / 2, 0.0, jnp.exp(s - m_new)), axis=-1,
        keepdims=True,
    )
    m_scr[:] = m_new

    # block top-k, then merge with the running top-k
    bv_vals, bv_idx = _select_topk(s, base, k)
    cat_vals = jnp.concatenate([tv_scr[:], bv_vals], axis=1)   # (BN, 2k)
    cat_idx = jnp.concatenate([ti_scr[:], bv_idx], axis=1)
    mv, mi = _select_topk(cat_vals, cat_idx, k)
    tv_scr[:] = mv
    ti_scr[:] = mi

    @pl.when(jv == nv - 1)
    def _finish():
        lse = jnp.log(l_scr[:]) + m_scr[:]                   # (BN, 1)
        lp_ref[:] = tv_scr[:] - lse
        idx_ref[:] = ti_scr[:]


@functools.partial(jax.jit, static_argnums=(1,))
def topk_log_probs(logits: jnp.ndarray, k: int):
    """(N, V) raw logits -> (log_probs (N, k) f32, ids (N, k) i32): the top-k
    entries of log_softmax(logits) without materializing anything vocab-wide."""
    n, v = logits.shape
    if jax.default_backend() != "tpu":
        l32 = logits.astype(jnp.float32)
        vals, ids = jax.lax.top_k(l32, k)
        lse = jax.scipy.special.logsumexp(l32, axis=-1, keepdims=True)
        return vals - lse, ids

    bn = min(n, 256)
    bv = 2048
    grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
    lp, idx = pl.pallas_call(
        functools.partial(_kernel, v, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, bv), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, k), jnp.float32),
            pltpu.VMEM((bn, k), jnp.int32),
        ],
    )(logits)
    return lp, idx
