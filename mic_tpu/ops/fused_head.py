"""Pallas kernel: fused LM-head GEMM + per-row top-k + logsumexp.

Every decode step needs, per hidden-state row: the top-(2K+1) candidate
log-probs+ids and the row logsumexp.  The unfused pipeline materializes the
(N, 250054) logits in HBM and then re-reads them three times (profiled at
the flagship batch-128 config: dot writes 256 MB, layout copy 0.73 ms/step,
max+sumexp reads 0.66 ms/step, top-k read ~0.7 ms/step — ~2.8 ms of pure
logits traffic on top of the 1.4 ms weight-streaming dot).

This kernel streams the LM-head weight matrix ONCE per step and keeps every
(BN, BV) logits tile in VMEM: grid (N tiles, vocab chunks), each instance
runs the (BN, D) x (D, BV) MXU matmul, adds the bias chunk, and folds the
tile into per-row online (max, sumexp) and a running top-k (K-step
select-and-mask on the VPU — which pipelines UNDER the next chunk's MXU
work, unlike the unfused serial custom-call).  Nothing vocab-wide ever
reaches HBM.

Reference behavior being replaced: the tied lm_head matmul inside the decode
loop + HF's log_softmax/top-k pipeline
(/root/reference/models/flax_clip_vision_mbart/modeling_clip_vision_mbart.py:600-610,
 generation_clip_vision_utils.py:850-903).

Off-TPU falls back to plain XLA ops (CPU tests run the same API).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mic_tpu.ops.topk_lse import NEG_INF, _select_topk


def _kernel(vocab, k, x_ref, w_ref, b_ref, lp_ref, idx_ref, lse_ref,
            m_scr, l_scr, tv_scr, ti_scr):
    jv = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(jv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        tv_scr[:] = jnp.full_like(tv_scr, NEG_INF)
        ti_scr[:] = jnp.zeros_like(ti_scr)

    # (BN, D) x (BV, D)^T on the MXU — the only weight read of the step
    s = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b_ref[:].astype(jnp.float32)                    # (BN, BV)
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

    # chunk top-k merged into the running top-k
    bv_vals, bv_idx = _select_topk(s, base, k)
    cat_vals = jnp.concatenate([tv_scr[:], bv_vals], axis=1)
    cat_idx = jnp.concatenate([ti_scr[:], bv_idx], axis=1)
    mv, mi = _select_topk(cat_vals, cat_idx, k)
    tv_scr[:] = mv
    ti_scr[:] = mi

    @pl.when(jv == nv - 1)
    def _finish():
        lse = jnp.log(l_scr[:]) + m_scr[:]                   # (BN, 1)
        lp_ref[:] = tv_scr[:] - lse
        idx_ref[:] = ti_scr[:]
        lse_ref[:] = lse


def _kernel_q8(vocab, k, x_ref, xs_ref, w_ref, ws_ref, b_ref,
               lp_ref, idx_ref, lse_ref, m_scr, l_scr, tv_scr, ti_scr):
    """Int8 variant: x (BN, D) int8 x w (BV, D) int8 on the MXU at 2x bf16
    rate and HALF the weight-stream bytes; the per-row activation scale and
    per-vocab-channel weight scale multiply the int32 accumulator."""
    jv = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(jv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        tv_scr[:] = jnp.full_like(tv_scr, NEG_INF)
        ti_scr[:] = jnp.zeros_like(ti_scr)

    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]      # (BN, BV)
    s = s + b_ref[:].astype(jnp.float32)
    bn, bv = s.shape
    base = jv * bv
    if vocab % bv != 0:
        col = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < vocab, s, NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.where(s <= NEG_INF / 2, 0.0, jnp.exp(s - m_new)), axis=-1,
        keepdims=True,
    )
    m_scr[:] = m_new

    bv_vals, bv_idx = _select_topk(s, base, k)
    cat_vals = jnp.concatenate([tv_scr[:], bv_vals], axis=1)
    cat_idx = jnp.concatenate([ti_scr[:], bv_idx], axis=1)
    mv, mi = _select_topk(cat_vals, cat_idx, k)
    tv_scr[:] = mv
    ti_scr[:] = mi

    @pl.when(jv == nv - 1)
    def _finish():
        lse = jnp.log(l_scr[:]) + m_scr[:]
        lp_ref[:] = tv_scr[:] - lse
        idx_ref[:] = ti_scr[:]
        lse_ref[:] = lse


@functools.partial(jax.jit, static_argnums=(4,))
def fused_head_topk_q8(
    hidden: jnp.ndarray,        # (N, D) bf16/f32
    weight_q: jnp.ndarray,      # (V, D) int8 — quantized tied embedding
    weight_scale: jnp.ndarray,  # (V,) f32 per-vocab-row scales
    bias: jnp.ndarray,          # (V,)
    k: int,
):
    """Int8-weight fused head: same contract as fused_head_topk but streams
    int8 weights (256 MB vs 512 MB at the flagship vocab) and runs a native
    int8 x int8 MXU dot with dynamically per-row-quantized activations
    (ops/quant.quantize_rows_dynamic semantics, inlined here so the quant
    fuses with the decoder's last op)."""
    from mic_tpu.ops.quant import quantize_rows_dynamic

    n, d = hidden.shape
    v = weight_q.shape[0]
    xq, xs = quantize_rows_dynamic(hidden)
    if jax.default_backend() != "tpu":
        acc = jax.lax.dot_general(
            xq, weight_q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        logits = (
            acc.astype(jnp.float32) * xs * weight_scale[None, :]
            + bias.astype(jnp.float32)
        )
        vals, ids = jax.lax.top_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids, lse

    bn = min(n, 256)
    bv = 2048
    grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
    lp, idx, lse = pl.pallas_call(
        functools.partial(_kernel_q8, v, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, k), jnp.float32),
            pltpu.VMEM((bn, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v,
            bytes_accessed=v * d + v * 4 + n * d,
            transcendentals=n * v,
        ),
    )(xq, xs, weight_q, weight_scale.reshape(1, v), bias.reshape(1, v))
    return lp, idx, lse


@functools.partial(jax.jit, static_argnums=(3,))
def fused_head_topk(
    hidden: jnp.ndarray,   # (N, D)
    weight: jnp.ndarray,   # (V, D) — tied embedding layout
    bias: jnp.ndarray,     # (V,)   — final_logits_bias
    k: int,
):
    """-> (log_probs (N, k) f32, ids (N, k) i32, lse (N, 1) f32) of
    log_softmax(hidden @ weight.T + bias) without materializing logits."""
    n, d = hidden.shape
    v = weight.shape[0]
    if jax.default_backend() != "tpu":
        logits = (
            jnp.dot(hidden, weight.T.astype(hidden.dtype),
                    preferred_element_type=jnp.float32)
            + bias.astype(jnp.float32)
        )
        vals, ids = jax.lax.top_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids, lse

    bn = min(n, 256)
    bv = 2048
    grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
    bias2 = bias.reshape(1, v)
    lp, idx, lse = pl.pallas_call(
        functools.partial(_kernel, v, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bv, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, 1), jnp.float32),
            pltpu.VMEM((bn, k), jnp.float32),
            pltpu.VMEM((bn, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v,
            bytes_accessed=v * d * weight.dtype.itemsize + n * d * 2,
            transcendentals=n * v,
        ),
    )(hidden, weight, bias2)
    return lp, idx, lse
