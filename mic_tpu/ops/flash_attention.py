"""Pallas flash attention (forward kernel + recompute backward).

At the reference's sequence lengths (50 patch tokens, 64 decoder tokens) XLA's
fused attention is already fine — this kernel exists so longer max_length is a
config change, not a rewrite (SURVEY.md §5: keep attention implementations
swappable).  Select it with ``Captioner(config, attn_impl="pallas")``.

Design (standard online-softmax tiling, written for Mosaic/TPU):
- grid (batch*heads, q_blocks, kv_blocks); the kv axis is innermost so a VMEM
  scratch carries the running max / normalizer / accumulator across kv steps,
  initialized at jk==0 and written back at jk==nk-1;
- scores/accumulation in float32 regardless of input dtype;
- masking arrives as an additive f32 bias (0 / -inf), blocked like the scores;
- backward pass recomputes attention with plain XLA einsums (exact gradients,
  no extra residency) via jax.custom_vjp — the forward never stores the
  (Tq, Tk) score matrix.

Off-TPU the kernel runs in interpret mode (tests exercise it on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(kv_len, q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr):
    jk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(jk == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)           # (BQ, Dh)
    k = k_ref[0].astype(jnp.float32)           # (BK, Dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                           # (BQ, BK)
    if bias_ref is not None:
        s = s + bias_ref[0]
    bk = k.shape[0]
    v = v_ref[0].astype(jnp.float32)
    if kv_len % bk != 0:  # mask the padding tail of the last kv block
        col = jk * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
        # padded v rows hold garbage (NaN in interpret mode): 0 * NaN = NaN
        row = jk * bk + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(row < kv_len, v, 0.0)

    m_prev = m_scr[:]                           # (BQ, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)                      # (BQ, BK)
    # fully-masked rows: keep masked columns at 0 instead of exp(0)=1
    p = jnp.where(s <= NEG_INF / 2, 0.0, p)
    alpha = jnp.exp(m_prev - m_new)             # (BQ, 1)
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(jk == nk - 1)
    def _finish():
        # rows that saw only -inf (fully masked) produce 0 output
        l = l_scr[:]
        safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / safe).astype(o_ref.dtype)


def _flash_fwd_raw(q, k, v, bias, block_q: int, block_k: int, interpret: bool):
    """q: (BH, Tq, Dh), k/v: (BH, Tk, Dh), bias: (BH_or_1, Tq, Tk) f32 or None."""
    bh, tq, dh = q.shape
    tk = k.shape[1]
    bq = min(block_q, tq)
    bk = min(block_k, tk)
    grid = (bh, pl.cdiv(tq, bq), pl.cdiv(tk, bk))

    in_specs = [
        pl.BlockSpec((1, bq, dh), lambda b, iq, jk: (b, iq, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), lambda b, iq, jk: (b, jk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), lambda b, iq, jk: (b, jk, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        heads_per_bias = bh // bias.shape[0]  # bias is (B, Tq, Tk), q is (B*H,..)
        in_specs.append(
            pl.BlockSpec(
                (1, bq, bk),
                lambda b, iq, jk: (b // heads_per_bias, iq, jk),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias)
        kernel = functools.partial(_kernel, tk)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
            return _kernel(tk, q_ref, k_ref, v_ref, None, o_ref, m_scr, l_scr, acc_scr)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dh), lambda b, iq, jk: (b, iq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, bias, block_q, block_k):
    interpret = jax.default_backend() != "tpu"
    return _flash_fwd_raw(q, k, v, bias, block_q, block_k, interpret)


def _flash_fwd(q, k, v, bias, block_q, block_k):
    return _flash(q, k, v, bias, block_q, block_k), (q, k, v, bias)


def _flash_bwd(block_q, block_k, res, do):
    q, k, v, bias = res
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bqd,bkd->bqk", q32, k32, preferred_element_type=jnp.float32)
    if bias is not None:
        s = s + jnp.repeat(bias, s.shape[0] // bias.shape[0], axis=0)
    # mirror the forward's `safe` handling: fully-masked query rows produce
    # exact-zero output, so they must get exact-zero gradients too — a plain
    # softmax over all-NEG_INF rows would give uniform weights and leak
    # nonzero dq/dk/dv through padded rows.
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(s <= NEG_INF / 2, 0.0, p)
    do32 = do.astype(jnp.float32)
    dv = jnp.einsum("bqk,bqd->bkd", p, do32)
    dp = jnp.einsum("bqd,bkd->bqk", do32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bqk,bkd->bqd", ds, k32)
    dk = jnp.einsum("bqk,bqd->bkd", ds, q32)
    if bias is None:
        dbias = None
    else:  # bias rows are shared across each batch's heads: sum their grads
        heads = ds.shape[0] // bias.shape[0]
        dbias = ds.reshape(bias.shape[0], heads, *ds.shape[1:]).sum(axis=1)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,                    # (B, Tq, H, Dh), q pre-scaled
    k: jnp.ndarray,                    # (B, Tk, H, Dh)
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # bool (B, 1, Tq, Tk); True = attend
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    b, tq, h, dh = q.shape
    tk = k.shape[1]

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], dh)

    bias = None
    if mask is not None:
        # (B, Tq, Tk) additive bias; the kernel's index_map shares one bias
        # row across each batch's heads (fold() keeps batch-major rows)
        bias = jnp.where(
            jnp.broadcast_to(mask[:, 0], (b, tq, tk)), 0.0, NEG_INF
        ).astype(jnp.float32)

    out = _flash(fold(q), fold(k), fold(v), bias, block_q, block_k)
    return out.reshape(b, h, tq, dh).transpose(0, 2, 1, 3)
