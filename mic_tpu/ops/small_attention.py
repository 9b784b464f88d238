"""Pallas full-softmax attention for SHORT sequences (training fwd + bwd).

At the flagship training shape (B=128, H=16, Tq=Tk=64, Dh=64) attention is
~1 GFLOP/layer — nothing on the MXU — yet XLA's lowering of the bqhd
einsums costs ~1 ms/layer/step: layout assignment picks batch-minor layouts
for the (B,H,T,T) intermediates (full-lane elementwise, but ~40 ms/step of
batch-minor <-> row-major boundary copies) and emits the tiny batched
GEMMs through a convolution-style emitter measured ~200x off the FLOP
floor (train HLO: %fusion.1713, "EmitAllInputFeatureInSublanes...").  The
generic flash kernel (ops/flash_attention.py) doesn't help here: its
grid is (B*H, Tq/bq, Tk/bk) = 2048 tiny cells of online-softmax machinery
and its backward is plain XLA einsums — measured 329 vs 389 samples/s.

This kernel instead:
- reads q/k/v in their NATURAL row-major (B, T, H, Dh) layout (exactly
  what the projection GEMMs produce) — zero boundary transposes;
- whole rows fit in VMEM at T <= 64, so the softmax is one-shot (no
  online rescaling);
- packs TWO images per 128-lane MXU tile: for each head, the packed
  (128, Dh) q/k blocks give a (128, 128) score tile whose diagonal
  (64, 64) blocks are the two images' real scores — 2x logical FLOPs on
  a workload at ~0.5% of the MXU roofline buys full-width tiles and
  halves the per-dot count;
- the BACKWARD is the same kernel geometry (recompute from q/k/v —
  standard dP/dS algebra), so the gradient path never touches the XLA
  emitters either.

Masking: an additive f32 (B, Tq, Tk) bias (0 / finfo.min), built by the
wrapper from the boolean (B, 1, Tq, Tk) mask — per-head-invariant, which
covers causal+padding decoder masks and encoder padding masks (reference
semantics: modeling_clip_vision_mbart.py decoder attention masks).
Attention-weight dropout is not supported — callers fall back to XLA when
attention_dropout > 0 (it is 0.0 in every production config, matching HF
CLIP/mBART defaults).

Numerics match ops/attention.py::_xla_attention: scores f32 (q pre-scaled
by the caller), softmax in f32, weights cast to the input dtype before the
weights @ v contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = jnp.finfo(jnp.float32).min

PACK = 2  # images per MXU tile (2 x T=64 rows = 128 lanes)


def _pk(x_ref, h, dh):
    """(PACK*T, H*Dh) ref -> packed (PACK*T, Dh) block for head h.

    Blocks arrive as flat 2-D (PACK*T, H*Dh) views of the contiguous
    (B, T, H, Dh) arrays (two images per block), so per-head access is a
    static 64-lane slice — Mosaic handles lane slices at Dh=64 offsets but
    rejects the unit-dim reshapes a 3-D (rows, H, Dh) block would need.
    """
    return x_ref[:, h * dh:(h + 1) * dh]


def _scores(q_ref, k_ref, b_ref, h, t, dh, dtype):
    qh = _pk(q_ref, h, dh).astype(jnp.float32)
    kh = _pk(k_ref, h, dh).astype(jnp.float32)
    s = jax.lax.dot_general(
        qh, kh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # (PACK*T, PACK*T)
    # kill the cross-image blocks; add the per-image additive bias on the
    # diagonal blocks
    n = PACK * t
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // t
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // t
    s = jnp.where(row == col, s, NEG)
    if b_ref is not None:
        b0 = b_ref[0:t, :]
        b1 = b_ref[t:2 * t, :]
        z = jnp.full((t, t), NEG, jnp.float32)
        s = s + jnp.concatenate(
            [jnp.concatenate([b0, z], axis=1),
             jnp.concatenate([z, b1], axis=1)], axis=0,
        ) - jnp.where(row == col, 0.0, NEG)  # bias only on diag blocks
    return s


def _softmax(s):
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(t, dh, nh, has_bias,
                q_ref, k_ref, v_ref, *rest):
    b_ref, o_ref = (rest[0], rest[1]) if has_bias else (None, rest[0])
    dtype = o_ref.dtype
    for h in range(nh):
        s = _scores(q_ref, k_ref, b_ref, h, t, dh, dtype)
        p = _softmax(s).astype(dtype)
        vh = _pk(v_ref, h, dh)
        o = jax.lax.dot_general(
            p, vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                       # (PACK*T, Dh)
        o_ref[:, h * dh:(h + 1) * dh] = o.astype(dtype)


def _bwd_kernel(t, dh, nh, has_bias,
                q_ref, k_ref, v_ref, *rest):
    if has_bias:
        b_ref, do_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        b_ref, (do_ref, dq_ref, dk_ref, dv_ref) = None, rest
    dtype = dq_ref.dtype
    for h in range(nh):
        s = _scores(q_ref, k_ref, b_ref, h, t, dh, dtype)
        p = _softmax(s)                          # f32 (PACK*T, PACK*T)
        p16 = p.astype(dtype)
        doh = _pk(do_ref, h, dh).astype(jnp.float32)
        vh = _pk(v_ref, h, dh).astype(jnp.float32)
        # dV = P^T dO  (off-diagonal blocks of P are exactly 0)
        dv = jax.lax.dot_general(
            p16.astype(jnp.float32), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        qh = _pk(q_ref, h, dh).astype(jnp.float32)
        kh = _pk(k_ref, h, dh).astype(jnp.float32)
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dq_ref[:, h * dh:(h + 1) * dh] = dq.astype(dtype)
        dk_ref[:, h * dh:(h + 1) * dh] = dk.astype(dtype)
        dv_ref[:, h * dh:(h + 1) * dh] = dv.astype(dtype)


def _specs(t, nh, dh, has_bias):
    x = pl.BlockSpec((PACK * t, nh * dh), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    specs = [x, x, x]
    if has_bias:
        specs.append(pl.BlockSpec((PACK * t, t), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _fwd_call(q, k, v, bias, interpret):
    b, t, nh, dh = q.shape
    has_bias = bias is not None
    kern = functools.partial(_fwd_kernel, t, dh, nh, has_bias)
    flat = lambda x: x.reshape(b * t, nh * dh)  # contiguous view  # noqa: E731
    args = (flat(q), flat(k), flat(v)) + (
        (bias.reshape(b * t, t),) if has_bias else ()
    )
    out = pl.pallas_call(
        kern,
        grid=(b // PACK,),
        in_specs=_specs(t, nh, dh, has_bias),
        out_specs=pl.BlockSpec((PACK * t, nh * dh), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * t, nh * dh), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * nh * t * t * dh * PACK,
            bytes_accessed=4 * b * t * nh * dh * q.dtype.itemsize,
            transcendentals=b * nh * t * t * PACK,
        ),
    )(*args)
    return out.reshape(b, t, nh, dh)


def _bwd_call(q, k, v, bias, do, interpret):
    b, t, nh, dh = q.shape
    has_bias = bias is not None
    kern = functools.partial(_bwd_kernel, t, dh, nh, has_bias)
    flat = lambda x: x.reshape(b * t, nh * dh)  # noqa: E731
    args = (flat(q), flat(k), flat(v)) + (
        (bias.reshape(b * t, t),) if has_bias else ()
    ) + (flat(do),)
    sh = jax.ShapeDtypeStruct((b * t, nh * dh), q.dtype)
    x = pl.BlockSpec((PACK * t, nh * dh), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(b // PACK,),
        in_specs=_specs(t, nh, dh, has_bias) + [x],
        out_specs=[x, x, x],
        out_shape=[sh, sh, sh],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * nh * t * t * dh * PACK,
            bytes_accessed=7 * b * t * nh * dh * q.dtype.itemsize,
            transcendentals=b * nh * t * t * PACK,
        ),
    )(*args)
    back = lambda x: x.reshape(b, t, nh, dh)  # noqa: E731
    return back(dq), back(dk), back(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attn(q, k, v, bias, interpret):
    return _fwd_call(q, k, v, bias, interpret)


def _attn_fwd(q, k, v, bias, interpret):
    return _fwd_call(q, k, v, bias, interpret), (q, k, v, bias)


def _attn_bwd(interpret, res, do):
    q, k, v, bias = res
    dq, dk, dv = _bwd_call(q, k, v, bias, do, interpret)
    return dq, dk, dv, None


_attn.defvjp(_attn_fwd, _attn_bwd)


def supports(q, k, v, mask, dropout_rate, return_weights) -> bool:
    """Shape/feature gate for the small-T kernel (see module docstring)."""
    b, tq, nh, dh = q.shape
    tk = k.shape[1]
    return (
        not return_weights
        and dropout_rate == 0.0
        and tq == tk
        and tq <= 64
        and dh == 64
        and (mask is None or (mask.ndim == 4 and mask.shape[1] == 1))
        and q.dtype == k.dtype == v.dtype
    )


def small_t_attention(q, k, v, mask=None, interpret=False):
    """softmax(q @ k^T + mask_bias) @ v for (B, T, H, 64) with Tq == Tk <= 64.

    q must already carry the 1/sqrt(dh) scale (ops/attention.py convention).
    mask: optional bool (B, 1, T, T), True = attend.  Rows with no valid
    key (fully padded) are redirected to attend key 0 so the softmax stays
    finite; their output is garbage but their upstream gradient is zero by
    construction (the loss masks those positions).
    """
    b, t, nh, dh = q.shape
    t0 = t
    pad_t = (-t) % 8  # sublane-align T (e.g. vision's 50 -> 56)
    if pad_t:
        padded = ((0, 0), (0, pad_t), (0, 0), (0, 0))
        q = jnp.pad(q, padded)
        k = jnp.pad(k, padded)
        v = jnp.pad(v, padded)
        t = t + pad_t
        # padded keys must not be attended
        key_valid = jnp.arange(t) < t0
        if mask is None:
            mask = jnp.broadcast_to(
                key_valid[None, None, None, :], (b, 1, t, t)
            )
        else:
            mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad_t), (0, pad_t)))
            mask = mask & key_valid[None, None, None, :]
    pad_b = (-b) % PACK
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad_b), (0, 0), (0, 0), (0, 0)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, pad_b), (0, 0), (0, 0), (0, 0)))

    if mask is not None:
        m = mask[:, 0]                           # (B, T, T) bool
        bias = jnp.where(m, 0.0, NEG).astype(jnp.float32)
        # fully-masked rows: attend key 0 (finite softmax; see docstring)
        any_valid = jnp.any(m, axis=-1, keepdims=True)
        bias = bias.at[:, :, :1].set(
            jnp.where(any_valid, bias[:, :, :1], 0.0)
        )
    else:
        bias = None

    out = _attn(q, k, v, bias, interpret)
    return out[: b, : t0] if (pad_b or pad_t) else out
