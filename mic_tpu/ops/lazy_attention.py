"""Pallas kernel: fused lazy-cache beam decode-attention.

The lazy beam cache (mic_tpu/nn/cache.py LazyDecoderCache) never physically
reorders K/V rows; attention instead scores ALL ``beams`` source rows per
query beam and folds the beam ancestry into the softmax mask.  The XLA
lowering of that math (nn/attention.py mha_decode_step_lazy) round-trips the
f32 (B, H, K, J, T) score and weight tensors through HBM every layer —
profiled at 3.1 + 1.1 + 1.2 ms/step of the 8.45 ms flagship batch-128 decode
step (tools/agg_profile.py), on top of the unavoidable bf16 K/V cache stream.

This kernel keeps the whole score/softmax/weight pipeline in VMEM: grid over
images, each cell streams one image's (J*T, H*Dh) K and V tiles from HBM
ONCE and runs two MXU matmuls:

  scores  = K_tile @ Qmat            Qmat (HD, K*H) is the query arranged
                                     block-diagonally per head (column
                                     k*H + h holds q[k, h*Dh:(h+1)*Dh] in
                                     rows h*Dh:(h+1)*Dh, zero elsewhere), so
                                     ONE full-width matmul computes every
                                     per-head dot in the merged 1024-lane
                                     cache layout — no per-head slicing, no
                                     minor-dim reshapes (which Mosaic
                                     rejects; see ops/decode_attention.py's
                                     measured dead end).
  softmax in VMEM                    ancestry+liveness arrive as a per-STEP
                                     (B, J*T, K) int8 mask shared by all 12
                                     layers (ancestry is layer-invariant).
  out     = Wᵀ @ V_tile              then the (K*H, HD) product is masked to
                                     its per-head diagonal blocks and folded
                                     to (K, HD) by a tiny select matmul.

The int8-KV variant streams half the bytes and converts the resident tile
in-kernel (the trick that won for ops/fused_head.py); the per-(row, position,
head) scales multiply the SMALL score/weight tiles, never a cache-sized one.

The CURRENT step's K/V arrive as separate small inputs and are appended as
``beams`` extra score rows in-kernel (each live only for its own query beam)
rather than being written into the cache first: the kernel must read the
PRE-update cache so the post-kernel column write's only consumer is the
loop carry — XLA then updates it in place.  With the write before the
kernel, the cache value feeds both the custom-call and the carry and XLA
materializes it (profiled 1.48 ms/step of dynamic-update vs 0.07).

Reference behavior being replaced: the per-step beam KV-cache gather +
attention of generation_clip_vision_utils.py:945-953 (rebuilt lazily, then
fused).  Off-TPU callers use the XLA path; tests run this kernel in
interpret mode against it (tests/test_lazy_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = jnp.finfo(jnp.float32).min


def _expand_per_beam(x, beams: int, width: int):
    """(R, beams) -> (R, beams*width), column c -> x[:, c // width]
    (k-major packing) via static per-beam lane broadcasts."""
    r = x.shape[0]
    return jnp.concatenate(
        [jnp.broadcast_to(x[:, k : k + 1], (r, width)) for k in range(beams)],
        axis=1,
    )


def _attend_tiles(kt, vt, q, ks_step, vs_step, am, ks, vs,
                  beams, heads, head_dim, out_dtype):
    """Shared kernel math on resident tiles.

    kt/vt (JT, HD) bf16 (already dequant-converted) — the PRE-update cache,
    q (K, HD), ks_step/vs_step (K, HD) bf16 — the current step's K/V rows
    (appended as K extra score rows, each live only for its own query beam;
    None = no step rows, e.g. cross-attention), am (JT, K) int8 or None
    (None = every row live for every beam — shared-source attention),
    ks/vs (JT, H) f32 scale tiles or None -> (K, HD) attention output.
    """
    K, H, Dh = beams, heads, head_dim
    HD = H * Dh
    jt = kt.shape[0]

    # Qmat: block-diagonal per-head query matrix (HD, K*H), column k*H + h
    qt = jnp.transpose(q)                                    # (HD, K)
    qrep = _expand_per_beam(qt, K, H)                        # (HD, K*H)
    di = jax.lax.broadcasted_iota(jnp.int32, (HD, K * H), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (HD, K * H), 1)
    qmat = jnp.where(di // Dh == ci % H, qrep, 0).astype(jnp.bfloat16)

    s = jax.lax.dot_general(
        kt, qmat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (JT, K*H)
    if ks is not None:
        # per-(row, head) K scale: column k*H + h needs ks[:, h] == tile
        s = s * jnp.tile(ks, (1, K))
    if am is not None:
        amr = _expand_per_beam(am, K, H) != 0                # (JT, K*H)
        s = jnp.where(amr, s, NEG)
    else:
        amr = None

    if ks_step is not None:
        # current-step rows: row j' scores against every (k, h) column but
        # is live only where j' == k (a beam's current token is its own)
        ss = jax.lax.dot_general(
            ks_step, qmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (K, K*H)
        sri = jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 0)
        sci = jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 1)
        smask = sri == sci // H
        ss = jnp.where(smask, ss, NEG)
        s = jnp.concatenate([s, ss], axis=0)                 # (JT+K, K*H)
        hist_live = (
            jnp.ones((jt, K * H), jnp.bool_) if amr is None else amr
        )
        live = jnp.concatenate([hist_live, smask], axis=0)
    else:
        live = amr

    m = jnp.max(s, axis=0, keepdims=True)                    # (1, K*H)
    e = jnp.exp(s - m) if live is None else jnp.where(live, jnp.exp(s - m), 0.0)
    w = e / jnp.sum(e, axis=0, keepdims=True)
    w_hist, w_step = w[:jt], w[jt:]
    if vs is not None:
        # fold the V scale into the small W tile instead of dequantizing the
        # cache-sized V tile twice: out column d only reads rows with
        # h == d // Dh, where the folded scale matches exactly.  The step
        # rows are unquantized — no scale.
        w_hist = w_hist * jnp.tile(vs, (1, K))
    w_hist = w_hist.astype(jnp.bfloat16)

    of = jax.lax.dot_general(
        w_hist, vt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if ks_step is not None:
        of = of + jax.lax.dot_general(
            w_step.astype(jnp.bfloat16), vs_step, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (K*H, HD)
    ri = jax.lax.broadcasted_iota(jnp.int32, (K * H, HD), 0)
    dj = jax.lax.broadcasted_iota(jnp.int32, (K * H, HD), 1)
    om = jnp.where(ri % H == dj // Dh, of, 0.0).astype(jnp.bfloat16)
    # fold the K*H rows to K rows: out[k] = sum_h om[k*H + h]
    rsel = (
        jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 1) // H
        == jax.lax.broadcasted_iota(jnp.int32, (K, K * H), 0)
    ).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        rsel, om, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (K, HD)
    return out.astype(out_dtype)


def _kernel_bf16(beams, heads, head_dim,
                 k_ref, v_ref, q_ref, kst_ref, vst_ref, am_ref, o_ref):
    o_ref[0] = _attend_tiles(
        k_ref[0], v_ref[0], q_ref[0], kst_ref[0], vst_ref[0], am_ref[0],
        None, None, beams, heads, head_dim, o_ref.dtype,
    )


def _kernel_q8(beams, heads, head_dim,
               k_ref, ks_ref, v_ref, vs_ref, q_ref, kst_ref, vst_ref,
               am_ref, o_ref):
    o_ref[0] = _attend_tiles(
        k_ref[0].astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16),
        q_ref[0], kst_ref[0], vst_ref[0], am_ref[0], ks_ref[0], vs_ref[0],
        beams, heads, head_dim, o_ref.dtype,
    )


def build_ancestry_mask(ancestry: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """(B, K, T) int32 ancestry + scalar write index -> (B, J*T, K) int8 mask
    shared by every decoder layer this step: mask[b, j*T + t, k] == 1 iff
    query beam k's history at position t lives in row j and t < index
    (STRICT: the kernel reads the pre-update cache; position ``index`` is
    covered by the per-step K/V rows passed separately)."""
    b, k, t = ancestry.shape
    live = jnp.arange(t) < index                              # (T,)
    j = jnp.arange(k, dtype=ancestry.dtype)
    sel = ancestry[:, None, :, :] == j[None, :, None, None]   # (B, J, K, T)
    sel = sel & live[None, None, None, :]
    return sel.transpose(0, 1, 3, 2).reshape(b, k * t, k).astype(jnp.int8)


def supports(cache_k, beams: int, num_heads: int, head_dim: int) -> bool:
    """Shape guard: the kernel wants the merged lane dim (H*Dh) 128-aligned
    and the (J*T) sublane dim 16-aligned (bf16 tiles)."""
    if beams < 2:
        return False
    kv = cache_k["q"] if isinstance(cache_k, dict) else cache_k
    t = kv.shape[1]
    return (num_heads * head_dim) % 128 == 0 and (beams * t) % 16 == 0


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def fused_lazy_attention(
    q: jnp.ndarray,        # (B, K, HD) — query, already head_dim**-0.5-scaled
    cache_k,               # (B*K, T, H, Dh) or merged (B*K, T, H*Dh) bf16 —
    cache_v,               # or int8 dict {"q","s"} — PRE-update (no column
                           # for the current step; see k_step/v_step)
    k_step: jnp.ndarray,   # (B, K, HD) — the current step's K/V rows
    v_step: jnp.ndarray,
    amask: jnp.ndarray,    # (B, J*T, K) int8 from build_ancestry_mask
    beams: int,
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> (B, K, HD) attention output (softmax over all live (source row,
    position) pairs the ancestry mask admits, plus each beam's current-step
    row — the exact math of nn/attention.py mha_decode_step_lazy, with zero
    HBM score traffic)."""
    b, k, hd = q.shape
    head_dim = hd // num_heads
    quant = isinstance(cache_k, dict)

    def merge(kv):  # (B*K, T[, H, Dh]) -> (B, K*T, HD): pure dim regrouping
        t = kv.shape[1]
        return kv.reshape(b, k * t, hd)

    if quant:
        k2, v2 = merge(cache_k["q"]), merge(cache_v["q"])
        ks = cache_k["s"].reshape(b, -1, num_heads)
        vs = cache_v["s"].reshape(b, -1, num_heads)
    else:
        k2, v2 = merge(cache_k), merge(cache_v)
    jt = k2.shape[1]

    kern = functools.partial(
        _kernel_q8 if quant else _kernel_bf16, k, num_heads, head_dim
    )
    row_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    in_specs = [row_spec((jt, hd))]
    args = [k2]
    if quant:
        in_specs.append(row_spec((jt, num_heads)))
        args.append(ks)
    in_specs.append(row_spec((jt, hd)))
    args.append(v2)
    if quant:
        in_specs.append(row_spec((jt, num_heads)))
        args.append(vs)
    in_specs += [
        row_spec((k, hd)), row_spec((k, hd)), row_spec((k, hd)),
        row_spec((jt, k)),
    ]
    args += [
        q.astype(jnp.bfloat16),
        k_step.astype(jnp.bfloat16), v_step.astype(jnp.bfloat16),
        amask,
    ]

    cache_bytes = (1 if quant else 2) * 2 * jt * hd
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=row_spec((k, hd)),
        out_shape=jax.ShapeDtypeStruct((b, k, hd), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * (2 * jt * hd * k * num_heads),
            bytes_accessed=b * cache_bytes,
            transcendentals=b * jt * k * num_heads,
        ),
    )(*args)
