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
import os

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
    ks/vs f32 scale tiles or None: (JT, H) per-(row, head) or (JT, 1)
    per-row -> (K, HD) attention output.
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
        # per-(row, head) K scale: column k*H + h needs ks[:, h] == tile;
        # per-ROW scale (JT, 1) broadcasts directly
        s = s * (ks if ks.shape[1] == 1 else jnp.tile(ks, (1, K)))
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
        w_hist = w_hist * (vs if vs.shape[1] == 1 else jnp.tile(vs, (1, K)))
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


def resolve_mode(max_length: int) -> str:
    """MIC_TPU_FUSED_LAZY_ATTN: "0" (XLA chain), "1" (blocked kernel),
    "2" (DMA pass-through kernel) — or unset = auto.

    Auto picks the v2 DMA kernel for max_length > 64 on TPU: the XLA
    score/softmax chain degrades super-linearly with cache length (measured
    30.0 captions/s/chip at batch 256 / max_length 128 vs 110.3 for the v2
    kernel with int8-KV — PERFORMANCE.md), while at max_length 64 the XLA
    chain still wins (237.8 vs 229.8).  The reference names max_length 128
    as its intended scale-up (README.md:112)."""
    raw = os.environ.get("MIC_TPU_FUSED_LAZY_ATTN")
    if raw is not None:
        return raw
    if jax.default_backend() != "tpu":
        return "0"
    return "2" if max_length > 64 else "0"


def supports(cache_k, beams: int, num_heads: int, head_dim: int) -> bool:
    """Shape guard: the kernel wants the merged lane dim (H*Dh) 128-aligned
    and the (J*T) sublane dim 16-aligned (bf16 tiles).  int8 caches need
    per-HEAD (B*K, T, H) scales — the blocked kernel reshapes them to
    (B, J*T, H); per-ROW (B*K, T) scales are the DMA kernel's layout."""
    if beams < 2:
        return False
    if isinstance(cache_k, dict) and cache_k["s"].ndim != 3:
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


# ---------------------------------------------------------------------------
# v2: manual-DMA pass-through kernel.
#
# The blocked kernel above loses end-to-end because XLA's copy-insertion
# materializes any while-carried cache that is both read by a custom call
# and column-written in the same loop iteration (+1.37 ms/step profiled;
# neither update order nor optimization_barrier avoids it — see
# PERFORMANCE.md).  Here the cache is instead passed THROUGH the kernel:
# ANY-memory-space operands aliased to ANY outputs that the kernel never
# writes, with the compute tiles streamed by explicit DMA.  The downstream
# column write then consumes the kernel's OUTPUT — one linear ownership
# chain, which XLA updates in place (verified: a 12-cache repro runs the
# write at the no-copy cost).
#
# Because the kernel owns its DMA, the int8-KV cache becomes profitable for
# the first time: the bytes halve and the int8->bf16 convert happens on the
# resident VMEM tile (the XLA int8-KV path lost to convert/materialization
# overhead — PERFORMANCE.md "measured dead ends").
# ---------------------------------------------------------------------------


def _dma_group(batch: int, per_image_bytes: int) -> int:
    """Images per grid cell: fewer, larger DMAs (one per G images) while the
    DOUBLE-BUFFERED K/V slots (2 x 2 buffers) stay within ~8 MB of VMEM."""
    for g in (8, 4, 2, 1):
        if batch % g == 0 and g * per_image_bytes <= 2 * 1024 * 1024:
            return g
    return 1


def _kernel_dma_bf16(G, beams, heads, head_dim,
                     ck_hbm, cv_hbm, q_ref, kst_ref, vst_ref, am_ref,
                     cko, cvo, o_ref, kbuf, vbuf, ksem, vsem):
    del cko, cvo  # pass-through aliases: never read, never written
    K = beams
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = G * K

    # double-buffered prefetch: grid instances run sequentially on TPU, so
    # instance i computes from slot i%2 while instance i+1's K/V stream into
    # the other slot — the naive issue-then-wait version serialized ~768 DMA
    # round-trips per decode step (measured 199.9 vs 237.8 captions/s/chip)
    def cp_k(g, slot):
        return pltpu.make_async_copy(
            ck_hbm.at[pl.ds(g * rows, rows)], kbuf.at[slot], ksem.at[slot]
        )

    def cp_v(g, slot):
        return pltpu.make_async_copy(
            cv_hbm.at[pl.ds(g * rows, rows)], vbuf.at[slot], vsem.at[slot]
        )

    @pl.when(i == 0)
    def _first():
        cp_k(0, 0).start()
        cp_v(0, 0).start()

    @pl.when(i + 1 < n)
    def _prefetch():
        cp_k(i + 1, (i + 1) % 2).start()
        cp_v(i + 1, (i + 1) % 2).start()

    slot = i % 2
    cp_k(i, slot).wait()
    cp_v(i, slot).wait()
    t, hd = kbuf.shape[2], kbuf.shape[3]
    for g in range(G):
        kt = kbuf[slot, g * K:(g + 1) * K].reshape(K * t, hd)
        vt = vbuf[slot, g * K:(g + 1) * K].reshape(K * t, hd)
        o_ref[g] = _attend_tiles(
            kt.astype(jnp.bfloat16), vt.astype(jnp.bfloat16),
            q_ref[g], kst_ref[g], vst_ref[g], am_ref[g],
            None, None, beams, heads, head_dim, o_ref.dtype,
        )


def _rows_to_col(S, K: int, T: int):
    """(K, T) f32 -> (K*T, 1): out[k*T + t] = S[k, t].

    Mosaic rejects the direct reshape (a lane->sublane shape cast); this is
    the MXU-friendly formulation: replicate each of the K rows T times with
    a one-hot row-select matmul, mask to the diagonal t, reduce over lanes
    with a ones-matmul."""
    kt = K * T
    a = (
        jax.lax.broadcasted_iota(jnp.int32, (kt, K), 0) // T
        == jax.lax.broadcasted_iota(jnp.int32, (kt, K), 1)
    ).astype(jnp.float32)
    tmp = jax.lax.dot_general(
        a, S.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (KT, T)
    tmask = (
        jax.lax.broadcasted_iota(jnp.int32, (kt, T), 0) % T
        == jax.lax.broadcasted_iota(jnp.int32, (kt, T), 1)
    )
    tmp = jnp.where(tmask, tmp, 0.0)
    ones = jnp.ones((T, 1), jnp.float32)
    return jax.lax.dot_general(
        tmp, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                        # (KT, 1)


def _kernel_dma_q8(G, beams, heads, head_dim,
                   ck_hbm, cv_hbm,
                   ksc_ref, vsc_ref, q_ref, kst_ref, vst_ref, am_ref,
                   cko, cvo, o_ref,
                   kbuf, vbuf, ksem, vsem):
    """int8 variant: the big int8 VALUE planes are manual-DMA pass-throughs;
    the tiny per-ROW (B*K, T) f32 scale planes arrive as ordinary blocked
    VMEM inputs — Mosaic cannot DMA into a sub-128-lane f32 buffer, and the
    copy XLA inserts for a custom-call-read carried buffer is negligible at
    scale-plane size (~100 KB vs the 10s-of-MB value planes)."""
    del cko, cvo
    K = beams
    i = pl.program_id(0)
    n = pl.num_programs(0)
    rows = G * K

    def cp_k(g, slot):
        return pltpu.make_async_copy(
            ck_hbm.at[pl.ds(g * rows, rows)], kbuf.at[slot], ksem.at[slot]
        )

    def cp_v(g, slot):
        return pltpu.make_async_copy(
            cv_hbm.at[pl.ds(g * rows, rows)], vbuf.at[slot], vsem.at[slot]
        )

    @pl.when(i == 0)
    def _first():
        cp_k(0, 0).start()
        cp_v(0, 0).start()

    @pl.when(i + 1 < n)
    def _prefetch():
        cp_k(i + 1, (i + 1) % 2).start()
        cp_v(i + 1, (i + 1) % 2).start()

    slot = i % 2
    cp_k(i, slot).wait()
    cp_v(i, slot).wait()
    t, hd = kbuf.shape[2], kbuf.shape[3]
    for g in range(G):
        sl = slice(g * K, (g + 1) * K)
        kt = kbuf[slot, sl].reshape(K * t, hd).astype(jnp.bfloat16)
        vt = vbuf[slot, sl].reshape(K * t, hd).astype(jnp.bfloat16)
        # per-ROW scales: (K, T) -> (K*T, 1)
        ks = _rows_to_col(ksc_ref[sl], K, t)
        vs = _rows_to_col(vsc_ref[sl], K, t)
        o_ref[g] = _attend_tiles(
            kt, vt, q_ref[g], kst_ref[g], vst_ref[g], am_ref[g],
            ks, vs, beams, heads, head_dim, o_ref.dtype,
        )


def supports_dma(cache_k, beams: int, num_heads: int, head_dim: int) -> bool:
    """v2 guard: MERGED (B*K, T, H*Dh) storage required (the DMA row slices
    and the free in-VMEM (K, T, HD) -> (K*T, HD) view both assume it); int8
    caches additionally need per-ROW (B*K, T) scales — Mosaic rejects the
    sub-128-lane slices a per-head scale tile would take."""
    quant = isinstance(cache_k, dict)
    kv = cache_k["q"] if quant else cache_k
    if quant and cache_k["s"].ndim != 2:
        return False
    return (
        beams >= 2
        and kv.ndim == 3
        and (num_heads * head_dim) % 128 == 0
        and kv.shape[1] % 8 == 0
    )


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def fused_lazy_attention_dma(
    q: jnp.ndarray,        # (B, K, HD) — query, already head_dim**-0.5-scaled
    cache_k,               # merged (B*K, T, H*Dh) bf16 — or int8 dict
    cache_v,               # {"q": (B*K, T, HD) int8, "s": (B*K, T, H) f32}
    k_step: jnp.ndarray,   # (B, K, HD) — the current step's K/V rows
    v_step: jnp.ndarray,
    amask: jnp.ndarray,    # (B, J*T, K) int8 from build_ancestry_mask
    beams: int,
    num_heads: int,
    interpret: bool = False,
):
    """-> (out (B, K, HD), cache_k, cache_v): same math as
    fused_lazy_attention, but the caches flow THROUGH the kernel (aliased,
    untouched) so the caller's subsequent column write aliases in place.
    Callers MUST thread the returned caches onward."""
    b, k, hd = q.shape
    head_dim = hd // num_heads
    quant = isinstance(cache_k, dict)
    kv = cache_k["q"] if quant else cache_k
    t = kv.shape[1]
    jt = k * t
    esize = 1 if quant else 2
    G = _dma_group(b, k * t * hd * esize)

    blk = lambda shape: pl.BlockSpec(  # noqa: E731
        (G,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)

    small_in = [blk((k, hd)), blk((k, hd)), blk((k, hd)), blk((jt, k))]
    small_args = [
        q.astype(jnp.bfloat16),
        k_step.astype(jnp.bfloat16), v_step.astype(jnp.bfloat16),
        amask,
    ]
    cache_bytes = esize * 2 * jt * hd

    if quant:
        kern = functools.partial(
            _kernel_dma_q8, G, k, num_heads, head_dim
        )
        scale_spec = pl.BlockSpec(
            (G * k, t), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            kern,
            grid=(b // G,),
            in_specs=[any_spec] * 2 + [scale_spec] * 2 + small_in,
            out_specs=[any_spec] * 2 + [blk((k, hd))],
            out_shape=[
                jax.ShapeDtypeStruct(cache_k["q"].shape, cache_k["q"].dtype),
                jax.ShapeDtypeStruct(cache_v["q"].shape, cache_v["q"].dtype),
                jax.ShapeDtypeStruct((b, k, hd), q.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, G * k, t, hd), jnp.int8),
                pltpu.VMEM((2, G * k, t, hd), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            input_output_aliases={0: 0, 1: 1},
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=b * 2 * (2 * jt * hd * k * num_heads),
                bytes_accessed=b * cache_bytes,
                transcendentals=b * jt * k * num_heads,
            ),
        )(cache_k["q"], cache_v["q"], cache_k["s"], cache_v["s"], *small_args)
        ckq, cvq, out = outs
        return (
            out,
            {"q": ckq, "s": cache_k["s"]},
            {"q": cvq, "s": cache_v["s"]},
        )

    kern = functools.partial(_kernel_dma_bf16, G, k, num_heads, head_dim)
    outs = pl.pallas_call(
        kern,
        grid=(b // G,),
        in_specs=[any_spec] * 2 + small_in,
        out_specs=[any_spec] * 2 + [blk((k, hd))],
        out_shape=[
            jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
            jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
            jax.ShapeDtypeStruct((b, k, hd), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, G * k, t, hd), cache_k.dtype),
            pltpu.VMEM((2, G * k, t, hd), cache_v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 2 * (2 * jt * hd * k * num_heads),
            bytes_accessed=b * cache_bytes,
            transcendentals=b * jt * k * num_heads,
        ),
    )(cache_k, cache_v, *small_args)
    out_k, out_v, out = outs
    return out, out_k, out_v
