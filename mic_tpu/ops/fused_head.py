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

_WINDOW = 128  # lane width: top-1 per 128-lane window in "window" select mode


def _window_candidates(s, base):
    """Top-1 of every 128-lane window of the (BN, BV) score tile -> values
    (BN, BV/128) and GLOBAL ids.  One lane-reduction per window instead of
    the exact mode's K select-and-mask passes over the whole tile — the
    exact select measured VPU-bound (7.5 ms/step vs the 1.2 ms weight-stream
    floor at the flagship shapes).  Same approximation family as
    jax.lax.approx_max_k (top-1 per disjoint bin), which is the
    BLEU-validated default candidate source (PERFORMANCE.md)."""
    bn, bv = s.shape
    nw = bv // _WINDOW
    s3 = s.reshape(bn, nw, _WINDOW)
    wmax = jnp.max(s3, axis=-1)                                    # (BN, NW)
    lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    # highest lane index on (improbable float) ties
    widx = jnp.max(jnp.where(s3 == wmax[:, :, None], lane, -1), axis=-1)
    win = jax.lax.broadcasted_iota(jnp.int32, wmax.shape, 1)
    return wmax, base + win * _WINDOW + widx


# Fixed offset for the sum-of-exps accumulator: exp(min(s, _EXP_CLAMP))
# per element.  Mathematically exact (lse = log(sum exp(s)) directly) as
# long as no logit exceeds the clamp: 250054 * exp(60) ~ 2.7e31 << f32 max.
# Trained LM logits live in [-30, 30]; a clamp engagement means the run is
# already degenerate.  The PREVIOUS online-max formulation
# (l = l*exp(m_prev-m_new) + exp(s-m_new)) was 2 transcendentals/element —
# profiled as the kernel's VPU bottleneck at the 1024-row tile (~4 ms/step,
# ~500M exps); this is 1.
_EXP_CLAMP = 60.0


def _bucket_update(s, base, l_scr, rmax_scr, rid_scr):
    """Per-chunk accumulator update with ELEMENTWISE ops only.

    The exact/window selects and a scalar online-lse pay several cross-lane
    reductions per chunk (a lane reduction is ~log2(width) shuffle steps; at
    245 chunks that measured ~4 ms/step of pure VPU shuffle time).  Here
    every column position j of the chunk keeps its own running sum-of-exps
    (fixed offset — see _EXP_CLAMP) and its own running (best value, best
    global id) over chunks — all elementwise, ONE transcendental — and
    _bucket_finish does the only reductions ONCE."""
    l_scr[:] = l_scr[:] + jnp.exp(jnp.minimum(s, _EXP_CLAMP))
    col = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    upd = s > rmax_scr[:]
    rid_scr[:] = jnp.where(upd, col, rid_scr[:])
    rmax_scr[:] = jnp.where(upd, s, rmax_scr[:])


def _bucket_finish(k, lp_ref, idx_ref, lse_ref, l_scr, rmax_scr, rid_scr):
    lt = jnp.sum(l_scr[:], axis=-1, keepdims=True)           # (BN, 1)
    # rmax holds the per-column running max, so its row max is the EXACT row
    # max — use it to keep degenerate rows finite: a row whose exps all
    # underflow (max < ~-87) or whose max exceeds _EXP_CLAMP degrades to
    # lse ~= row max instead of -inf/NaN beam scores.  In the normal range
    # lt >= exp(row max) so the guard is a no-op.
    m = jnp.max(rmax_scr[:], axis=-1, keepdims=True)
    lse = jnp.maximum(
        jnp.log(jnp.maximum(lt, jnp.finfo(jnp.float32).tiny)), m
    )
    mv, mi = _select_topk(rmax_scr[:], rid_scr[:], k)
    lp_ref[:] = mv - lse
    idx_ref[:] = mi
    lse_ref[:] = lse


def _kernel_bucket(vocab, k, x_ref, w_ref, b_ref, lp_ref, idx_ref, lse_ref,
                   l_scr, rmax_scr, rid_scr):
    """Bucket-mode bf16 kernel: candidates = per-column-position running max
    over vocab chunks (bv buckets/row, the approx_max_k family of
    approximations); exact lse via per-column online accumulators."""
    jv = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(jv == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        rmax_scr[:] = jnp.full_like(rmax_scr, NEG_INF)
        rid_scr[:] = jnp.zeros_like(rid_scr)

    s = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b_ref[:].astype(jnp.float32)
    bv = s.shape[1]
    base = jv * bv
    if vocab % bv != 0:
        colm = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(colm < vocab, s, NEG_INF)
    _bucket_update(s, base, l_scr, rmax_scr, rid_scr)

    @pl.when(jv == nv - 1)
    def _finish():
        _bucket_finish(k, lp_ref, idx_ref, lse_ref,
                       l_scr, rmax_scr, rid_scr)


def _kernel_bucket_acc(vocab, x_ref, w_ref, b_ref,
                       l_ref, rmax_ref, rid_ref):
    """Bucket kernel WITHOUT the in-kernel finish: the four accumulator
    planes are pallas OUTPUTS (updated in place in VMEM, flushed to HBM once
    at grid end) and the tiny lse/top-k finish runs in XLA.  Mosaic's
    scoped-vmem accounting charges the finish's k select-and-mask
    temporaries against the kernel stack — at a 1024-row tile that overflows
    the 16 MB VMEM (17.1 MB measured), while the accumulator-only body fits.
    Used whenever the row tile exceeds 512 (see _bucket_tiles)."""
    jv = pl.program_id(1)

    @pl.when(jv == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        rmax_ref[:] = jnp.full_like(rmax_ref, NEG_INF)
        rid_ref[:] = jnp.zeros_like(rid_ref)

    s = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + b_ref[:].astype(jnp.float32)
    bv = s.shape[1]
    base = jv * bv
    if vocab % bv != 0:
        colm = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(colm < vocab, s, NEG_INF)
    _bucket_update(s, base, l_ref, rmax_ref, rid_ref)


def _kernel_q8_bucket_acc(vocab, x_ref, w_ref, ws_ref, b_ref,
                          l_ref, rmax_ref, rid_ref):
    """int8-weight variant of _kernel_bucket_acc (bf16 MXU dot on the
    in-kernel-dequantized tile, like _kernel_q8_bucket)."""
    jv = pl.program_id(1)

    @pl.when(jv == 0)
    def _init():
        l_ref[:] = jnp.zeros_like(l_ref)
        rmax_ref[:] = jnp.full_like(rmax_ref, NEG_INF)
        rid_ref[:] = jnp.zeros_like(rid_ref)

    w = w_ref[:].astype(jnp.bfloat16)                        # int8 -> bf16
    s = jax.lax.dot_general(
        x_ref[:], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * ws_ref[:] + b_ref[:].astype(jnp.float32)
    bv = s.shape[1]
    base = jv * bv
    if vocab % bv != 0:
        colm = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(colm < vocab, s, NEG_INF)
    _bucket_update(s, base, l_ref, rmax_ref, rid_ref)


def _bucket_finish_host(k, l, rmax, rid):
    """XLA-side finish for the acc kernels: exact row lse from the per-column
    fixed-offset sum-of-exps plane + top-k over the bucket winners —
    identical math to the in-kernel _bucket_finish (incl. the degenerate-row
    guard: lse >= exact row max, never -inf)."""
    lt = jnp.sum(l, axis=-1, keepdims=True)
    m = jnp.max(rmax, axis=-1, keepdims=True)
    lse = jnp.maximum(
        jnp.log(jnp.maximum(lt, jnp.finfo(jnp.float32).tiny)), m
    )
    tv, pick = jax.lax.top_k(rmax, k)
    ids = jnp.take_along_axis(rid, pick, axis=-1)
    return tv - lse, ids, lse


def _acc_out_specs(bn, bv):
    """out_specs/out_shape builder for the acc kernels: four (N, BV)
    accumulator planes, one VMEM block per row tile (flushed at grid end)."""
    spec = pl.BlockSpec((bn, bv), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    return [spec] * 3


def _acc_out_shape(n, bv):
    return [
        jax.ShapeDtypeStruct((n, bv), jnp.float32),
        jax.ShapeDtypeStruct((n, bv), jnp.float32),
        jax.ShapeDtypeStruct((n, bv), jnp.int32),
    ]


def _kernel_q8_bucket(vocab, k, x_ref, w_ref, ws_ref, b_ref,
                      lp_ref, idx_ref, lse_ref,
                      l_scr, rmax_scr, rid_scr):
    """Bucket-mode int8-weight kernel: streams int8 bytes but converts the
    weight tile to bf16 IN-KERNEL and runs a bf16 MXU dot — Mosaic's native
    int8 dot measured ~3.4 ms slower than the bf16 dot at these shapes, and
    the convert is one elementwise pass over the resident tile.  Activations
    stay bf16 (no activation quant error); the per-vocab-channel scale
    multiplies the f32 accumulator."""
    jv = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(jv == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        rmax_scr[:] = jnp.full_like(rmax_scr, NEG_INF)
        rid_scr[:] = jnp.zeros_like(rid_scr)

    w = w_ref[:].astype(jnp.bfloat16)                        # int8 -> bf16
    s = jax.lax.dot_general(
        x_ref[:], w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * ws_ref[:] + b_ref[:].astype(jnp.float32)
    bv = s.shape[1]
    base = jv * bv
    if vocab % bv != 0:
        colm = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(colm < vocab, s, NEG_INF)
    _bucket_update(s, base, l_scr, rmax_scr, rid_scr)

    @pl.when(jv == nv - 1)
    def _finish():
        _bucket_finish(k, lp_ref, idx_ref, lse_ref,
                       l_scr, rmax_scr, rid_scr)


def _tiles(n: int) -> tuple[int, int]:
    """Row/vocab block sizes.  The grid iterates vocab chunks innermost, so
    the weight matrix is streamed from HBM once PER ROW TILE — at the
    flagship decode shape (n=512 rows) a 256-row tile means streaming the
    512 MB head twice per step, which measured slower than the unfused dot
    (155.9 vs 169.2 captions/s/chip).  Cover all rows in ONE tile whenever
    the (bn, bv) f32 logits tile + weight double-buffer fit VMEM, shrinking
    the vocab chunk to compensate (bn*bv is held near 512K f32 = 2 MB)."""
    if n <= 256:
        bn = n
        bv = 2048
    elif n <= 512:
        bn = n
        bv = 1024
    else:
        # the exact/window kernels run their select passes IN-KERNEL each
        # chunk; above 512 rows the select temporaries overflow Mosaic's
        # scoped VMEM (17.1 MB measured at a 1024-row tile — the same limit
        # that forced the bucket path onto the acc-output kernel).  Cap the
        # row tile at 512 and accept one extra weight stream per tile; the
        # default bucket path covers 1024 rows in one tile instead.
        bn = 512
        bv = 1024
    return bn, bv


def _kernel(vocab, k, window, x_ref, w_ref, b_ref, lp_ref, idx_ref, lse_ref,
            m_scr, l_scr, tv_scr, ti_scr):
    jv = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(jv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        tv_scr[:] = jnp.full_like(tv_scr, NEG_INF)
        ti_scr[:] = jnp.zeros_like(ti_scr)

    # (BN, D) x (D, BV) on the MXU — the only weight read of the step.
    # The weight arrives PRE-TRANSPOSED as (D, V): contracting the rhs minor
    # dim instead would make Mosaic transpose every 2 MB weight tile in VMEM
    # (measured: the (V, D)-layout kernel ran 5.7 ms vs the ~2.5 ms floor).
    s = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
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

    # chunk candidates merged into the running top-k
    if window:
        bv_vals, bv_idx = _window_candidates(s, base)
    else:
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


def _kernel_q8(vocab, k, window, x_ref, xs_ref, w_ref, ws_ref, b_ref,
               lp_ref, idx_ref, lse_ref, m_scr, l_scr, tv_scr, ti_scr):
    """Int8 variant: x (BN, D) int8 x w_t (D, BV) int8 on the MXU at 2x bf16
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
        dimension_numbers=(((1,), (0,)), ((), ())),
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

    if window:
        bv_vals, bv_idx = _window_candidates(s, base)
    else:
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


def _bucket_tiles(n: int) -> tuple[int, int]:
    """Bucket-mode tiles: the (BN, BV) f32/int32 accumulators live in
    VMEM scratch (4 x BN x BV x 4 bytes).  The grid iterates vocab chunks
    innermost, so every extra ROW tile streams the whole head weight again
    — cover up to 1024 rows (the flagship batch-256 x beam-4 shape) in ONE
    tile, shrinking BV to keep scratch + x + weight double-buffer inside
    the ~16 MB VMEM: bn=1024, bv=256 is 4 MB scratch + 2 MB x + 1 MB w.
    MIC_TPU_EXPERIMENTAL=bucket_bv=<w> overrides the vocab-chunk width
    (perf experiments)."""
    from mic_tpu.core.knobs import experimental

    override = experimental("bucket_bv")
    if n <= 512:
        return n, int(override or 512)
    # 1024-row tile: runs the accumulator-output kernel (XLA finish) —
    # Mosaic's scoped-vmem accounting charges the in-kernel finish's
    # select-pass temporaries against the kernel stack and OOMs; without
    # the finish, bv=512 fits (3 acc planes 6 MB + x 2 MB + w double-buffer
    # 2 MB) and measured 3% faster than bv=256 (3.96 vs 4.09 ms standalone,
    # tools/bench_head.py --n 1024): half the grid's per-chunk overheads.
    return min(n, 1024), int(override or 512)


def _bucket_topk_dense(logits, k, bv):
    """CPU/XLA oracle for select="bucket": per-column-position max over
    ceil(V/bv) chunks (earliest chunk wins ties, mirroring the kernel's
    strict-> update), then exact top-k over the bv bucket winners."""
    n, v = logits.shape
    pad = (-v) % bv
    if pad:
        fill = jnp.full((n, pad), NEG_INF, logits.dtype)
        logits = jnp.concatenate([logits, fill], axis=1)
    nc = logits.shape[1] // bv
    s3 = logits.reshape(n, nc, bv)
    vals = jnp.max(s3, axis=1)                               # (n, bv)
    chunk = jnp.argmax(s3, axis=1).astype(jnp.int32)         # first max
    ids = chunk * bv + jnp.arange(bv, dtype=jnp.int32)[None, :]
    tv, pick = jax.lax.top_k(vals, k)
    return tv, jnp.take_along_axis(ids, pick, axis=-1)


def _window_topk_dense(logits, k):
    """CPU/XLA oracle for select="window": top-1 per disjoint 128-lane
    window, then exact top-k over the window winners (identical semantics
    to the kernel, including the highest-index tie rule)."""
    n, v = logits.shape
    pad = (-v) % _WINDOW
    if pad:
        fill = jnp.full((n, pad), NEG_INF, logits.dtype)
        logits = jnp.concatenate([logits, fill], axis=1)
    nw = logits.shape[1] // _WINDOW
    s3 = logits.reshape(n, nw, _WINDOW)
    wmax = jnp.max(s3, axis=-1)
    lane = jax.lax.broadcasted_iota(jnp.int32, s3.shape, 2)
    widx = jnp.max(jnp.where(s3 == wmax[:, :, None], lane, -1), axis=-1)
    wids = jnp.arange(nw, dtype=jnp.int32)[None, :] * _WINDOW + widx
    vals, pick = jax.lax.top_k(wmax, k)
    return vals, jnp.take_along_axis(wids, pick, axis=-1)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def fused_head_topk_q8(
    hidden: jnp.ndarray,        # (N, D) bf16/f32
    weight_qt: jnp.ndarray,     # (D, V) int8 — TRANSPOSED quantized embedding
    weight_scale: jnp.ndarray,  # (V,) f32 per-vocab-row scales
    bias: jnp.ndarray,          # (V,)
    k: int,
    select: str = "exact",      # "exact" | "window" (approx_max_k-family)
    interpret: bool = False,    # run the kernel in interpret mode (CPU tests)
):
    """Int8-weight fused head: same contract as fused_head_topk but streams
    int8 weights (256 MB vs 512 MB at the flagship vocab) and runs a native
    int8 x int8 MXU dot with dynamically per-row-quantized activations
    (ops/quant.quantize_rows_dynamic semantics, inlined here so the quant
    fuses with the decoder's last op).  The weight must be PRE-TRANSPOSED
    (D, V) by the caller, once, outside the decode loop (see _kernel)."""
    from mic_tpu.ops.quant import quantize_rows_dynamic

    n, d = hidden.shape
    v = weight_qt.shape[1]
    if select == "bucket":
        # bucket mode streams int8 but computes in bf16 (no activation
        # quant): dequant error = weight rounding only
        if jax.default_backend() != "tpu" and not interpret:
            logits = jnp.dot(
                hidden.astype(jnp.bfloat16),
                weight_qt.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * weight_scale[None, :] + bias.astype(jnp.float32)
            bv = _bucket_tiles(n)[1]
            vals, ids = _bucket_topk_dense(logits, k, bv)
            lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
            return vals - lse, ids, lse
        bn, bv = _bucket_tiles(n)
        grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
        in_specs = [
            pl.BlockSpec((bn, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bv), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ]
        args = (hidden.astype(jnp.bfloat16), weight_qt,
                weight_scale.reshape(1, v), bias.reshape(1, v))
        cost = pl.CostEstimate(
            flops=2 * n * d * v,
            bytes_accessed=v * d + v * 4 + n * d,
            transcendentals=n * v,
        )
        if bn > 512:
            # large row tile: accumulator-output kernel + XLA finish (the
            # in-kernel finish's select-pass temporaries overflow VMEM)
            accs = pl.pallas_call(
                functools.partial(_kernel_q8_bucket_acc, v),
                grid=grid,
                in_specs=in_specs,
                out_specs=_acc_out_specs(bn, bv),
                out_shape=_acc_out_shape(n, bv),
                cost_estimate=cost,
                interpret=interpret,
            )(*args)
            return _bucket_finish_host(k, *accs)
        lp, idx, lse = pl.pallas_call(
            functools.partial(_kernel_q8_bucket, v, k),
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bn, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, k), jnp.float32),
                jax.ShapeDtypeStruct((n, k), jnp.int32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bn, bv), jnp.float32),
                pltpu.VMEM((bn, bv), jnp.float32),
                pltpu.VMEM((bn, bv), jnp.int32),
            ],
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
        return lp, idx, lse

    xq, xs = quantize_rows_dynamic(hidden)
    if jax.default_backend() != "tpu" and not interpret:
        acc = jax.lax.dot_general(
            xq, weight_qt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        logits = (
            acc.astype(jnp.float32) * xs * weight_scale[None, :]
            + bias.astype(jnp.float32)
        )
        if select == "window":
            vals, ids = _window_topk_dense(logits, k)
        else:
            vals, ids = jax.lax.top_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids, lse

    bn, bv = _tiles(n)
    grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
    lp, idx, lse = pl.pallas_call(
        functools.partial(_kernel_q8, v, k, select == "window"),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(xq, xs, weight_qt, weight_scale.reshape(1, v), bias.reshape(1, v))
    return lp, idx, lse


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def fused_head_topk(
    hidden: jnp.ndarray,    # (N, D)
    weight_t: jnp.ndarray,  # (D, V) — PRE-TRANSPOSED tied embedding
    bias: jnp.ndarray,      # (V,)   — final_logits_bias
    k: int,
    select: str = "exact",  # "exact" | "window" (approx_max_k-family)
    interpret: bool = False,    # run the kernel in interpret mode (CPU tests)
):
    """-> (log_probs (N, k) f32, ids (N, k) i32, lse (N, 1) f32) of
    log_softmax(hidden @ weight_t + bias) without materializing logits.
    The caller transposes the (V, D) embedding ONCE outside the decode loop."""
    n, d = hidden.shape
    v = weight_t.shape[1]
    if jax.default_backend() != "tpu" and not interpret:
        logits = (
            jnp.dot(hidden, weight_t.astype(hidden.dtype),
                    preferred_element_type=jnp.float32)
            + bias.astype(jnp.float32)
        )
        if select == "bucket":
            vals, ids = _bucket_topk_dense(logits, k, _bucket_tiles(n)[1])
        elif select == "window":
            vals, ids = _window_topk_dense(logits, k)
        else:
            vals, ids = jax.lax.top_k(logits, k)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        return vals - lse, ids, lse

    if select == "bucket":
        bn, bv = _bucket_tiles(n)
        grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
        if bn > 512:
            # large row tile: accumulator-output kernel + XLA finish (the
            # in-kernel finish's select-pass temporaries overflow VMEM)
            accs = pl.pallas_call(
                functools.partial(_kernel_bucket_acc, v),
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bn, d), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, bv), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, bv), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=_acc_out_specs(bn, bv),
                out_shape=_acc_out_shape(n, bv),
                cost_estimate=pl.CostEstimate(
                    flops=2 * n * d * v,
                    bytes_accessed=v * d * weight_t.dtype.itemsize + n * d * 2,
                    transcendentals=n * v,
                ),
                interpret=interpret,
            )(hidden, weight_t, bias.reshape(1, v))
            return _bucket_finish_host(k, *accs)
        lp, idx, lse = pl.pallas_call(
            functools.partial(_kernel_bucket, v, k),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bn, d), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, bv), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bv), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bn, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n, k), jnp.float32),
                jax.ShapeDtypeStruct((n, k), jnp.int32),
                jax.ShapeDtypeStruct((n, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bn, bv), jnp.float32),
                pltpu.VMEM((bn, bv), jnp.float32),
                pltpu.VMEM((bn, bv), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n * d * v,
                bytes_accessed=v * d * weight_t.dtype.itemsize + n * d * 2,
                transcendentals=n * v,
            ),
            interpret=interpret,
        )(hidden, weight_t, bias.reshape(1, v))
        return lp, idx, lse

    bn, bv = _tiles(n)
    grid = (pl.cdiv(n, bn), pl.cdiv(v, bv))
    bias2 = bias.reshape(1, v)
    lp, idx, lse = pl.pallas_call(
        functools.partial(_kernel, v, k, select == "window"),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bv), lambda i, j: (0, j), memory_space=pltpu.VMEM),
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
            bytes_accessed=v * d * weight_t.dtype.itemsize + n * d * 2,
            transcendentals=n * v,
        ),
        interpret=interpret,
    )(hidden, weight_t, bias2)
    return lp, idx, lse
