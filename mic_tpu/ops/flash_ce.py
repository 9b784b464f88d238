"""Pallas flash cross-entropy over the tied LM head (training).

The XLA chunked CE (ops/fused_ce.py) materializes each chunk's f32 logits
to HBM (4.1 GB per 4096-row chunk at mBART's 250054 vocab) and re-reads
them for every reduction (max, sumexp, label gather, row sum) — then the
backward recomputes them again and read-modify-writes the 1 GB f32
embedding-grad accumulator.  Profiled at ~160 ms of the 366 ms train step
(per-device batch 128, v5e).

These kernels never let a logit reach HBM:

- `flash_ce_forward`: grid (row bands, vocab chunks), vocab innermost.
  Each cell computes one (RB, VC) logits tile on the MXU and folds it into
  per-row ONLINE accumulators (running max, rescaled sumexp, label logit,
  row logit-sum) in VMEM scratch; the band's (lse, label_logit, sum_logits)
  vector leaves at its last vocab cell.  The f32 logits tile lives only in
  registers/VMEM.
- `flash_ce_grad_w`: grid (vocab chunks, row bands), ROWS innermost so the
  (VC, D) embedding-grad block stays resident across the row sweep and is
  written exactly ONCE — no gradient accumulator RMW.  Recomputes the
  logits tile, forms dl = (softmax - smoothed-target) * rowscale, and
  contracts dl^T @ h on the spot.  The dl tile is also the source for
  grad_bias.
- `flash_ce_grad_h`: grid (row bands, vocab chunks), VOCAB innermost so the
  (RB, D) f32 hidden-grad block stays resident across the vocab sweep.
  Recomputes dl (cast to bf16, matching fused_ce's cast-before-matmul) and
  accumulates dl @ W.
- `flash_ce_backward_dl` (the TPU default backward): ONE kernel recomputes
  the logits from the saved forward lse, materializes dl as bf16 (+ exact
  f32 dbias partials), and dh/demb run as plain XLA GEMMs over dl — one
  logits recompute instead of the two the grad_w/grad_h split pays.

Numerics: logits tiles accumulate in f32 on the MXU exactly like the XLA
einsum; the forward lse uses online rescaling (vs XLA's one-shot max), and
grad_W/grad_h accumulate per-band/per-chunk f32 partials where XLA uses one
long dot — same-math different summation order, tested to tight tolerance
against ops/fused_ce.py (itself pinned to the unfused oracle).

Reference behavior being replaced: the reference's train step materialized
the full (B, T, 250054) logits and ran optax.softmax_cross_entropy-style
label-smoothed CE on it (/root/reference/main.py loss_fn).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = jnp.finfo(jnp.float32).min


def _ce_fwd_kernel(nc,
                   h_ref, w_ref, b_ref,
                   out_ref, m_ref, s_ref, z_ref, buf_ref):
    """Lean software-pipelined cell: GEMM + bias + online (max, sumexp, z).

    Round-4 restructuring of the forward:
    - label_logit and the vocab masking moved OUT of the kernel
      (label_logit is a gather + rowwise f32 dot in XLA; the ragged vocab
      tail past the last full chunk runs as a tiny XLA GEMM merged via
      logaddexp), so the kernel only ever sees full (RB, VC) tiles and the
      per-tile VPU work is just the online softmax + one raw-logit sum.
    - SOFTWARE PIPELINING: cell c writes its logits tile to the ping-pong
      scratch buf[c%2] and folds the PREVIOUS cell's tile buf[(c-1)%2]
      into the accumulators, so Mosaic can overlap this cell's MXU dot
      with the previous tile's VPU softmax (they have no data
      dependency).  The grid runs one epilogue cell (nc+1 iterations)
      to fold the final tile.
    """
    c = pl.program_id(1)
    rb = out_ref.shape[0]
    vc = w_ref.shape[0]

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full((rb, 1), NEG, jnp.float32)
        s_ref[:] = jnp.zeros((rb, 1), jnp.float32)
        z_ref[:] = jnp.zeros((rb, 1), jnp.float32)

    @pl.when(c < nc)
    def _():
        buf_ref[c % 2] = jax.lax.dot_general(
            h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[:].astype(jnp.float32)                    # (RB, VC)

    @pl.when(c > 0)
    def _():
        logits = buf_ref[(c - 1) % 2]
        mx = jnp.max(logits, axis=1, keepdims=True)
        mnew = jnp.maximum(m_ref[:], mx)
        s_ref[:] = (
            s_ref[:] * jnp.exp(m_ref[:] - mnew)
            + jnp.sum(jnp.exp(logits - mnew), axis=1, keepdims=True)
        )
        m_ref[:] = mnew
        z_ref[:] += jnp.sum(logits, axis=1, keepdims=True)

    @pl.when(c == nc)
    def _():
        lse = m_ref[:] + jnp.log(s_ref[:])
        out_ref[:] = jnp.concatenate(
            [lse, z_ref[:], jnp.zeros((rb, 126), jnp.float32)], axis=1,
        )


def _ce_fwd_save_kernel(nc,
                        h_ref, w_ref, b_ref,
                        out_ref, lg_ref, m_ref, s_ref, z_ref, buf_ref):
    """The pipelined forward cell, additionally SAVING each logits tile to
    HBM in the storage dtype (bf16) — the "save" backward then skips the
    whole 2*N*D*V-FLOP logits recompute (flash_ce_backward_save).  The
    accumulators still fold the exact f32 tiles, so loss/lse are bit-equal
    to the non-saving kernel; only the backward sees the rounded logits."""
    c = pl.program_id(1)
    rb = out_ref.shape[0]

    @pl.when(c == 0)
    def _():
        m_ref[:] = jnp.full((rb, 1), NEG, jnp.float32)
        s_ref[:] = jnp.zeros((rb, 1), jnp.float32)
        z_ref[:] = jnp.zeros((rb, 1), jnp.float32)

    @pl.when(c < nc)
    def _():
        tile = jax.lax.dot_general(
            h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[:].astype(jnp.float32)                    # (RB, VC)
        buf_ref[c % 2] = tile
        lg_ref[:] = tile.astype(lg_ref.dtype)

    @pl.when(c > 0)
    def _():
        logits = buf_ref[(c - 1) % 2]
        mx = jnp.max(logits, axis=1, keepdims=True)
        mnew = jnp.maximum(m_ref[:], mx)
        s_ref[:] = (
            s_ref[:] * jnp.exp(m_ref[:] - mnew)
            + jnp.sum(jnp.exp(logits - mnew), axis=1, keepdims=True)
        )
        m_ref[:] = mnew
        z_ref[:] += jnp.sum(logits, axis=1, keepdims=True)

    @pl.when(c == nc)
    def _():
        lse = m_ref[:] + jnp.log(s_ref[:])
        out_ref[:] = jnp.concatenate(
            [lse, z_ref[:], jnp.zeros((rb, 126), jnp.float32)], axis=1,
        )


def _lse_main_save(h, emb, bias, rb, vc, v_main, interpret):
    """_lse_main variant returning (lse, zsum, logits_main (N, v_main) bf16)."""
    n, d = h.shape
    v = emb.shape[0]
    nc = v_main // vc
    kern = functools.partial(_ce_fwd_save_kernel, nc)
    out, lg = pl.pallas_call(
        kern,
        grid=(n // rb, nc + 1),
        in_specs=[
            pl.BlockSpec((rb, d), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vc, d), lambda r, c: (jnp.minimum(c, nc - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vc), lambda r, c: (0, jnp.minimum(c, nc - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, 128), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            # epilogue cell re-addresses (and re-emits, unchanged) the last
            # tile: its dot is pl.when-guarded off
            pl.BlockSpec((rb, vc), lambda r, c: (r, jnp.minimum(c, nc - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, v_main), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((2, rb, vc), jnp.float32),   # ping-pong logits
        ],
        interpret=interpret,
        # ping-pong f32 scratch + the bf16 logits out block on top of the
        # non-saving kernel's 48 MB budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v_main,
            bytes_accessed=(n // rb) * 2 * v_main * d + 2 * n * d
            + 2 * n * v_main,
            transcendentals=n * v_main,
        ),
    )(
        h, emb, bias.reshape(1, v),
    )
    return out[:, 0], out[:, 1], lg


def _lse_main(h, emb, bias, rb, vc, v_main, interpret):
    """Online-softmax (lse, sum_logits) over the first ``v_main`` (divisible
    by vc) rows of the FULL (V, D) table: the grid stops at the last full
    chunk, so the ragged tail is simply never addressed — no slice operand.
    ``emb`` must already be in h.dtype; ``bias`` f32 (V,)."""
    n, d = h.shape
    v = emb.shape[0]
    nc = v_main // vc
    kern = functools.partial(_ce_fwd_kernel, nc)
    out = pl.pallas_call(
        kern,
        grid=(n // rb, nc + 1),  # +1 epilogue cell folds the last tile
        in_specs=[
            pl.BlockSpec((rb, d), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            # clamp: the epilogue cell re-addresses the last block (its
            # dot is pl.when-guarded off, no new DMA is actually needed)
            pl.BlockSpec((vc, d), lambda r, c: (jnp.minimum(c, nc - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vc), lambda r, c: (0, jnp.minimum(c, nc - 1)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 128), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
            pltpu.VMEM((2, rb, vc), jnp.float32),   # ping-pong logits
        ],
        interpret=interpret,
        # the ping-pong logits scratch (2*RB*VC f32 = 32 MB at the
        # flagship band) overflows the default 16 MB scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v_main,
            bytes_accessed=(n // rb) * 2 * v_main * d + 2 * n * d,
            transcendentals=n * v_main,
        ),
    )(
        h, emb, bias.reshape(1, v),
    )
    return out[:, 0], out[:, 1]


@functools.partial(jax.jit, static_argnums=(4, 6))
def flash_ce_forward(h, emb, bias, labels, interpret=False, emb_cast=None,
                     save=False):
    """h (N, D) bf16/f32, emb (V, D), bias (V,), labels (N,) int32 ->
    (lse, label_logit, sum_logits), each (N,) f32.  N must be a multiple
    of the row band (wrapper pads); V may be ragged (the tail past the
    last full vocab chunk runs as a plain XLA GEMM and merges into the
    kernel's lse via logaddexp — same online-rescale math).

    ``emb_cast``: optional pre-cast (V, D) table in h.dtype (the training
    shadow, train/shadow.py) — skips the full-table astype here.  Either
    way the kernel reads the FULL table with its grid bounded to the last
    full chunk, so no (v_main, D) slice ever materializes (the slice
    profiled at 1.6 ms/step at the flagship shape).

    ``save=True`` additionally returns (logits_main (N, v_main) bf16,
    tail_logits (N, V - v_main) f32) for flash_ce_backward_save — the
    backward that never recomputes the logits GEMM."""
    n, d = h.shape
    v = emb.shape[0]
    rb, vc = _fwd_tiles(n, v)
    v_main = (v // vc) * vc
    bias_f = bias.astype(jnp.float32)
    w = emb_cast if emb_cast is not None else emb.astype(h.dtype)

    logits_main = None
    if v_main > 0:
        if save:
            lse, zsum, logits_main = _lse_main_save(
                h, w, bias_f, rb, vc, v_main, interpret
            )
        else:
            lse, zsum = _lse_main(h, w, bias_f, rb, vc, v_main, interpret)
    else:
        lse, zsum = None, jnp.zeros((n,), jnp.float32)
        if save:
            logits_main = jnp.zeros((n, 0), jnp.bfloat16)
    tail = None
    if v_main < v:
        # ragged tail: < vc columns, one cheap XLA GEMM (f32 MXU accum,
        # same numerics as the kernel's dot_general)
        tail = jnp.einsum(
            "nd,vd->nv", h, w[v_main:],
            preferred_element_type=jnp.float32,
        ) + bias_f[v_main:]
        mt = jnp.max(tail, axis=1)
        lse_tail = mt + jnp.log(
            jnp.sum(jnp.exp(tail - mt[:, None]), axis=1)
        )
        lse = lse_tail if lse is None else jnp.logaddexp(lse, lse_tail)
        zsum = zsum + jnp.sum(tail, axis=1)

    # label logit: gather the label's embedding row, rowwise f32 dot
    # (the products are the same bf16-rounded values the kernel's MXU saw)
    emb_rows = jnp.take(w, labels, axis=0)
    lbl = jnp.einsum(
        "nd,nd->n", h.astype(jnp.float32), emb_rows.astype(jnp.float32)
    ) + jnp.take(bias_f, labels)

    if save:
        if tail is None:
            tail = jnp.zeros((n, 0), jnp.float32)
        return lse, lbl, zsum, logits_main, tail
    return lse, lbl, zsum


def _fwd_tiles(n, v):
    rb = 2048 if n % 2048 == 0 else (1024 if n % 1024 == 0 else n)
    # biggest chunk the vocab can fill (2048 at the flagship 250054, where
    # the fwd kernel measured 23.9 ms/step vs 24.4 at 1024 and 26.4 at 512
    # against the 21.3 ms MXU floor); small test vocabs shrink vc so the
    # kernel path still runs (vc=128 floor keeps lane-full tiles)
    vc = 2048
    while vc > 128 and v < vc:
        vc //= 2
    return rb, vc


def _ce_gw_kernel(vocab, nr, vc, conf, low,
                  h_ref, w_ref, b_ref, y_ref, lse_ref, rs_ref,
                  gw_ref, gb_ref):
    r = pl.program_id(1)
    c = pl.program_id(0)
    rb = h_ref.shape[0]

    logits = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, vc), 1) + c * vc
    valid = col < vocab
    p = jnp.exp(jnp.where(valid, logits, NEG) - lse_ref[:])
    onehot = col == y_ref[:]
    target = low + (conf - low) * onehot.astype(jnp.float32)
    dl = jnp.where(valid, (p - target) * rs_ref[:], 0.0)    # (RB, VC) f32
    dlb = dl.astype(h_ref.dtype)

    part_w = jax.lax.dot_general(
        dlb, h_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (VC, D)
    part_b = jnp.sum(dl, axis=0, keepdims=True)             # (1, VC)

    @pl.when(r == 0)
    def _():
        gw_ref[:] = part_w
        gb_ref[:] = part_b

    @pl.when(r > 0)
    def _():
        gw_ref[:] += part_w
        gb_ref[:] += part_b


def _ce_gh_kernel(vocab, nc, vc, conf, low,
                  h_ref, w_ref, b_ref, y_ref, lse_ref, rs_ref, gh_ref):
    c = pl.program_id(1)
    rb = h_ref.shape[0]

    logits = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, vc), 1) + c * vc
    valid = col < vocab
    p = jnp.exp(jnp.where(valid, logits, NEG) - lse_ref[:])
    onehot = col == y_ref[:]
    target = low + (conf - low) * onehot.astype(jnp.float32)
    dl = jnp.where(valid, (p - target) * rs_ref[:], 0.0).astype(h_ref.dtype)

    # the vocab tail's W rows hold arbitrary OOB-pad bits; dl is 0 there
    # but 0 x NaN = NaN on the MXU, so zero the dead rows
    wrow = jax.lax.broadcasted_iota(jnp.int32, (vc, 1), 0) + c * vc
    wz = jnp.where(wrow < vocab, w_ref[:], 0).astype(h_ref.dtype)
    part = jax.lax.dot_general(
        dl, wz, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (RB, D)

    @pl.when(c == 0)
    def _():
        gh_ref[:] = part

    @pl.when(c > 0)
    def _():
        gh_ref[:] += part


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def flash_ce_backward(h, emb, bias, labels, lse, rowscale,
                      label_smoothing, out_dtype_name: str = "bfloat16",
                      interpret=False, emb_cast=None):
    """-> (dh (N, D) out_dtype, demb (V, D) f32, dbias (V,) f32).

    rowscale (N,) f32 = mask * g / denom, folded per row.  dl is cast to
    h.dtype before BOTH contractions, matching fused_ce's backward."""
    n, d = h.shape
    v = emb.shape[0]
    conf = 1.0 - label_smoothing
    low = label_smoothing / (v - 1)
    w = emb_cast if emb_cast is not None else emb.astype(h.dtype)
    b = bias.reshape(1, v).astype(jnp.float32)
    y = labels.reshape(n, 1).astype(jnp.int32)
    lse2 = lse.reshape(n, 1).astype(jnp.float32)
    rs2 = rowscale.reshape(n, 1).astype(jnp.float32)

    # grad_W: rows innermost -> the (VC, D) grad block is written ONCE
    rbw, vcw = _gw_tiles(n)
    ncw = -(-v // vcw)
    gw, gb = pl.pallas_call(
        functools.partial(_ce_gw_kernel, v, n // rbw, vcw, conf, low),
        grid=(ncw, n // rbw),
        in_specs=[
            pl.BlockSpec((rbw, d), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vcw, d), lambda c, r: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vcw), lambda c, r: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rbw, 1), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rbw, 1), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rbw, 1), lambda c, r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((vcw, d), lambda c, r: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vcw), lambda c, r: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, d), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * d * v,
            bytes_accessed=2 * v * d * 2 + (ncw) * 2 * n * d + 4 * v * d,
            transcendentals=n * v,
        ),
    )(h, w, b, y, lse2, rs2)

    # grad_h: vocab innermost -> the (RB, D) grad block is written ONCE
    rbh, vch = _gh_tiles(n)
    nch = -(-v // vch)
    gh = pl.pallas_call(
        functools.partial(_ce_gh_kernel, v, nch, vch, conf, low),
        grid=(n // rbh, nch),
        in_specs=[
            pl.BlockSpec((rbh, d), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vch, d), lambda r, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vch), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rbh, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rbh, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rbh, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rbh, d), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * d * v,
            bytes_accessed=(n // rbh) * 2 * v * d + 4 * n * d,
            transcendentals=n * v,
        ),
    )(h, w, b, y, lse2, rs2)

    return (
        gh.astype(jnp.dtype(out_dtype_name)),
        gw,
        gb.reshape(v),
    )


def _ce_gw_save_kernel(vc, conf, low,
                       lg_ref, h_ref, y_ref, lse_ref, rs_ref,
                       gw_ref, gb_ref):
    """grad_W from SAVED logits: no W stream, no logits recompute — the
    only MXU work is the dl^T @ h contraction itself (the demb GEMM's
    unavoidable 2*N*V*D FLOPs).  Grid covers full chunks only (the ragged
    tail is XLA in the wrapper), so no vocab-validity masking."""
    r = pl.program_id(1)
    c = pl.program_id(0)
    rb = h_ref.shape[0]

    logits = lg_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, vc), 1) + c * vc
    p = jnp.exp(logits - lse_ref[:])
    onehot = col == y_ref[:]
    target = low + (conf - low) * onehot.astype(jnp.float32)
    dl = (p - target) * rs_ref[:]                           # (RB, VC) f32
    dlb = dl.astype(h_ref.dtype)

    part_w = jax.lax.dot_general(
        dlb, h_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (VC, D)
    part_b = jnp.sum(dl, axis=0, keepdims=True)             # (1, VC)

    @pl.when(r == 0)
    def _():
        gw_ref[:] = part_w
        gb_ref[:] = part_b

    @pl.when(r > 0)
    def _():
        gw_ref[:] += part_w
        gb_ref[:] += part_b


def _ce_gh_save_kernel(vc, conf, low,
                       lg_ref, w_ref, y_ref, lse_ref, rs_ref, gh_ref):
    """grad_h from SAVED logits: streams W once per row band for the
    dl @ W contraction, never recomputes the logits tile."""
    c = pl.program_id(1)
    rb = gh_ref.shape[0]

    logits = lg_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, vc), 1) + c * vc
    p = jnp.exp(logits - lse_ref[:])
    onehot = col == y_ref[:]
    target = low + (conf - low) * onehot.astype(jnp.float32)
    dl = ((p - target) * rs_ref[:]).astype(w_ref.dtype)

    part = jax.lax.dot_general(
        dl, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # (RB, D)

    @pl.when(c == 0)
    def _():
        gh_ref[:] = part

    @pl.when(c > 0)
    def _():
        gh_ref[:] += part


def _save_tiles(n, v_main):
    """(rb_gw, vc_gw, rb_gh, vc_gh) — vc must divide v_main (which the
    forward built as a multiple of its own chunk, a power-of-two >= 128)."""
    rb_gw = 256 if n % 256 == 0 else n
    vc_gw = 1024
    while vc_gw > 128 and v_main % vc_gw:
        vc_gw //= 2
    rb_gh = 1024 if n % 1024 == 0 else n
    vc_gh = 512
    while vc_gh > 128 and v_main % vc_gh:
        vc_gh //= 2
    return rb_gw, vc_gw, rb_gh, vc_gh


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def flash_ce_backward_save(h, emb, bias, labels, lse, rowscale,
                           label_smoothing, out_dtype_name: str = "bfloat16",
                           interpret=False, emb_cast=None,
                           logits_main=None, tail_logits=None):
    """-> (dh (N, D) out_dtype, demb (V, D) f32, dbias (V,) f32), from the
    logits SAVED by flash_ce_forward(save=True).

    vs flash_ce_backward_dl this removes the whole 2*N*D*V logits-recompute
    GEMM (4.2 TFLOP = a 21.3 ms MXU floor at the flagship N=8192/V=250054)
    and replaces the bf16 dl round-trip with a bf16 logits round-trip of
    the same byte count — dl is formed in VMEM inside both contraction
    kernels.  Numerics: dl is computed from bf16-ROUNDED logits (the saved
    storage dtype) instead of the recomputed f32 tiles; each dl element
    carries ~2^-9 relative rounding noise from the exp, which averages out
    in the N- (demb) and V- (dh) length contractions (measured against the
    exact path in tests/test_flash_ce.py).  The ragged vocab tail runs in
    exact f32 XLA from the forward's saved tail logits."""
    n, d = h.shape
    v = emb.shape[0]
    v_main = logits_main.shape[1]
    conf = 1.0 - label_smoothing
    low = label_smoothing / (v - 1)
    w = emb_cast if emb_cast is not None else emb.astype(h.dtype)
    y = labels.reshape(n, 1).astype(jnp.int32)
    lse2 = lse.reshape(n, 1).astype(jnp.float32)
    rs2 = rowscale.reshape(n, 1).astype(jnp.float32)

    dh = jnp.zeros((n, d), jnp.float32)
    if v_main > 0:
        rbw, vcw, rbh, vch = _save_tiles(n, v_main)
        ncw = v_main // vcw
        gw, gb = pl.pallas_call(
            functools.partial(_ce_gw_save_kernel, vcw, conf, low),
            grid=(ncw, n // rbw),
            in_specs=[
                pl.BlockSpec((rbw, vcw), lambda c, r: (r, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbw, d), lambda c, r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbw, 1), lambda c, r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbw, 1), lambda c, r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbw, 1), lambda c, r: (r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((vcw, d), lambda c, r: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, vcw), lambda c, r: (0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((v_main, d), jnp.float32),
                jax.ShapeDtypeStruct((1, v_main), jnp.float32),
            ],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * d * v_main,
                bytes_accessed=2 * n * v_main
                + ncw * 2 * n * d + 4 * v_main * d,
                transcendentals=n * v_main,
            ),
        )(logits_main, h, y, lse2, rs2)

        nch = v_main // vch
        gh = pl.pallas_call(
            functools.partial(_ce_gh_save_kernel, vch, conf, low),
            grid=(n // rbh, nch),
            in_specs=[
                pl.BlockSpec((rbh, vch), lambda r, c: (r, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((vch, d), lambda r, c: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbh, 1), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbh, 1), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((rbh, 1), lambda r, c: (r, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rbh, d), lambda r, c: (r, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * n * d * v_main,
                bytes_accessed=2 * n * v_main
                + (n // rbh) * 2 * v_main * d + 4 * n * d,
                transcendentals=n * v_main,
            ),
        )(logits_main, w[:v_main], y, lse2, rs2)
        dh = gh
        gb = gb.reshape(v_main)
    else:
        gw = jnp.zeros((0, d), jnp.float32)
        gb = jnp.zeros((0,), jnp.float32)

    # ragged tail (< one vocab chunk): exact f32 XLA from the saved tail
    if v_main < v:
        vt = v - v_main
        col = jnp.arange(vt)[None, :] + v_main
        p_t = jnp.exp(tail_logits - lse.reshape(n, 1))
        onehot = col == y
        target = low + (conf - low) * onehot.astype(jnp.float32)
        dl_t = (p_t - target) * rs2                          # (N, VT) f32
        dlb_t = dl_t.astype(h.dtype)
        dh = dh + jnp.einsum(
            "nv,vd->nd", dlb_t, w[v_main:],
            preferred_element_type=jnp.float32,
        )
        gw_t = jnp.einsum("nv,nd->vd", dlb_t, h,
                          preferred_element_type=jnp.float32)
        gb_t = jnp.sum(dl_t, axis=0)
        gw = jnp.concatenate([gw, gw_t], axis=0)
        gb = jnp.concatenate([gb, gb_t], axis=0)

    return dh.astype(jnp.dtype(out_dtype_name)), gw, gb


def _ce_dl_kernel(vocab, vc, conf, low,
                  h_ref, w_ref, b_ref, y_ref, lse_ref, rs_ref,
                  dl_ref, gbp_ref):
    c = pl.program_id(1)
    rb = h_ref.shape[0]

    logits = jax.lax.dot_general(
        h_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, vc), 1) + c * vc
    valid = col < vocab
    p = jnp.exp(jnp.where(valid, logits, NEG) - lse_ref[:])
    onehot = col == y_ref[:]
    target = low + (conf - low) * onehot.astype(jnp.float32)
    dl = jnp.where(valid, (p - target) * rs_ref[:], 0.0)    # (RB, VC) f32
    dl_ref[:] = dl.astype(dl_ref.dtype)
    # exact f32 dbias partial, one per row band.  The block is padded to 8
    # sublanes (Mosaic's minimum); rows 1..7 are zeroed so the caller's
    # plain sum over axis 0 stays exact.
    part = jnp.sum(dl, axis=0, keepdims=True)               # (1, VC)
    rowz = jax.lax.broadcasted_iota(jnp.int32, (8, dl.shape[1]), 0) == 0
    gbp_ref[:] = jnp.where(rowz, part, 0.0)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def flash_ce_backward_dl(h, emb, bias, labels, lse, rowscale,
                         label_smoothing, out_dtype_name: str = "bfloat16",
                         interpret=False, emb_cast=None):
    """Backward via ONE logits recompute: the kernel materializes the row-
    scaled softmax gradient dl = (p - smoothed-target) * rowscale as bf16
    (plus exact f32 per-band dbias partials), and dh/demb are plain XLA
    GEMMs over dl.  vs the two-kernel backward (grad_w + grad_h), this
    skips one full logits GEMM recompute (4.2 TFLOP at N=8192) for a 2 GB
    bf16 dl round-trip; vs the XLA chunked backward it skips the f32
    logits materialization and its softmax/dbias re-reads (~12 GB f32
    traffic at N=8192).  Same math: dl is cast to h.dtype before both
    contractions exactly like ops/fused_ce.py's backward.  ``emb_cast``:
    optional pre-cast (V, D) table in h.dtype (the training shadow)."""
    n, d = h.shape
    v = emb.shape[0]
    conf = 1.0 - label_smoothing
    low = label_smoothing / (v - 1)
    w = emb_cast if emb_cast is not None else emb.astype(h.dtype)
    b = bias.reshape(1, v).astype(jnp.float32)
    y = labels.reshape(n, 1).astype(jnp.int32)
    lse2 = lse.reshape(n, 1).astype(jnp.float32)
    rs2 = rowscale.reshape(n, 1).astype(jnp.float32)

    rb, vc = _dl_tiles(n)
    nr = n // rb
    nc = -(-v // vc)
    dl, gbp = pl.pallas_call(
        functools.partial(_ce_dl_kernel, v, vc, conf, low),
        # rows OUTER: the h band stays resident across the vocab sweep; W is
        # re-streamed once per band (nr x 512 MB, hidden under the GEMM)
        grid=(nr, nc),
        in_specs=[
            pl.BlockSpec((rb, d), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((vc, d), lambda r, c: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vc), lambda r, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, vc), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, vc), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, v), h.dtype),
            jax.ShapeDtypeStruct((nr * 8, v), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v,
            bytes_accessed=nr * 2 * v * d + 2 * n * d + 2 * n * v,
            transcendentals=n * v,
        ),
    )(h, w, b, y, lse2, rs2)

    dh = jnp.einsum("nv,vd->nd", dl, w,
                    preferred_element_type=jnp.float32)
    demb = jnp.einsum("nv,nd->vd", dl, h,
                      preferred_element_type=jnp.float32)
    return (
        dh.astype(jnp.dtype(out_dtype_name)),
        demb,
        jnp.sum(gbp, axis=0),
    )


def _dl_tiles(n):
    # one row band resident across the vocab sweep; VC=512 keeps the dl out
    # block + f32 temporaries inside the 16 MB scoped-VMEM budget
    rb = 1024 if n % 1024 == 0 else n
    return rb, 512


def _gw_tiles(n):
    # small row band: h is re-fetched once per (vocab chunk, band) — traffic
    # scales with the CHUNK COUNT only (4.1 GB at VC=1024/N=8192), while the
    # band size sets the VMEM footprint (RB=512 put the kernel 3.3 MB over
    # the 16 MB scoped limit)
    rb = 256 if n % 256 == 0 else n
    # the (VC, D) f32 grad block is double-buffered by Pallas across vocab
    # transitions: VC=1024 was 8 MB of output buffering alone (17.4 MB total)
    return rb, 512


def _gh_tiles(n):
    # large row band: W is re-fetched once per band (4.1 GB at RB=1024 /
    # N=8192); the vocab chunk sets the VMEM footprint
    rb = 1024 if n % 1024 == 0 else n
    return rb, 256
