"""Chunked label-smoothed cross-entropy fused with the tied LM head.

The trainer's memory hog is the logits tensor: (B, T, 250054) is ~2 GB in bf16
at the reference's batch (plus the f32 softmax and its backward).  This op
computes the SAME loss as lm_logits + label_smoothed_cross_entropy without
ever materializing the full logits:

- forward: `lax.scan` over token chunks; each chunk's logits (C, V) are
  produced, reduced to (lse, label_logit, sum_logits) and discarded;
- backward (custom_vjp): per chunk, logits are recomputed, the softmax-minus-
  smoothed-target gradient is formed and immediately contracted into
  d_hidden / d_embedding / d_bias accumulators.

Peak residency drops from O(B*T*V) to O(C*V) at identical gradients
(tests/test_fused_ce.py pins both loss and grads to the unfused path).

Chunk-size economics (round 3, measured on v5e at batch 64 x seq 64,
N = 4096 rows): every chunk iteration re-reads the whole 512 MB bf16
embedding AND read-modify-writes the 1 GB f32 embedding-gradient
accumulator — ~4.5 GB of HBM traffic per chunk, so SMALL chunks are
catastrophically slow (chunk 256 = 16 iterations = ~72 GB/step: the
backward loop alone profiled 104 ms/step).  chunk >= N collapses the scan
to one iteration: 221 -> 327 samples/s/chip.  Keep the chunk as large as
the (C, V) f32 logits transient fits — ~2 GB per 2048 rows; the chunk is
clamped to the row count so small callers never pad up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mic_tpu.core.knobs import override


def _resolve_mode(mode: str) -> str:
    """Resolve the flash-CE routing (TrainConfig.flash_ce; env override
    MIC_TPU_FLASH_CE wins when set — core/knobs.py) to the internal tag:
    "" = XLA chunked path, "fwd" = flash forward + XLA backward,
    "1" = flash forward and two-kernel backward, "dl" = flash forward +
    dl-materializing backward (one logits recompute; dh/demb as XLA GEMMs
    over the bf16 dl tensor), "save" = logits-saving forward + a backward
    with ZERO logits recomputes (the dh/demb contraction kernels form dl
    in VMEM from the saved bf16 logits).  The two-kernel backward measured
    slower than XLA's (341.4 vs 357.8 samples/s/chip) — its grad_W/grad_h
    split recomputes the logits GEMM twice (PERFORMANCE.md)."""
    raw = override("MIC_TPU_FLASH_CE")
    if raw is not None:
        mode = raw
    if mode in ("", "0", "off"):
        return ""
    if mode == "auto":
        return "dl" if jax.default_backend() == "tpu" else ""
    return "1" if mode == "split" else mode


def _chunk(x: jnp.ndarray, size: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % size
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x.reshape(-1, size, *x.shape[1:])


def _logits_chunk(h, emb, bias):
    # (C, D) x (V, D)^T + (V,) -> (C, V) in f32
    logits = jnp.einsum(
        "cd,vd->cv", h, emb, preferred_element_type=jnp.float32
    )
    return logits + bias.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 8, 9))
def fused_lm_loss(
    hidden: jnp.ndarray,    # (B, T, D) decoder output, compute dtype
    embedding: jnp.ndarray, # (V, D) shared table (tied LM head)
    bias: jnp.ndarray,      # (V,) final_logits_bias
    labels: jnp.ndarray,    # (B, T)
    mask: jnp.ndarray,      # (B, T)
    label_smoothing: float = 0.0,
    chunk: int = 512,
    emb_cast: jnp.ndarray | None = None,  # optional pre-cast (V, D) table
    # in hidden.dtype (the training shadow, train/shadow.py): the flash
    # kernels read it instead of casting `embedding`, while the f32
    # `embedding` keeps receiving the exact f32 demb cotangent (its value
    # is never read in that case — XLA dead-code-eliminates the operand)
    mode: str = "auto",     # flash-CE routing (TrainConfig.flash_ce)
    dl_max_rows: int = 8192,  # TrainConfig.dl_max_rows
) -> jnp.ndarray:
    loss, _, _, _ = _fwd_impl(
        hidden, embedding, bias, labels, mask, label_smoothing, chunk,
        emb_cast, mode, dl_max_rows,
    )
    return loss


def _normalizing(label_smoothing, vocab):
    if label_smoothing <= 0.0:
        return 0.0
    confidence = 1.0 - label_smoothing
    low = label_smoothing / (vocab - 1)
    return -(
        confidence * jnp.log(confidence)
        + (vocab - 1) * low * jnp.log(low + 1e-20)
    )


def _fwd_impl(hidden, embedding, bias, labels, mask, label_smoothing, chunk,
              emb_cast=None, mode="auto", dl_max_rows=8192):
    b, t, d = hidden.shape
    vocab = embedding.shape[0]
    flash = _resolve_mode(mode)
    n = b * t
    # both the saved-logits buffer and the dl backward's bf16 (N, V)
    # tensor scale with the row count; above the cap fall back to modes
    # that never materialize an (N, V) plane
    max_rows = int(override("MIC_TPU_DL_MAX_ROWS", str(dl_max_rows)))
    if flash == "save" and n > max_rows:
        flash = "dl"

    if flash:
        from mic_tpu.ops.flash_ce import flash_ce_forward

        saved = None
        interp = jax.default_backend() != "tpu"  # interpret off-TPU (tests)
        if flash == "save":
            lse, lbl, zsum, logits_main, tail = flash_ce_forward(
                hidden.reshape(n, d), embedding, bias, labels.reshape(n),
                interp, emb_cast, True,
            )
            saved = (logits_main, tail)
        else:
            lse, lbl, zsum = flash_ce_forward(
                hidden.reshape(n, d), embedding, bias, labels.reshape(n),
                interp, emb_cast,
            )
        if label_smoothing > 0.0:
            confidence = 1.0 - label_smoothing
            low = label_smoothing / (vocab - 1)
            expected = confidence * lbl + low * (zsum - lbl)
        else:
            expected = lbl
        m2 = mask.reshape(n).astype(jnp.float32)
        loss_sum = jnp.sum((lse - expected) * m2)
        denom = jnp.sum(m2)
        loss = loss_sum / denom - _normalizing(label_smoothing, vocab)
        return (
            loss, denom,
            (lse if flash in ("1", "dl", "save") else None), saved,
        )

    chunk = min(chunk, b * t)
    h = _chunk(hidden.reshape(b * t, d), chunk)
    y = _chunk(labels.reshape(b * t), chunk)
    m = _chunk(mask.reshape(b * t).astype(jnp.float32), chunk)

    confidence = 1.0 - label_smoothing
    low = label_smoothing / (vocab - 1)

    def body(acc, xs):
        h_c, y_c, m_c = xs
        logits = _logits_chunk(h_c, embedding, bias)
        mx = jnp.max(logits, axis=-1)
        lse = mx + jnp.log(jnp.sum(jnp.exp(logits - mx[:, None]), axis=-1))
        label_logit = jnp.take_along_axis(logits, y_c[:, None], axis=-1)[:, 0]
        if label_smoothing > 0.0:
            sum_logits = jnp.sum(logits, axis=-1)
            expected = confidence * label_logit + low * (sum_logits - label_logit)
        else:
            expected = label_logit
        loss_c = (lse - expected) * m_c
        return (acc[0] + jnp.sum(loss_c), acc[1] + jnp.sum(m_c)), None

    (loss_sum, denom), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)), (h, y, m)
    )
    return (
        loss_sum / denom - _normalizing(label_smoothing, vocab), denom,
        None, None,
    )


def _fused_fwd(hidden, embedding, bias, labels, mask, label_smoothing, chunk,
               emb_cast=None, mode="auto", dl_max_rows=8192):
    loss, denom, lse, saved = _fwd_impl(
        hidden, embedding, bias, labels, mask, label_smoothing, chunk,
        emb_cast, mode, dl_max_rows,
    )
    return loss, (hidden, embedding, bias, labels, mask, denom, lse,
                  emb_cast, saved)


def _fused_bwd(label_smoothing, chunk, mode, dl_max_rows, res, g):
    (hidden, embedding, bias, labels, mask, denom, lse, emb_cast,
     saved) = res
    b, t, d = hidden.shape
    vocab = embedding.shape[0]

    if lse is not None:
        from mic_tpu.ops.flash_ce import (
            flash_ce_backward, flash_ce_backward_dl, flash_ce_backward_save,
        )

        n = b * t
        flash = _resolve_mode(mode)
        rowscale = mask.reshape(n).astype(jnp.float32) * (g / denom)
        interp = jax.default_backend() != "tpu"
        if saved is not None:
            # logits were saved by the forward: zero-recompute backward
            dh, demb, dbias = flash_ce_backward_save(
                hidden.reshape(n, d), embedding, bias, labels.reshape(n),
                lse, rowscale, label_smoothing, str(hidden.dtype),
                interp, emb_cast, saved[0], saved[1],
            )
            return (
                dh.reshape(b, t, d),
                demb.astype(embedding.dtype),
                dbias.astype(bias.dtype),
                None,
                None,
                _zero_ct(emb_cast),
            )
        # the dl backward materializes a bf16 (N, V) gradient tensor; above
        # ~8k rows at mBART's vocab that transient alone is >4 GB, so huge
        # batches fall back to the XLA chunked backward (which ignores lse)
        max_dl_rows = int(override("MIC_TPU_DL_MAX_ROWS", str(dl_max_rows)))
        if flash in ("dl", "save") and n > max_dl_rows:
            pass  # fall through to the XLA chunked backward below
        else:
            bwd = (flash_ce_backward_dl if flash in ("dl", "save")
                   else flash_ce_backward)
            dh, demb, dbias = bwd(
                hidden.reshape(n, d), embedding, bias, labels.reshape(n),
                lse, rowscale, label_smoothing, str(hidden.dtype),
                interp, emb_cast,
            )
            return (
                dh.reshape(b, t, d),
                demb.astype(embedding.dtype),
                dbias.astype(bias.dtype),
                None,
                None,
                _zero_ct(emb_cast),
            )

    chunk = min(chunk, b * t)
    h = _chunk(hidden.reshape(b * t, d), chunk)
    y = _chunk(labels.reshape(b * t), chunk)
    m = _chunk(mask.reshape(b * t).astype(jnp.float32), chunk)

    confidence = 1.0 - label_smoothing
    low = label_smoothing / (vocab - 1)
    scale = g / denom

    def body(acc, xs):
        demb, dbias = acc
        h_c, y_c, m_c = xs
        logits = _logits_chunk(h_c, embedding, bias)
        p = jax.nn.softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(y_c, vocab, dtype=jnp.float32)
        target = low + (confidence - low) * onehot
        dlogits = (p - target) * (m_c * scale)[:, None]        # (C, V) f32
        dl = dlogits.astype(hidden.dtype)
        dh_c = jnp.einsum("cv,vd->cd", dl, embedding,
                          preferred_element_type=jnp.float32).astype(hidden.dtype)
        demb = demb + jnp.einsum("cv,cd->vd", dl, h_c,
                                 preferred_element_type=jnp.float32)
        dbias = dbias + jnp.sum(dlogits, axis=0)
        return (demb, dbias), dh_c

    init = (
        jnp.zeros((vocab, d), jnp.float32),
        jnp.zeros((vocab,), jnp.float32),
    )
    (demb, dbias), dh = jax.lax.scan(body, init, (h, y, m))
    dh = dh.reshape(-1, d)[: b * t].reshape(b, t, d)
    return (
        dh,
        demb.astype(embedding.dtype),
        dbias.astype(bias.dtype),
        None,
        None,
        _zero_ct(emb_cast),
    )


def _zero_ct(x):
    # the shadow embedding is state, never differentiated: this zero flows
    # to a closure constant and XLA dead-code-eliminates it
    return None if x is None else jnp.zeros_like(x)


fused_lm_loss.defvjp(_fused_fwd, _fused_bwd)
