"""Multi-head attention as pure functions (projections + core attention).

Numerics match mBART/CLIP: the query is scaled by head_dim**-0.5 *before* the
score matmul, projections carry biases, softmax runs in float32
(mic_tpu/ops/attention.py).  Reference behavior being reproduced:
models/flax_clip_vision_mbart/modeling_clip_vision_mbart.py:92 (decoder
self/cross attention via HF FlaxMBartAttention) — rebuilt functionally.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mic_tpu.nn.layers import Params, dense, init_dense, merge_heads, split_heads
from mic_tpu.ops.attention import dot_product_attention


def init_mha(key, d_model: int, num_heads: int, std: float = 0.02) -> Params:
    del num_heads  # head count is an apply-time argument; params are fused
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": init_dense(kq, d_model, d_model, std),
        "k": init_dense(kk, d_model, d_model, std),
        "v": init_dense(kv, d_model, d_model, std),
        "o": init_dense(ko, d_model, d_model, std),
    }


def project_kv(params: Params, kv_states: jnp.ndarray, num_heads: int, dtype=None):
    """K/V projections alone — used to pre-compute cross-attention caches."""
    k = split_heads(dense(params["k"], kv_states, dtype), num_heads)
    v = split_heads(dense(params["v"], kv_states, dtype), num_heads)
    return k, v


def mha(
    params: Params,
    x: jnp.ndarray,
    kv_states: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
    impl: str = "xla",
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_weights: bool = False,
):
    """Full-sequence attention: self-attention when kv_states is x.
    With return_weights, returns (out, post-softmax weights (B,H,Tq,Tk))."""
    head_dim = x.shape[-1] // num_heads
    q = split_heads(dense(params["q"], x) * (head_dim**-0.5), num_heads)
    k, v = project_kv(params, kv_states, num_heads, x.dtype)
    out = dot_product_attention(
        q, k, v, mask=mask, impl=impl,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
        return_weights=return_weights,
    )
    if return_weights:
        out, weights = out
        return dense(params["o"], merge_heads(out)), weights
    return dense(params["o"], merge_heads(out))


def mha_with_kv(
    params: Params,
    x: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
) -> jnp.ndarray:
    """Attention against pre-projected K/V (cached cross-attention)."""
    head_dim = x.shape[-1] // num_heads
    q = split_heads(dense(params["q"], x) * (head_dim**-0.5), num_heads)
    out = dot_product_attention(q, k, v, mask=mask)
    return dense(params["o"], merge_heads(out))


def mha_cross_grouped(
    params: Params,
    x: jnp.ndarray,          # (B*beams, 1, D) current-step hidden states
    k: jnp.ndarray,          # (B, S, H, Dh) — ONE copy per image, not per
    v: jnp.ndarray,          # beam — or head-dims-MERGED (B, S, H*Dh)
    mask: Optional[jnp.ndarray],  # (B, 1, 1, S) or None
    num_heads: int,
    beams: int,
    kernel: bool = False,    # force the fused Pallas path (mask=None only)
    enc_len: Optional[int] = None,  # live encoder length (merged padded K/V)
) -> jnp.ndarray:
    """Beam-grouped cached cross-attention: all of an image's beams share the
    same encoder K/V, so the cache stores them once per image and the beams
    ride the query axis.  Cuts cross-KV HBM reads by the beam factor per step
    (~1 GB/step at the flagship beam-4 config).

    MERGED (B, S_pad, H*Dh) K/V (8-aligned-padded, zeros past ``enc_len``)
    route through the manual-DMA fused kernel (ops/cross_attention.py
    fused_cross_attention_dma): the canonical 4-dim layout lane-pads
    (16, 64) -> (16, 128) in HBM, so the XLA chain physically reads 2x its
    logical cross-cache bytes per step (104 vs 52 MB/layer at B=256,
    profiled); the kernel reads the merged layout unpadded with the v3
    lazy-attention kernel's double-buffered DMA structure.  Storage choice
    is made once per generate (captioner.py); the merged layout implies the
    kernel."""
    bk, one, d = x.shape
    head_dim = d // num_heads
    b = k.shape[0]
    q = dense(params["q"], x) * (head_dim**-0.5)
    if k.ndim == 3 and mask is None:
        from mic_tpu.ops.cross_attention import fused_cross_attention_dma

        out = fused_cross_attention_dma(
            q.reshape(b, (bk // b) * one, d), k, v,
            enc_len if enc_len is not None else k.shape[1],
            (bk // b) * one, num_heads,
            interpret=jax.default_backend() != "tpu",
        )
        return dense(params["o"], out.reshape(bk, one, d))
    if kernel and mask is None:
        from mic_tpu.ops.cross_attention import fused_cross_attention

        out = fused_cross_attention(
            q.reshape(b, (bk // b) * one, d), k, v, (bk // b) * one, num_heads,
            interpret=jax.default_backend() != "tpu",
        )
        return dense(params["o"], out.reshape(bk, one, d))
    if k.ndim == 3:  # merged storage without the kernel (masked fallback)
        k = k.reshape(b, -1, num_heads, head_dim)
        v = v.reshape(b, -1, num_heads, head_dim)
    q = q.reshape(b, (bk // b) * one, num_heads, head_dim)      # (B, K, H, Dh)
    scores = jnp.einsum(
        "bkhd,bshd->bhks", q, k, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum(
        "bhks,bshd->bkhd", weights, v, preferred_element_type=x.dtype
    )
    out = out.reshape(bk, one, d)
    return dense(params["o"], out)


def mha_decode_step(
    params: Params,
    x: jnp.ndarray,          # (B, 1, D) current-step hidden states
    cache_k: jnp.ndarray,    # (B, max_len, H, Dh)
    cache_v: jnp.ndarray,
    index: jnp.ndarray,      # scalar int32: tokens already in cache
    num_heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-token cached self-attention. Returns (out, new_k, new_v)."""
    head_dim = x.shape[-1] // num_heads
    q = split_heads(dense(params["q"], x) * (head_dim**-0.5), num_heads)
    k_step, v_step = project_kv(params, x, num_heads)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k_step, (0, index, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v_step, (0, index, 0, 0))
    # attend only to the index+1 filled positions
    max_len = cache_k.shape[1]
    valid = jnp.arange(max_len) <= index                      # (max_len,)
    mask = valid[None, None, None, :]                         # (1, 1, 1, max_len)
    out = dot_product_attention(q, cache_k, cache_v, mask=mask)
    return dense(params["o"], merge_heads(out)), cache_k, cache_v


def mha_decode_step_lazy(
    params: Params,
    x: jnp.ndarray,          # (B*K, 1, D) current-step hidden states
    cache_k: jnp.ndarray,    # (B*K, max_len, H, Dh) — rows never reordered
    cache_v: jnp.ndarray,
    ancestry: jnp.ndarray,   # (B, K, max_len) int32 within-group source slots
    index: jnp.ndarray,      # scalar int32: position being written
    num_heads: int,
    beams: int,
    buckets: tuple = (),     # static read-prefix lengths; () = full window
    amask: Optional[jnp.ndarray] = None,  # (B, K*T, K) int8: use fused kernel
    dma: bool = False,       # with amask: v2 DMA pass-through kernel
    ln: Optional[tuple] = None,  # (ln_params, eps): x is PRE-norm; fuse the
                                 # LN into the qkv GEMM (ops/ln_gemm.py)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cached beam self-attention without physical cache reordering.

    The K/V written at position t live in whatever row wrote them; a beam's
    true history is ``cache[b, ancestry[b, k, t], t]``.  Rather than gathering,
    attention scores are computed against ALL ``beams`` source rows (a tiny
    K× FLOP overhead on the 1-token query) and the ancestry becomes part of
    the mask: entry (k, j, t) survives iff ancestry[b, k, t] == j and
    t <= index.  Softmax over the joint (j, t) axis then equals the softmax
    the physically-reordered cache would produce.  HBM cost per step: read
    K+V once (like any attention) and write ONE column — no permute pass.

    Returns (out (B*K, 1, D), cache_k, cache_v) with the new column written
    (callers keep the update in place: the caches are loop-carried buffers).
    """
    bk, one, d = x.shape
    head_dim = d // num_heads
    b = bk // beams
    if ln is not None:
        from mic_tpu.ops import ln_gemm as _lg

        fusable = (
            "qkv" in params
            and "kernel" in params["qkv"]
            and params["qkv"]["kernel"].ndim == 2
            and _lg.supports(x.reshape(bk, d), params["qkv"]["kernel"])
        )
        if not fusable:
            from mic_tpu.nn.layers import layer_norm

            x = layer_norm(ln[0], x, ln[1])
            ln = None
    if ln is not None:
        # MIC_TPU_EXPERIMENTAL=ln_qkv: LN folded into the qkv GEMM's
        # prologue (one x read, no normalized-activation round-trip)
        qkv = _lg.ln_gemm(
            x.reshape(bk, d), ln[0]["scale"], ln[0]["bias"],
            params["qkv"]["kernel"], params["qkv"]["bias"], ln[1],
            jax.default_backend() != "tpu",
        ).reshape(bk, one, 3 * d)
        q, k_flat, v_flat = jnp.split(qkv, 3, axis=-1)
        q = q * (head_dim**-0.5)
        k_step = split_heads(k_flat, num_heads)
        v_step = split_heads(v_flat, num_heads)
    elif "qkv" in params:
        # fused projection (models/mbart_decoder.py fuse_qkv_params): ONE
        # (rows, D) x (D, 3D) GEMM instead of three — bit-identical columns
        qkv = dense(params["qkv"], x)                           # (BK, 1, 3D)
        q, k_flat, v_flat = jnp.split(qkv, 3, axis=-1)
        q = q * (head_dim**-0.5)
        k_step = split_heads(k_flat, num_heads)                 # (BK, 1, H, Dh)
        v_step = split_heads(v_flat, num_heads)
    else:
        q = dense(params["q"], x) * (head_dim**-0.5)
        k_step, v_step = project_kv(params, x, num_heads)       # (BK, 1, H, Dh)
    q = q.reshape(b, beams * one, num_heads, head_dim)          # (B, K, H, Dh)
    quant = isinstance(cache_k, dict)

    if amask is not None:
        # Fused Pallas decode attention (ops/lazy_attention.py): the whole
        # score/mask/softmax/weight pipeline stays in VMEM.  The kernel reads
        # the PRE-update cache (the current step's K/V go in as small extra
        # inputs); the column write happens after.  Two variants:
        #   MIC_TPU_FUSED_LAZY_ATTN=2 — the DMA pass-through kernel: the
        #     caches flow THROUGH the kernel (ANY-space, aliased, untouched)
        #     so the write below consumes the kernel OUTPUT and XLA aliases
        #     it in place.  The only copy-free structure found (see
        #     PERFORMANCE.md); enables in-kernel int8-KV streaming.
        #   MIC_TPU_FUSED_LAZY_ATTN=1 — the blocked kernel: faster kernel,
        #     but XLA materializes the carried cache (+1.37 ms/step) because
        #     a custom call reads it in the same iteration as the write.
        # `amask` is the per-STEP ancestry+liveness mask with STRICT t<index
        # liveness (layer-invariant, built once in _decoder_step_lazy).
        from mic_tpu.ops import lazy_attention as la

        if dma:
            # v3 kernel: the cache column write happens IN-KERNEL (aliased
            # pass-through planes + one small strided DMA per plane) — the
            # returned caches are already post-update, so no
            # dynamic_update_slice may run here (it was profiled as a full
            # cache read-modify-write, ~3 ms/step at B=256)
            out, cache_k, cache_v = la.fused_lazy_attention_dma(
                q.reshape(b, beams, d), cache_k, cache_v,
                k_step.reshape(b, beams, d), v_step.reshape(b, beams, d),
                amask, index, beams, num_heads,
            )
            return (
                dense(params["o"], out.reshape(bk, one, d)),
                cache_k, cache_v,
            )
        else:
            out = la.fused_lazy_attention(
                q.reshape(b, beams, d), cache_k, cache_v,
                k_step.reshape(b, beams, d), v_step.reshape(b, beams, d),
                amask, beams, num_heads,
            )
        if quant:
            from mic_tpu.ops.quant import quantize_rows_dynamic

            if cache_k["q"].ndim == 3:
                # merged int8 (B*K, T, HD) + per-ROW (B*K, T) scales
                kq8, ks = quantize_rows_dynamic(k_step.reshape(bk, 1, d))
                vq8, vs = quantize_rows_dynamic(v_step.reshape(bk, 1, d))
                cache_k = {
                    "q": jax.lax.dynamic_update_slice(
                        cache_k["q"], kq8, (0, index, 0)
                    ),
                    "s": jax.lax.dynamic_update_slice(
                        cache_k["s"], ks.reshape(bk, 1), (0, index)
                    ),
                }
                cache_v = {
                    "q": jax.lax.dynamic_update_slice(
                        cache_v["q"], vq8, (0, index, 0)
                    ),
                    "s": jax.lax.dynamic_update_slice(
                        cache_v["s"], vs.reshape(bk, 1), (0, index)
                    ),
                }
            else:
                kq8, ks = quantize_rows_dynamic(k_step)
                vq8, vs = quantize_rows_dynamic(v_step)
                cache_k = {
                    "q": jax.lax.dynamic_update_slice(
                        cache_k["q"], kq8, (0, index, 0, 0)
                    ),
                    "s": jax.lax.dynamic_update_slice(
                        cache_k["s"], ks[..., 0], (0, index, 0)
                    ),
                }
                cache_v = {
                    "q": jax.lax.dynamic_update_slice(
                        cache_v["q"], vq8, (0, index, 0, 0)
                    ),
                    "s": jax.lax.dynamic_update_slice(
                        cache_v["s"], vs[..., 0], (0, index, 0)
                    ),
                }
        elif cache_k.ndim == 3:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_step.reshape(bk, 1, d), (0, index, 0)
            )
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_step.reshape(bk, 1, d), (0, index, 0)
            )
        else:
            cache_k = jax.lax.dynamic_update_slice(
                cache_k, k_step, (0, index, 0, 0)
            )
            cache_v = jax.lax.dynamic_update_slice(
                cache_v, v_step, (0, index, 0, 0)
            )
        return dense(params["o"], out.reshape(bk, one, d)), cache_k, cache_v

    if quant:
        # int8 KV cache: per-(row, position, head) scales (4-dim) or per-row
        # scales (merged); halves the decode loop's dominant HBM stream (the
        # cache read). The int8->compute convert fuses into the einsum
        # operand loads; scales multiply the SMALL scores/weights tensors,
        # never a cache-sized one.
        from mic_tpu.ops.quant import quantize_rows_dynamic

        if cache_k["q"].ndim == 3:  # merged int8 (B*K, T, HD) + (B*K, T)
            kq8, ks = quantize_rows_dynamic(k_step.reshape(bk, 1, d))
            vq8, vs = quantize_rows_dynamic(v_step.reshape(bk, 1, d))
            cache_k = {
                "q": jax.lax.dynamic_update_slice(
                    cache_k["q"], kq8, (0, index, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    cache_k["s"], ks.reshape(bk, 1), (0, index)
                ),
            }
            cache_v = {
                "q": jax.lax.dynamic_update_slice(
                    cache_v["q"], vq8, (0, index, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    cache_v["s"], vs.reshape(bk, 1), (0, index)
                ),
            }
        else:
            kq8, ks = quantize_rows_dynamic(k_step)         # (BK,1,H,Dh),(BK,1,H,1)
            vq8, vs = quantize_rows_dynamic(v_step)
            cache_k = {
                "q": jax.lax.dynamic_update_slice(
                    cache_k["q"], kq8, (0, index, 0, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    cache_k["s"], ks[..., 0], (0, index, 0)
                ),
            }
            cache_v = {
                "q": jax.lax.dynamic_update_slice(
                    cache_v["q"], vq8, (0, index, 0, 0)
                ),
                "s": jax.lax.dynamic_update_slice(
                    cache_v["s"], vs[..., 0], (0, index, 0)
                ),
            }
        t = cache_k["q"].shape[1]
    elif cache_k.ndim == 3:
        # merged (B*K, T, H*Dh) storage (fused-kernel mode): padding-free on
        # TPU and a pure bitcast into the kernel's (B, K*T, HD) view
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_step.reshape(bk, 1, d), (0, index, 0)
        )
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_step.reshape(bk, 1, d), (0, index, 0)
        )
        t = cache_k.shape[1]
    else:
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_step, (0, index, 0, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_step, (0, index, 0, 0))
        t = cache_k.shape[1]

    def attend(tb: int) -> jnp.ndarray:
        """Attention over the first tb cache positions (static prefix).
        Masked positions contribute exp(NEG)==0 to the softmax sum, so every
        bucket computes bit-identical results — shorter ones just stream
        fewer cache bytes."""
        if quant:
            kg = cache_k["q"][:, :tb].reshape(b, beams, tb, num_heads, head_dim)
            vg = cache_v["q"][:, :tb].reshape(b, beams, tb, num_heads, head_dim)
            if cache_k["s"].ndim == 2:
                # per-ROW (B*K, T) scales (merged-int8 format):
                # (B, J, tb) -> (B, 1, 1, J, tb), broadcast over H and K
                ksc = cache_k["s"][:, :tb].reshape(b, beams, tb)
                ksc = ksc[:, None, None]
                vsc = cache_v["s"][:, :tb].reshape(b, beams, tb)
                vsc = vsc[:, None, None]
            else:
                # (B, J, tb, H) -> (B, H, 1, J, tb) to scale scores/weights
                ksc = cache_k["s"][:, :tb].reshape(b, beams, tb, num_heads)
                ksc = ksc.transpose(0, 3, 1, 2)[:, :, None]
                vsc = cache_v["s"][:, :tb].reshape(b, beams, tb, num_heads)
                vsc = vsc.transpose(0, 3, 1, 2)[:, :, None]
        else:
            kg = cache_k[:, :tb].reshape(b, beams, tb, num_heads, head_dim)
            vg = cache_v[:, :tb].reshape(b, beams, tb, num_heads, head_dim)
        scores = jnp.einsum(
            "bkhd,bjthd->bhkjt", q, kg.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )                                                       # (B, H, K, J, tb)
        if quant:
            scores = scores * ksc
        live = jnp.arange(tb) <= index                          # (tb,)
        sel = ancestry[:, :, :tb, None] == jnp.arange(beams, dtype=jnp.int32)
        mask = (sel & live[None, None, :, None]).transpose(0, 1, 3, 2)
        scores = jnp.where(mask[:, None], scores, jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(
            scores.reshape(b, num_heads, beams, beams * tb), axis=-1
        )
        w = w.reshape(b, num_heads, beams, beams, tb)
        if quant:
            w = w * vsc
        w = w.astype(x.dtype)
        return jnp.einsum(
            "bhkjt,bjthd->bkhd", w, vg.astype(x.dtype),
            preferred_element_type=x.dtype,
        )

    if buckets:
        # read-only prefix buckets: pick the shortest static prefix covering
        # index+1 live positions with a lax.switch. Only the (B,K,H,Dh)
        # attention OUTPUT crosses the switch boundary — the cache buffers do
        # not, so the while-loop carry aliasing that sank the physical-cache
        # bucketed permute (beam_permute_matmul_prefix) cannot trigger here.
        bs = tuple(sorted(min(tb, t) for tb in buckets))
        if bs[-1] != t:
            bs = bs + (t,)
        idx = jnp.sum(jnp.asarray(bs[:-1], jnp.int32) < index + 1)
        out = jax.lax.switch(idx, [lambda tb=tb: attend(tb) for tb in bs])
    else:
        out = attend(t)
    return dense(params["o"], out.reshape(bk, one, d)), cache_k, cache_v


def mha_decode_step_split(
    params: Params,
    x: jnp.ndarray,          # (B, 1, D) current-step hidden states
    cache_k: jnp.ndarray,    # (B, max_len, H, Dh) — WITHOUT the current token
    cache_v: jnp.ndarray,
    index: jnp.ndarray,      # scalar int32: position of the current token
    num_heads: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cached self-attention that never writes the full cache back.

    The current token's K/V are kept OUT of the cache and folded into the
    softmax with a second tiny dot (joint normalization), so a decode step's
    layer scan emits only the (B, 1, H, Dh) new column as its output — the
    caller writes all layers' columns with one small dynamic_update_slice
    instead of streaming the whole cache through the scan ys (profiled
    ~1.2 ms/step of pure copy at the flagship config).

    Returns (attn_out, k_step, v_step)."""
    head_dim = x.shape[-1] // num_heads
    q = split_heads(dense(params["q"], x) * (head_dim**-0.5), num_heads)
    k_step, v_step = project_kv(params, x, num_heads)

    s_cache = jnp.einsum(
        "bqhd,bkhd->bhqk", q, cache_k, preferred_element_type=jnp.float32
    )                                                       # (B, H, 1, T)
    valid = (jnp.arange(cache_k.shape[1]) < index)[None, None, None, :]
    s_cache = jnp.where(valid, s_cache, jnp.finfo(jnp.float32).min)
    s_step = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k_step, preferred_element_type=jnp.float32
    )                                                       # (B, H, 1, 1)

    m = jnp.maximum(jnp.max(s_cache, axis=-1, keepdims=True), s_step)
    w_cache = jnp.exp(s_cache - m)
    w_step = jnp.exp(s_step - m)
    denom = jnp.sum(w_cache, axis=-1, keepdims=True) + w_step
    w_cache = (w_cache / denom).astype(x.dtype)
    w_step = (w_step / denom).astype(x.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", w_cache, cache_v, preferred_element_type=x.dtype
    ) + w_step.transpose(0, 2, 1, 3) * v_step
    return dense(params["o"], merge_heads(out)), k_step, v_step
