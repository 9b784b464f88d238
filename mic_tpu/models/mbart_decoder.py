"""mBART-style pre-norm transformer decoder with cross-attention, TPU-first.

Behavioral spec: the mBART-large-50 decoder as used by the reference's fused
model — shared token embedding scaled by sqrt(d_model), learned positions with
a +2 offset, layernorm_embedding, pre-norm blocks (self-attn -> cross-attn ->
MLP), final layer_norm (reference: modeling_clip_vision_mbart.py:49-51, 92 via
HF FlaxMBartDecoder).

TPU-first design:
- all layers applied with one `lax.scan` over stacked params;
- decoding uses the explicit stacked DecoderCache (mic_tpu/nn/cache.py):
  cross-attention K/V projected ONCE at cache init, per-step self-attn K/V
  written with `dynamic_update_slice`; the scan's ys ARE the new cache;
- masks are boolean biases built once per call; softmax/LN in f32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mic_tpu.core.config import DecoderConfig
from mic_tpu.nn.attention import (
    init_mha,
    mha,
    mha_cross_grouped,
    mha_decode_step,
    mha_decode_step_lazy,
    project_kv,
)
from mic_tpu.nn.cache import DecoderCache, LazyDecoderCache
from mic_tpu.nn.layers import (
    ACTIVATIONS,
    Params,
    dense,
    dropout,
    embed,
    init_dense,
    init_layer_norm,
    layer_norm,
)
from mic_tpu.nn.stacked import init_stacked, scan_apply

from mic_tpu.core.knobs import experimental, override


def _attn_buckets(max_len: int) -> tuple:
    """Static cache-read prefix lengths for the lazy decode attention.

    ``MIC_TPU_EXPERIMENTAL=attn_buckets=auto|<list>`` — "auto" uses
    half/full, or a comma-free digit list like "16.32.64"; default/""/"0"
    disables (full-window reads). At step index
    only index+1 positions are live, so the shortest covering prefix should
    save ~25% of the cache stream (bit-identical results — masked tails
    contribute exact zeros to the softmax). MEASURED NEGATIVE at the
    flagship config (166.8 vs 169.2 captions/s/chip at batch 128, half/full
    buckets): XLA re-materializes the sliced operands around the switch
    branches, costing more than the skipped tail reads. Kept as an opt-in
    documented knob; may win at much longer max_length."""
    spec = experimental("attn_buckets", "0")
    if spec in ("", "0"):
        return ()
    if spec in ("auto", "1"):
        return (max_len // 2, max_len) if max_len >= 16 else ()
    return tuple(int(s) for s in spec.replace(".", ",").split(","))


def fuse_qkv_params(decoder_params: Params) -> Params:
    """Decode-only param view: each layer's self-attention q/k/v denses are
    concatenated into ONE (L, D, 3D) "qkv" dense (plus fused bias).

    The decode step runs 36 separate (rows, D) x (D, D) projection GEMMs per
    step (3 per layer); each is far below the MXU pipeline's sweet spot and
    pays its own dispatch.  One (D, 3D) GEMM per layer computes the same
    columns bit-identically (every output column contracts the same kernel
    column in the same order) with a third of the op launches.  Built once
    per generate, outside the decode loop; the cross-attention q and the
    o-projections are untouched (cross k/v are projected once at cache
    init).  Consumed by mha_decode_step_lazy when "qkv" is present."""
    layers = decoder_params["layers"]
    sa = layers["self_attn"]
    qkv = {
        "kernel": jnp.concatenate(
            [sa["q"]["kernel"], sa["k"]["kernel"], sa["v"]["kernel"]], axis=-1
        )
    }
    if "bias" in sa["q"]:
        qkv["bias"] = jnp.concatenate(
            [sa["q"]["bias"], sa["k"]["bias"], sa["v"]["bias"]], axis=-1
        )
    new_sa = dict(sa)
    for name in ("q", "k", "v"):
        new_sa.pop(name)
    new_sa["qkv"] = qkv
    new_layers = dict(layers)
    new_layers["self_attn"] = new_sa
    out = dict(decoder_params)
    out["layers"] = new_layers
    return out


class DecoderTowerOutput(NamedTuple):
    """Structured decoder output (reference surface: output_hidden_states /
    output_attentions of FlaxMBartDecoder through
    modeling_clip_vision_mbart.py:447-510). Layer axes are stacked arrays:
    hidden_states (L+1, B, T, D) — embeddings output first, final entry
    post-final-LN like HF mBART; attentions / cross_attentions
    (L, B, heads, T, ·)."""

    last_hidden_state: jnp.ndarray
    hidden_states: Optional[jnp.ndarray] = None
    attentions: Optional[jnp.ndarray] = None
    cross_attentions: Optional[jnp.ndarray] = None


def _init_layer(key, cfg: DecoderConfig) -> Params:
    ks, kx, k1, k2 = jax.random.split(key, 4)
    std = cfg.init_std
    return {
        "ln_self": init_layer_norm(cfg.d_model),
        "self_attn": init_mha(ks, cfg.d_model, cfg.num_heads, std),
        "ln_cross": init_layer_norm(cfg.d_model),
        "cross_attn": init_mha(kx, cfg.d_model, cfg.num_heads, std),
        "ln_mlp": init_layer_norm(cfg.d_model),
        "fc1": init_dense(k1, cfg.d_model, cfg.ffn_dim, std),
        "fc2": init_dense(k2, cfg.ffn_dim, cfg.d_model, std),
    }


def init_decoder(key, cfg: DecoderConfig) -> Params:
    """Decoder params WITHOUT the token embedding (that's the shared table)."""
    kpos, kl = jax.random.split(key)
    params = {
        "pos_embed": {
            "embedding": jax.random.normal(
                kpos, (cfg.max_position_embeddings + cfg.pos_offset, cfg.d_model)
            )
            * cfg.init_std
        },
        "ln_embed": init_layer_norm(cfg.d_model),
        "layers": init_stacked(kl, cfg.num_layers, lambda k: _init_layer(k, cfg)),
    }
    if cfg.use_final_ln:
        params["final_ln"] = init_layer_norm(cfg.d_model)
    return params


def embed_tokens(shared: Params, ids: jnp.ndarray, cfg: DecoderConfig, dtype) -> jnp.ndarray:
    scale = cfg.d_model**0.5 if cfg.scale_embedding else 1.0
    return embed(shared, ids, dtype) * jnp.asarray(scale, dtype)


def _causal_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) padding mask -> (B, 1, T, T) boolean causal+padding mask."""
    t = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((t, t), jnp.bool_))
    pad = attention_mask.astype(jnp.bool_)[:, None, None, :]
    return causal[None, None, :, :] & pad


def apply_decoder(
    params: Params,
    shared: Params,
    input_ids: jnp.ndarray,          # (B, T)
    attention_mask: jnp.ndarray,     # (B, T)  1 = real token
    enc_states: jnp.ndarray,         # (B, S, d_model) — already projected
    enc_mask: Optional[jnp.ndarray],  # (B, S) or None (= all ones)
    cfg: DecoderConfig,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    remat: bool = False,
    position_ids: Optional[jnp.ndarray] = None,
    output_hidden_states: bool = False,
    output_attentions: bool = False,
):
    """Teacher-forced full-sequence decode -> hidden states (B, T, d_model),
    or a DecoderTowerOutput when introspection outputs are requested."""
    b, t = input_ids.shape
    eps = cfg.layer_norm_eps
    act = ACTIVATIONS[cfg.activation]

    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(t)[None, :], (b, t))
    x = embed_tokens(shared, input_ids, cfg, dtype)
    x = x + embed(params["pos_embed"], position_ids + cfg.pos_offset, dtype)
    x = layer_norm(params["ln_embed"], x, eps)
    x = dropout(x, cfg.dropout, _site(rng, 0))

    self_mask = _causal_mask(attention_mask)
    if enc_mask is None:
        cross_mask = None
    else:
        cross_mask = enc_mask.astype(jnp.bool_)[:, None, None, :]
    enc_states = enc_states.astype(dtype)

    post = cfg.post_norm
    embeddings = x

    def layer(h, p, idx, _):
        lrng = jax.random.fold_in(rng, idx) if rng is not None else None
        ys = {}
        r = h
        if not post:
            h = layer_norm(p["ln_self"], h, eps)
        h = mha(p["self_attn"], h, h, self_mask, cfg.num_heads, impl=attn_impl,
                dropout_rate=cfg.attention_dropout, dropout_rng=_site(lrng, 5),
                return_weights=output_attentions)
        if output_attentions:
            h, ys["attn"] = h
        h = r + dropout(h, cfg.dropout, _site(lrng, 1))
        if post:
            h = layer_norm(p["ln_self"], h, eps)
        r = h
        if not post:
            h = layer_norm(p["ln_cross"], h, eps)
        h = mha(p["cross_attn"], h, enc_states, cross_mask, cfg.num_heads,
                dropout_rate=cfg.attention_dropout, dropout_rng=_site(lrng, 6),
                return_weights=output_attentions)
        if output_attentions:
            h, ys["cross_attn"] = h
        h = r + dropout(h, cfg.dropout, _site(lrng, 2))
        if post:
            h = layer_norm(p["ln_cross"], h, eps)
        r = h
        if not post:
            h = layer_norm(p["ln_mlp"], h, eps)
        h = act(dense(p["fc1"], h))
        h = dropout(h, cfg.activation_dropout, _site(lrng, 3))
        h = dense(p["fc2"], h)
        h = r + dropout(h, cfg.dropout, _site(lrng, 4))
        if post:
            h = layer_norm(p["ln_mlp"], h, eps)
        if output_hidden_states:
            ys["hidden"] = h
        return h, ys

    x, ys = scan_apply(layer, x, params["layers"], remat=remat)
    if cfg.use_final_ln:
        x = layer_norm(params["final_ln"], x, eps)
    if not (output_hidden_states or output_attentions):
        return x
    hidden_states = None
    if output_hidden_states:
        hidden_states = jnp.concatenate([embeddings[None], ys["hidden"]])
        if cfg.use_final_ln:  # HF mBART reports the final entry post-LN
            hidden_states = hidden_states.at[-1].set(x)
    return DecoderTowerOutput(
        last_hidden_state=x,
        hidden_states=hidden_states,
        attentions=ys["attn"] if output_attentions else None,
        cross_attentions=ys["cross_attn"] if output_attentions else None,
    )


def _site(rng: Optional[jax.Array], site: int) -> Optional[jax.Array]:
    return None if rng is None else jax.random.fold_in(rng, site)


# ---------------------------------------------------------------------------
# cached single-token decoding


def init_cross_cache(
    params: Params, enc_states: jnp.ndarray, cfg: DecoderConfig,
    dtype=jnp.float32, merged: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project encoder states into every layer's cross-attn K/V once.

    Returns (cross_k, cross_v), each (L, B, S, H, Dh) — or head-dims-MERGED
    (L, B, S, H*Dh) with ``merged=True``: XLA lane-pads a stored trailing
    (H=16, Dh=64) dim pair to (16, 128), so the canonical layout physically
    reads 2x its logical bytes per decode step (104 vs 52 MB/layer at B=256,
    profiled); the merged layout is padding-free and is what the fused
    cross-attention kernel (ops/cross_attention.py) consumes directly.  The
    reference re-ran these projections every decode step (HF
    FlaxMBartAttention inside the while_loop) — here they are hoisted out of
    the loop entirely.
    """
    enc_states = enc_states.astype(dtype)

    def one_layer(layer_params):
        return project_kv(layer_params["cross_attn"], enc_states, cfg.num_heads)

    k, v = jax.vmap(one_layer)(params["layers"])
    if merged:
        l, b, s = k.shape[:3]
        k = k.reshape(l, b, s, -1)
        v = v.reshape(l, b, s, -1)
        # the DMA kernel's scratch/DMA tiles are bf16 (16, 128) — pad the
        # encoder axis to a 16 multiple once at init; padded rows are ZEROS
        # and masked live < enc_len in-kernel
        pad = (-s) % 16
        if pad:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return k, v


def _decoder_step_fused(
    params: Params,
    shared: Params,
    token_ids: jnp.ndarray,
    cache: DecoderCache,
    cfg: DecoderConfig,
    dtype,
    enc_mask: Optional[jnp.ndarray],
    beams: int,
) -> Tuple[jnp.ndarray, DecoderCache]:
    """decoder_step variant using the fused Pallas decode-attention kernel
    (mic_tpu/ops/decode_attention.py): the self-attention cache rides the scan
    CARRY and is updated in place by the kernel (aliased), with attention
    reading only the live ceil((index+1)/chunk) cache chunks.
    Enable with MIC_TPU_EXPERIMENTAL=fused_decode."""
    from mic_tpu.nn.layers import merge_heads, split_heads
    from mic_tpu.ops.decode_attention import decode_attention

    eps = cfg.layer_norm_eps
    act = ACTIVATIONS[cfg.activation]
    index = cache.index
    post = cfg.post_norm
    head_dim = cfg.head_dim

    x = embed_tokens(shared, token_ids, cfg, dtype)
    pos = jnp.full(token_ids.shape, index, token_ids.dtype)
    x = x + embed(params["pos_embed"], pos + cfg.pos_offset, dtype)
    x = layer_norm(params["ln_embed"], x, eps)

    cross_mask = (
        None if enc_mask is None else enc_mask.astype(jnp.bool_)[:, None, None, :]
    )

    def body(carry, xs):
        h, ck, cv = carry
        p, lidx, xk, xv = xs
        r = h
        if not post:
            h = layer_norm(p["ln_self"], h, eps)
        ap = p["self_attn"]
        q = split_heads(dense(ap["q"], h) * (head_dim**-0.5), cfg.num_heads)
        k_step, v_step = project_kv(ap, h, cfg.num_heads)
        attn, ck, cv = decode_attention(q, k_step, v_step, ck, cv, lidx, index)
        h = dense(ap["o"], merge_heads(attn.astype(h.dtype)))
        h = r + h
        if post:
            h = layer_norm(p["ln_self"], h, eps)
        r = h
        if not post:
            h = layer_norm(p["ln_cross"], h, eps)
        h = mha_cross_grouped(
            p["cross_attn"], h, xk, xv, cross_mask, cfg.num_heads, beams
        )
        h = r + h
        if post:
            h = layer_norm(p["ln_cross"], h, eps)
        r = h
        if not post:
            h = layer_norm(p["ln_mlp"], h, eps)
        h = r + dense(p["fc2"], act(dense(p["fc1"], h)))
        if post:
            h = layer_norm(p["ln_mlp"], h, eps)
        return (h, ck, cv), None

    L = cfg.num_layers
    (x, new_k, new_v), _ = jax.lax.scan(
        body,
        (x, cache.self_k, cache.self_v),
        (params["layers"], jnp.arange(L, dtype=jnp.int32),
         cache.cross_k, cache.cross_v),
    )
    if cfg.use_final_ln:
        x = layer_norm(params["final_ln"], x, eps)
    new_cache = DecoderCache(
        self_k=new_k, self_v=new_v,
        cross_k=cache.cross_k, cross_v=cache.cross_v,
        index=index + token_ids.shape[1],
    )
    return x, new_cache


def _decoder_step_lazy(
    params: Params,
    shared: Params,
    token_ids: jnp.ndarray,
    cache: LazyDecoderCache,
    cfg: DecoderConfig,
    dtype,
    enc_mask: Optional[jnp.ndarray],
    beams: int,
    enc_len: Optional[int] = None,
) -> Tuple[jnp.ndarray, LazyDecoderCache]:
    """decoder_step on a LazyDecoderCache: no physical beam reorder, one
    in-place cache-column write per layer.

    Layers are unrolled in Python (static slices of the stacked params)
    instead of `lax.scan`: each per-layer cache array is then a separate
    loop-carried buffer whose single `dynamic_update_slice` XLA aliases in
    place. Threading the caches through scan xs->ys double-buffers ~1.6 GB
    per step at the flagship config; a post-scan column write copies the
    whole cache (the scan keeps it live) — both measured slower.
    """
    eps = cfg.layer_norm_eps
    act = ACTIVATIONS[cfg.activation]
    index = cache.index
    post = cfg.post_norm
    buckets = _attn_buckets(cache.max_len)

    # Fused Pallas decode attention (ops/lazy_attention.py), selected by
    # lazy_attention.resolve_mode: the v3 DMA pass-through kernel is the
    # TPU DEFAULT at EVERY max_length (265.4 vs 240.1 captions/s/chip at
    # batch 256 / len 64; 115.9 vs 30.0 at len 128 — the XLA score chain
    # degrades super-linearly with cache length, PERFORMANCE.md).
    # MIC_TPU_FUSED_LAZY_ATTN overrides: =1 blocked kernel (faster
    # standalone but XLA copies any while-carried cache both read by a
    # custom call and column-written in the same iteration, +1.37 ms/step),
    # =2 DMA kernel (caches flow THROUGH as aliased ANY operands and the
    # column write happens IN-kernel; also the int8-KV vehicle), =0 XLA
    # chain.  The ancestry+liveness mask is layer-invariant: built ONCE per
    # step and shared by all layers.
    amask = None
    dma = False
    fla = override("MIC_TPU_FUSED_LAZY_ATTN")
    if fla is None:
        # the captioner encodes its lazy_attention.resolve_mode choice in the
        # cache layout: merged (B*K, T, H*Dh) storage exists only for the
        # fused kernels, and the auto path only ever selects the DMA variant
        sk0 = cache.self_k[0]
        merged_store = (
            sk0["q"] if isinstance(sk0, dict) else sk0
        ).ndim == 3
        fla = "2" if merged_store else "0"
    if fla in ("1", "2") and jax.default_backend() == "tpu" and not buckets:
        from mic_tpu.ops import lazy_attention

        dma = fla == "2"
        ok = (
            lazy_attention.supports_dma if dma
            else lazy_attention.supports
        )(cache.self_k[0], beams, cfg.num_heads, cfg.head_dim)
        if ok:
            amask = lazy_attention.build_ancestry_mask(cache.ancestry, index)
        else:
            dma = False

    x = embed_tokens(shared, token_ids, cfg, dtype)
    pos = jnp.full(token_ids.shape, index, token_ids.dtype)
    x = x + embed(params["pos_embed"], pos + cfg.pos_offset, dtype)
    x = layer_norm(params["ln_embed"], x, eps)

    cross_mask = (
        None if enc_mask is None else enc_mask.astype(jnp.bool_)[:, None, None, :]
    )
    cross_kernel = (
        experimental("fused_cross_attn", "0") == "1"
        and jax.default_backend() == "tpu"
        and cross_mask is None
        and (cfg.num_heads * cfg.head_dim) % 128 == 0
    )
    # Fused MLP kernel (ops/fused_mlp.py): chunked fc1->gelu->fc2, the
    # (N, ffn) intermediate never leaves VMEM.  bf16 weights only (the int8
    # path's native int8 dot has its own fused pipeline).  Opt-in: measured
    # SLOWER than XLA's MLP mega-fusion (PERFORMANCE.md).
    mlp_kernel = (
        experimental("fused_mlp", "0") == "1"
        and jax.default_backend() == "tpu"
        and "kernel" in params["layers"]["fc1"]
        and "bias" in params["layers"]["fc1"]
        and token_ids.shape[0] % 8 == 0
        and cfg.d_model % 128 == 0
        and cfg.ffn_dim % 512 == 0
    )

    # MIC_TPU_EXPERIMENTAL=ln_qkv: fold ln_self into the qkv GEMM's prologue
    # (ops/ln_gemm.py) instead of a separate LN fusion per layer
    ln_fused = (
        experimental("ln_qkv", "0") == "1"
        and not post
        and jax.default_backend() == "tpu"
    )

    new_k, new_v = [], []
    for l in range(cfg.num_layers):
        p = jax.tree.map(lambda a, _l=l: a[_l], params["layers"])
        r = x
        if not post and not ln_fused:
            x = layer_norm(p["ln_self"], x, eps)
        x, sk, sv = mha_decode_step_lazy(
            p["self_attn"], x, cache.self_k[l], cache.self_v[l],
            cache.ancestry, index, cfg.num_heads, beams, buckets=buckets,
            amask=amask, dma=dma,
            ln=(p["ln_self"], eps) if ln_fused else None,
        )
        new_k.append(sk)
        new_v.append(sv)
        x = r + x
        if post:
            x = layer_norm(p["ln_self"], x, eps)
        r = x
        if not post:
            x = layer_norm(p["ln_cross"], x, eps)
        x = mha_cross_grouped(
            p["cross_attn"], x, cache.cross_k[l], cache.cross_v[l],
            cross_mask, cfg.num_heads, beams, kernel=cross_kernel,
            enc_len=enc_len,
        )
        x = r + x
        if post:
            x = layer_norm(p["ln_cross"], x, eps)
        r = x
        if not post:
            x = layer_norm(p["ln_mlp"], x, eps)
        if mlp_kernel:
            from mic_tpu.ops.fused_mlp import fused_mlp

            bk, one, dm = x.shape
            x = r + fused_mlp(
                x.reshape(bk, dm),
                p["fc1"]["kernel"], p["fc1"]["bias"],
                p["fc2"]["kernel"], p["fc2"]["bias"],
                cfg.activation,
            ).reshape(bk, one, dm)
        else:
            x = r + dense(p["fc2"], act(dense(p["fc1"], x)))
        if post:
            x = layer_norm(p["ln_mlp"], x, eps)
    if cfg.use_final_ln:
        x = layer_norm(params["final_ln"], x, eps)
    new_cache = cache._replace(
        self_k=tuple(new_k), self_v=tuple(new_v),
        index=index + token_ids.shape[1],
    )
    return x, new_cache


def decoder_step(
    params: Params,
    shared: Params,
    token_ids: jnp.ndarray,   # (B*beams, 1) tokens for this step
    cache: DecoderCache,
    cfg: DecoderConfig,
    dtype=jnp.float32,
    enc_mask: Optional[jnp.ndarray] = None,  # (B, S) or None (true batch B)
    beams: int = 1,
    enc_len: Optional[int] = None,  # live length of a merged padded cross cache
) -> Tuple[jnp.ndarray, DecoderCache]:
    """One cached decode step -> (hidden (B*beams, 1, d_model), updated cache).

    The self-attention cache is per (batch*beam) row; the cross-attention
    cache is per IMAGE (true batch) and shared across beams via grouped
    attention (mic_tpu/nn/attention.py mha_cross_grouped)."""
    if isinstance(cache, LazyDecoderCache):
        return _decoder_step_lazy(
            params, shared, token_ids, cache, cfg, dtype, enc_mask, beams,
            enc_len=enc_len,
        )
    if experimental("fused_decode", "0") == "1":
        return _decoder_step_fused(
            params, shared, token_ids, cache, cfg, dtype, enc_mask, beams
        )
    eps = cfg.layer_norm_eps
    act = ACTIVATIONS[cfg.activation]
    index = cache.index

    x = embed_tokens(shared, token_ids, cfg, dtype)
    pos = jnp.full(token_ids.shape, index, token_ids.dtype)
    x = x + embed(params["pos_embed"], pos + cfg.pos_offset, dtype)
    x = layer_norm(params["ln_embed"], x, eps)

    cross_mask = (
        None if enc_mask is None else enc_mask.astype(jnp.bool_)[:, None, None, :]
    )

    post = cfg.post_norm

    def layer(h, p, idx, layer_cache):
        del idx
        sk, sv, xk, xv = layer_cache
        r = h
        if not post:
            h = layer_norm(p["ln_self"], h, eps)
        # NOTE: the cache flows through scan xs->ys on purpose. A "write one
        # column after the scan" variant (mha_decode_step_split) measures
        # ~40% SLOWER end-to-end: the post-scan dynamic_update_slice cannot
        # alias while the cache is still live as the scan input, so XLA
        # copies the whole cache; the ys path double-buffers at stream rate.
        h, sk, sv = mha_decode_step(p["self_attn"], h, sk, sv, index, cfg.num_heads)
        h = r + h
        if post:
            h = layer_norm(p["ln_self"], h, eps)
        r = h
        if not post:
            h = layer_norm(p["ln_cross"], h, eps)
        h = mha_cross_grouped(
            p["cross_attn"], h, xk, xv, cross_mask, cfg.num_heads, beams
        )
        h = r + h
        if post:
            h = layer_norm(p["ln_cross"], h, eps)
        r = h
        if not post:
            h = layer_norm(p["ln_mlp"], h, eps)
        h = r + dense(p["fc2"], act(dense(p["fc1"], h)))
        if post:
            h = layer_norm(p["ln_mlp"], h, eps)
        return h, (sk, sv)

    x, (new_k, new_v) = scan_apply(
        layer, x, params["layers"],
        per_layer_xs=(cache.self_k, cache.self_v, cache.cross_k, cache.cross_v),
    )
    if cfg.use_final_ln:
        x = layer_norm(params["final_ln"], x, eps)
    new_cache = DecoderCache(
        self_k=new_k, self_v=new_v,
        cross_k=cache.cross_k, cross_v=cache.cross_v,
        index=index + token_ids.shape[1],
    )
    return x, new_cache
