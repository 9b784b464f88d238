"""The fused vision->text captioner: CLIP-ViT encoder + mBART decoder.

Capability parity target: ``FlaxCLIPVisionMBartForConditionalGeneration``
(reference: modeling_clip_vision_mbart.py:32-192, 447-651) — shared 250054 x
1024 token embedding, CLIP vision encoder, visual projection bridging
CLIP hidden size to mBART d_model, mBART decoder cross-attending to the
projected patch tokens, LM head tied to the shared embedding plus
``final_logits_bias``.  The encoder attention mask is implicit: every patch
token is always attendable (reference: modeling_clip_vision_mbart.py:87-88),
so no cross-attention mask is materialized at all.

Unlike the reference (vendored HF PreTrainedModel machinery,
modeling_clip_vision_utils.py:36-451), this class is a thin config holder over
pure functions: params are an explicit pytree argument everywhere, so the whole
model jits/shards/checkpoints with zero framework magic.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.core.knobs import experimental, override
from mic_tpu.generate import search
from mic_tpu.generate.processors import build_warpers
from mic_tpu.models import clip_vit, mbart_decoder
from mic_tpu.nn.cache import DecoderCache, init_cache, init_lazy_cache
from mic_tpu.nn.layers import Params, dense, init_dense, init_embed

from typing import NamedTuple


def _resolve_cache_segments(max_length: int, spec: str = "auto") -> tuple:
    """``spec`` is DecodeConfig.cache_segments (env MIC_TPU_CACHE_SEGMENTS
    wins when set — resolved by the caller): "0"/"off"/"" = off, "on" = 4
    linear phases, "auto" = platform default ("on" for TPU, off elsewhere),
    or an explicit comma list of cache lengths (e.g. "16,32,48,64").
    Segments are clamped/deduped to (0, max_length] and always end at
    max_length so every write position fits; decoding shorter than max_length
    is phased through growing static cache sizes (search._run_segmented).

    The TPU-on default is bit-identical to the unsegmented loop
    (tests/test_generate.py) and +11-16% captions/s/chip (PERFORMANCE.md);
    off-TPU the 4x decode-graph compiles are pure overhead for the CPU test
    suite."""
    raw = spec
    if raw == "auto":
        raw = "on" if jax.default_backend() == "tpu" else ""
    if not raw or raw in ("0", "off"):
        return ()
    if raw == "on":
        # intermediate segments round UP to multiples of 8: the v2 DMA
        # decode-attention kernel (the max_length>64 default) slices cache
        # rows in 8-aligned chunks (lazy_attention.supports_dma), and a
        # slightly longer early segment costs far less than losing the
        # kernel for the whole run
        segs = [
            ((max_length * i // 4 + 7) // 8) * 8 for i in (1, 2, 3)
        ] + [max_length]
    else:
        segs = [int(s) for s in raw.split(",") if s.strip()]
    out: list = []
    for s in sorted(segs):
        s = min(max(s, 1), max_length)
        if not out or s > out[-1]:
            out.append(s)
    if out[-1] != max_length:
        out.append(max_length)
    return tuple(out) if len(out) > 1 else ()


class EncodeOutput(NamedTuple):
    """`encode` with introspection: last_hidden_state is the PROJECTED
    (B, 1+N, d_model) states the decoder cross-attends to; hidden_states /
    attentions are the vision tower's stacked per-layer arrays (reference
    surface: modeling_clip_vision_mbart.py:284-338 encode outputs)."""

    last_hidden_state: jnp.ndarray
    hidden_states: Optional[jnp.ndarray] = None
    attentions: Optional[jnp.ndarray] = None


class CaptionerOutput(NamedTuple):
    """Structured `__call__` output (reference surface: FlaxCLIPVisionMBart-
    ForConditionalGenerationModule.__call__ with output_attentions /
    output_hidden_states, modeling_clip_vision_mbart.py:447-510). All layer
    axes are stacked arrays (jit-friendly), not tuples."""

    logits: jnp.ndarray
    encoder_last_hidden_state: Optional[jnp.ndarray] = None
    encoder_hidden_states: Optional[jnp.ndarray] = None
    encoder_attentions: Optional[jnp.ndarray] = None
    decoder_hidden_states: Optional[jnp.ndarray] = None
    decoder_attentions: Optional[jnp.ndarray] = None
    cross_attentions: Optional[jnp.ndarray] = None


class Captioner:
    def __init__(self, config: CaptionerConfig, attn_impl: str = "xla",
                 remat: "bool | str" = False):
        self.config = config
        self.attn_impl = attn_impl
        self.remat = remat

    # -- params -------------------------------------------------------------

    def init_params(self, key: jax.Array) -> Params:
        cfg = self.config
        ks, kv, kp, kd, kh = jax.random.split(key, 5)
        params = {
            "shared": init_embed(ks, cfg.decoder.vocab_size, cfg.decoder.d_model,
                                 cfg.decoder.init_std),
            "vision": clip_vit.init_vision(kv, cfg.vision),
            "proj": init_dense(kp, cfg.vision.hidden_size, cfg.decoder.d_model,
                               cfg.decoder.init_std),
            "decoder": mbart_decoder.init_decoder(kd, cfg.decoder),
            "final_logits_bias": jnp.zeros((cfg.decoder.vocab_size,), jnp.float32),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init_dense(
                kh, cfg.decoder.d_model, cfg.decoder.vocab_size,
                cfg.decoder.init_std, use_bias=False,
            )
        return params

    @property
    def dtype(self):
        return self.config.compute_dtype

    # -- forward ------------------------------------------------------------

    def encode(
        self,
        params: Params,
        pixel_values: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        """pixel_values (B, H, W, 3) float -> projected encoder states
        (B, 1+num_patches, d_model), or an EncodeOutput with the vision
        tower's introspection arrays.  (The reference's separate `encode` had
        an int32-cast bug, modeling_clip_vision_mbart.py:330 — fixed by
        design.)"""
        out = clip_vit.apply_vision(
            params["vision"], pixel_values, self.config.vision,
            dtype=self.dtype, rng=rng, attn_impl=self.attn_impl,
            remat=self.remat,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions,
        )
        if not (output_hidden_states or output_attentions):
            return dense(params["proj"], out, self.dtype)
        return EncodeOutput(
            last_hidden_state=dense(params["proj"], out.last_hidden_state,
                                    self.dtype),
            hidden_states=out.hidden_states,
            attentions=out.attentions,
        )

    def decode_hidden(
        self,
        params: Params,
        enc_states: jnp.ndarray,
        decoder_input_ids: jnp.ndarray,
        decoder_attention_mask: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Teacher-forced decoder hidden states (B, T, d_model), pre-LM-head —
        feeds ops/fused_ce.py so training never materializes full logits."""
        return mbart_decoder.apply_decoder(
            params["decoder"], params["shared"],
            decoder_input_ids, decoder_attention_mask,
            enc_states, None, self.config.decoder,
            dtype=self.dtype, rng=rng, attn_impl=self.attn_impl, remat=self.remat,
        )

    def decode_train(
        self,
        params: Params,
        enc_states: jnp.ndarray,
        decoder_input_ids: jnp.ndarray,
        decoder_attention_mask: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        hidden = self.decode_hidden(
            params, enc_states, decoder_input_ids, decoder_attention_mask, rng
        )
        return self.lm_logits(params, hidden)

    def __call__(
        self,
        params: Params,
        pixel_values: jnp.ndarray,
        decoder_input_ids: jnp.ndarray,
        decoder_attention_mask: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        output_hidden_states: bool = False,
        output_attentions: bool = False,
    ):
        """Teacher-forced forward -> logits (B, T, vocab), or a
        CaptionerOutput when introspection outputs are requested."""
        # distinct stream from the decoder's per-layer fold_in(rng, idx)
        vision_rng = (
            jax.random.fold_in(rng, 0x5649) if rng is not None else None
        )
        if not (output_hidden_states or output_attentions):
            enc_states = self.encode(params, pixel_values, rng=vision_rng)
            return self.decode_train(
                params, enc_states, decoder_input_ids, decoder_attention_mask,
                rng,
            )
        enc = self.encode(
            params, pixel_values, rng=vision_rng,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions,
        )
        dec = mbart_decoder.apply_decoder(
            params["decoder"], params["shared"],
            decoder_input_ids, decoder_attention_mask,
            enc.last_hidden_state, None, self.config.decoder,
            dtype=self.dtype, rng=rng, attn_impl=self.attn_impl,
            remat=self.remat,
            output_hidden_states=output_hidden_states,
            output_attentions=output_attentions,
        )
        return CaptionerOutput(
            logits=self.lm_logits(params, dec.last_hidden_state),
            encoder_last_hidden_state=enc.last_hidden_state,
            encoder_hidden_states=enc.hidden_states,
            encoder_attentions=enc.attentions,
            decoder_hidden_states=dec.hidden_states,
            decoder_attentions=dec.attentions,
            cross_attentions=dec.cross_attentions,
        )

    def lm_logits(self, params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
        if self.config.tie_word_embeddings:
            shared = params["shared"]
            if "embedding_q" in shared:
                # int8 LM head as a NATIVE int8 x int8 dot: dynamic per-token
                # activation quant, both scales folded into the int32
                # accumulator epilogue. The bf16-dequant formulation measured
                # throughput parity — XLA hoisted the dequantized 512 MB
                # kernel out of the decode loop, so the loop still streamed
                # bf16; int8 operands keep the stream at 256 MB. (The pallas
                # dequant GEMM measured slower, 76.6 vs 81.8 captions/s —
                # ops/int8_matmul.py stays as a documented reference.)
                from mic_tpu.ops.quant import quantize_rows_dynamic

                hq, hs = quantize_rows_dynamic(hidden)
                acc = jax.lax.dot_general(
                    hq, shared["embedding_q"],
                    (((hidden.ndim - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                logits = (
                    acc.astype(jnp.float32)
                    * hs
                    * shared["embedding_scale"]
                ).astype(self.dtype)
                return logits + params["final_logits_bias"].astype(self.dtype)
            kernel = shared["embedding"].T
        else:
            kernel = params["lm_head"]["kernel"]
        logits = jnp.dot(
            hidden, kernel.astype(self.dtype), preferred_element_type=self.dtype
        )
        return logits + params["final_logits_bias"].astype(self.dtype)

    # -- generation ---------------------------------------------------------

    def init_decode_cache(
        self, params: Params, enc_states: jnp.ndarray, max_length: int,
        beams: int = 1, lazy: bool = False, kv_quant: Optional[str] = None,
        merged: bool = False, merged_cross: bool = False,
    ) -> DecoderCache:
        """enc_states is TRUE-batch (B, S, D): the cross-attention cache keeps
        one K/V copy per image; only the self-attention cache is per-beam.
        With lazy=True, returns a LazyDecoderCache (ancestry-tracked beam
        reordering — no physical cache permute per step); merged=True stores
        its self K/V head-dims-merged for the fused Pallas attention kernel
        (see nn/cache.py init_lazy_cache); merged_cross=True stores the cross
        K/V head-dims-merged for the fused cross-attention kernel
        (lane-padding-free reads — see mbart_decoder.init_cross_cache)."""
        cfg = self.config.decoder
        batch, enc_len = enc_states.shape[0], enc_states.shape[1]
        cross_k, cross_v = mbart_decoder.init_cross_cache(
            params["decoder"], enc_states, cfg, self.dtype,
            merged=merged_cross,
        )
        if lazy:
            empty = init_lazy_cache(
                cfg.num_layers, batch, beams, max_length, enc_len,
                cfg.num_heads, cfg.head_dim, self.dtype, kv_quant=kv_quant,
                merged=merged,
            )
        else:
            empty = init_cache(
                cfg.num_layers, batch * beams, max_length, enc_len,
                cfg.num_heads, cfg.head_dim, self.dtype,
            )
        return empty._replace(cross_k=cross_k, cross_v=cross_v)

    def decode_step(
        self, params: Params, token_ids: jnp.ndarray, cache: DecoderCache,
        beams: int = 1, enc_len: "int | None" = None,
    ):
        """(B*beams, 1) tokens + cache -> ((B*beams, vocab) logits, cache)."""
        hidden, cache = mbart_decoder.decoder_step(
            params["decoder"], params["shared"], token_ids, cache,
            self.config.decoder, self.dtype, beams=beams, enc_len=enc_len,
        )
        return self.lm_logits(params, hidden)[:, 0, :], cache

    def generate(
        self,
        params: Params,
        pixel_values: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        **overrides,
    ) -> search.GenerateOutput:
        """Caption a batch of images. Jittable; all defaults come from
        config.generation, overridable per call (max_length, num_beams,
        forced_bos_token_id, decoder_start_token_id, do_sample, ...)."""
        dcfg = self.config.decode
        quantize = overrides.pop("quantize", None) or override(
            "MIC_TPU_DECODE_QUANT", dcfg.quantize
        )
        kv_quant = overrides.pop("kv_quant", None) or override(
            "MIC_TPU_KV_QUANT", dcfg.kv_quant
        ) or None
        # (batch,) pinned per-image EOS positions — deterministic early-exit
        # serving protocol (search.generate docstring); a traced array, so it
        # bypasses the static GenerationConfig
        eos_positions = overrides.pop("eos_positions", None)
        gen = self.config.generation.replace(**overrides)
        dec = self.config.decoder
        start = (
            gen.decoder_start_token_id
            if gen.decoder_start_token_id is not None
            else dec.decoder_start_token_id
        )
        batch = pixel_values.shape[0]

        if self.dtype != jnp.float32:
            # cast weights to the compute dtype ONCE, outside the decode loop:
            # halves the HBM weight traffic of every step (params live f32 for
            # training; generation is activation/weight-read bound)
            params = jax.tree.map(
                lambda x: x.astype(self.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
        # Beam decode uses the lazy cache (gated below); its step fn consumes
        # a fused (D, 3D) self-attention QKV projection — one GEMM per layer
        # per step instead of three, bit-identical columns (fuse_qkv_params).
        # Built BEFORE int8 quantization so the fused kernel is quantized
        # per-channel like any other dense.
        lazy_cache = override(
            "MIC_TPU_LAZY_CACHE", "1" if dcfg.lazy_cache else "0"
        ) == "1"
        fused_qkv = override(
            "MIC_TPU_FUSED_QKV", "1" if dcfg.fused_qkv else "0"
        ) == "1"
        if gen.num_beams > 1 and lazy_cache and fused_qkv:
            params = dict(params)
            params["decoder"] = mbart_decoder.fuse_qkv_params(params["decoder"])

        if quantize == "int8":
            # int8 weight-only decode: halves weight streaming again vs bf16
            # (every decode step re-reads all decoder + LM-head weights).
            # Runs AFTER the bf16 cast so the f32 quantization scales are not
            # themselves downcast (quant math runs in f32 internally).
            from mic_tpu.ops.quant import quantize_params_for_decode

            params = quantize_params_for_decode(params)

        enc_states = self.encode(params, pixel_values)  # true batch: no repeat
        enc_len = enc_states.shape[1]  # pre-padding length (merged cross cache)
        # Beam search defaults to the lazy (ancestry-masked) cache: no
        # physical beam permute and one in-place cache column write per layer
        # instead of double-buffering the whole cache through the layer scan.
        # MIC_TPU_LAZY_CACHE=0 falls back to the physically-permuted cache.
        lazy = gen.num_beams > 1 and lazy_cache
        on_tpu = jax.default_backend() == "tpu"
        # kernel mode is resolved ONCE from the full max_length (see
        # lazy_attention.resolve_mode) and implied to the decode steps via
        # the cache layout
        from mic_tpu.ops import lazy_attention

        fla = lazy_attention.resolve_mode(gen.max_length)
        # Will the v3 DMA kernel actually drive this generate?  (Static
        # mirror of _decoder_step_lazy's gate + supports_dma.)  If so, cache
        # segmentation is pure overhead: the kernel already streams only the
        # live prefix every step (chunked DMA bounded by the write index),
        # so phases would add grow copies and per-phase recompiles for no
        # stream saving.
        dma_path = (
            lazy
            and on_tpu
            and fla == "2"
            and lazy_attention.dma_shape_ok(
                gen.max_length, gen.num_beams, dec.num_heads, dec.head_dim,
                kv_quant == "int8",
            )
            and not mbart_decoder._attn_buckets(gen.max_length)
        )
        # Segmented cache growth: run the decode loop in phases over growing
        # static cache sizes so early steps stream a prefix-sized K/V cache
        # (~38% less self-attn cache read traffic at max_length 64 with 4
        # linear segments) — see search._run_segmented.  XLA-chain path only
        # (the DMA kernel prefix-bounds its own stream, above).
        seg_spec = override("MIC_TPU_CACHE_SEGMENTS", None)
        if seg_spec is None:
            seg_spec = dcfg.cache_segments
            if dma_path and seg_spec == "auto":
                seg_spec = ""  # the DMA kernel prefix-bounds its own stream
        cache_segments = _resolve_cache_segments(gen.max_length, seg_spec)
        first_len = cache_segments[0] if cache_segments else gen.max_length
        # Merged (B*K, T, H*Dh) self-KV layout for the fused Pallas lazy
        # decode attention (ops/lazy_attention.py): XLA lane-pads the
        # canonical (..., H=16, Dh=64) trailing dims to (16, 128) — 2x the
        # physical cache bytes AND a ~9.9 ms/layer copy into the kernel's
        # merged view (profiled). Storing merged makes that view a bitcast.
        # Must mirror _decoder_step_lazy's fused-kernel gate exactly;
        # MIC_TPU_EXPERIMENTAL=merged_kv forces it (CPU equivalence tests).
        seg_lens = cache_segments if cache_segments else (gen.max_length,)
        merged = lazy and (
            experimental("merged_kv") == "1"
            or (
                on_tpu
                and (kv_quant is None or fla == "2")
                and fla in ("1", "2")
                and gen.num_beams >= 2
                and (dec.num_heads * dec.head_dim) % 128 == 0
                # mirror the per-kernel shape gates (supports / supports_dma)
                # per segment length: the DMA kernel slices cache ROWS (t
                # must be 8-aligned), the blocked kernel views (beams*t)
                # sublanes (16-aligned) — choosing merged storage when the
                # kernel will reject it would run the slow XLA fallback on
                # the merged layout every step (tools/bench_cache_write.py)
                and all(
                    lazy_attention.dma_shape_ok(
                        t, gen.num_beams, dec.num_heads, dec.head_dim,
                        kv_quant == "int8",
                    )
                    if fla == "2"
                    else (gen.num_beams * t) % 16 == 0
                    for t in seg_lens
                )
                and not mbart_decoder._attn_buckets(gen.max_length)
            )
        )
        # Merged (B, S, H*Dh) CROSS cache -> the fused cross-attention kernel
        # (ops/cross_attention.py), opt-in via MIC_TPU_MERGED_CROSS=1
        # (interpret-mode off-TPU — CPU equivalence tests).  MEASURED
        # NEGATIVE as a default at the flagship shape (231.3 vs 277.0
        # captions/s/chip at B=256, round 4): the in-model XLA score/out
        # fusions already run at ~78 us/layer — the UNPADDED 52 MB/layer
        # stream bound, i.e. XLA's layout assignment avoids the (16, 64) ->
        # (16, 128) lane pad here (as it does for the self cache) — while
        # the kernel's per-image (50, HD) tiles stay MXU-pipeline-bound
        # (~1.0 ms/layer standalone at any grouping G in {4, 8, 16}).  Kept
        # for hypothetically larger encoders, where S in the hundreds fills
        # the MXU pipeline.
        merged_cross = lazy and experimental("merged_cross") == "1"
        cache = self.init_decode_cache(
            params, enc_states, first_len, beams=gen.num_beams, lazy=lazy,
            kv_quant=kv_quant if lazy else None,  # quant KV is lazy-path only
            merged=merged, merged_cross=merged_cross,
        )

        # Fused LM head (ops/fused_head.py): step_fn returns HIDDEN states
        # and candidate selection runs GEMM + online top-k/lse in one Pallas
        # pass — logits are never materialized (~1.2-1.6 ms/step of logits
        # HBM traffic saved at the flagship batch-128 config; 181.8 -> 233.8
        # captions/s/chip with segments+int8).  Tied-embedding, non-sampling
        # paths only.  DEFAULT ON for TPU with the bucket select
        # (BLEU-validated vs the exact path, tools/validate_fast_decode.py);
        # MIC_TPU_FUSED_HEAD=0 opts out.
        fh = override("MIC_TPU_FUSED_HEAD", dcfg.fused_head)
        if fh == "auto":
            fh = "1" if on_tpu else "0"
        fused_head = (
            not gen.do_sample
            and self.config.tie_word_embeddings
            and fh == "1"
        )
        if fused_head:
            from mic_tpu.ops.fused_head import fused_head_topk, fused_head_topk_q8

            # Candidate-select mode inside the kernel: "bucket" (per-column
            # running max over vocab chunks — elementwise accumulators, the
            # fast TPU path, approx_max_k family) or "exact"/"window".  CPU
            # defaults to exact so fused == dense bit-for-bit in tests.
            sel = override("MIC_TPU_FUSED_SELECT", dcfg.fused_select)
            if sel == "auto":
                sel = "bucket" if on_tpu else "exact"

            bias = params["final_logits_bias"].reshape(-1)
            if quantize == "int8":
                # int8 x int8 fused head: the two measured wins compose —
                # logits never reach HBM AND the weight stream is int8 bytes
                from mic_tpu.ops.quant import quantize_rows_dynamic

                weight_q = params["shared"]["embedding_q"]
                weight_scale = params["shared"]["embedding_scale"]
                # transposed ONCE here, outside the decode loop — the kernel
                # wants (D, V) so every chunk is a clean (M,K)x(K,N) MXU dot
                weight_qt = weight_q.T

                def _head(hidden, k):
                    return fused_head_topk_q8(
                        hidden, weight_qt, weight_scale, bias, k, sel
                    )

                if sel == "bucket":
                    # bucket-q8 computes bf16 x dequantized-bf16 (no
                    # activation quant); the forced-token numerator must
                    # use the same math as the kernel
                    def _tok_logit(hidden, tok):
                        row = jnp.take(weight_q, tok, axis=0).astype(
                            jnp.bfloat16
                        )
                        return (
                            jnp.dot(
                                hidden.astype(jnp.bfloat16), row,
                                preferred_element_type=jnp.float32,
                            )
                            * jnp.take(weight_scale, tok).astype(jnp.float32)
                            + bias[tok].astype(jnp.float32)
                        )
                else:
                    def _tok_logit(hidden, tok):
                        # numerator must use the SAME quantized-activation
                        # dot as the kernel/dense int8 paths, or forced-token
                        # log-probs drift from the unfused path's
                        xq, xs = quantize_rows_dynamic(hidden)
                        row_q = jnp.take(weight_q, tok, axis=0)  # (D,) int8
                        acc = jax.lax.dot_general(
                            xq, row_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                        return (
                            acc.astype(jnp.float32)
                            * xs[:, 0]
                            * jnp.take(weight_scale, tok).astype(jnp.float32)
                            + bias[tok].astype(jnp.float32)
                        )
            else:
                weight = params["shared"]["embedding"]
                weight_t = weight.astype(self.dtype).T  # once, outside the loop

                def _head(hidden, k):
                    return fused_head_topk(hidden, weight_t, bias, k, sel)

                def _tok_logit(hidden, tok):
                    w_row = jnp.take(weight, tok, axis=0).astype(hidden.dtype)
                    return (
                        jnp.dot(
                            hidden, w_row, preferred_element_type=jnp.float32
                        )
                        + bias[tok].astype(jnp.float32)
                    )

            def step_fn(token_ids, cache):
                hidden, cache = mbart_decoder.decoder_step(
                    params["decoder"], params["shared"], token_ids, cache,
                    self.config.decoder, self.dtype, beams=gen.num_beams,
                    enc_len=enc_len,
                )
                return hidden[:, 0, :], cache

            def head_topk(hidden, k):
                lp, ids, _ = _head(hidden, k)
                return lp, ids

            def head_token_lp(hidden, tok):
                # one weight ROW + the row lse (kernel pass with k=1)
                _, _, lse = _head(hidden, 1)
                return _tok_logit(hidden, tok) - lse[:, 0]

            head = search.CandidateHead(
                topk=head_topk, token_lp=head_token_lp,
                vocab_size=dec.vocab_size,
            )
        else:
            head = None

            def step_fn(token_ids, cache):
                return self.decode_step(
                    params, token_ids, cache, beams=gen.num_beams,
                    enc_len=enc_len,
                )

        forced = []
        if gen.forced_bos_token_id is not None:
            forced.append((1, gen.forced_bos_token_id))
        if gen.forced_eos_token_id is not None:
            forced.append((gen.max_length - 1, gen.forced_eos_token_id))
        spec = search.ProcessorSpec(
            forced=tuple(forced),
            min_length=gen.min_length,
            eos_token_id=dec.eos_token_id,
            no_repeat_ngram=gen.no_repeat_ngram_size,
        )
        warpers = build_warpers(
            temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p
        )
        return search.generate(
            step_fn, cache, batch,
            max_length=gen.max_length, start_token_id=start,
            eos_token_id=dec.eos_token_id, pad_token_id=dec.pad_token_id,
            num_beams=gen.num_beams, do_sample=gen.do_sample,
            spec=spec, warpers=warpers,
            length_penalty=gen.length_penalty, early_stopping=gen.early_stopping,
            rng=rng, head=head, cache_segments=cache_segments,
            eos_positions=eos_positions,
        )

    # -- persistence (full save/load lives in mic_tpu/io) --------------------

    def save_pretrained(self, directory: str, params: Params) -> None:
        from mic_tpu.io import checkpoint

        os.makedirs(directory, exist_ok=True)
        self.config.to_json(os.path.join(directory, "config.json"))
        checkpoint.save_params(directory, params)

    def push_to_hub(self, directory: str, repo_id: str, **kw) -> str:
        """Upload a `save_pretrained` directory to the HF Hub (reference:
        main.py:322-328). Requires network + credentials; see io/hub.py."""
        from mic_tpu.io.hub import push_to_hub

        return push_to_hub(directory, repo_id, **kw)

    @classmethod
    def from_pretrained(
        cls, directory: str, revision: Optional[str] = None, **kw
    ) -> tuple["Captioner", Params]:
        """Load a model — a local directory in either mic_tpu's own format
        (config.json + Orbax params) or a reference/HF fused checkpoint
        (config.json with clip_vision_config/mbart_config +
        flax_model.msgpack), auto-detected — or a hub repo id resolved to a
        cached snapshot (io/hub.py). Mirrors the reference's from_pretrained
        surface (modeling_clip_vision_utils.py:119-396)."""
        from mic_tpu.io import checkpoint
        from mic_tpu.io.hub import resolve_model_dir

        directory = resolve_model_dir(directory, revision=revision)
        if os.path.exists(os.path.join(directory, "flax_model.msgpack")):
            from mic_tpu.io.hf_import import load_fused_checkpoint

            config = CaptionerConfig.from_hf_json(
                os.path.join(directory, "config.json")
            )
            return cls(config, **kw), load_fused_checkpoint(directory)

        config = CaptionerConfig.from_json(os.path.join(directory, "config.json"))
        model = cls(config, **kw)
        params = checkpoint.load_params(directory)
        return model, params
