"""Full mBART-50 seq2seq (text encoder + decoder + tied LM head).

A second model family of the framework: the multilingual machine-translation
model the reference used (via HF) to build the 4-language CC12M caption set
(reference: data/CC12M_translate_MBart50.py:44-83).  tools/data/translate.py
drives it; it shares the decoder stack, KV cache, search, and sharding rules
with the captioner.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.config import DecoderConfig, GenerationConfig
from mic_tpu.generate import search
from mic_tpu.generate.processors import build_warpers
from mic_tpu.models import mbart_decoder, mbart_text
from mic_tpu.nn.cache import DecoderCache, init_cache
from mic_tpu.nn.layers import Params, init_embed


class MBartSeq2Seq:
    """Config-holder over pure functions; same design as Captioner."""

    def __init__(
        self,
        config: DecoderConfig,
        generation: GenerationConfig | None = None,
        dtype=jnp.float32,
        attn_impl: str = "xla",
        remat: bool = False,
    ):
        self.config = config
        self.generation = generation or GenerationConfig()
        self.dtype = jnp.dtype(dtype)
        self.attn_impl = attn_impl
        self.remat = remat

    def init_params(self, key: jax.Array) -> Params:
        cfg = self.config
        ks, ke, kd = jax.random.split(key, 3)
        return {
            "shared": init_embed(ks, cfg.vocab_size, cfg.d_model, cfg.init_std),
            "encoder": mbart_text.init_text_encoder(ke, cfg),
            "decoder": mbart_decoder.init_decoder(kd, cfg),
            "final_logits_bias": jnp.zeros((cfg.vocab_size,), jnp.float32),
        }

    def encode(self, params, input_ids, attention_mask, rng=None):
        return mbart_text.apply_text_encoder(
            params["encoder"], params["shared"], input_ids, attention_mask,
            self.config, self.dtype, rng, self.attn_impl, self.remat,
        )

    def lm_logits(self, params, hidden):
        logits = jnp.dot(
            hidden, params["shared"]["embedding"].T.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        return logits + params["final_logits_bias"].astype(self.dtype)

    def __call__(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        decoder_input_ids: jnp.ndarray,
        decoder_attention_mask: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        enc = self.encode(params, input_ids, attention_mask, rng)
        hidden = mbart_decoder.apply_decoder(
            params["decoder"], params["shared"],
            decoder_input_ids, decoder_attention_mask,
            enc, attention_mask, self.config,
            self.dtype, rng, self.attn_impl, self.remat,
        )
        return self.lm_logits(params, hidden)

    # -- generation -----------------------------------------------------------

    def generate(
        self,
        params: Params,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        **overrides,
    ) -> search.GenerateOutput:
        gen = self.generation.replace(**overrides)
        cfg = self.config
        if self.dtype != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(self.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
        batch = input_ids.shape[0]
        start = (
            gen.decoder_start_token_id
            if gen.decoder_start_token_id is not None
            else cfg.decoder_start_token_id
        )

        # true-batch encoder states/mask: cross K/V are stored once per source
        # sentence and shared across beams (grouped cross-attention)
        enc = self.encode(params, input_ids, attention_mask)
        cross_k, cross_v = mbart_decoder.init_cross_cache(
            params["decoder"], enc, cfg, self.dtype
        )
        cache = init_cache(
            cfg.num_layers, batch * gen.num_beams, gen.max_length, enc.shape[1],
            cfg.num_heads, cfg.head_dim, self.dtype,
        )._replace(cross_k=cross_k, cross_v=cross_v)

        def step_fn(token_ids, cache: DecoderCache):
            hidden, cache = mbart_decoder.decoder_step(
                params["decoder"], params["shared"], token_ids, cache,
                cfg, self.dtype, enc_mask=attention_mask, beams=gen.num_beams,
            )
            return self.lm_logits(params, hidden)[:, 0, :], cache

        forced = []
        if gen.forced_bos_token_id is not None:
            forced.append((1, gen.forced_bos_token_id))
        if gen.forced_eos_token_id is not None:
            forced.append((gen.max_length - 1, gen.forced_eos_token_id))
        spec = search.ProcessorSpec(
            forced=tuple(forced), min_length=gen.min_length,
            eos_token_id=cfg.eos_token_id,
        )
        return search.generate(
            step_fn, cache, batch,
            max_length=gen.max_length, start_token_id=start,
            eos_token_id=cfg.eos_token_id, pad_token_id=cfg.pad_token_id,
            num_beams=gen.num_beams, do_sample=gen.do_sample,
            spec=spec,
            warpers=build_warpers(temperature=gen.temperature, top_k=gen.top_k,
                                  top_p=gen.top_p),
            length_penalty=gen.length_penalty,
            early_stopping=gen.early_stopping, rng=rng,
        )
