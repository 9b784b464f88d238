"""mBART text encoder (pre-norm, learned positions offset 2), functional.

Together with the decoder (mic_tpu/models/mbart_decoder.py) this forms the
full mBART-50 seq2seq used by the reference's dataset-translation pipeline
(reference: data/CC12M_translate_MBart50.py via HF FlaxMBart) — rebuilt here
as a first-class model family of the framework.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.config import DecoderConfig
from mic_tpu.nn.attention import init_mha, mha
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
from mic_tpu.models.mbart_decoder import _site, embed_tokens


def _init_layer(key, cfg: DecoderConfig) -> Params:
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "ln_self": init_layer_norm(cfg.d_model),
        "self_attn": init_mha(ka, cfg.d_model, cfg.num_heads, cfg.init_std),
        "ln_mlp": init_layer_norm(cfg.d_model),
        "fc1": init_dense(k1, cfg.d_model, cfg.ffn_dim, cfg.init_std),
        "fc2": init_dense(k2, cfg.ffn_dim, cfg.d_model, cfg.init_std),
    }


def init_text_encoder(key, cfg: DecoderConfig) -> Params:
    """Encoder params WITHOUT the token embedding (shared table)."""
    kpos, kl = jax.random.split(key)
    return {
        "pos_embed": {
            "embedding": jax.random.normal(
                kpos, (cfg.max_position_embeddings + cfg.pos_offset, cfg.d_model)
            )
            * cfg.init_std
        },
        "ln_embed": init_layer_norm(cfg.d_model),
        "final_ln": init_layer_norm(cfg.d_model),
        "layers": init_stacked(kl, cfg.num_layers, lambda k: _init_layer(k, cfg)),
    }


def apply_text_encoder(
    params: Params,
    shared: Params,
    input_ids: jnp.ndarray,        # (B, S)
    attention_mask: jnp.ndarray,   # (B, S) 1 = real token
    cfg: DecoderConfig,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    remat: bool = False,
) -> jnp.ndarray:
    b, s = input_ids.shape
    eps = cfg.layer_norm_eps
    act = ACTIVATIONS[cfg.activation]

    positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
    x = embed_tokens(shared, input_ids, cfg, dtype)
    x = x + embed(params["pos_embed"], positions + cfg.pos_offset, dtype)
    x = layer_norm(params["ln_embed"], x, eps)
    x = dropout(x, cfg.dropout, _site(rng, 0))

    mask = attention_mask.astype(jnp.bool_)[:, None, None, :]  # (B,1,1,S)

    def layer(h, p, idx, _):
        lrng = jax.random.fold_in(rng, idx) if rng is not None else None
        r = h
        h = layer_norm(p["ln_self"], h, eps)
        h = mha(p["self_attn"], h, h, mask, cfg.num_heads, impl=attn_impl)
        h = r + dropout(h, cfg.dropout, _site(lrng, 1))
        r = h
        h = layer_norm(p["ln_mlp"], h, eps)
        h = act(dense(p["fc1"], h))
        h = dropout(h, cfg.activation_dropout, _site(lrng, 2))
        h = dense(p["fc2"], h)
        h = r + dropout(h, cfg.dropout, _site(lrng, 3))
        return h, None

    x, _ = scan_apply(layer, x, params["layers"], remat=remat)
    return layer_norm(params["final_ln"], x, eps)
