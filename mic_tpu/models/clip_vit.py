"""CLIP-style pre-LN vision transformer, TPU-first.

Behavioral spec (what the reference consumes): the CLIP ViT-B/32 vision tower
whose *un-normalized* last_hidden_state (CLS + 49 patch tokens, (B, 50, 768))
feeds the visual projection of the fused captioner
(reference: modeling_clip_vision_mbart.py:79-90 via HF FlaxCLIPVisionModule).

TPU-first design choices:
- the stride-P patch "convolution" is expressed as reshape + one big matmul
  (B·N, P·P·3) @ (P·P·3, H) — it lands straight on the MXU with no conv
  lowering, and imports HF conv kernels by a pure reshape;
- the 12 encoder layers are a single `lax.scan` over stacked params;
- LayerNorm/softmax in f32, matmuls in the configured compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mic_tpu.core.config import VisionConfig
from mic_tpu.nn.attention import init_mha, mha
from mic_tpu.nn.layers import (
    ACTIVATIONS,
    Params,
    dense,
    dropout,
    init_dense,
    init_layer_norm,
    layer_norm,
)
from mic_tpu.nn.stacked import init_stacked, scan_apply


class VisionOutput(NamedTuple):
    """Structured tower output (reference surface: output_hidden_states /
    output_attentions of FlaxCLIPVisionModule, consumed through
    modeling_clip_vision_mbart.py:447-510). Layer axes are stacked arrays,
    not tuples — jit/scan friendly: hidden_states (L+1, B, T, H) with the
    embeddings output first, attentions (L, B, heads, T, T)."""

    last_hidden_state: jnp.ndarray
    hidden_states: Optional[jnp.ndarray] = None
    attentions: Optional[jnp.ndarray] = None


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) NHWC image -> (B, N, patch*patch*C) non-overlapping patches.

    Flattening order per patch is (row, col, channel), matching an HF/Flax conv
    kernel reshaped from (P, P, C, D) to (P*P*C, D)."""
    b, h, w, c = pixels.shape
    x = pixels.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c)


def _init_layer(key, cfg: VisionConfig) -> Params:
    ka, k1, k2 = jax.random.split(key, 3)
    return {
        "ln1": init_layer_norm(cfg.hidden_size),
        "attn": init_mha(ka, cfg.hidden_size, cfg.num_heads),
        "ln2": init_layer_norm(cfg.hidden_size),
        "fc1": init_dense(k1, cfg.hidden_size, cfg.intermediate_size),
        "fc2": init_dense(k2, cfg.intermediate_size, cfg.hidden_size),
    }


def init_vision(key, cfg: VisionConfig) -> Params:
    kp, kc, kpos, kl = jax.random.split(key, 4)
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    patch = {"kernel": jax.random.normal(kp, (patch_dim, cfg.hidden_size)) * 0.02}
    if cfg.patch_bias:
        patch["bias"] = jnp.zeros((cfg.hidden_size,), jnp.float32)
    params = {
        "patch_embed": patch,
        "class_embed": jax.random.normal(kc, (cfg.hidden_size,)) * 0.02,
        "pos_embed": {
            "embedding": jax.random.normal(kpos, (cfg.seq_len, cfg.hidden_size)) * 0.02
        },
        "post_ln": init_layer_norm(cfg.hidden_size),
        "layers": init_stacked(kl, cfg.num_layers, lambda k: _init_layer(k, cfg)),
    }
    if cfg.use_pre_ln:
        params["pre_ln"] = init_layer_norm(cfg.hidden_size)
    return params


def apply_vision(
    params: Params,
    pixels: jnp.ndarray,
    cfg: VisionConfig,
    dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
    attn_impl: str = "xla",
    remat: bool = False,
    output_hidden_states: bool = False,
    output_attentions: bool = False,
):
    """pixels (B, image_size, image_size, 3) -> last_hidden_state (B, 1+N, H),
    or a VisionOutput when introspection outputs are requested."""
    # no hidden dropout in CLIP/ViT towers; attention-weight dropout only
    # (HF FlaxCLIPAttention config.attention_dropout semantics)
    if cfg.attention_dropout == 0.0:
        rng = None
    act = ACTIVATIONS[cfg.hidden_act]
    eps = cfg.layer_norm_eps

    patches = patchify(pixels.astype(dtype), cfg.patch_size)
    x = jnp.dot(patches, params["patch_embed"]["kernel"].astype(dtype),
                preferred_element_type=dtype)
    if "bias" in params["patch_embed"]:
        x = x + params["patch_embed"]["bias"].astype(dtype)
    cls = jnp.broadcast_to(
        params["class_embed"].astype(dtype)[None, None, :],
        (x.shape[0], 1, x.shape[-1]),
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"]["embedding"].astype(dtype)[None]
    if cfg.use_pre_ln:
        x = layer_norm(params["pre_ln"], x, eps)

    embeddings = x

    def layer(h, p, idx, _):
        lrng = jax.random.fold_in(rng, idx) if rng is not None else None
        ys = {}
        r = h
        h = layer_norm(p["ln1"], h, eps)
        h = mha(p["attn"], h, h, None, cfg.num_heads, impl=attn_impl,
                dropout_rate=cfg.attention_dropout, dropout_rng=lrng,
                return_weights=output_attentions)
        if output_attentions:
            h, ys["attn"] = h
        h = r + h
        r = h
        h = layer_norm(p["ln2"], h, eps)
        h = r + dense(p["fc2"], act(dense(p["fc1"], h)))
        if output_hidden_states:
            ys["hidden"] = h
        return h, ys

    x, ys = scan_apply(layer, x, params["layers"], remat=remat)
    if cfg.final_ln_output:  # ViT-style towers layernorm the whole output
        x = layer_norm(params["post_ln"], x, eps)
    # CLIP-style towers: post_ln applies only to the pooled CLS path
    if not (output_hidden_states or output_attentions):
        return x
    return VisionOutput(
        last_hidden_state=x,
        # HF convention: embeddings output + every layer's output (L+1, ...)
        hidden_states=(
            jnp.concatenate([embeddings[None], ys["hidden"]])
            if output_hidden_states else None
        ),
        attentions=ys["attn"] if output_attentions else None,
    )


def pooled_output(params: Params, last_hidden: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    """CLS token through post_layernorm (the CLIP pooled embedding)."""
    return layer_norm(params["post_ln"], last_hidden[:, 0, :], cfg.layer_norm_eps)
