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

from typing import Optional

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
) -> jnp.ndarray:
    """pixels (B, image_size, image_size, 3) -> last_hidden_state (B, 1+N, H)."""
    del rng  # CLIP vision tower has no hidden dropout
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

    def layer(h, p, idx, _):
        del idx
        r = h
        h = layer_norm(p["ln1"], h, eps)
        h = r + mha(p["attn"], h, h, None, cfg.num_heads, impl=attn_impl)
        r = h
        h = layer_norm(p["ln2"], h, eps)
        h = r + dense(p["fc2"], act(dense(p["fc1"], h)))
        return h, None

    x, _ = scan_apply(layer, x, params["layers"], remat=remat)
    if cfg.final_ln_output:  # ViT-style towers layernorm the whole output
        x = layer_norm(params["post_ln"], x, eps)
    return x  # CLIP-style towers: post_ln applies only to the pooled CLS path


def pooled_output(params: Params, last_hidden: jnp.ndarray, cfg: VisionConfig) -> jnp.ndarray:
    """CLS token through post_layernorm (the CLIP pooled embedding)."""
    return layer_norm(params["post_ln"], last_hidden[:, 0, :], cfg.layer_norm_eps)
