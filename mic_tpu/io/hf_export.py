"""Export a trained captioner to the reference's HF checkpoint format.

Writes a directory loadable by the reference's
``FlaxCLIPVisionMBartForConditionalGeneration.from_pretrained``
(modeling_clip_vision_utils.py:119-396): ``config.json`` with the nested
``clip_vision_config`` / ``mbart_config`` keys (configuration_clip_vision_
mbart.py:33-51) and ``flax_model.msgpack`` with the exact param tree layout of
the published checkpoint (model/shared, model/encoder/vision_model/...,
model/decoder, model/visual_projection, lm_head, final_logits_bias).

The inverse of mic_tpu/io/hf_import.py's ``from_hf_fused_flax`` — round-trip
tested in tests/test_hf_export.py.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.nn.layers import Params


def _np32(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), dtype=np.float32)


def _unstack(stacked: Params) -> list[Params]:
    leaves, treedef = jax.tree_util.tree_flatten(stacked)
    n = leaves[0].shape[0]
    return [
        jax.tree_util.tree_unflatten(treedef, [leaf[i] for leaf in leaves])
        for i in range(n)
    ]


def _ln(p) -> dict:
    return {"scale": _np32(p["scale"]), "bias": _np32(p["bias"])}


def _dense(p) -> dict:
    out = {"kernel": _np32(p["kernel"])}
    if "bias" in p:
        out["bias"] = _np32(p["bias"])
    return out


def _mha(p) -> dict:
    return {
        "q_proj": _dense(p["q"]),
        "k_proj": _dense(p["k"]),
        "v_proj": _dense(p["v"]),
        "out_proj": _dense(p["o"]),
    }


def _vision_to_hf(vision: Params, patch_size: int) -> dict:
    kernel = _np32(vision["patch_embed"]["kernel"])
    d = kernel.shape[-1]
    layers = {}
    for i, li in enumerate(_unstack(vision["layers"])):
        layers[str(i)] = {
            "layer_norm1": _ln(li["ln1"]),
            "self_attn": _mha(li["attn"]),
            "layer_norm2": _ln(li["ln2"]),
            "mlp": {"fc1": _dense(li["fc1"]), "fc2": _dense(li["fc2"])},
        }
    return {
        "vision_model": {
            "embeddings": {
                "class_embedding": _np32(vision["class_embed"]),
                "patch_embedding": {
                    "kernel": kernel.reshape(patch_size, patch_size, 3, d)
                },
                "position_embedding": {
                    "embedding": _np32(vision["pos_embed"]["embedding"])
                },
            },
            "pre_layrnorm": _ln(vision["pre_ln"]),
            "post_layernorm": _ln(vision["post_ln"]),
            "encoder": {"layers": layers},
        }
    }


def _decoder_to_hf(decoder: Params) -> dict:
    layers = {}
    for i, li in enumerate(_unstack(decoder["layers"])):
        layers[str(i)] = {
            "self_attn_layer_norm": _ln(li["ln_self"]),
            "self_attn": _mha(li["self_attn"]),
            "encoder_attn_layer_norm": _ln(li["ln_cross"]),
            "encoder_attn": _mha(li["cross_attn"]),
            "final_layer_norm": _ln(li["ln_mlp"]),
            "fc1": _dense(li["fc1"]),
            "fc2": _dense(li["fc2"]),
        }
    return {
        "embed_positions": {"embedding": _np32(decoder["pos_embed"]["embedding"])},
        "layernorm_embedding": _ln(decoder["ln_embed"]),
        "layer_norm": _ln(decoder["final_ln"]),
        "layers": layers,
    }


def export_hf_fused(params: Params, config: CaptionerConfig, directory: str) -> None:
    """Write <directory>/{config.json, flax_model.msgpack} in the reference's
    published-checkpoint format."""
    from flax.serialization import msgpack_serialize

    os.makedirs(directory, exist_ok=True)
    shared = _np32(params["shared"]["embedding"])
    tree = {
        "model": {
            "shared": {"embedding": shared},
            "encoder": _vision_to_hf(params["vision"], config.vision.patch_size),
            "decoder": _decoder_to_hf(params["decoder"]),
            "visual_projection": _dense(params["proj"]),
        },
        # tied lm_head: the reference stores the transposed shared table
        "lm_head": {"kernel": shared.T},
        "final_logits_bias": _np32(params["final_logits_bias"]).reshape(1, -1),
    }
    with open(os.path.join(directory, "flax_model.msgpack"), "wb") as f:
        f.write(msgpack_serialize(tree))

    v, d, g = config.vision, config.decoder, config.generation
    hf_config = {
        "model_type": "clip-vision-mbart",
        "is_encoder_decoder": True,
        "tie_word_embeddings": config.tie_word_embeddings,
        "clip_vision_config": {
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_layers,
            "num_attention_heads": v.num_heads,
            "image_size": v.image_size,
            "patch_size": v.patch_size,
            "layer_norm_eps": v.layer_norm_eps,
            "hidden_act": v.hidden_act,
        },
        "mbart_config": {
            "vocab_size": d.vocab_size,
            "d_model": d.d_model,
            "decoder_ffn_dim": d.ffn_dim,
            "decoder_layers": d.num_layers,
            "decoder_attention_heads": d.num_heads,
            "max_position_embeddings": d.max_position_embeddings,
            "scale_embedding": d.scale_embedding,
            "activation_function": d.activation,
            "dropout": d.dropout,
            "pad_token_id": d.pad_token_id,
            "bos_token_id": d.bos_token_id,
            "eos_token_id": d.eos_token_id,
            "decoder_start_token_id": d.decoder_start_token_id,
            # generate defaults: the reference pulls these from the loaded
            # checkpoint's mbart_config (generation_clip_vision_utils.py:
            # 205-229), so exporting them makes the reference decode our
            # checkpoints with the settings they were validated under.
            "max_length": g.max_length,
            "min_length": g.min_length,
            "num_beams": g.num_beams,
            "do_sample": g.do_sample,
            "temperature": g.temperature,
            "top_k": g.top_k,
            "top_p": g.top_p,
            "length_penalty": g.length_penalty,
            "early_stopping": g.early_stopping,
            "forced_bos_token_id": g.forced_bos_token_id,
            "forced_eos_token_id": g.forced_eos_token_id,
        },
    }
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(hf_config, f, indent=2)
