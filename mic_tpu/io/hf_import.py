"""Import HuggingFace checkpoints (CLIP / mBART / the fused captioner) into
mic_tpu's param tree.

Three sources are understood (reference surface:
modeling_clip_vision_utils.py:119-396 `from_pretrained` incl. from_pt, and
modeling_clip_vision_mbart.py:702-773 `from_clip_vision_mbart_pretrained`):

1. HF *Flax* param pytrees (e.g. ``FlaxCLIPVisionModel(...).params``) — used by
   the tiny-config golden-parity tests and by `flax_model.msgpack` files.
2. HF *PyTorch* state dicts (``pytorch_model.bin`` / ``model.safetensors``) —
   dense kernels are transposed (out,in)->(in,out), the patch conv kernel
   (D,3,P,P) is permuted+flattened to our (P*P*3, D) matmul layout.
3. On-disk checkpoint directories for both towers or the fused model.

Our layouts (see mic_tpu/models/*):
  vision:  patch_embed.kernel (P*P*3, H) | class_embed (H,) | pos_embed |
           pre_ln/post_ln | layers.* stacked (L, ...)
  decoder: pos_embed (max+2, D) | ln_embed | final_ln | layers.* stacked
  top:     shared.embedding (V, D) | proj | final_logits_bias (V,)
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

Params = dict


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _stack(trees: list) -> Params:
    """List of per-layer param dicts -> one dict with stacked (L, ...) leaves."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


def _ln(p: Mapping) -> Params:
    return {"scale": jnp.asarray(_np(p["scale"])), "bias": jnp.asarray(_np(p["bias"]))}


def _dense(p: Mapping) -> Params:
    out = {"kernel": jnp.asarray(_np(p["kernel"]))}
    if "bias" in p:
        out["bias"] = jnp.asarray(_np(p["bias"]))
    return out


def _mha(p: Mapping) -> Params:
    return {
        "q": _dense(p["q_proj"]),
        "k": _dense(p["k_proj"]),
        "v": _dense(p["v_proj"]),
        "o": _dense(p["out_proj"]),
    }


# ---------------------------------------------------------------------------
# 1. HF Flax pytrees -> ours


def from_hf_clip_flax(clip_params: Mapping) -> Params:
    """FlaxCLIPVisionModel.params -> our vision tree."""
    vm = clip_params["vision_model"]
    emb = vm["embeddings"]
    patch = _np(emb["patch_embedding"]["kernel"])  # (P, P, 3, H)
    p, _, c, h = patch.shape
    layers = vm["encoder"]["layers"]
    per_layer = []
    for i in range(len(layers)):
        li = layers[str(i)]
        per_layer.append(
            {
                "ln1": _ln(li["layer_norm1"]),
                "attn": _mha(li["self_attn"]),
                "ln2": _ln(li["layer_norm2"]),
                "fc1": _dense(li["mlp"]["fc1"]),
                "fc2": _dense(li["mlp"]["fc2"]),
            }
        )
    return {
        "patch_embed": {"kernel": jnp.asarray(patch.reshape(p * p * c, h))},
        "class_embed": jnp.asarray(_np(emb["class_embedding"])),
        "pos_embed": {"embedding": jnp.asarray(_np(emb["position_embedding"]["embedding"]))},
        "pre_ln": _ln(vm["pre_layrnorm"]),
        "post_ln": _ln(vm["post_layernorm"]),
        "layers": _stack(per_layer),
    }


def _decoder_layers_from_hf(layers: Mapping) -> Params:
    per_layer = []
    for i in range(len(layers)):
        li = layers[str(i)]
        per_layer.append(
            {
                "ln_self": _ln(li["self_attn_layer_norm"]),
                "self_attn": _mha(li["self_attn"]),
                "ln_cross": _ln(li["encoder_attn_layer_norm"]),
                "cross_attn": _mha(li["encoder_attn"]),
                "ln_mlp": _ln(li["final_layer_norm"]),
                "fc1": _dense(li["fc1"]),
                "fc2": _dense(li["fc2"]),
            }
        )
    return _stack(per_layer)


def from_hf_mbart_decoder_flax(decoder: Mapping) -> Params:
    return {
        "pos_embed": {"embedding": jnp.asarray(_np(decoder["embed_positions"]["embedding"]))},
        "ln_embed": _ln(decoder["layernorm_embedding"]),
        "final_ln": _ln(decoder["layer_norm"]),
        "layers": _decoder_layers_from_hf(decoder["layers"]),
    }


def from_hf_vit_flax(vit_params: Mapping) -> Params:
    """FlaxViTModel.params -> our vision tree (style: use_pre_ln=False,
    final_ln_output=True, patch_bias=True, hidden_act='gelu')."""
    emb = vit_params["embeddings"]
    patch = _np(emb["patch_embeddings"]["projection"]["kernel"])  # (P,P,C,D)
    p, _, c, h = patch.shape
    layers = vit_params["encoder"]["layer"]
    per_layer = []
    for i in range(len(layers)):
        li = layers[str(i)]
        att = li["attention"]["attention"]
        per_layer.append(
            {
                "ln1": _ln(li["layernorm_before"]),
                "attn": {
                    "q": _dense(att["query"]),
                    "k": _dense(att["key"]),
                    "v": _dense(att["value"]),
                    "o": _dense(li["attention"]["output"]["dense"]),
                },
                "ln2": _ln(li["layernorm_after"]),
                "fc1": _dense(li["intermediate"]["dense"]),
                "fc2": _dense(li["output"]["dense"]),
            }
        )
    return {
        "patch_embed": {
            "kernel": jnp.asarray(patch.reshape(p * p * c, h)),
            "bias": jnp.asarray(_np(emb["patch_embeddings"]["projection"]["bias"])),
        },
        "class_embed": jnp.asarray(_np(emb["cls_token"])).reshape(-1),
        "pos_embed": {
            "embedding": jnp.asarray(_np(emb["position_embeddings"])).reshape(
                -1, h
            )
        },
        "post_ln": _ln(vit_params["layernorm"]),
        "layers": _stack(per_layer),
    }


def from_hf_bart_flax(bart_params: Mapping) -> tuple[Params, Params, jnp.ndarray]:
    """FlaxBartForConditionalGeneration.params -> (shared, decoder, bias).
    BART decoders are post-norm with NO final layer_norm."""
    model = bart_params["model"] if "model" in bart_params else bart_params
    shared = {"embedding": jnp.asarray(_np(model["shared"]["embedding"]))}
    dec = model["decoder"]
    decoder = {
        "pos_embed": {"embedding": jnp.asarray(_np(dec["embed_positions"]["embedding"]))},
        "ln_embed": _ln(dec["layernorm_embedding"]),
        "layers": _decoder_layers_from_hf(dec["layers"]),
    }
    bias = bart_params.get("final_logits_bias")
    if bias is None:
        bias = np.zeros((shared["embedding"].shape[0],), np.float32)
    return shared, decoder, jnp.asarray(_np(bias)).reshape(-1)


def from_hf_mbart_encoder_flax(encoder: Mapping) -> Params:
    """HF FlaxMBart *text* encoder tree -> our mbart_text tree."""
    layers = encoder["layers"]
    per_layer = []
    for i in range(len(layers)):
        li = layers[str(i)]
        per_layer.append(
            {
                "ln_self": _ln(li["self_attn_layer_norm"]),
                "self_attn": _mha(li["self_attn"]),
                "ln_mlp": _ln(li["final_layer_norm"]),
                "fc1": _dense(li["fc1"]),
                "fc2": _dense(li["fc2"]),
            }
        )
    return {
        "pos_embed": {"embedding": jnp.asarray(_np(encoder["embed_positions"]["embedding"]))},
        "ln_embed": _ln(encoder["layernorm_embedding"]),
        "final_ln": _ln(encoder["layer_norm"]),
        "layers": _stack(per_layer),
    }


def from_hf_mbart_seq2seq_flax(mbart_params: Mapping) -> Params:
    """FlaxMBartForConditionalGeneration.params -> our MBartSeq2Seq tree."""
    model = mbart_params["model"] if "model" in mbart_params else mbart_params
    shared, decoder, bias = from_hf_mbart_flax(mbart_params)
    return {
        "shared": shared,
        "encoder": from_hf_mbart_encoder_flax(model["encoder"]),
        "decoder": decoder,
        "final_logits_bias": bias,
    }


def from_hf_mbart_flax(mbart_params: Mapping) -> tuple[Params, Params, jnp.ndarray]:
    """FlaxMBartForConditionalGeneration.params ->
    (shared, decoder, final_logits_bias)."""
    model = mbart_params["model"] if "model" in mbart_params else mbart_params
    shared = {"embedding": jnp.asarray(_np(model["shared"]["embedding"]))}
    decoder = from_hf_mbart_decoder_flax(model["decoder"])
    bias = mbart_params.get("final_logits_bias")
    if bias is None:
        bias = np.zeros((shared["embedding"].shape[0],), np.float32)
    return shared, decoder, jnp.asarray(_np(bias)).reshape(-1)


def from_hf_fused_flax(fused_params: Mapping) -> Params:
    """The published fused checkpoint's Flax tree -> our full param tree.
    (Layout per reference modeling_clip_vision_mbart.py:32-192: model.shared /
    model.encoder.vision_model / model.decoder / model.visual_projection /
    lm_head / final_logits_bias.)"""
    m = fused_params["model"]
    vision = from_hf_clip_flax(m["encoder"])
    decoder = from_hf_mbart_decoder_flax(m["decoder"])
    tree = {
        "shared": {"embedding": jnp.asarray(_np(m["shared"]["embedding"]))},
        "vision": vision,
        "proj": _dense(m["visual_projection"]),
        "decoder": decoder,
        "final_logits_bias": jnp.asarray(
            _np(fused_params["final_logits_bias"])
        ).reshape(-1),
    }
    return tree


def build_fused_params(
    clip_flax_params: Mapping, mbart_flax_params: Mapping, proj: Params | None = None,
) -> Params:
    """Graft two tower checkpoints into one captioner tree (the reference's
    `from_clip_vision_mbart_pretrained` fusion, modeling_clip_vision_mbart.py:
    768-770). `proj` stays random/given — it is trained from scratch."""
    import jax

    shared, decoder, bias = from_hf_mbart_flax(mbart_flax_params)
    vision = from_hf_clip_flax(clip_flax_params)
    if proj is None:
        d_in = vision["pre_ln"]["scale"].shape[0]
        d_out = shared["embedding"].shape[1]
        key = jax.random.PRNGKey(0)
        from mic_tpu.nn.layers import init_dense

        proj = init_dense(key, d_in, d_out, 0.02)
    return {
        "shared": shared,
        "vision": vision,
        "proj": proj,
        "decoder": decoder,
        "final_logits_bias": bias,
    }


# ---------------------------------------------------------------------------
# 2. torch state dicts -> HF-Flax-shaped trees (then reuse the maps above)


def _unflatten_torch(state_dict: Mapping[str, Any]) -> dict:
    """'a.b.c' -> nested dict, with torch Linear weights transposed to (in,out)
    flax 'kernel' layout and LayerNorm weight/bias renamed scale/bias."""
    tree: dict = {}
    for name, tensor in state_dict.items():
        arr = _np(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parts = name.split(".")
        leaf = parts[-1]
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if leaf == "weight":
            if arr.ndim == 2:
                node["kernel"] = arr.T
            elif arr.ndim == 4:  # conv (D, C, P, P) -> (P, P, C, D)
                node["kernel"] = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 1:  # LayerNorm weight
                node["scale"] = arr
            else:
                node["kernel"] = arr
        elif leaf == "bias":
            node["bias"] = arr
        else:
            node[leaf] = arr
    return tree


def _fix_embeddings(tree: dict) -> dict:
    """Embedding tables came through as 2-D 'kernel' (transposed); undo that
    for known embedding leaves."""
    def fix(node, name):
        if name in node and "kernel" in node[name]:
            node[name] = {"embedding": node[name]["kernel"].T}

    vm = tree.get("vision_model", {})
    if "embeddings" in vm:
        fix(vm["embeddings"], "position_embedding")
        emb = vm["embeddings"]
        if "class_embedding" in emb and isinstance(emb["class_embedding"], dict):
            emb["class_embedding"] = emb["class_embedding"].get("kernel")
        # patch conv has no transpose issue (4-D handled in _unflatten_torch)
        if "patch_embedding" in emb and "scale" in emb.get("patch_embedding", {}):
            emb["patch_embedding"] = {"kernel": emb["patch_embedding"]["scale"]}
    model = tree.get("model", tree)
    if "shared" in model:
        fix(model, "shared")
    for side in ("encoder", "decoder"):
        sub = model.get(side)
        if isinstance(sub, dict):
            fix(sub, "embed_positions")
            fix(sub, "embed_tokens")
    return tree


def from_torch_clip_state_dict(state_dict: Mapping) -> Params:
    tree = _fix_embeddings(_unflatten_torch(state_dict))
    return from_hf_clip_flax(tree)


def from_torch_mbart_state_dict(state_dict: Mapping):
    tree = _fix_embeddings(_unflatten_torch(state_dict))
    if "model" not in tree:
        tree = {"model": tree, "final_logits_bias": tree.pop("final_logits_bias", None)}
    shared_src = tree["model"].get("shared") or tree["model"]["decoder"].get("embed_tokens")
    tree["model"]["shared"] = shared_src
    return from_hf_mbart_flax(tree)


# ---------------------------------------------------------------------------
# 3. on-disk checkpoint directories


def _load_hf_weights_file(directory: str) -> Mapping:
    """Read flax msgpack / safetensors / torch bin from an HF model dir."""
    msgpack = os.path.join(directory, "flax_model.msgpack")
    if os.path.exists(msgpack):
        from flax.serialization import msgpack_restore

        with open(msgpack, "rb") as f:
            return {"format": "flax", "tree": msgpack_restore(f.read())}
    st = os.path.join(directory, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return {"format": "torch", "tree": load_file(st)}
    bin_path = os.path.join(directory, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        return {
            "format": "torch",
            "tree": torch.load(bin_path, map_location="cpu", weights_only=True),
        }
    raise FileNotFoundError(f"no weights file found under {directory}")


def load_pretrained_towers(clip_dir: str, mbart_dir: str) -> Params:
    """Fuse on-disk CLIP + mBART checkpoints into a captioner param tree
    (equivalent of reference from_clip_vision_mbart_pretrained)."""
    clip = _load_hf_weights_file(clip_dir)
    mbart = _load_hf_weights_file(mbart_dir)
    clip_tree = (
        clip["tree"]
        if clip["format"] == "flax"
        else _fix_embeddings(_unflatten_torch(clip["tree"]))
    )
    if mbart["format"] == "flax":
        shared, decoder, bias = from_hf_mbart_flax(mbart["tree"])
    else:
        shared, decoder, bias = from_torch_mbart_state_dict(mbart["tree"])
    vision = from_hf_clip_flax(clip_tree)
    import jax

    d_in = vision["pre_ln"]["scale"].shape[0]
    d_out = shared["embedding"].shape[1]
    from mic_tpu.nn.layers import init_dense

    return {
        "shared": shared,
        "vision": vision,
        "proj": init_dense(jax.random.PRNGKey(0), d_in, d_out, 0.02),
        "decoder": decoder,
        "final_logits_bias": bias,
    }


def load_fused_checkpoint(directory: str) -> Params:
    """Load the published fused checkpoint directory (config.json +
    flax_model.msgpack) into our tree."""
    blob = _load_hf_weights_file(directory)
    if blob["format"] != "flax":
        raise ValueError("fused checkpoints are expected in flax msgpack format")
    return from_hf_fused_flax(blob["tree"])
