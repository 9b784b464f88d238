"""ViT+BART variant parity (reference secondary family models/flax_vit_bart):
same fused-captioner code path with tower-style knobs flipped."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
from mic_tpu.io import hf_import
from mic_tpu.models import clip_vit
from mic_tpu.models.captioner import Captioner

ATOL = 3e-5


def tiny_vit_config():
    from transformers import ViTConfig

    return ViTConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
    )


def tiny_bart_config():
    from transformers import BartConfig

    return BartConfig(
        vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        scale_embedding=False, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    )


def our_tiny_config():
    return CaptionerConfig(
        vision=VisionConfig.tiny(
            hidden_act="gelu", use_pre_ln=False, final_ln_output=True,
            patch_bias=True, layer_norm_eps=1e-12,
        ),
        decoder=DecoderConfig.tiny(
            scale_embedding=False, post_norm=True, use_final_ln=False,
        ),
    )


@pytest.fixture(scope="module")
def hf_vit():
    from transformers import FlaxViTModel

    return FlaxViTModel(tiny_vit_config(), seed=0)


@pytest.fixture(scope="module")
def hf_bart():
    from transformers import FlaxBartForConditionalGeneration

    return FlaxBartForConditionalGeneration(tiny_bart_config(), seed=0)


def test_vit_tower_parity(hf_vit):
    cfg = our_tiny_config().vision
    params = hf_import.from_hf_vit_flax(hf_vit.params)
    pixels = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = clip_vit.apply_vision(params, jnp.asarray(pixels), cfg)
    theirs = hf_vit(pixels.transpose(0, 3, 1, 2)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=ATOL)


@pytest.mark.slow
def test_vit_bart_fused_parity(hf_vit, hf_bart):
    config = our_tiny_config()
    model = Captioner(config)
    shared, decoder, bias = hf_import.from_hf_bart_flax(hf_bart.params)
    params = {
        "shared": shared,
        "vision": hf_import.from_hf_vit_flax(hf_vit.params),
        "proj": model.init_params(jax.random.PRNGKey(0))["proj"],
        "decoder": decoder,
        "final_logits_bias": bias,
    }
    rng = np.random.default_rng(1)
    B, T = 2, 6
    pixels = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 99, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)

    ours = model(params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))

    enc = hf_vit(pixels.transpose(0, 3, 1, 2)).last_hidden_state
    proj = np.asarray(enc) @ np.asarray(params["proj"]["kernel"]) + np.asarray(
        params["proj"]["bias"]
    )
    out = hf_bart.decode(
        decoder_input_ids=ids,
        encoder_outputs=(jnp.asarray(proj),),
        encoder_attention_mask=np.ones((B, proj.shape[1]), np.int32),
        decoder_attention_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(out.logits), atol=ATOL)


@pytest.mark.slow
def test_vit_bart_generate_cache_consistency(hf_vit, hf_bart):
    """Post-norm decoder: cached decode == teacher-forced forward."""
    config = our_tiny_config()
    model = Captioner(config)
    shared, decoder, bias = hf_import.from_hf_bart_flax(hf_bart.params)
    params = {
        "shared": shared,
        "vision": hf_import.from_hf_vit_flax(hf_vit.params),
        "proj": model.init_params(jax.random.PRNGKey(0))["proj"],
        "decoder": decoder,
        "final_logits_bias": bias,
    }
    rng = np.random.default_rng(2)
    px = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 99, size=(2, 5)).astype(np.int32))
    enc = model.encode(params, px)
    full = model.decode_train(params, enc, ids, jnp.ones((2, 5), jnp.int32))
    cache = model.init_decode_cache(params, enc, max_length=5)
    outs = []
    for t in range(5):
        logits, cache = model.decode_step(params, ids[:, t : t + 1], cache)
        outs.append(logits)
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, 1)), np.asarray(full), atol=ATOL
    )
