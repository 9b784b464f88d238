"""Golden-parity tests vs HuggingFace transformers modules on tiny configs.

The reference model is built from HF's FlaxCLIPVisionModule + FlaxMBartDecoder
(reference modeling_clip_vision_mbart.py:21-26); these tests pin our from-
scratch TPU implementation to the same numerics by importing HF weights via
mic_tpu.io.hf_import and comparing forward outputs in float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from transformers import CLIPVisionConfig, MBartConfig

from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
from mic_tpu.io import hf_import
from mic_tpu.models import clip_vit, mbart_decoder
from mic_tpu.models.captioner import Captioner

ATOL = 2e-5


def tiny_hf_clip_config():
    return CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=16,
    )


def tiny_hf_mbart_config(**kw):
    base = dict(
        vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        scale_embedding=True, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    )
    base.update(kw)
    return MBartConfig(**base)


@pytest.fixture(scope="module")
def hf_clip():
    from transformers import FlaxCLIPVisionModel

    return FlaxCLIPVisionModel(tiny_hf_clip_config(), seed=0)


@pytest.fixture(scope="module")
def hf_mbart():
    from transformers import FlaxMBartForConditionalGeneration

    return FlaxMBartForConditionalGeneration(tiny_hf_mbart_config(), seed=0)


def test_vision_parity_flax(hf_clip):
    cfg = VisionConfig.tiny()
    pixels = np.random.default_rng(0).normal(size=(3, 32, 32, 3)).astype(np.float32)
    ours = clip_vit.apply_vision(
        hf_import.from_hf_clip_flax(hf_clip.params), jnp.asarray(pixels), cfg
    )
    theirs = hf_clip(pixels.transpose(0, 3, 1, 2)).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs), atol=ATOL)


@pytest.mark.slow
def test_vision_parity_torch():
    import torch
    from transformers import CLIPVisionModel

    tm = CLIPVisionModel(tiny_hf_clip_config()).eval()
    params = hf_import.from_torch_clip_state_dict(tm.state_dict())
    pixels = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours = clip_vit.apply_vision(params, jnp.asarray(pixels), VisionConfig.tiny())
    with torch.no_grad():
        theirs = tm(torch.from_numpy(pixels.transpose(0, 3, 1, 2))).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-4)


@pytest.mark.slow
def test_decoder_lm_parity_flax(hf_mbart):
    """Our decoder+tied-lm-head vs HF decode() with injected encoder states."""
    shared, decoder, bias = hf_import.from_hf_mbart_flax(hf_mbart.params)
    cfg = DecoderConfig.tiny()
    rng = np.random.default_rng(2)
    B, T, S = 2, 7, 5
    enc = rng.normal(size=(B, S, cfg.d_model)).astype(np.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[0, 5:] = 0  # padded tail on row 0

    hidden = mbart_decoder.apply_decoder(
        decoder, shared, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(enc),
        None, cfg,
    )
    scale = cfg.d_model**0.5 if cfg.scale_embedding else 1.0
    del scale
    ours = jnp.dot(hidden, shared["embedding"].T) + bias

    out = hf_mbart.decode(
        decoder_input_ids=ids,
        encoder_outputs=(jnp.asarray(enc),),
        encoder_attention_mask=np.ones((B, S), np.int32),
        decoder_attention_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(out.logits), atol=ATOL)


@pytest.mark.slow
def test_fused_forward_parity(hf_clip, hf_mbart):
    """Full captioner forward == HF-composed oracle (clip -> proj -> decode)."""
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = hf_import.build_fused_params(hf_clip.params, hf_mbart.params)

    rng = np.random.default_rng(3)
    B, T = 2, 6
    pixels = rng.normal(size=(B, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, config.decoder.vocab_size, size=(B, T)).astype(np.int32)
    mask = np.ones((B, T), np.int32)

    ours = model(params, jnp.asarray(pixels), jnp.asarray(ids), jnp.asarray(mask))

    enc = hf_clip(pixels.transpose(0, 3, 1, 2)).last_hidden_state
    proj = np.asarray(enc) @ np.asarray(params["proj"]["kernel"]) + np.asarray(
        params["proj"]["bias"]
    )
    out = hf_mbart.decode(
        decoder_input_ids=ids,
        encoder_outputs=(jnp.asarray(proj),),
        encoder_attention_mask=np.ones((B, proj.shape[1]), np.int32),
        decoder_attention_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(out.logits), atol=ATOL)


@pytest.mark.slow
def test_cached_decode_matches_full_forward(hf_mbart):
    """Step-by-step cached decoding reproduces teacher-forced logits."""
    shared, decoder, bias = hf_import.from_hf_mbart_flax(hf_mbart.params)
    cfg = DecoderConfig.tiny()
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = {
        "shared": shared,
        "vision": model.init_params(jax.random.PRNGKey(0))["vision"],
        "proj": model.init_params(jax.random.PRNGKey(1))["proj"],
        "decoder": decoder,
        "final_logits_bias": bias,
    }
    rng = np.random.default_rng(4)
    B, T, S = 2, 6, 5
    enc = jnp.asarray(rng.normal(size=(B, S, cfg.d_model)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)).astype(np.int32))

    full = model.decode_train(params, enc, ids, jnp.ones((B, T), jnp.int32))

    cache = model.init_decode_cache(params, enc, max_length=T)
    step_logits = []
    for t in range(T):
        logits, cache = model.decode_step(params, ids[:, t : t + 1], cache)
        step_logits.append(logits)
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), atol=ATOL)


@pytest.mark.slow
def test_bf16_forward_runs():
    config = CaptionerConfig.tiny(dtype="bfloat16")
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    logits = model(
        params,
        jnp.zeros((2, 32, 32, 3), jnp.float32),
        jnp.zeros((2, 4), jnp.int32),
        jnp.ones((2, 4), jnp.int32),
    )
    assert logits.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(logits.astype(jnp.float32))))


@pytest.mark.slow
def test_attention_dropout_is_live():
    """config.attention_dropout must not be a silent no-op: with an rng it
    perturbs training logits stochastically (both towers), without an rng the
    forward is deterministic and equals the rate-0 model (HF Flax*Attention
    dropout semantics)."""
    base = CaptionerConfig.tiny()
    cfg = base.replace(
        vision=base.vision.replace(attention_dropout=0.5),
        decoder=base.decoder.replace(attention_dropout=0.5, dropout=0.0),
    )
    model = Captioner(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    px = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    ids = jnp.ones((2, 5), jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)

    a = model(params, px, ids, mask, rng=jax.random.PRNGKey(1))
    b = model(params, px, ids, mask, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b)), (
        "attention_dropout had no effect under rng"
    )

    det = model(params, px, ids, mask, rng=None)
    model0 = Captioner(base.replace(
        vision=base.vision.replace(attention_dropout=0.0),
        decoder=base.decoder.replace(attention_dropout=0.0, dropout=0.0),
    ))
    det0 = model0(params, px, ids, mask, rng=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(det), np.asarray(det0), rtol=1e-6)
