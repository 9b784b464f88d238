"""MBartSeq2Seq (text encoder + decoder) parity vs HF FlaxMBart and
generation smoke (the translation model family, reference
data/CC12M_translate_MBart50.py)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from mic_tpu.core.config import DecoderConfig, GenerationConfig
from mic_tpu.io import hf_import
from mic_tpu.models.mbart_seq2seq import MBartSeq2Seq


@pytest.fixture(scope="module")
def hf_model():
    from transformers import FlaxMBartForConditionalGeneration, MBartConfig

    cfg = MBartConfig(
        vocab_size=99, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, max_position_embeddings=64,
        scale_embedding=True, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    )
    return FlaxMBartForConditionalGeneration(cfg, seed=0)


@pytest.fixture(scope="module")
def ours(hf_model):
    model = MBartSeq2Seq(DecoderConfig.tiny())
    params = hf_import.from_hf_mbart_seq2seq_flax(hf_model.params)
    return model, params


@pytest.mark.slow
def test_seq2seq_forward_parity(hf_model, ours):
    model, params = ours
    rng = np.random.default_rng(0)
    B, S, T = 2, 9, 7
    input_ids = rng.integers(4, 99, size=(B, S)).astype(np.int32)
    attn = np.ones((B, S), np.int32)
    attn[1, 6:] = 0
    dec_ids = rng.integers(4, 99, size=(B, T)).astype(np.int32)
    dec_attn = np.ones((B, T), np.int32)

    got = model(params, jnp.asarray(input_ids), jnp.asarray(attn),
                jnp.asarray(dec_ids), jnp.asarray(dec_attn))
    want = hf_model(
        input_ids=input_ids, attention_mask=attn,
        decoder_input_ids=dec_ids, decoder_attention_mask=dec_attn,
    ).logits
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.slow
def test_seq2seq_generate_smoke(ours):
    model, params = ours
    rng = np.random.default_rng(1)
    input_ids = jnp.asarray(rng.integers(4, 99, size=(3, 8)).astype(np.int32))
    attn = jnp.ones((3, 8), jnp.int32)
    out = model.generate(
        params, input_ids, attn, max_length=10, num_beams=4,
        forced_bos_token_id=7,
    )
    assert out.sequences.shape == (3, 10)
    assert np.all(np.asarray(out.sequences)[:, 1] == 7)
    # beam output scores are finite and ordered vs greedy
    greedy = model.generate(params, input_ids, attn, max_length=10, num_beams=1,
                            forced_bos_token_id=7)
    assert np.all(np.isfinite(np.asarray(out.scores)))
    assert np.all(np.isfinite(np.asarray(greedy.scores)))


@pytest.mark.slow
def test_seq2seq_respects_source_padding(ours):
    """Padding the source must not change outputs vs the unpadded source."""
    model, params = ours
    rng = np.random.default_rng(2)
    ids = rng.integers(4, 99, size=(1, 6)).astype(np.int32)
    attn = np.ones((1, 6), np.int32)
    padded = np.concatenate([ids, np.ones((1, 3), np.int32)], axis=1)
    pattn = np.concatenate([attn, np.zeros((1, 3), np.int32)], axis=1)

    a = model.generate(params, jnp.asarray(ids), jnp.asarray(attn), max_length=8)
    b = model.generate(params, jnp.asarray(padded), jnp.asarray(pattn), max_length=8)
    np.testing.assert_array_equal(np.asarray(a.sequences), np.asarray(b.sequences))
