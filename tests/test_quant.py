"""Int8 weight-only decode quantization: format, accuracy bound, e2e generate."""

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.models.captioner import Captioner
from mic_tpu.ops.quant import quantize_array, quantize_params_for_decode
import pytest


def test_quantize_array_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 0.1
    q, s = quantize_array(w, axis=0)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = q.astype(jnp.float32) * s[None, :]
    err = jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w))
    assert float(err) < 1 / 64  # half-step of 127 levels, relative to amax


def test_quantize_tree_shape_and_scope():
    model = Captioner(CaptionerConfig.tiny())
    params = model.init_params(jax.random.PRNGKey(0))
    qp = quantize_params_for_decode(params)
    # decoder kernels quantized (stacked: per (L, out) scales)
    lq = qp["decoder"]["layers"]["self_attn"]["q"]
    assert lq["kernel_q"].dtype == jnp.int8
    assert lq["kernel_scale"].shape == lq["kernel_q"].shape[:1] + lq["kernel_q"].shape[2:]
    assert "embedding_q" in qp["shared"]
    # vision untouched
    assert "kernel" in qp["vision"]["patch_embed"]
    # layernorms untouched
    assert "scale" in qp["decoder"]["ln_embed"]


@pytest.mark.slow
def test_generate_int8_close_to_fp():
    model = Captioner(CaptionerConfig.tiny())
    params = model.init_params(jax.random.PRNGKey(1))
    px = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32
    )
    fp = model.generate(params, px, max_length=8, num_beams=4)
    q8 = model.generate(params, px, max_length=8, num_beams=4, quantize="int8")
    assert q8.sequences.shape == fp.sequences.shape
    # scores should be close even if an occasional token flips on a tiny
    # random model; bound the score gap loosely
    np.testing.assert_allclose(
        np.asarray(q8.scores), np.asarray(fp.scores), atol=0.5
    )


@pytest.mark.slow
def test_teacher_forced_logits_close_after_quant():
    model = Captioner(CaptionerConfig.tiny())
    params = model.init_params(jax.random.PRNGKey(2))
    qp = quantize_params_for_decode(params)
    px = jnp.zeros((1, 32, 32, 3), jnp.float32)
    ids = jnp.arange(6, dtype=jnp.int32)[None] + 4
    mask = jnp.ones((1, 6), jnp.int32)
    a = model(params, px, ids, mask)
    b = model(qp, px, ids, mask)
    # int8 per-channel on a tiny model: logits deviate mildly
    assert float(jnp.max(jnp.abs(a - b))) < 0.15


@pytest.mark.slow
def test_kv_quant_int8_close_to_fp(monkeypatch):
    """int8 KV cache (LazyDecoderCache quant layout): beam outputs should
    match the fp cache on a model with clear logit margins (random tiny
    model, f32 — quantization noise ~0.4% must not flip decisions here)."""
    import jax
    import numpy as np

    from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
    from mic_tpu.models.captioner import Captioner

    config = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(vocab_size=64, max_position_embeddings=32),
        tie_word_embeddings=True,
    )
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(1))
    px = np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32)

    fp = model.generate(params, px, max_length=12, num_beams=4)
    q = model.generate(params, px, max_length=12, num_beams=4, kv_quant="int8")
    assert (np.asarray(fp.sequences) == np.asarray(q.sequences)).mean() > 0.9
    np.testing.assert_allclose(
        np.asarray(fp.scores), np.asarray(q.scores), rtol=0.1, atol=0.2
    )
