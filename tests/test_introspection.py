"""Introspection outputs: output_hidden_states / output_attentions parity
with the reference's structured __call__/encode surface
(modeling_clip_vision_mbart.py:447-510), as jit-compatible stacked arrays."""

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.models.captioner import Captioner, CaptionerOutput, EncodeOutput
import pytest


def _setup():
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    px = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    ids = jnp.asarray([[4, 5, 6, 7], [8, 9, 2, 1]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1], [1, 1, 1, 0]], jnp.int32)
    return config, model, params, px, ids, mask


@pytest.mark.slow
def test_call_introspection_shapes_and_logit_parity():
    config, model, params, px, ids, mask = _setup()
    v, d = config.vision, config.decoder
    B, T, S = 2, 4, v.seq_len

    @jax.jit
    def run(params):
        return model(params, px, ids, mask,
                     output_hidden_states=True, output_attentions=True)

    out = run(params)
    assert isinstance(out, CaptionerOutput)
    assert out.logits.shape == (B, T, d.vocab_size)
    assert out.encoder_last_hidden_state.shape == (B, S, d.d_model)
    assert out.encoder_hidden_states.shape == (v.num_layers + 1, B, S, v.hidden_size)
    assert out.encoder_attentions.shape == (v.num_layers, B, v.num_heads, S, S)
    assert out.decoder_hidden_states.shape == (d.num_layers + 1, B, T, d.d_model)
    assert out.decoder_attentions.shape == (d.num_layers, B, d.num_heads, T, T)
    assert out.cross_attentions.shape == (d.num_layers, B, d.num_heads, T, S)

    plain = model(params, px, ids, mask)
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(plain), rtol=2e-5, atol=2e-5
    )
    # post-softmax rows sum to 1; causal row 0 attends only position 0
    np.testing.assert_allclose(
        np.asarray(out.decoder_attentions.sum(-1)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.decoder_attentions[:, :, :, 0, 0]), 1.0, atol=1e-5
    )
    # final decoder hidden state is the post-LN last_hidden (HF convention):
    # its LM projection equals the logits
    np.testing.assert_allclose(
        np.asarray(model.lm_logits(params, out.decoder_hidden_states[-1])),
        np.asarray(out.logits), rtol=2e-5, atol=2e-5,
    )


def test_encode_introspection():
    config, model, params, px, _, _ = _setup()
    v = config.vision
    out = jax.jit(
        lambda p: model.encode(p, px, output_hidden_states=True,
                               output_attentions=True)
    )(params)
    assert isinstance(out, EncodeOutput)
    plain = model.encode(params, px)
    np.testing.assert_allclose(
        np.asarray(out.last_hidden_state), np.asarray(plain), rtol=2e-5, atol=2e-5
    )
    assert out.hidden_states.shape[0] == v.num_layers + 1
    np.testing.assert_allclose(np.asarray(out.attentions.sum(-1)), 1.0, atol=1e-5)
