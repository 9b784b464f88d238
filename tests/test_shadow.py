"""Compute-dtype shadow params (mic_tpu/train/shadow.py).

Shadow leaves are exactly astype(master) — the same rounding the model's
per-use casts apply — f32-consumed leaves pass through, and use_shadow's
custom_vjp routes cotangents through the same astype the per-use cast
transpose applied.  Step outputs agree with the plain step to within XLA's
excess-precision noise: with the per-use casts, XLA's allow-excess-precision
pass sometimes ELIDES an f32->bf16->f32 chain (computing with unrounded f32
weights where the program asked for bf16); the materialized shadow pins the
bf16 rounding everywhere, so individual grads can differ by ~1 bf16 ulp of
accumulated value.  The shadow's own invariants (leaf == astype(master),
optimizer-emitted shadow == astype(new params)) hold bit-exactly.

Reference context: the reference's HF Flax modules cast per use
(/root/reference/models/flax_clip_vision_mbart/modeling_clip_vision_mbart.py
dtype plumbing); the shadow is the TPU-native restructuring of that cast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
from mic_tpu.models.captioner import Captioner
from mic_tpu.train.fused_adamw import apply_gradients
from mic_tpu.train.shadow import (
    cast_shadow, ce_embedding, shadow_spec, shadowed_params,
)
from mic_tpu.train.state import TrainState, make_optimizer
from mic_tpu.train.loss import label_smoothed_cross_entropy


def assert_close(a, b, rtol=2e-2):
    """Same-math-different-rounding comparison: elementwise rtol plus an
    atol scaled to the leaf's magnitude (a 1-ulp bf16 difference on a large
    element dwarfs a near-zero element's value)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(float(np.abs(a).max()), 1e-6)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=2e-3 * scale)


def tiny_model(dtype="bfloat16"):
    config = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(vocab_size=97),  # ragged vocab on purpose
        dtype=dtype,
    )
    return Captioner(config), config


def make_batch(config, b=4, t=8, seed=0):
    rng = np.random.default_rng(seed)
    s = config.vision.image_size
    return {
        "pixel_values": jnp.asarray(
            rng.integers(0, 255, size=(b, s, s, 3), dtype=np.uint8)
        ),
        "labels": jnp.asarray(
            rng.integers(4, config.decoder.vocab_size, size=(b, t))
        ).astype(jnp.int32),
        "decoder_input_ids": jnp.asarray(
            rng.integers(4, config.decoder.vocab_size, size=(b, t))
        ).astype(jnp.int32),
        "decoder_attention_mask": jnp.ones((b, t), jnp.int32),
    }


def test_shadow_spec_rules():
    model, config = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    spec = shadow_spec(params, jnp.bfloat16)
    # dense kernels are shadowed
    assert spec["proj"]["kernel"] is True
    # the shared embedding is shadowed (feeds the CE kernels via emb_cast)
    assert spec["shared"]["embedding"] is True
    # final_logits_bias is consumed in f32 by the CE loss
    assert spec["final_logits_bias"] is False
    # every LayerNorm {scale, bias} pair passes through (consumed in f32)
    def check_ln(node):
        if isinstance(node, dict):
            if "scale" in node and "kernel" not in node:
                assert all(v is False for v in node.values())
            else:
                for v in node.values():
                    check_ln(v)
    check_ln(spec)


def test_cast_shadow_bits():
    model, config = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0))
    spec = shadow_spec(params, jnp.bfloat16)
    shadow = cast_shadow(params, spec, jnp.bfloat16)
    flat_s, _ = jax.tree.flatten(shadow)
    flat_p, _ = jax.tree.flatten(params)
    flat_spec, _ = jax.tree.flatten(spec)
    for p, s, sh in zip(flat_p, flat_s, flat_spec):
        if sh:
            assert s.dtype == jnp.bfloat16
            np.testing.assert_array_equal(
                np.asarray(s), np.asarray(p.astype(jnp.bfloat16))
            )
        else:
            assert s is p  # zero-cost alias


def _loss_fn_factory(model, config, batch, shadow, emb_cast_on):
    from mic_tpu.ops.fused_ce import fused_lm_loss

    def loss_fn(params):
        cp = shadowed_params(params, shadow)
        pixels = batch["pixel_values"].astype(config.compute_dtype) / 255.0
        enc = model.encode(cp, pixels)
        hidden = model.decode_hidden(
            cp, enc, batch["decoder_input_ids"],
            batch["decoder_attention_mask"], None,
        )
        return fused_lm_loss(
            hidden, params["shared"]["embedding"],
            params["final_logits_bias"], batch["labels"],
            batch["decoder_attention_mask"], 0.1, 64,
            ce_embedding(shadow) if emb_cast_on else None,
        )

    return loss_fn


@pytest.mark.parametrize("flash", ["0", "dl"])
def test_shadow_loss_and_grads_match(monkeypatch, flash):
    """value_and_grad through the shadow == through the per-use casts (to
    within XLA excess-precision noise — see module docstring), on both the
    XLA chunked CE and the flash (interpret) CE paths."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", flash)
    model, config = tiny_model()
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    batch = make_batch(config)
    spec = shadow_spec(params, jnp.bfloat16)
    shadow = jax.jit(lambda p: cast_shadow(p, spec, jnp.bfloat16))(params)

    base = jax.jit(
        jax.value_and_grad(_loss_fn_factory(model, config, batch, None, False))
    )
    shad = jax.jit(
        jax.value_and_grad(_loss_fn_factory(model, config, batch, shadow,
                                            emb_cast_on=flash != "0"))
    )
    loss0, g0 = base(params)
    loss1, g1 = shad(params)
    np.testing.assert_allclose(
        np.asarray(loss0), np.asarray(loss1), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert_close(a, b)


def test_shadow_training_trajectory_matches(monkeypatch):
    """Three full optimizer steps: params and losses track the plain step
    (tight tolerance — excess-precision noise compounds slightly), and the
    emitted shadow is EXACTLY astype(new params)."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "dl")
    model, config = tiny_model()
    optimizer = make_optimizer(1e-3)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    spec = shadow_spec(params, jnp.bfloat16)

    def make_step(use_shadow):
        def step(state, batch):
            shadow = state.shadow if use_shadow else None
            loss_fn = _loss_fn_factory(model, config, batch, shadow,
                                       emb_cast_on=use_shadow)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            out = apply_gradients(
                optimizer, state.params, grads, state.opt_state,
                shadow_spec=spec if use_shadow else None,
                shadow_dtype=jnp.bfloat16,
            )
            shadow2 = out[2] if use_shadow else None
            return TrainState(out[0], out[1], state.step + 1,
                              state.dropout_rng, shadow2), loss
        return jax.jit(step)

    s_plain = TrainState.create(params, optimizer, 0)
    s_shadow = TrainState.create(params, optimizer, 0,
                                 shadow_dtype=jnp.bfloat16)
    step_plain, step_shadow = make_step(False), make_step(True)
    for i in range(3):
        batch = make_batch(config, seed=i + 1)
        s_plain, l0 = step_plain(s_plain, batch)
        s_shadow, l1 = step_shadow(s_shadow, batch)
        np.testing.assert_allclose(
            np.asarray(l0), np.asarray(l1), rtol=5e-4, atol=1e-5
        )
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_shadow.params)):
        # Adam normalizes by sqrt(v): on zero-init / near-zero-grad leaves a
        # 1-ulp grad difference can flip a whole update, so the honest
        # absolute bound is the worst-case update divergence 2 * steps * lr;
        # structural bugs (mis-wired shadow, stale casts) would show up at
        # weight magnitude (~0.02-1.0), far above it — and the losses above
        # already match to 5e-4
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=2e-2, atol=2 * 3 * 1e-3,
        )
    # the emitted shadow is exactly astype(new params) where shadowed
    for p, s, sh in zip(jax.tree.leaves(s_shadow.params),
                        jax.tree.leaves(s_shadow.shadow),
                        jax.tree.leaves(spec)):
        want = p.astype(jnp.bfloat16) if sh else p
        np.testing.assert_array_equal(np.asarray(s), np.asarray(want))


def test_full_logits_path_with_shadow():
    """The non-fused-CE loss (full logits through the model head) also
    matches bit-for-bit under the shadow."""
    model, config = tiny_model()
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    batch = make_batch(config)
    spec = shadow_spec(params, jnp.bfloat16)
    shadow = jax.jit(lambda p: cast_shadow(p, spec, jnp.bfloat16))(params)

    def loss_fn(params, shadow):
        cp = shadowed_params(params, shadow)
        pixels = batch["pixel_values"].astype(config.compute_dtype) / 255.0
        logits = model(cp, pixels, batch["decoder_input_ids"],
                       batch["decoder_attention_mask"])
        return label_smoothed_cross_entropy(
            logits, batch["labels"], batch["decoder_attention_mask"], 0.1
        )

    l0, g0 = jax.jit(jax.value_and_grad(loss_fn))(params, None)
    l1, g1 = jax.jit(jax.value_and_grad(loss_fn))(params, shadow)
    np.testing.assert_allclose(
        np.asarray(l0), np.asarray(l1), rtol=1e-4, atol=1e-6
    )
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert_close(a, b)


def test_emb_cast_matches_internal_cast(monkeypatch):
    """fused_lm_loss(emb_cast=precast) == fused_lm_loss() on the flash path:
    loss and (dh, demb, dbias) gradients, with a ragged vocab."""
    monkeypatch.setenv("MIC_TPU_FLASH_CE", "dl")
    from mic_tpu.ops.fused_ce import fused_lm_loss

    rng = np.random.default_rng(0)
    n, d, v = 16, 32, 97
    hidden = jnp.asarray(rng.normal(size=(2, 8, d)), jnp.bfloat16)
    emb = jnp.asarray(rng.normal(size=(v, d)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(v,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, size=(2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    def f(h, e, b, cast):
        return fused_lm_loss(h, e, b, labels, mask, 0.1, 64,
                             e.astype(h.dtype) if cast else None)

    l0, g0 = jax.value_and_grad(f, argnums=(0, 1, 2))(hidden, emb, bias, False)
    l1, g1 = jax.value_and_grad(f, argnums=(0, 1, 2))(hidden, emb, bias, True)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
