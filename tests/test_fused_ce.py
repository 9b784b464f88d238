"""Fused chunked LM-head cross-entropy == unfused logits+CE, values and grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.ops.fused_ce import fused_lm_loss
from mic_tpu.train.loss import label_smoothed_cross_entropy


def setup(seed=0, B=2, T=11, D=16, V=37):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    hidden = jax.random.normal(ks[0], (B, T, D), jnp.float32)
    emb = jax.random.normal(ks[1], (V, D), jnp.float32) * 0.5
    bias = jax.random.normal(ks[2], (V,), jnp.float32) * 0.1
    rng = np.random.default_rng(seed)
    labels = jnp.asarray(rng.integers(0, V, size=(B, T)).astype(np.int32))
    mask = jnp.asarray((rng.random((B, T)) > 0.2).astype(np.int32)).at[:, 0].set(1)
    return hidden, emb, bias, labels, mask


def unfused(hidden, emb, bias, labels, mask, smoothing):
    logits = jnp.einsum("btd,vd->btv", hidden, emb) + bias
    return label_smoothed_cross_entropy(logits, labels, mask, smoothing)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("chunk", [4, 8, 64])  # incl. chunk > N with padding
def test_loss_and_grads_match_unfused(smoothing, chunk):
    hidden, emb, bias, labels, mask = setup()

    f_fused = lambda h, e, b: fused_lm_loss(h, e, b, labels, mask, smoothing, chunk)
    f_ref = lambda h, e, b: unfused(h, e, b, labels, mask, smoothing)

    loss_a, grads_a = jax.value_and_grad(f_fused, argnums=(0, 1, 2))(hidden, emb, bias)
    loss_b, grads_b = jax.value_and_grad(f_ref, argnums=(0, 1, 2))(hidden, emb, bias)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for a, b in zip(grads_a, grads_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_trainer_fused_matches_unfused_loss(tmp_path):
    """End-to-end: one train step with fused_ce on/off gives the same loss."""
    from tests.test_train import make_synthetic_dataset, tiny_configs
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path, n=8)
    losses = {}
    for fused in (True, False):
        mc, dc, tc = tiny_configs(
            tmp_path, train_tsv, val_tsv, img_dir, num_epochs=1,
            fused_ce=fused, ce_chunk=16,
            output_dir=str(tmp_path / f"run_{fused}"),
        )
        trainer = Trainer(mc, dc, tc)
        loader, _ = trainer.make_loaders()
        trainer.build(10)
        state = trainer._init_state()
        batch = next(loader.epoch_iterator(epoch=0))
        _, m = trainer.p_train_step(state, trainer._put_batch(batch))
        losses[fused] = float(m["loss"])
        trainer.ckpt.close()
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
