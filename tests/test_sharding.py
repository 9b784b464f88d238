"""Mesh/sharding tests on the 8-virtual-device CPU backend (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mic_tpu.core.config import CaptionerConfig, DecoderConfig, VisionConfig
from mic_tpu.models.captioner import Captioner
from mic_tpu.parallel.mesh import make_mesh
from mic_tpu.parallel.sharding import batch_sharding, param_specs, shard_params
from mic_tpu.train.loss import label_smoothed_cross_entropy
import pytest


def tp_friendly_config():
    return CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(vocab_size=128),
    )


def test_param_specs_rules():
    model = Captioner(tp_friendly_config())
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    specs = param_specs(params, model_axis_size=2)
    assert specs["shared"]["embedding"] == P("model", None)
    # stacked decoder attn kernels: (L, D, D) -> shard output dim
    assert specs["decoder"]["layers"]["self_attn"]["q"]["kernel"] == P(None, None, "model")
    assert specs["decoder"]["layers"]["self_attn"]["o"]["kernel"] == P(None, "model", None)
    assert specs["decoder"]["layers"]["fc1"]["kernel"] == P(None, None, "model")
    assert specs["decoder"]["layers"]["ln_self"]["scale"] == P()
    assert specs["final_logits_bias"] == P("model")


def test_fsdp_specs():
    """fsdp adds a "data" shard on the largest still-replicated divisible dim
    of every leaf, on top of the TP rules (ZeRO-3 weight layout)."""
    model = Captioner(tp_friendly_config())
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    specs = param_specs(params, model_axis_size=2, fsdp_axis_size=4)
    # embedding (V=128, D): vocab dim is TP-sharded, so fsdp takes the other
    assert specs["shared"]["embedding"] == P("model", "data")
    # stacked (L, D, D) q kernel: output dim TP-sharded, fsdp takes dim 1
    assert specs["decoder"]["layers"]["self_attn"]["q"]["kernel"] == P(None, "data", "model")
    # rule-less leaves get pure fsdp sharding (largest divisible dim)
    assert specs["decoder"]["layers"]["ln_self"]["scale"] == P(None, "data")
    # indivisible leaves stay replicated (rng key-sized (2,) etc.)
    from mic_tpu.parallel.sharding import spec_for
    assert spec_for("rng", (2,), 2, fsdp_axis_size=4) == P()
    assert spec_for("step", (), 2, fsdp_axis_size=4) == P()


@pytest.mark.slow
def test_fsdp_loss_matches_single_device():
    """FSDP-sharded params: same loss/grads as one device; state actually
    sharded over "data" (per-device bytes ~ total/dp)."""
    config = tp_friendly_config()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(config)
    loss_fn = _loss_fn(model)

    single = jax.jit(jax.value_and_grad(loss_fn))(params, batch)

    mesh = make_mesh(dp=4, tp=2)
    sharded_params = shard_params(params, mesh, fsdp=True)
    bshard = batch_sharding(mesh)
    dev_batch = jax.tree.map(lambda x: jax.device_put(x, bshard), batch)
    sharded = jax.jit(jax.value_and_grad(loss_fn))(sharded_params, dev_batch)

    np.testing.assert_allclose(float(single[0]), float(sharded[0]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(single[1]), jax.tree.leaves(sharded[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-4, rtol=1e-3
        )
    q = sharded_params["decoder"]["layers"]["self_attn"]["q"]["kernel"]
    assert q.sharding.spec == P(None, "data", "model")
    # each device holds 1/(dp*tp) of the fully-sharded leaf
    assert q.addressable_shards[0].data.nbytes == q.nbytes // 8


def test_divisibility_guard():
    model = Captioner(CaptionerConfig.tiny())  # vocab 99: odd
    params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
    specs = param_specs(params, model_axis_size=2)
    # vocab 99 not divisible by 2 -> embedding replicated (normalized to P())
    assert specs["shared"]["embedding"] == P()


def _loss_fn(model):
    def fn(params, batch):
        logits = model(
            params, batch["pixel_values"], batch["decoder_input_ids"],
            batch["decoder_attention_mask"],
        )
        return label_smoothed_cross_entropy(
            logits, batch["labels"], batch["decoder_attention_mask"], 0.1
        )

    return fn


def _batch(config, n=8):
    rng = np.random.default_rng(0)
    T = 6
    size = config.vision.image_size
    labels = rng.integers(4, config.decoder.vocab_size, size=(n, T)).astype(np.int32)
    return {
        "pixel_values": rng.normal(size=(n, size, size, 3)).astype(np.float32),
        "labels": labels,
        "decoder_input_ids": np.roll(labels, 1, axis=1),
        "decoder_attention_mask": np.ones((n, T), np.int32),
    }


@pytest.mark.slow
def test_dp_tp_loss_matches_single_device():
    """Same params+batch -> same loss and grads on dp=4 x tp=2 vs one device."""
    config = tp_friendly_config()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(config)
    loss_fn = _loss_fn(model)

    single = jax.jit(jax.value_and_grad(loss_fn))(params, batch)

    mesh = make_mesh(dp=4, tp=2)
    sharded_params = shard_params(params, mesh)
    bshard = batch_sharding(mesh)
    dev_batch = jax.tree.map(lambda x: jax.device_put(x, bshard), batch)
    sharded = jax.jit(jax.value_and_grad(loss_fn))(sharded_params, dev_batch)

    np.testing.assert_allclose(float(single[0]), float(sharded[0]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(single[1]), jax.tree.leaves(sharded[1])):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(jax.device_get(b)), atol=1e-4, rtol=1e-3
        )
    # check something actually sharded
    emb_shards = sharded_params["shared"]["embedding"].sharding
    assert emb_shards.spec == P("model", None)


@pytest.mark.slow
def test_generate_under_mesh():
    """Beam search works with params sharded over the 2-D mesh."""
    config = tp_friendly_config()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, tp=2)
    sharded_params = shard_params(params, mesh)
    px = jax.device_put(
        np.zeros((8, 32, 32, 3), np.float32), batch_sharding(mesh)
    )
    out = jax.jit(
        lambda p, x: model.generate(p, x, max_length=8, num_beams=4,
                                    forced_bos_token_id=5)
    )(sharded_params, px)
    assert out.sequences.shape == (8, 8)
    assert np.all(np.asarray(out.sequences)[:, 1] == 5)
