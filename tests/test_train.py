"""Training-stack tests: loss oracle, schedule, shift, end-to-end loop+resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.core.config import CaptionerConfig, DataConfig, TrainConfig
from mic_tpu.train.loss import label_smoothed_cross_entropy
from mic_tpu.train.schedule import linear_warmup_linear_decay
from mic_tpu.train.steps import shift_tokens_right


def reference_loss(logits, labels, mask, smoothing):
    """The reference's formula (main.py:658-680): smoothed one-hot + softmax CE
    minus normalizing constant, masked mean — in float64 numpy."""
    logits = logits.astype(np.float64)
    V = logits.shape[-1]
    conf = 1.0 - smoothing
    low = smoothing / (V - 1)
    onehot = np.full(logits.shape, low)
    np.put_along_axis(onehot, labels[..., None], conf, axis=-1)
    logz = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    ce = logz - (onehot * logits).sum(-1)
    norm = -(conf * np.log(conf) + (V - 1) * low * np.log(low + 1e-20)) if smoothing else 0.0
    loss = (ce - norm) * mask
    return loss.sum() / mask.sum()


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
def test_loss_matches_reference_formula(smoothing):
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 7, 33)).astype(np.float32)
    labels = rng.integers(0, 33, size=(4, 7))
    mask = (rng.random((4, 7)) > 0.3).astype(np.float32)
    mask[:, 0] = 1.0
    ours = label_smoothed_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), smoothing
    )
    np.testing.assert_allclose(
        float(ours), reference_loss(logits, labels, mask, smoothing), rtol=1e-5
    )


def test_schedule_boundaries():
    fn = linear_warmup_linear_decay(3e-4, total_steps=100, warmup_steps=10)
    assert float(fn(0)) == 0.0
    np.testing.assert_allclose(float(fn(10)), 3e-4, rtol=1e-6)
    np.testing.assert_allclose(float(fn(55)), 1.5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(fn(100)), 0.0, atol=1e-12)


def test_shift_tokens_right():
    ids = np.array([[5, 6, 7, 2, 1]], np.int32)
    out = shift_tokens_right(ids, pad_token_id=1)
    np.testing.assert_array_equal(out, [[1, 5, 6, 7, 2]])


# ---------------------------------------------------------------------------
# end-to-end training loop on synthetic data


def make_synthetic_dataset(tmp_path, n=32, size=48):
    from PIL import Image

    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    langs = ["en_XX", "fr_XX", "es_XX", "de_DE"]
    words = ["cat", "dog", "red", "blue", "house", "tree", "runs", "sleeps"]
    rows = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        name = f"img_{i}.png"
        Image.fromarray(arr).save(img_dir / name)
        caption = " ".join(rng.choice(words, size=4))
        rows.append(f"{name}\t{caption}\thttp://x\t{langs[i % 4]}")
    train_tsv = tmp_path / "train.tsv"
    train_tsv.write_text("\n".join(rows[:24]) + "\n")
    val_tsv = tmp_path / "val.tsv"
    val_tsv.write_text("\n".join(rows[24:]) + "\n")
    return str(train_tsv), str(val_tsv), str(img_dir)


def tiny_configs(tmp_path, train_tsv, val_tsv, img_dir, **tc_kw):
    model_config = CaptionerConfig.tiny()
    data_config = DataConfig(
        train_file=train_tsv, validation_file=val_tsv, images_dir=img_dir,
        max_seq_length=12, num_workers=0, decode_size=32,
    )
    base = dict(
        output_dir=str(tmp_path / "run"), num_epochs=2, per_device_batch_size=1,
        learning_rate=1e-3, warmup_steps=2, logging_steps=1, eval_steps=100,
        save_steps=3, save_total_limit=2, seed=0, gen_eval=False,
    )
    base.update(tc_kw)
    return model_config, data_config, TrainConfig(**base)


@pytest.mark.slow
def test_train_loop_and_resume(tmp_path):
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path)
    mc, dc, tc = tiny_configs(tmp_path, train_tsv, val_tsv, img_dir)
    trainer = Trainer(mc, dc, tc)
    state = trainer.train()
    trainer.ckpt.close()

    assert int(jax.device_get(state.step)) == 6  # 24 imgs / 8 devices / bs1 * 2 epochs
    assert os.path.exists(tc.output_dir + "/metrics.jsonl")
    assert os.path.exists(tc.output_dir + "/model/config.json")
    with open(tc.output_dir + "/metrics.jsonl") as f:
        lines = [l for l in f if '"train/loss"' in l]
    assert lines and np.isfinite(float(__import__("json").loads(lines[-1])["train/loss"]))

    # resume: a new trainer continues from the saved step, params identical
    trainer2 = Trainer(mc, dc, tc)
    loader, _ = trainer2.make_loaders()
    trainer2.build(len(loader))
    state2 = trainer2.init_or_resume(loader)
    assert int(jax.device_get(state2.step)) == 6
    a = jax.tree.leaves(jax.device_get(state.params))
    b = jax.tree.leaves(jax.device_get(state2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    trainer2.ckpt.close()


@pytest.mark.slow
def test_fsdp_train_matches_replicated(tmp_path):
    """TrainConfig.fsdp=True (ZeRO-3 state sharding over "data"): identical
    losses to the replicated-state run, state leaves actually sharded, and
    checkpoint save/resume round-trips the fsdp layout."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path)
    losses = {}
    for fsdp in (False, True):
        mc, dc, tc = tiny_configs(
            tmp_path, train_tsv, val_tsv, img_dir, fsdp=fsdp, num_epochs=1,
            output_dir=str(tmp_path / f"run_fsdp{int(fsdp)}"),
        )
        trainer = Trainer(mc, dc, tc)
        state = trainer.train()
        trainer.ckpt.close()
        with open(tc.output_dir + "/metrics.jsonl") as f:
            losses[fsdp] = [
                json.loads(l)["train/loss"] for l in f if '"train/loss"' in l
            ]
        if fsdp:
            # some leaf is genuinely sharded over "data"
            assert any(jax.tree.leaves(jax.tree.map(
                lambda x: "data" in tuple(x.sharding.spec), state.params)))
            # resume restores the fsdp-sharded state exactly
            trainer2 = Trainer(mc, dc, tc)
            loader, _ = trainer2.make_loaders()
            trainer2.build(len(loader))
            state2 = trainer2.init_or_resume(loader)
            for x, y in zip(jax.tree.leaves(jax.device_get(state.params)),
                            jax.tree.leaves(jax.device_get(state2.params))):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            trainer2.ckpt.close()
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-5)


@pytest.mark.slow
def test_resume_from_other_directory(tmp_path):
    """--resume_from must restore from an ARBITRARY run's checkpoints (the
    reference's restore_model_checkpoint, main.py:332-346, was dead code):
    train into dir A, resume into fresh dir B, bit-identical state; all three
    accepted path forms work; a bogus path errors instead of silently
    fresh-initializing."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path)
    mc, dc, tc = tiny_configs(tmp_path, train_tsv, val_tsv, img_dir,
                              output_dir=str(tmp_path / "run_a"))
    trainer = Trainer(mc, dc, tc)
    state = trainer.train()
    trainer.ckpt.close()
    step_a = int(jax.device_get(state.step))
    ref = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(state.params))]

    for path in (
        tc.output_dir,
        tc.output_dir + "/checkpoints",
        tc.output_dir + f"/checkpoints/{step_a}",
    ):
        tc_b = tc.replace(output_dir=str(tmp_path / "run_b"), resume_from=path)
        trainer_b = Trainer(mc, dc, tc_b)
        loader, _ = trainer_b.make_loaders()
        trainer_b.build(len(loader))
        state_b = trainer_b.init_or_resume(loader)
        assert int(jax.device_get(state_b.step)) == step_a
        for x, y in zip(ref, jax.tree.leaves(jax.device_get(state_b.params))):
            np.testing.assert_array_equal(x, np.asarray(y))
        trainer_b.ckpt.close()

    tc_bad = tc.replace(output_dir=str(tmp_path / "run_c"),
                        resume_from=str(tmp_path / "nowhere"))
    trainer_c = Trainer(mc, dc, tc_bad)
    loader, _ = trainer_c.make_loaders()
    trainer_c.build(len(loader))
    with pytest.raises(FileNotFoundError):
        trainer_c.init_or_resume(loader)
    trainer_c.ckpt.close()


@pytest.mark.slow
def test_checkpoint_data_position_not_skewed_by_prefetch(tmp_path):
    """The device-prefetch loop pulls batch N+1 before step N checkpoints; a
    mid-epoch save must still record the position of the batch actually
    trained on (resume must not skip a batch)."""
    import json as _json

    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path)
    # 24 train imgs / 8 devices / bs1 = 3 steps per epoch; save at step 2
    mc, dc, tc = tiny_configs(tmp_path, train_tsv, val_tsv, img_dir,
                              save_steps=2, num_epochs=1,
                              output_dir=str(tmp_path / "run_pf"))
    trainer = Trainer(mc, dc, tc)
    trainer.train()
    trainer.ckpt.close()
    with open(tc.output_dir + "/checkpoints/2/meta.json") as f:
        meta = _json.load(f)
    assert meta == {"epoch": 0, "next_batch": 2}, meta
    # end-of-training save records the completed epoch
    with open(tc.output_dir + "/checkpoints/3/meta.json") as f:
        meta3 = _json.load(f)
    assert meta3["epoch"] + (meta3["next_batch"] == 0) >= 1, meta3


@pytest.mark.slow
def test_eval_covers_ragged_tail(tmp_path):
    """Per-language eval splits smaller than (or not divisible by) the data
    axis must still be evaluated — padded and masked, never skipped. With 2
    examples per language on an 8-device mesh the old behavior skipped every
    batch and produced no eval metrics at all."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path)
    mc, dc, tc = tiny_configs(tmp_path, train_tsv, val_tsv, img_dir,
                              gen_eval=True)
    trainer = Trainer(mc, dc, tc)
    train_loader, eval_loaders = trainer.make_loaders()
    trainer.build(len(train_loader))
    state = trainer._init_state()
    metrics = trainer.evaluate(state.params, eval_loaders)
    trainer.ckpt.close()
    for lang in ("en_XX", "fr_XX", "es_XX", "de_DE"):
        assert f"{lang}/loss" in metrics, metrics.keys()
        assert np.isfinite(metrics[f"{lang}/loss"])
        assert f"{lang}/bleu-1" in metrics, metrics.keys()

    # the padding itself must not change the loss value: a weight-0 repeated
    # example contributes nothing to the masked mean
    batch = next(iter(eval_loaders["en_XX"].epoch_iterator(epoch=0)))
    padded, n_real = Trainer._pad_to_multiple(dict(batch), 8)
    assert padded["pixel_values"].shape[0] == 8 and n_real == 2
    np.testing.assert_array_equal(padded["loss_weight"], [1, 1, 0, 0, 0, 0, 0, 0])
    m_pad = trainer.p_eval_step(state.params, trainer._put_batch(padded))
    assert float(m_pad["ntok"]) == float(
        np.sum(batch["decoder_attention_mask"])
    )


@pytest.mark.slow
def test_loss_decreases_overfit(tmp_path):
    """2+ train steps on one repeated batch must reduce the loss."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path, n=8)
    mc, dc, tc = tiny_configs(
        tmp_path, train_tsv, train_tsv, img_dir, num_epochs=1,
        learning_rate=5e-3, warmup_steps=0,
    )
    trainer = Trainer(mc, dc, tc.replace(num_epochs=1))
    loader, _ = trainer.make_loaders()
    trainer.build(40)
    state = trainer._init_state()
    batch = next(loader.epoch_iterator(epoch=0))
    dev_batch = trainer._put_batch(batch)
    losses = []
    for _ in range(8):
        state, m = trainer.p_train_step(state, dev_batch)
        losses.append(float(m["loss"]))
    trainer.ckpt.close()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_remat_matches_no_remat(tmp_path):
    """remat policies must change memory, not math: identical first-step loss.

    "masks" saves the dropout masks across the per-layer checkpoint and
    "dots" saves matmul outputs — under the deterministic threefry PRNG both
    recompute to the same values, so every policy must match "none"."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path, n=8)
    losses = {}
    for remat in ("none", "full", "masks", "dots"):
        mc, dc, tc = tiny_configs(
            tmp_path, train_tsv, val_tsv, img_dir, num_epochs=1, remat=remat,
            output_dir=str(tmp_path / f"run_{remat}"),
        )
        trainer = Trainer(mc, dc, tc)
        loader, _ = trainer.make_loaders()
        trainer.build(10)
        state = trainer._init_state()
        batch = next(loader.epoch_iterator(epoch=0))
        state, m = trainer.p_train_step(state, trainer._put_batch(batch))
        # loss pins the forward; a post-update param leaf pins the backward
        losses[remat] = (
            float(m["loss"]),
            np.asarray(state.params["final_logits_bias"], np.float64),
        )
        trainer.ckpt.close()
    for remat in ("full", "masks", "dots"):
        np.testing.assert_allclose(
            losses["none"][0], losses[remat][0], rtol=1e-6, err_msg=remat
        )
        np.testing.assert_allclose(
            losses["none"][1], losses[remat][1], rtol=1e-5, atol=1e-7,
            err_msg=remat,
        )


@pytest.mark.slow
def test_shadow_restore_bit_equal_under_fsdp_tp(tmp_path):
    """VERDICT r4 item 4: with shadow params ACTIVE (bf16 compute dtype),
    train under fsdp + tp=2 on the CPU mesh, save, restore in a fresh
    trainer: master params bit-equal, and the REBUILT shadow (checkpoints
    strip it, trainer.py restore rebuilds) == astype(master) leaf-for-leaf."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path)
    mc, dc, tc = tiny_configs(
        tmp_path, train_tsv, val_tsv, img_dir, fsdp=True, tp=2, num_epochs=1,
        output_dir=str(tmp_path / "run_shadow_fsdp"),
    )
    mc = mc.replace(dtype="bfloat16")
    trainer = Trainer(mc, dc, tc)
    assert trainer.tc.shadow_params
    state = trainer.train()
    trainer.ckpt.close()
    assert state.shadow is not None  # shadow really was active

    trainer2 = Trainer(mc, dc, tc)
    loader, _ = trainer2.make_loaders()
    trainer2.build(len(loader))
    state2 = trainer2.init_or_resume(loader)

    for x, y in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(jax.device_get(state2.params))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # rebuilt shadow leaves == astype(master) where the spec shadows them
    flat_master = dict(jax.tree_util.tree_flatten_with_path(
        jax.device_get(state2.params))[0])
    n_checked = 0
    for path, sh in jax.tree_util.tree_flatten_with_path(
            jax.device_get(state2.shadow))[0]:
        # spec leaves are bf16-SHADOWED or f32 pass-through (f32-consumed
        # leaves like layer norms keep master precision — train/shadow.py)
        m = flat_master[path]
        np.testing.assert_array_equal(
            np.asarray(sh), np.asarray(m.astype(sh.dtype))
        )
        if sh.dtype == jnp.bfloat16:
            n_checked += 1
    assert n_checked > 0
    trainer2.ckpt.close()
