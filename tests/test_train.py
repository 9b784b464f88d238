"""Training-stack tests: loss oracle, schedule, shift, end-to-end loop+resume."""

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


def test_remat_matches_no_remat(tmp_path):
    """remat='full' must change memory, not math: identical first-step loss."""
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path, n=8)
    losses = {}
    for remat in ("none", "full"):
        mc, dc, tc = tiny_configs(
            tmp_path, train_tsv, val_tsv, img_dir, num_epochs=1, remat=remat,
            output_dir=str(tmp_path / f"run_{remat}"),
        )
        trainer = Trainer(mc, dc, tc)
        loader, _ = trainer.make_loaders()
        trainer.build(10)
        state = trainer._init_state()
        batch = next(loader.epoch_iterator(epoch=0))
        _, m = trainer.p_train_step(state, trainer._put_batch(batch))
        losses[remat] = float(m["loss"])
        trainer.ckpt.close()
    np.testing.assert_allclose(losses["none"], losses["full"], rtol=1e-6)
