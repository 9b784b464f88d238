"""Extra generation invariants: early exit, padding after EOS, loader shards,
trainer profiler hook."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.models.captioner import Captioner


@pytest.mark.slow
def test_greedy_early_exit_pads_after_eos():
    """Force EOS at position 1: every row finishes immediately and the rest
    of the buffer stays PAD (the while_loop exits after 2 iterations)."""
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    px = jnp.zeros((3, 32, 32, 3), jnp.float32)
    eos = config.decoder.eos_token_id
    out = model.generate(
        params, px, max_length=12, num_beams=1,
        forced_bos_token_id=eos, forced_eos_token_id=None,
    )
    seqs = np.asarray(out.sequences)
    assert np.all(seqs[:, 1] == eos)
    assert np.all(seqs[:, 2:] == config.decoder.pad_token_id)


@pytest.mark.slow
def test_beam_early_stopping_flag_runs():
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(1))
    px = jnp.zeros((2, 32, 32, 3), jnp.float32)
    out = model.generate(
        params, px, max_length=8, num_beams=3, early_stopping=True,
        length_penalty=0.8,
    )
    assert out.sequences.shape == (2, 8)


def test_loader_process_shard_slices():
    from tests.test_data import make_tsv
    import pytest

    tmp = pytest.importorskip("pathlib").Path("/tmp/shard_test")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    tmp.mkdir(parents=True)
    tsv, img_dir = make_tsv(tmp)
    from mic_tpu.data.dataset import CaptionDataset
    from mic_tpu.data.loader import CaptionLoader
    from mic_tpu.data.tokenizer import SimpleTokenizer

    ds = CaptionDataset(tsv, img_dir)
    tk = SimpleTokenizer()
    full = list(
        CaptionLoader(ds, tk, 4, image_size=24, max_length=6, seed=5)
        .epoch_iterator(epoch=0)
    )
    shards = []
    for rank in range(2):
        loader = CaptionLoader(
            ds, tk, 4, image_size=24, max_length=6, seed=5,
            process_shard=(rank, 2),
        )
        shards.append(list(loader.epoch_iterator(epoch=0)))
    for b_full, b0, b1 in zip(full, shards[0], shards[1]):
        assert b0["labels"].shape[0] == 2 and b1["labels"].shape[0] == 2
        np.testing.assert_array_equal(
            np.concatenate([b0["labels"], b1["labels"]]), b_full["labels"]
        )


@pytest.mark.slow
def test_trainer_profile_steps_writes_trace(tmp_path):
    from tests.test_train import make_synthetic_dataset, tiny_configs
    from mic_tpu.train.trainer import Trainer

    train_tsv, val_tsv, img_dir = make_synthetic_dataset(tmp_path, n=16)
    mc, dc, tc = tiny_configs(
        tmp_path, train_tsv, val_tsv, img_dir, num_epochs=1,
        profile_steps="1:2", eval_steps=1000, save_steps=1000,
    )
    trainer = Trainer(mc, dc, tc)
    trainer.train()
    trainer.ckpt.close()
    prof_dir = os.path.join(tc.output_dir, "profile")
    assert os.path.isdir(prof_dir) and os.listdir(prof_dir)
