"""End-to-end learning test: the full stack (loader -> device preprocess ->
fused model -> label-smoothed loss -> adamw -> beam generation -> BLEU) must
LEARN a deterministic image->caption mapping, not just run.

Images are solid color patches; captions name the color. After a few hundred
steps the tiny captioner should generate the right captions (BLEU-1 ~ 1.0)."""

import os

import numpy as np
import pytest

from mic_tpu.core.config import (
    CaptionerConfig,
    DataConfig,
    DecoderConfig,
    TrainConfig,
    VisionConfig,
)

COLORS = {
    "red": (255, 0, 0),
    "green": (0, 255, 0),
    "blue": (0, 0, 255),
    "yellow": (255, 255, 0),
}


@pytest.fixture
def color_dataset(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = list(COLORS)
    rows = []
    for i in range(64):
        cname = names[i % 4]
        arr = np.zeros((32, 32, 3), np.uint8)
        arr[:] = COLORS[cname]
        arr = np.clip(
            arr.astype(int) + rng.integers(-12, 12, arr.shape), 0, 255
        ).astype(np.uint8)
        fname = f"i{i}.png"
        Image.fromarray(arr).save(img_dir / fname)
        rows.append(f"{fname}\ta {cname} square\turl\ten_XX")
    (tmp_path / "train.tsv").write_text("\n".join(rows[:48]))
    (tmp_path / "val.tsv").write_text("\n".join(rows[48:]))
    return tmp_path, str(img_dir)


@pytest.mark.slow
def test_captioner_learns_color_naming(color_dataset):
    from mic_tpu.train.trainer import Trainer

    tmp, img_dir = color_dataset
    mc = CaptionerConfig(
        vision=VisionConfig.tiny(),
        decoder=DecoderConfig.tiny(d_model=64, ffn_dim=128),
    )
    dc = DataConfig(
        train_file=str(tmp / "train.tsv"), validation_file=str(tmp / "val.tsv"),
        images_dir=img_dir, max_seq_length=8, num_workers=0, decode_size=32,
    )
    tc = TrainConfig(
        output_dir=str(tmp / "run"), num_epochs=60, per_device_batch_size=1,
        learning_rate=3e-3, warmup_steps=20, logging_steps=100,
        eval_steps=100000, save_steps=100000, seed=0, gen_eval=False,
    )
    trainer = Trainer(mc, dc, tc)
    state = trainer.train()

    trainer.tc = tc.replace(gen_eval=True)  # generate at final eval only
    metrics = trainer.evaluate(state.params, trainer.make_loaders()[1])
    trainer.ckpt.close()

    assert metrics["en_XX/loss"] < 0.25, metrics
    assert metrics["en_XX/bleu-1"] > 0.9, metrics

    # the exported model must caption a fresh image correctly via the CLI path
    from mic_tpu.models.captioner import Captioner
    from mic_tpu.data.tokenizer import SimpleTokenizer
    from mic_tpu.ops.image_prep import preprocess_images
    import jax.numpy as jnp

    model_dir = os.path.join(tc.output_dir, "model")
    model, params = Captioner.from_pretrained(model_dir)
    tk = SimpleTokenizer.load(os.path.join(model_dir, "tokenizer.json"))
    arr = np.zeros((1, 32, 32, 3), np.uint8)
    arr[:] = COLORS["blue"]
    px = preprocess_images(jnp.asarray(arr), 32)
    out = model.generate(
        params, px, max_length=8, num_beams=2,
        decoder_start_token_id=tk.pad_token_id,
        forced_bos_token_id=tk.lang_code_to_id["en_XX"],
    )
    text = tk.decode(np.asarray(out.sequences)[0])
    assert "blue" in text, text
