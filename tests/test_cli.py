"""End-to-end CLI tests: the standalone evaluate/caption entry points.

Drives the actual arg plumbing (a regression there previously could not fail
the suite), the mesh sharding (8 virtual devices — the CLIs replicate params
onto a data mesh like the reference's pmapped eval, evaluation.py:78-107),
ragged-tail padding, and all three decode start conventions.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.data.tokenizer import SimpleTokenizer
from mic_tpu.models.captioner import Captioner

LANGS = ["en_XX", "fr_XX", "es_XX", "de_DE"]
CAPS = [
    "a red cat", "a blue dog", "green tree house",
    "dog runs fast", "cat sleeps", "red house",
]


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    """Tiny saved model + tokenizer + 6-row TSV (ragged per-language splits)."""
    from PIL import Image

    tmp_path = tmp_path_factory.mktemp("cli")
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))
    model_dir = tmp_path / "model"
    model.save_pretrained(str(model_dir), params)

    tok = SimpleTokenizer(vocab_size=64)
    tok.fit(CAPS)
    tok.save(str(model_dir / "tokenizer.json"))

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, cap in enumerate(CAPS):
        arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"i{i}.png")
        rows.append(f"i{i}.png\t{cap}\thttp://x\t{LANGS[i % 4]}")
    tsv = tmp_path / "val.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    return {
        "model": model, "params": params, "tok": tok,
        "model_dir": str(model_dir), "tsv": str(tsv),
        "img_dir": str(img_dir), "tmp": tmp_path,
    }


@pytest.mark.slow
def test_evaluate_cli_sharded_matches_single_device(cli_env):
    """cli/evaluate on the 8-device mesh == a plain single-device generate.

    6 rows split 2/2/1/1 over 4 languages with batch 8: every batch is a
    ragged tail, so the padding path runs on every language."""
    from mic_tpu.cli import evaluate as eval_cli
    from mic_tpu.data.dataset import CaptionDataset
    from mic_tpu.data.loader import CaptionLoader
    from mic_tpu.ops.image_prep import maybe_preprocess

    out_json = str(cli_env["tmp"] / "res.json")
    results = eval_cli.main([
        "--model_dir", cli_env["model_dir"],
        "--tsv_path", cli_env["tsv"], "--images_dir", cli_env["img_dir"],
        "--batch_size", "8", "--num_beams", "2", "--max_length", "8",
        "--decode_size", "32", "--output_json", out_json,
    ])
    assert set(results) == set(LANGS)
    for r in results.values():
        assert set(r) == {"bleu-1", "bleu-2", "bleu-3", "bleu-4"}
        assert all(0.0 <= v <= 1.0 for v in r.values())
    assert json.loads(open(out_json).read()) == results

    # single-device reference for one language: same loader path, plain jit
    # on device 0 (no mesh), same 'pad' start convention
    model, params, tok = cli_env["model"], cli_env["params"], cli_env["tok"]
    dec = model.config.decoder
    sub = CaptionDataset(
        cli_env["tsv"], cli_env["img_dir"]
    ).split_by_language()["en_XX"]
    loader = CaptionLoader(sub, tok, 8, image_size=32, max_length=8,
                           shuffle=False, drop_last=False)
    preds = []
    for batch in loader.epoch_iterator(epoch=0):
        px = jnp.asarray(batch["pixel_values"])
        seqs = jax.jit(
            lambda p, x: model.generate(
                p, maybe_preprocess(x, model.config.vision.image_size,
                                    model.dtype),
                max_length=8, num_beams=2,
                decoder_start_token_id=dec.pad_token_id,
                forced_bos_token_id=tok.lang_code_to_id["en_XX"],
            ).sequences
        )(params, px)
        preds.extend(tok.batch_decode(np.asarray(seqs)))
    loader.close()
    from mic_tpu.evals.bleu import bleu_1_to_4

    refs = [c for c, l in zip(CAPS, [LANGS[i % 4] for i in range(6)])
            if l == "en_XX"]
    expect = bleu_1_to_4(preds, refs, "en")
    assert results["en_XX"] == expect


@pytest.mark.parametrize("convention", ["eos", "lang"])
def test_evaluate_cli_start_conventions(cli_env, convention):
    """The --start_convention switch plumbs through to generate."""
    from mic_tpu.cli import evaluate as eval_cli

    results = eval_cli.main([
        "--model_dir", cli_env["model_dir"],
        "--tsv_path", cli_env["tsv"], "--images_dir", cli_env["img_dir"],
        "--batch_size", "8", "--num_beams", "1", "--max_length", "6",
        "--decode_size", "32", "--start_convention", convention,
    ])
    assert set(results) == set(LANGS)


def test_caption_cli_pads_and_prints(cli_env, capsys):
    """cli/caption on 3 images: the batch pads 3 -> 8 for the mesh and the
    output is exactly one line per REAL image."""
    from mic_tpu.cli import caption as caption_cli

    imgs = [f"{cli_env['img_dir']}/i{i}.png" for i in range(3)]
    caption_cli.main(imgs + [
        "--model_dir", cli_env["model_dir"],
        "--lang", "fr_XX", "--num_beams", "2", "--max_length", "6",
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 3
    for path, line in zip(imgs, lines):
        assert line.startswith(path + "\t")
