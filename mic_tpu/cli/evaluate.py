"""Standalone BLEU evaluation of a saved model over a caption TSV
(reference surface: evaluation.py — per-language beam-4 generate + BLEU-1..4).

Uses EVERY visible device: params are replicated onto a 1-D data mesh and
eval batches shard their leading dim across it, like the reference's pmapped
per-language generate closures (/root/reference/evaluation.py:78-107) — but
via jit + NamedSharding, so the same code runs unchanged on 1 chip or 8.
Ragged tails are padded to the full static batch (one compile) and sliced
back before scoring.

    python -m mic_tpu.cli.evaluate --model_dir runs/cc12m/model \
        --tsv_path data/val.tsv --images_dir images/ \
        --tokenizer path/to/tokenizer --batch_size 64 --num_beams 4
"""

from __future__ import annotations

import argparse
import os
import json

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.data.dataset import CaptionDataset
from mic_tpu.data.loader import CaptionLoader
from mic_tpu.data.tokenizer import load_tokenizer
from mic_tpu.evals.bleu import bleu_1_to_4
from mic_tpu.models.captioner import Captioner
from mic_tpu.ops.image_prep import maybe_preprocess
from mic_tpu.parallel.mesh import make_mesh
from mic_tpu.parallel.sharding import batch_sharding, shard_params


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--tsv_path", required=True)
    parser.add_argument("--images_dir", default="")
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_beams", type=int, default=4)
    parser.add_argument("--max_length", type=int, default=64)
    parser.add_argument("--decode_size", type=int, default=256)
    parser.add_argument("--output_json", default=None)
    parser.add_argument(
        "--start_convention", default="pad",
        choices=["pad", "eos", "lang"],
        help="decoder start for generation: 'pad' (training-consistent: PAD "
             "start + language forced at position 1, best BLEU), 'eos' "
             "(reference evaluation.py: EOS start + forced language BOS), "
             "'lang' (reference main.py eval: language code as start token)",
    )
    args = parser.parse_args(argv)

    model, params = Captioner.from_pretrained(args.model_dir)
    tok_path = args.tokenizer
    if tok_path is None:  # fall back to the tokenizer saved with the model
        candidate = os.path.join(args.model_dir, "tokenizer.json")
        tok_path = candidate if os.path.exists(candidate) else None
    tokenizer = load_tokenizer(tok_path)
    dataset = CaptionDataset(args.tsv_path, args.images_dir)

    # all visible devices on the data axis; params replicated (tp=1 means the
    # model-axis rules degenerate to replication over a size-1 axis)
    mesh = make_mesh(dp=-1, tp=1)
    batch_size = -(-args.batch_size // mesh.size) * mesh.size  # ceil to mesh
    params = shard_params(params, mesh)
    bshard = batch_sharding(mesh)

    dec = model.config.decoder

    @jax.jit
    def generate(params, pixels_u8, lang_token):
        pixels = maybe_preprocess(
            pixels_u8, model.config.vision.image_size, model.dtype
        )
        kw = {
            "pad": dict(decoder_start_token_id=dec.pad_token_id,
                        forced_bos_token_id=lang_token),
            "eos": dict(decoder_start_token_id=dec.eos_token_id,
                        forced_bos_token_id=lang_token),
            "lang": dict(decoder_start_token_id=lang_token),
        }[args.start_convention]
        return model.generate(
            params, pixels, max_length=args.max_length,
            num_beams=args.num_beams, **kw,
        ).sequences

    results = {}
    for lang, sub in dataset.split_by_language().items():
        loader = CaptionLoader(
            sub, tokenizer, batch_size, image_size=args.decode_size,
            max_length=args.max_length, shuffle=False, drop_last=False,
        )
        preds, refs = [], []
        start = tokenizer.lang_code_to_id[lang]
        try:
            for batch in loader.epoch_iterator(epoch=0):
                px = batch["pixel_values"]
                n_real = px.shape[0]
                pad = batch_size - n_real  # static shapes: one compile
                if pad:
                    px = np.concatenate([px, np.repeat(px[:1], pad, axis=0)])
                seqs = generate(
                    params, jax.device_put(px, bshard),
                    jnp.asarray(start, jnp.int32),
                )
                preds.extend(tokenizer.batch_decode(np.asarray(seqs)[:n_real]))
                refs.extend(tokenizer.batch_decode(batch["labels"]))
        finally:
            loader.close()
        results[lang] = bleu_1_to_4(preds, refs, lang[:2])
        print(lang, results[lang])

    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
