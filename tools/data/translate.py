"""Build the 4-language caption TSVs by machine-translating English captions
with OUR mBART-50 seq2seq on TPU (reference: data/CC12M_translate_MBart50.py,
which used HF FlaxMBart + pmap; rebuilt on mic_tpu.models.MBartSeq2Seq with
jit + beam search).

Round-robins target languages over caption chunks exactly like the reference
(:135-144): chunk c of the shuffled data gets language langs[c % 4]; English
chunks pass through untranslated.  Output TSVs have the training pipeline's
columns: image_file \t caption \t url \t lang_id.

Requires a local mbart-50-one-to-many-mmt checkpoint directory
(flax msgpack / safetensors / torch bin) and its tokenizer.

  python tools/data/translate.py --report images/downloaded_train_report.tsv \
      --weights /path/to/mbart-50-one-to-many-mmt \
      --tokenizer /path/to/tokenizer --out data/ --chunk 512
"""

from __future__ import annotations

import argparse
import csv
import os

import numpy as np

LANGS = ("en_XX", "fr_XX", "es_XX", "de_DE")


def load_model(weights_dir: str, dtype: str):
    import jax

    from mic_tpu.core.config import DecoderConfig, GenerationConfig
    from mic_tpu.io.hf_import import _load_hf_weights_file, from_hf_mbart_seq2seq_flax
    from mic_tpu.models.mbart_seq2seq import MBartSeq2Seq

    blob = _load_hf_weights_file(weights_dir)
    if blob["format"] != "flax":
        from mic_tpu.io.hf_import import _fix_embeddings, _unflatten_torch

        tree = _fix_embeddings(_unflatten_torch(blob["tree"]))
        params = from_hf_mbart_seq2seq_flax(tree)
    else:
        params = from_hf_mbart_seq2seq_flax(blob["tree"])
    model = MBartSeq2Seq(
        DecoderConfig(), GenerationConfig(max_length=64, num_beams=4), dtype=dtype
    )
    return model, jax.device_put(params)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--report", required=True,
                        help="download report TSV: row_id\\tfile\\tcaption\\turl\\tstatus")
    parser.add_argument("--weights", required=True)
    parser.add_argument("--tokenizer", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--chunk", type=int, default=512)
    parser.add_argument("--val_fraction", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mic_tpu.data.tokenizer import HFTokenizer

    tokenizer = HFTokenizer(args.tokenizer)
    model, params = load_model(args.weights, args.dtype)

    rows = []
    with open(args.report, newline="") as f:
        for row in csv.reader(f, delimiter="\t"):
            if len(row) >= 5 and row[1] and row[4] == "200":
                rows.append((row[1], row[2], row[3]))  # file, caption, url
            if args.limit is not None and len(rows) >= args.limit:
                break
    rng = np.random.default_rng(args.seed)
    rng.shuffle(rows)
    n_val = int(len(rows) * args.val_fraction)
    splits = {"val": rows[:n_val], "train": rows[n_val:]}

    @jax.jit
    def translate_chunk(params, input_ids, attention_mask, forced_bos):
        return model.generate(
            params, input_ids, attention_mask, forced_bos_token_id=forced_bos
        ).sequences

    os.makedirs(args.out, exist_ok=True)
    for split, data in splits.items():
        out_path = os.path.join(args.out, f"{split}_file.tsv")
        with open(out_path, "w", newline="") as f:
            writer = csv.writer(f, delimiter="\t")
            for c in range(0, len(data), args.chunk):
                chunk = data[c : c + args.chunk]
                lang = LANGS[(c // args.chunk) % len(LANGS)]
                if lang == "en_XX":
                    for file, cap, url in chunk:
                        writer.writerow([file, cap, url, lang])
                    continue
                tokenizer.tk.src_lang = "en_XX"
                caps = [cap for _, cap, _ in chunk]
                pad_n = args.chunk - len(caps)  # keep shapes static for jit
                enc = tokenizer.tk(
                    caps + [""] * pad_n, max_length=64, truncation=True,
                    padding="max_length", return_tensors="np",
                )
                seqs = translate_chunk(
                    params,
                    jnp.asarray(enc["input_ids"]),
                    jnp.asarray(enc["attention_mask"]),
                    jnp.asarray(tokenizer.lang_code_to_id[lang], jnp.int32),
                )
                texts = tokenizer.batch_decode(np.asarray(seqs)[: len(caps)])
                for (file, _, url), text in zip(chunk, texts):
                    writer.writerow([file, text, url, lang])
                print(f"{split}: {c + len(chunk)}/{len(data)} ({lang})")
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
