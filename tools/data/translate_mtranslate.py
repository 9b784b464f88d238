"""Expand an English caption TSV into a multilingual train/val JSON pair via
a per-caption web-translation backend (reference:
data/translate_cc12m_captions_mTranslate.py, which fanned mtranslate.translate
calls out over a ray cluster).

Rebuilt framework-native: a spawn multiprocessing pool replaces ray (same
physical-core fan-out, no cluster daemon), and the translation backend is
pluggable --

  * ``mtranslate``  -- the reference's backend (Google web translate; needs
    the optional ``mtranslate`` package and network egress; import is gated
    so the tool loads fine without it),
  * ``identity``    -- offline dry-run backend: tags the caption with the
    target language instead of translating, so the fan-out / split / JSON
    plumbing is testable with zero network.

Each input row expands to 1 + len(lang_list) rows (English passthrough plus
one per target language, reference :33-43); rows whose translation raises are
skipped whole, like the reference's except branch.  Outputs
``train.json`` / ``val.json`` lists of {image_file, caption, url, lang_id}
(reference :61-75).

NOTE: the reference itself superseded this tool with the mBART-50 batch
translator (reference README.md:99); our production path is
tools/data/translate.py on the first-party TPU seq2seq.  This variant is kept
for CLI parity.  Default lang_list follows the project's production trio
(fr/es/de; the reference file's own default of fr/de/hi predates its final
language set, README.md:22).

  python tools/data/translate_mtranslate.py --tsv images-list-clean.tsv \
      --out data/ --lang_list fr es de --backend mtranslate
"""

from __future__ import annotations

import argparse
import csv
import json
import multiprocessing as mp
import os
import sys

import numpy as np

DEFAULT_LANGS = ("fr", "es", "de")


def _translate_mtranslate(caption: str, lang: str) -> str:
    import mtranslate  # gated: optional dependency, needs network

    return mtranslate.translate(caption, lang, "en")


def _translate_identity(caption: str, lang: str) -> str:
    return f"{lang}:{caption}"


BACKENDS = {
    "mtranslate": _translate_mtranslate,
    "identity": _translate_identity,
}


def expand_row(job):
    """One input row -> [en row, lang rows...] or None if any lang fails
    (reference :33-43 skips the whole row on exception)."""
    (image_file, caption, url), langs, backend = job
    try:
        fn = BACKENDS[backend]
        rows = [{"image_file": image_file, "caption": caption,
                 "url": url, "lang_id": "en"}]
        for lang in langs:
            rows.append({"image_file": image_file, "caption": fn(caption, lang),
                         "url": url, "lang_id": lang})
        return rows
    except Exception:
        print(caption, url, " skipped!", file=sys.stderr)
        return None


def read_tsv(tsv_path: str):
    """Header TSV with image_file / caption / url columns (the reference read
    the same file with pandas, :28-31)."""
    with open(tsv_path, newline="") as f:
        reader = csv.reader(f, delimiter="\t")
        header = next(reader)
        idx = {name: header.index(name) for name in ("image_file", "caption", "url")}
        rows = [(r[idx["image_file"]], r[idx["caption"]], r[idx["url"]])
                for r in reader if len(r) >= len(header)]
    print(f"Number of Examples: {len(rows)} for {tsv_path}")
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tsv", required=True,
                        help="header TSV with image_file/caption/url columns")
    parser.add_argument("--val_split", type=float, default=0.1)
    parser.add_argument("--lang_list", nargs="+", default=list(DEFAULT_LANGS))
    parser.add_argument("--out", default=".",
                        help="directory for train.json / val.json")
    parser.add_argument("--backend", choices=sorted(BACKENDS), default="mtranslate")
    parser.add_argument("--workers", type=int,
                        default=max(1, (os.cpu_count() or 2) // 2),
                        help="pool size (reference used physical-core count)")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args(argv)

    if args.backend == "mtranslate":
        try:
            import mtranslate  # noqa: F401
        except ImportError:
            raise SystemExit(
                "the mtranslate backend needs the optional 'mtranslate' "
                "package (and network access); use --backend identity for an "
                "offline dry run, or tools/data/translate.py for the "
                "production TPU mBART-50 path"
            )

    rows = read_tsv(args.tsv)
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(rows))
    n_val = int(round(len(rows) * args.val_split))
    splits = {
        "val": [rows[i] for i in order[:n_val]],
        "train": [rows[i] for i in order[n_val:]],
    }

    os.makedirs(args.out, exist_ok=True)
    ctx = mp.get_context("spawn")  # spawn: safe under jax/XLA parents
    with ctx.Pool(args.workers) as pool:
        for split, data in splits.items():
            jobs = [(row, tuple(args.lang_list), args.backend) for row in data]
            expanded = pool.map(expand_row, jobs)
            flat = [r for rows_ in expanded if rows_ for r in rows_]
            out_path = os.path.join(args.out, f"{split}.json")
            with open(out_path, "w", encoding="utf8") as f:
                json.dump(flat, f, ensure_ascii=False)
            print(f"wrote {out_path}: {len(flat)} rows "
                  f"({len(data)} inputs x {1 + len(args.lang_list)} langs)")


if __name__ == "__main__":
    main()
