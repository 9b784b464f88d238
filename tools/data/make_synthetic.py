"""Generate a synthetic multilingual color-naming dataset for smoke/perf runs.

Solid color patches (with pixel noise) paired with per-language captions that
name the color — the deterministic image->caption task used to validate real
training end-to-end on the TPU without network access (the reference trained
on CC12M + marian-translated captions, reference README.md:60-72; this tool
stands in for that pipeline offline).

  python tools/data/make_synthetic.py --out /tmp/colors --n 2048

Writes <out>/images/*.png, <out>/train.tsv, <out>/val.tsv in the loader's
TSV schema (image_file \t caption \t url \t lang_id).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

COLOR_RGB = {
    "red": (255, 0, 0),
    "green": (0, 255, 0),
    "blue": (0, 0, 255),
    "yellow": (255, 255, 0),
}

# caption templates per language (lang ids: the reference's 4 training
# languages, reference README.md:21). Kept short: a from-scratch flagship
# must learn the image->color mapping within a few hundred steps
CAPTIONS = {
    "en_XX": "a {c} square",
    "fr_XX": {
        "red": "un carre rouge",
        "green": "un carre vert",
        "blue": "un carre bleu",
        "yellow": "un carre jaune",
    },
    "de_DE": {
        "red": "ein rotes quadrat",
        "green": "ein gruenes quadrat",
        "blue": "ein blaues quadrat",
        "yellow": "ein gelbes quadrat",
    },
    "es_XX": {
        "red": "un cuadrado rojo",
        "green": "un cuadrado verde",
        "blue": "un cuadrado azul",
        "yellow": "un cuadrado amarillo",
    },
}


def caption_for(lang: str, color: str) -> str:
    spec = CAPTIONS[lang]
    if isinstance(spec, str):
        return spec.format(c=color)
    return spec[color]


def main() -> None:
    from PIL import Image

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=2048, help="total images")
    ap.add_argument("--val_frac", type=float, default=0.125)
    ap.add_argument("--size", type=int, default=256, help="image side length")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    img_dir = os.path.join(args.out, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    colors = list(COLOR_RGB)
    langs = list(CAPTIONS)

    rows = []
    for i in range(args.n):
        color = colors[i % len(colors)]
        lang = langs[(i // len(colors)) % len(langs)]
        arr = np.zeros((args.size, args.size, 3), np.int16)
        arr[:] = COLOR_RGB[color]
        arr = np.clip(arr + rng.integers(-16, 16, arr.shape), 0, 255).astype(
            np.uint8
        )
        fname = f"img{i:06d}.png"
        Image.fromarray(arr).save(os.path.join(img_dir, fname))
        rows.append(f"{fname}\t{caption_for(lang, color)}\turl\t{lang}")

    n_val = max(1, int(args.n * args.val_frac))
    rng.shuffle(rows)
    with open(os.path.join(args.out, "train.tsv"), "w") as f:
        f.write("\n".join(rows[n_val:]))
    with open(os.path.join(args.out, "val.tsv"), "w") as f:
        f.write("\n".join(rows[:n_val]))
    print(f"wrote {args.n - n_val} train / {n_val} val rows under {args.out}")


if __name__ == "__main__":
    main()
