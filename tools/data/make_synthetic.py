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


# ---------------------------------------------------------------------------
# --hard: long ambiguous captions (12-20 tokens, near-tie continuations)
#
# The color task above converges to near-deterministic captions, so every
# decode mode trivially agrees (exact == approx == window scores 1.0).  The
# hard task keeps the image -> attributes mapping learnable (square color,
# square size, background color are all visible to the tiny vision tower)
# but makes the CAPTION underdetermined by construction: at two positions a
# synonym is sampled uniformly at train time ("big"/"large", "in this
# picture"/"in the image"), so a converged model has a genuine ~50/50
# posterior — a near-tie — exactly where approximate candidate selection
# could change the argmax.  This is the adversarial regime VERDICT r4
# item 5 asks the exact-vs-approx serving A/B to face (reference exact
# top-2K semantics: generation_clip_vision_utils.py:872-903).
# ---------------------------------------------------------------------------

BG_RGB = {
    "white": (235, 235, 235),
    "black": (20, 20, 20),
    "gray": (128, 128, 128),
    "orange": (255, 150, 30),
}

# per-language: template + the two synonym slots.  Each {..} slot value is
# drawn uniformly; both variants are correct for the image, so the trained
# posterior at the slot token is a near-tie.
HARD_TEMPLATES = {
    "en_XX": (
        "there is a {size} {c} square sitting on a {bg} background {tail}",
        {"big": ("big", "large"), "small": ("small", "little")},
        {"white": "white", "black": "black", "gray": "gray",
         "orange": "orange"},
        ("in this picture", "in the image"),
    ),
    "fr_XX": (
        "il y a un {size} carre {c} pose sur un fond {bg} {tail}",
        {"big": ("grand", "gros"), "small": ("petit", "menu")},
        {"white": "blanc", "black": "noir", "gray": "gris",
         "orange": "orange"},
        ("dans cette image", "sur la photo"),
    ),
    "de_DE": (
        "da ist ein {size} {c} quadrat auf einem {bg} hintergrund {tail}",
        {"big": ("grosses", "riesiges"), "small": ("kleines", "winziges")},
        {"white": "weissen", "black": "schwarzen", "gray": "grauen",
         "orange": "orangen"},
        ("in diesem bild", "auf dem foto"),
    ),
    "es_XX": (
        "hay un cuadrado {c} {size} sobre un fondo {bg} {tail}",
        {"big": ("grande", "enorme"), "small": ("pequeno", "chico")},
        {"white": "blanco", "black": "negro", "gray": "gris",
         "orange": "naranja"},
        ("en esta imagen", "en la foto"),
    ),
}

HARD_COLOR_WORDS = {
    "en_XX": {"red": "red", "green": "green", "blue": "blue",
              "yellow": "yellow"},
    "fr_XX": {"red": "rouge", "green": "vert", "blue": "bleu",
              "yellow": "jaune"},
    "de_DE": {"red": "rotes", "green": "gruenes", "blue": "blaues",
              "yellow": "gelbes"},
    "es_XX": {"red": "rojo", "green": "verde", "blue": "azul",
              "yellow": "amarillo"},
}


def hard_caption(lang: str, color: str, size: str, bg: str, rng) -> str:
    tmpl, size_syn, bg_words, tails = HARD_TEMPLATES[lang]
    return tmpl.format(
        size=size_syn[size][int(rng.integers(0, 2))],
        c=HARD_COLOR_WORDS[lang][color],
        bg=bg_words[bg],
        tail=tails[int(rng.integers(0, 2))],
    )


def hard_image(color: str, size: str, bg: str, side: int, rng) -> np.ndarray:
    arr = np.zeros((side, side, 3), np.int16)
    arr[:] = BG_RGB[bg]
    half = side * 3 // 8 if size == "big" else side // 8
    c0 = side // 2
    arr[c0 - half:c0 + half, c0 - half:c0 + half] = COLOR_RGB[color]
    return np.clip(arr + rng.integers(-12, 12, arr.shape), 0, 255).astype(
        np.uint8
    )


def main() -> None:
    from PIL import Image

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=2048, help="total images")
    ap.add_argument("--val_frac", type=float, default=0.125)
    ap.add_argument("--size", type=int, default=256, help="image side length")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--hard", action="store_true",
        help="long ambiguous captions (12-20 tokens; square color+size on a "
             "colored background, with uniformly-sampled synonym slots that "
             "make two continuation positions genuine near-ties)",
    )
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
        if args.hard:
            size = ("big", "small")[(i // (len(colors) * len(langs))) % 2]
            bgs = [b for b in BG_RGB]
            bg = bgs[(i // (len(colors) * len(langs) * 2)) % len(bgs)]
            arr = hard_image(color, size, bg, args.size, rng)
            cap = hard_caption(lang, color, size, bg, rng)
        else:
            arr = np.zeros((args.size, args.size, 3), np.int16)
            arr[:] = COLOR_RGB[color]
            arr = np.clip(
                arr + rng.integers(-16, 16, arr.shape), 0, 255
            ).astype(np.uint8)
            cap = caption_for(lang, color)
        fname = f"img{i:06d}.png"
        Image.fromarray(arr).save(os.path.join(img_dir, fname))
        rows.append(f"{fname}\t{cap}\turl\t{lang}")

    n_val = max(1, int(args.n * args.val_frac))
    rng.shuffle(rows)
    with open(os.path.join(args.out, "train.tsv"), "w") as f:
        f.write("\n".join(rows[n_val:]))
    with open(os.path.join(args.out, "val.tsv"), "w") as f:
        f.write("\n".join(rows[:n_val]))
    print(f"wrote {args.n - n_val} train / {n_val} val rows under {args.out}")


if __name__ == "__main__":
    main()
