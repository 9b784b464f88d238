"""One-command parity run against the PUBLISHED fused checkpoint.

The moment the flax-community/clip-vit-base-patch32_mbart-large-50 snapshot
is reachable (network, or pre-populated HF cache + HF_HUB_OFFLINE=1), this
script (north star: /root/reference/README.md:70):

1. resolves the snapshot (io/hub.py) and loads the real config.json +
   flax_model.msgpack through ``Captioner.from_pretrained`` — exercising the
   full hf_import surface on the production 1.7 GB weights;
2. compares the loaded config against the committed fixture
   (tests/fixtures/clip_vit_b32_mbart50_config.json) and prints any drift —
   replace the fixture with the real file if it differs;
3. captions an image (``--image``, or a deterministic synthetic gradient)
   with the reference eval protocol — beam-4, max_length 64, language pinned
   via forced BOS (evaluation.py:65,80-107) — in all four languages, and
   prints token ids + decoded text for side-by-side comparison with the
   reference implementation's output.

  python tools/parity_real_checkpoint.py [--image cat.jpg] [--beams 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

LANGS = {  # lang code -> MBart50 lang-code token id (data/tokenizer.py)
    "en_XX": 250004,
    "es_XX": 250010,
    "fr_XX": 250008,
    "de_DE": 250003,
}
REPO_ID = "flax-community/clip-vit-base-patch32_mbart-large-50"
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "clip_vit_b32_mbart50_config.json",
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--repo", default=REPO_ID)
    p.add_argument("--image", default=None)
    p.add_argument("--beams", type=int, default=4)
    p.add_argument("--max_length", type=int, default=64)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from mic_tpu.io.hub import resolve_model_dir
    from mic_tpu.models.captioner import Captioner
    from mic_tpu.ops.image_prep import maybe_preprocess

    try:
        snap = resolve_model_dir(args.repo)
    except FileNotFoundError as e:
        print(f"SKIP: {e}", file=sys.stderr)
        return 2

    # 2. config drift vs the committed fixture
    with open(os.path.join(snap, "config.json")) as f:
        real = json.load(f)
    with open(FIXTURE) as f:
        fixture = json.load(f)
    drift = []
    for tower in ("clip_vision_config", "mbart_config"):
        r, x = real.get(tower, {}), fixture.get(tower, {})
        for key in sorted(set(r) | set(x)):
            if r.get(key) != x.get(key):
                drift.append(f"{tower}.{key}: real={r.get(key)!r} fixture={x.get(key)!r}")
    if drift:
        print("config drift vs fixture (update tests/fixtures/...):")
        for line in drift:
            print("  " + line)
    else:
        print("config.json matches the committed fixture")

    model, params = Captioner.from_pretrained(snap)

    if args.image:
        from PIL import Image

        im = Image.open(args.image).convert("RGB").resize((256, 256))
        img = np.asarray(im, np.uint8)[None]
    else:
        g = np.linspace(0, 255, 256, dtype=np.uint8)
        img = np.broadcast_to(g[None, :, None], (256, 256, 3))[None].copy()
    pixels = maybe_preprocess(
        jnp.asarray(img), model.config.vision.image_size, model.dtype
    )

    from mic_tpu.data.tokenizer import load_tokenizer

    try:
        tok = load_tokenizer("facebook/mbart-large-50")
    except Exception:
        tok = None

    for lang, bos in LANGS.items():
        out = model.generate(
            params, pixels, max_length=args.max_length,
            num_beams=args.beams, forced_bos_token_id=bos,
        )
        ids = np.asarray(out.sequences)[0].tolist()
        text = tok.decode(ids) if tok is not None else "(tokenizer unavailable)"
        print(f"{lang}: score={float(out.scores[0]):.4f}")
        print(f"  ids : {ids}")
        print(f"  text: {text}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    raise SystemExit(main())
