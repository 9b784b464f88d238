"""Serving bench with TRAINED weights: real early-exit behavior.

bench.py uses random weights (weight-agnostic throughput), so all max_length-1
decode steps always run and the beam-search early-stopping path
(mic_tpu/generate/search.py cond: all beams finished / no improvement
possible) never fires.  A trained model emits EOS after ~5-20 tokens and the
whole loop exits early — this script measures that effect on the converged
synthetic-color flagship (tools/validate_fast_decode.py artifacts: full-width
mBART-50 decoder, tiny vision tower), reporting captions/s and p50 alongside
the random-weight numbers.  Reference surface: the early-stopping semantics of
generation_clip_vision_utils.py:798-820.

  python tools/data/make_synthetic.py --out /tmp/colors --n 2048
  python tools/validate_fast_decode.py --data /tmp/colors --out /tmp/vrun ...
  python tools/bench_trained.py --model /tmp/vrun/model --data /tmp/colors
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="trained model dir")
    ap.add_argument("--data", required=True, help="make_synthetic.py output dir")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--max_length", type=int, default=64)
    ap.add_argument("--num_beams", type=int, default=4)
    ap.add_argument(
        "--no_early_stopping", action="store_true",
        help="disable beam early stopping to measure the full-length "
        "baseline this script exists to contrast against",
    )
    ap.add_argument("--quant", default=None, choices=[None, "int8"])
    args = ap.parse_args()

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import jax
    import jax.numpy as jnp

    from mic_tpu.data.images import load_image_safe
    from mic_tpu.data.tokenizer import load_tokenizer
    from mic_tpu.models.captioner import Captioner
    from mic_tpu.ops.image_prep import maybe_preprocess

    model, params = Captioner.from_pretrained(args.model)
    tok = load_tokenizer(os.path.join(args.model, "tokenizer.json"))

    # real val images (a noise input would never converge to an early EOS)
    rows = [
        l.split("\t") for l in open(os.path.join(args.data, "val.tsv"))
        if l.strip()
    ]
    rng = np.random.default_rng(0)
    img_dir = os.path.join(args.data, "images")
    pool = np.stack([
        load_image_safe(os.path.join(img_dir, r[0]), 256) for r in rows[:256]
    ])

    start = tok.lang_code_to_id["en_XX"]

    @jax.jit
    def caption(params, images_u8):
        pixels = maybe_preprocess(
            images_u8, model.config.vision.image_size, model.dtype
        )
        # training-consistent 'pad' start convention (cli/evaluate.py default):
        # PAD start + language forced at position 1 — what the model saw
        return model.generate(
            params, pixels, max_length=args.max_length,
            num_beams=args.num_beams,
            decoder_start_token_id=model.config.decoder.pad_token_id,
            forced_bos_token_id=start,
            early_stopping=not args.no_early_stopping, quantize=args.quant,
        ).sequences

    def sample(batch):
        idx = rng.integers(0, len(pool), size=batch)
        return jnp.asarray(pool[idx])

    def measure(batch, reps):
        batches = [sample(batch) for _ in range(reps + 1)]
        t0 = time.perf_counter()
        np.asarray(caption(params, batches[0]))
        print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        times = []
        for b in batches[1:]:
            t0 = time.perf_counter()
            np.asarray(caption(params, b))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    dt = measure(args.batch, 3)
    tput = args.batch / dt
    print(f"trained batch={args.batch}: {dt*1e3:.1f}ms -> "
          f"{tput:.1f} captions/s/chip", file=sys.stderr)
    p50 = measure(1, 5)
    print(f"trained p50 batch=1: {p50*1e3:.1f}ms", file=sys.stderr)

    # sanity: the model is actually captioning (not degenerate)
    seqs = np.asarray(caption(params, sample(args.batch)))
    texts = tok.batch_decode(seqs[:4])
    print(json.dumps({
        "trained_captions_per_sec_per_chip": round(tput, 2),
        "trained_p50_latency_ms_batch1": round(p50 * 1e3, 1),
        "quant": args.quant,
        "batch": args.batch,
        "sample_captions": texts,
    }))


if __name__ == "__main__":
    main()
