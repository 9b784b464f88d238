"""Caption images from the command line (reference surface: inference.py,
minus its bugs — the reference script references undefined names).

Uses every visible device: params replicate onto a 1-D data mesh and the
image batch (tail-padded to a device-count multiple) shards across it.

    python -m mic_tpu.cli.caption --model_dir runs/cc12m/model \
        --tokenizer path/to/tokenizer --lang en_XX --num_beams 4 img1.jpg ...
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mic_tpu.data.images import load_image
from mic_tpu.data.tokenizer import load_tokenizer
from mic_tpu.models.captioner import Captioner
from mic_tpu.ops.image_prep import preprocess_images
from mic_tpu.parallel.mesh import make_mesh
from mic_tpu.parallel.sharding import batch_sharding, shard_params


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("images", nargs="+")
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--tokenizer", default=None)
    parser.add_argument("--lang", default="en_XX")
    parser.add_argument("--num_beams", type=int, default=4)
    parser.add_argument("--max_length", type=int, default=64)
    args = parser.parse_args(argv)

    model, params = Captioner.from_pretrained(args.model_dir)
    tok_path = args.tokenizer
    if tok_path is None:  # fall back to the tokenizer saved with the model
        candidate = os.path.join(args.model_dir, "tokenizer.json")
        tok_path = candidate if os.path.exists(candidate) else None
    tokenizer = load_tokenizer(tok_path)
    start = tokenizer.lang_code_to_id[args.lang]

    mesh = make_mesh(dp=-1, tp=1)
    params = shard_params(params, mesh)
    raw = np.stack([load_image(p, 256) for p in args.images])
    n_real = raw.shape[0]
    pad = (-n_real) % mesh.size  # batch must split evenly over "data"
    if pad:
        raw = np.concatenate([raw, np.repeat(raw[:1], pad, axis=0)])
    pixels = preprocess_images(
        jax.device_put(raw, batch_sharding(mesh)),
        model.config.vision.image_size, model.dtype,
    )
    out = jax.jit(
        lambda p, x: model.generate(
            p, x, max_length=args.max_length, num_beams=args.num_beams,
            decoder_start_token_id=start,
        )
    )(params, pixels)
    for path, ids in zip(args.images, np.asarray(out.sequences)[:n_real]):
        print(f"{path}\t{tokenizer.decode(ids)}")


if __name__ == "__main__":
    main()
