"""Host input-pipeline throughput benchmark (images/sec per worker count).

The reference's documented training bottleneck was the torch DataLoader +
torchvision host pipeline (~200 GB RAM, reduced worker counts; README.md:103).
This measures mic_tpu's spawn-pool loader end-to-end (JPEG decode via the
native libjpeg path when built, tokenize, collate to uint8 batches).

  python tools/bench_loader.py [--n 512] [--batch 64] [--size 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import tempfile
import time

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n", type=int, default=512)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--workers", type=int, nargs="+", default=[0, 4, 8, 16])
    args = parser.parse_args(argv)

    from PIL import Image

    from mic_tpu.data.dataset import CaptionDataset
    from mic_tpu.data.loader import CaptionLoader
    from mic_tpu.data.tokenizer import SimpleTokenizer
    from mic_tpu.data import native

    print(f"native decoder available: {native.available()}")
    with tempfile.TemporaryDirectory() as d:
        rng = np.random.default_rng(0)
        rows = []
        base = rng.normal(size=(24, 32, 3))
        img = np.kron(base, np.ones((32, 32, 1)))
        img = (255 * (img - img.min()) / (np.ptp(img) + 1e-9)).astype(np.uint8)
        for i in range(args.n):
            name = f"img_{i}.jpg"
            Image.fromarray(np.roll(img, i, axis=1)).save(
                f"{d}/{name}", quality=90
            )
            rows.append(f"{name}\ta caption about image {i}\turl\ten_XX")
        tsv = f"{d}/data.tsv"
        with open(tsv, "w") as f:
            f.write("\n".join(rows))

        ds = CaptionDataset(tsv, d)
        tk = SimpleTokenizer()
        tk.encode_targets([r.split("\t")[1] for r in rows], ["en_XX"] * len(rows), 64)
        tk.freeze()

        for workers in args.workers:
            loader = CaptionLoader(
                ds, tk, args.batch, image_size=args.size, max_length=64,
                num_workers=workers, seed=0,
            )
            # pool startup included once, then a full epoch timed cold
            if workers:
                loader._get_pool()
            t0 = time.perf_counter()
            n_img = 0
            for b in loader.epoch_iterator(epoch=0):
                n_img += b["pixel_values"].shape[0]
            dt = time.perf_counter() - t0
            loader.close()
            print(f"workers={workers:3d}: {n_img/dt:8.1f} images/s")


if __name__ == "__main__":
    main()
