"""Headline benchmark: beam-4 captioning throughput per chip on the flagship
CLIP-ViT-B/32 + mBART-50 captioner (BASELINE.json north-star metric).

Measures end-to-end on-device work per caption: uint8 host batch -> device
preprocess (matmul bicubic resize + normalize) -> vision encoder -> beam-4
mBART decode to max_length=64.  Random weights (throughput is weight-agnostic).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "captions/sec/chip", "vs_baseline": R}
vs_baseline is measured against the north-star target of 5000 captions/sec on
a v5e-8 (= 625/chip), since the reference repo published no throughput numbers
(BASELINE.json "published": {}).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(__import__("os").environ.get("BENCH_BATCH", "64"))
MAX_LENGTH = 64
NUM_BEAMS = 4
TARGET_PER_CHIP = 5000 / 8  # north-star: 5k captions/s on v5e-8


def main() -> None:
    from mic_tpu import Captioner, CaptionerConfig
    from mic_tpu.ops.image_prep import maybe_preprocess

    n_chips = jax.device_count()
    config = CaptionerConfig.clip_vit_b32_mbart50(dtype="bfloat16")
    model = Captioner(config)
    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    @jax.jit
    def caption(params, images_u8):
        pixels = maybe_preprocess(images_u8, config.vision.image_size, model.dtype)
        return model.generate(
            params, pixels,
            max_length=MAX_LENGTH, num_beams=NUM_BEAMS,
            forced_bos_token_id=250004,  # en_XX
        ).sequences

    rng = np.random.default_rng(0)
    # distinct batch per rep + host readback per rep: the TPU relay on this
    # machine dedupes same-input executions and block_until_ready can return
    # before execution finishes — only a readback of fresh results is honest.
    reps = 3
    batches = [
        jnp.asarray(rng.integers(0, 255, size=(BATCH, 256, 256, 3), dtype=np.uint8))
        for _ in range(reps + 1)
    ]

    t0 = time.perf_counter()
    np.asarray(caption(params, batches[0]))
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for r in range(reps):
        np.asarray(caption(params, batches[r + 1]))
    dt = (time.perf_counter() - t0) / reps

    captions_per_sec = BATCH / dt
    per_chip = captions_per_sec / n_chips
    print(
        f"batch={BATCH} beams={NUM_BEAMS} max_len={MAX_LENGTH} "
        f"chips={n_chips} step={dt*1e3:.1f}ms p50_latency~{dt*1e3:.1f}ms",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam4",
        "value": round(per_chip, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(per_chip / TARGET_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
