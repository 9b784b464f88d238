"""Profile the serving decode step on the real TPU and print the op table.

Traces the default generate path (fused LM head + v3 lazy-attention DMA
kernel, bf16-resident weights) at the bench shape, then summarizes the
xplane with tools/parse_profile.py.

  python tools/profile_serving.py [--batch 128] [--quant int8] [--top 30]
"""

from __future__ import annotations

import argparse
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--quant", default=None, choices=[None, "int8"])
    p.add_argument("--max_length", type=int, default=64)
    p.add_argument("--num_beams", type=int, default=4)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default=None, help="trace dir (default: tmp)")
    args = p.parse_args(argv)

    from mic_tpu import Captioner, CaptionerConfig
    from mic_tpu.ops.image_prep import maybe_preprocess

    config = CaptionerConfig.clip_vit_b32_mbart50(dtype="bfloat16")
    model = Captioner(config)
    from mic_tpu.core.params import make_serving_params

    params = jax.jit(model.init_params)(jax.random.PRNGKey(0))
    # bf16-RESIDENT weights, matching bench.py's production-serving default
    params = make_serving_params(params)
    jax.block_until_ready(params)

    @jax.jit
    def caption(params, images_u8):
        pixels = maybe_preprocess(images_u8, config.vision.image_size, model.dtype)
        return model.generate(
            params, pixels,
            max_length=args.max_length, num_beams=args.num_beams,
            forced_bos_token_id=250004, quantize=args.quant,
        ).sequences

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.integers(0, 255, size=(args.batch, 256, 256, 3), dtype=np.uint8))
        for _ in range(3)
    ]
    np.asarray(caption(params, batches[0]))  # compile

    trace_dir = args.out or tempfile.mkdtemp(prefix="mic_serve_trace_")
    with jax.profiler.trace(trace_dir):
        np.asarray(caption(params, batches[1]))
        np.asarray(caption(params, batches[2]))

    print(f"trace: {trace_dir}")
    from parse_profile import find_xplane, summarize  # noqa: E402
    summarize(find_xplane(trace_dir), args.top)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
