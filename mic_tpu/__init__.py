"""mic_tpu — a TPU-native multilingual image-captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
gchhablani/multilingual-image-captioning (CLIP-ViT vision encoder fused into an
mBART-50 decoder via cross-attention, 4-language CC12M pre-training, on-device
beam-search captioning), re-designed TPU-first:

- pure functional layers over explicit param pytrees (no framework base classes)
- layer stacks applied with `lax.scan` over stacked params (fast compiles, clean remat)
- patch embedding and image resizing expressed as matmuls (MXU-native)
- 2-D ("data", "model") `jax.sharding.Mesh` with rule-based PartitionSpec trees;
  collectives are inserted by GSPMD from shardings, never hand-written
- generation as `lax.while_loop` over typed state with an explicit, stacked KV cache
- optional Pallas kernels for the hot ops (attention, fused image preprocessing)

Package map (SURVEY.md §7):
  core/      config tree, dtype policy, PRNG discipline
  parallel/  mesh construction, sharding rules, host->device placement
  ops/       Pallas kernels + XLA fallbacks for hot ops
  nn/        functional transformer building blocks + KV cache
  models/    CLIP-ViT encoder, mBART decoder, fused captioner, ViT+BART variant
  io/        HF checkpoint import, orbax save/restore with full-state resume
  data/      TSV datasets, torch-free loader, tokenizer wrappers, image pipeline
  generate/  logits processors + greedy/sample/beam search
  train/     loss, schedules, train state, trainer loop, metrics
  evals/     BLEU and the per-language eval harness
  cli/       train / evaluate / caption entry points
"""

__version__ = "0.1.0"

# Lazy top-level API (PEP 562): `import mic_tpu` stays lightweight so data
# workers (spawn pool) never pay the JAX import on boot.
_API = {
    "CaptionerConfig": "mic_tpu.core.config",
    "DecoderConfig": "mic_tpu.core.config",
    "VisionConfig": "mic_tpu.core.config",
    "GenerationConfig": "mic_tpu.core.config",
    "Captioner": "mic_tpu.models.captioner",
    "MBartSeq2Seq": "mic_tpu.models.mbart_seq2seq",
}


def __getattr__(name):
    if name in _API:
        import importlib

        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(f"module 'mic_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_API))
