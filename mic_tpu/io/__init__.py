from mic_tpu.io.checkpoint import load_params, save_params  # noqa: F401
from mic_tpu.io.hf_import import (  # noqa: F401
    from_hf_clip_flax,
    from_hf_fused_flax,
    from_hf_mbart_flax,
    load_fused_checkpoint,
    load_pretrained_towers,
)
