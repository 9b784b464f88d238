from mic_tpu.models.captioner import Captioner  # noqa: F401
from mic_tpu.models.clip_vit import apply_vision, init_vision  # noqa: F401
from mic_tpu.models.mbart_decoder import apply_decoder, init_decoder  # noqa: F401
