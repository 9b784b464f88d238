from mic_tpu.core.config import (  # noqa: F401
    CaptionerConfig,
    DataConfig,
    DecoderConfig,
    GenerationConfig,
    TrainConfig,
    VisionConfig,
)
