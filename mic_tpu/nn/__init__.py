from mic_tpu.nn.cache import DecoderCache, init_cache  # noqa: F401
from mic_tpu.nn.layers import (  # noqa: F401
    dense,
    embed,
    init_dense,
    init_layer_norm,
    layer_norm,
)
