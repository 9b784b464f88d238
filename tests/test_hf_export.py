"""HF-format export round-trip: our params -> reference msgpack layout -> our
params, bit-identical; config.json reimports to the same CaptionerConfig."""

import jax
import numpy as np

from mic_tpu.core.config import CaptionerConfig
from mic_tpu.io.hf_export import export_hf_fused
from mic_tpu.io.hf_import import load_fused_checkpoint
from mic_tpu.models.captioner import Captioner


def test_export_import_roundtrip(tmp_path):
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(0))

    out = str(tmp_path / "hf_ckpt")
    export_hf_fused(params, config, out)

    restored = load_fused_checkpoint(out)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(restored)
    )
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(
            np.asarray(leaf, np.float32), np.asarray(flat_b[key], np.float32),
            err_msg=key,
        )

    reparsed = CaptionerConfig.from_hf_json(out + "/config.json")
    assert reparsed.vision == config.vision
    assert reparsed.decoder.vocab_size == config.decoder.vocab_size
    assert reparsed.decoder.d_model == config.decoder.d_model


def test_from_pretrained_autodetects_hf_format(tmp_path):
    """Captioner.from_pretrained loads a reference-format checkpoint dir."""
    config = CaptionerConfig.tiny()
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(3))
    out = str(tmp_path / "hf_style")
    export_hf_fused(params, config, out)

    model2, params2 = Captioner.from_pretrained(out)
    assert model2.config.decoder.vocab_size == config.decoder.vocab_size
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(params2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32)
        )
