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


def test_hf_import_takes_generation_defaults_from_checkpoint(tmp_path):
    """An imported HF checkpoint must generate with its own published
    settings: the reference reads every generate default from the loaded
    checkpoint's mbart_config (generation_clip_vision_utils.py:205-229)."""
    d = {
        "clip_vision_config": {"hidden_size": 32, "num_hidden_layers": 2},
        "mbart_config": {
            "vocab_size": 99,
            "d_model": 32,
            "max_length": 48,
            "min_length": 3,
            "num_beams": 7,
            "length_penalty": 1.3,
            "early_stopping": True,
            "forced_bos_token_id": 11,
            "forced_eos_token_id": 5,
            "decoder_start_token_id": 4,
        },
    }
    cfg = CaptionerConfig.from_hf_dict(d)
    g = cfg.generation
    assert (g.max_length, g.min_length, g.num_beams) == (48, 3, 7)
    assert (g.length_penalty, g.early_stopping) == (1.3, True)
    assert (g.forced_bos_token_id, g.forced_eos_token_id) == (11, 5)
    assert g.decoder_start_token_id == 4
    # absent keys fall back to the HF PretrainedConfig defaults the reference
    # would have used, not mic_tpu's own GenerationConfig defaults
    g2 = CaptionerConfig.from_hf_dict({"mbart_config": {}}).generation
    assert (g2.max_length, g2.num_beams, g2.top_k) == (20, 1, 50)


def test_hf_export_roundtrips_generation_config(tmp_path):
    config = CaptionerConfig.tiny(
        generation=CaptionerConfig.tiny().generation.replace(
            max_length=33, num_beams=5, length_penalty=0.8, early_stopping=True
        )
    )
    model = Captioner(config)
    params = model.init_params(jax.random.PRNGKey(1))
    out = str(tmp_path / "genrt")
    export_hf_fused(params, config, out)
    g = CaptionerConfig.from_hf_json(out + "/config.json").generation
    assert (g.max_length, g.num_beams) == (33, 5)
    assert (g.length_penalty, g.early_stopping) == (0.8, True)


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
