"""core/knobs.py: the single knob-resolution surface (SURVEY §5's "one
typed config tree" — reference scattered flags across three dataclasses
plus HF TrainingArguments, main.py:61-163).

Pins the contract the rest of the package relies on: supported knobs
resolve config-default-then-env in ONE place (``override``), measured
dead ends live ONLY behind the ``MIC_TPU_EXPERIMENTAL`` registry with
typo detection, and no module re-reads ``os.environ`` on its own.
"""

import pathlib
import subprocess
import sys

import pytest

from mic_tpu.core import knobs


def test_override_env_wins(monkeypatch):
    monkeypatch.delenv("MIC_TPU_TEST_KNOB", raising=False)
    assert knobs.override("MIC_TPU_TEST_KNOB") is None
    assert knobs.override("MIC_TPU_TEST_KNOB", "cfg") == "cfg"
    monkeypatch.setenv("MIC_TPU_TEST_KNOB", "env")
    assert knobs.override("MIC_TPU_TEST_KNOB", "cfg") == "env"


def test_experimental_parsing(monkeypatch):
    monkeypatch.setenv(
        "MIC_TPU_EXPERIMENTAL", "fused_mlp, segmented_topk=8192"
    )
    assert knobs.experimental("fused_mlp") == "1"
    assert knobs.experimental("segmented_topk") == "8192"
    assert knobs.experimental("merged_kv") is None
    assert knobs.experimental("merged_kv", "0") == "0"


def test_experimental_typo_detection(monkeypatch):
    monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", "fused_mpl")
    with pytest.raises(KeyError, match="fused_mpl"):
        knobs.experimental("fused_mlp")
    monkeypatch.setenv("MIC_TPU_EXPERIMENTAL", "")
    with pytest.raises(KeyError, match="not a registered"):
        knobs.experimental("not_a_real_path")


# Each registered experimental path must name a module that imports (the
# registry is documentation; a stale entry pointing at deleted code would
# silently invalidate an A/B instruction in PERFORMANCE.md).
_EXPERIMENT_MODULES = {
    "pallas_topk": "mic_tpu.ops.topk_lse",
    "segmented_topk": "mic_tpu.generate.search",
    "approx_topk": "mic_tpu.generate.search",
    "fused_decode": "mic_tpu.ops.decode_attention",
    "attn_buckets": "mic_tpu.models.mbart_decoder",
    "fused_cross_attn": "mic_tpu.ops.cross_attention",
    "merged_cross": "mic_tpu.ops.cross_attention",
    "cross_g": "mic_tpu.ops.cross_attention",
    "fused_mlp": "mic_tpu.ops.fused_mlp",
    "merged_kv": "mic_tpu.nn.cache",
    "small_attn": "mic_tpu.ops.small_attention",
    "attn_bhtd": "mic_tpu.ops.attention",
    "custom_scan_vjp": "mic_tpu.nn.stacked",
    "unroll_layers": "mic_tpu.nn.stacked",
    "scan_split_transpose": "mic_tpu.nn.stacked",
    "bucket_bv": "mic_tpu.ops.fused_head",
    "ln_qkv": "mic_tpu.ops.ln_gemm",
}


def test_registry_names_importable_paths():
    assert set(_EXPERIMENT_MODULES) == set(knobs.EXPERIMENTAL), (
        "registry drifted: update _EXPERIMENT_MODULES alongside "
        "knobs.EXPERIMENTAL"
    )
    import importlib

    for name, mod in _EXPERIMENT_MODULES.items():
        importlib.import_module(mod)


def test_no_stray_environ_reads():
    """knobs.override/experimental are the package's only os.environ reads
    (parallel/distributed.py takes env as an injectable argument — the one
    legitimate direct use)."""
    root = pathlib.Path(knobs.__file__).resolve().parents[1]
    offenders = []
    for py in root.rglob("*.py"):
        rel = py.relative_to(root).as_posix()
        if rel in ("core/knobs.py", "parallel/distributed.py"):
            continue
        if "os.environ" in py.read_text():
            offenders.append(rel)
    assert not offenders, f"stray os.environ reads: {offenders}"


def test_unknown_experiment_fails_loudly():
    """An A/B launched with a typo'd experiment name must crash at the gate,
    not silently run the default path."""
    code = (
        "import os; os.environ['MIC_TPU_EXPERIMENTAL']='fused_mpl';"
        "import jax.numpy as jnp;"
        "from mic_tpu.nn.stacked import scan_apply;"
        "scan_apply(lambda h,p,i,e:(h,h), jnp.zeros((2,2)),"
        " {'w': jnp.zeros((3,2,2))})"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert r.returncode != 0
    assert "fused_mpl" in r.stderr
