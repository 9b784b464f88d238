"""Test environment: CPU backend with 8 virtual devices.

Distributed/sharding tests run on a simulated 8-device mesh
(``--xla_force_host_platform_device_count=8``), the standard JAX practice for
testing `Mesh`/`NamedSharding` programs without real multi-chip hardware
(SURVEY.md §4).  Must run before the first `import jax` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# keep HF from trying the network in any code path
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# This image pre-imports jax via PYTHONPATH sitecustomize (JAX_PLATFORMS=axon),
# so the env var above can be too late; the config update always works because
# backends initialize lazily.
jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, "expected 8 virtual CPU devices for tests"

# JAX's backend-default matmul precision is reduced (bf16-class) — fine for
# training throughput, wrong for golden-parity assertions against torch/numpy.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
