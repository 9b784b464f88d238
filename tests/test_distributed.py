"""Multi-host pipeline: per-process batch sharding + distributed bootstrap.

The reference never sharded data per process nor initialized a process group
(SURVEY.md §2c "multi-host: partially aware, never exercised"). These tests
prove (1) the loader's per-process slices reassemble the exact global batch,
and (2) `initialize_from_env` + `make_array_from_process_local_data` work in
a REAL two-process jax.distributed run on the CPU backend.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np

from mic_tpu.data.dataset import CaptionDataset
from mic_tpu.data.loader import CaptionLoader
from mic_tpu.data.tokenizer import SimpleTokenizer

from test_data import make_tsv
import pytest


def test_process_shards_reassemble_global_batch(tmp_path):
    """Every rank builds the same epoch order and takes its contiguous slice:
    concatenating rank slices must give exactly the single-process batch."""
    tsv, img_dir = make_tsv(tmp_path)
    ds = CaptionDataset(tsv, img_dir)
    tk = SimpleTokenizer()
    tk.encode_targets([f"caption {i}" for i in range(10)], ["en_XX"] * 10, 6)
    tk.freeze()
    kw = dict(batch_size=4, image_size=24, max_length=6, seed=5)

    global_batches = list(CaptionLoader(ds, tk, **kw).epoch_iterator(epoch=0))
    n_proc = 2
    rank_iters = [
        CaptionLoader(ds, tk, process_shard=(r, n_proc), **kw).epoch_iterator(epoch=0)
        for r in range(n_proc)
    ]
    for gb in global_batches:
        parts = [next(it) for it in rank_iters]
        assert all(p["pixel_values"].shape[0] == 4 // n_proc for p in parts)
        for key in gb:
            np.testing.assert_array_equal(
                np.concatenate([p[key] for p in parts]), gb[key], err_msg=key
            )


_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mic_tpu.parallel.distributed import initialize_from_env
    assert initialize_from_env(), "env did not opt in"
    assert jax.process_count() == 2
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mic_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, tp=1)
    sharding = NamedSharding(mesh, P("data"))
    rank = jax.process_index()
    # global batch rows 0..7; this process holds its contiguous half
    local = np.arange(8, dtype=np.float32).reshape(8, 1)[rank * 4:(rank + 1) * 4]
    arr = jax.make_array_from_process_local_data(sharding, local)
    total = jax.jit(jnp.sum, out_shardings=None)(arr)
    assert float(total) == 28.0, float(total)
    print(f"proc {rank} OK", flush=True)
""")


@pytest.mark.slow
def test_two_process_cpu_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            MIC_TPU_COORDINATOR=f"127.0.0.1:{port}",
            MIC_TPU_NUM_PROCESSES="2",
            MIC_TPU_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for rank, p in enumerate(procs):
        out, err = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}\n{err}"
    assert "proc 0 OK" in outs[0] and "proc 1 OK" in outs[1]
