"""True multi-process distributed test: two jax processes (gloo CPU
collectives) form one 4-device SNP mesh, run the batched EM on a global
sharded array, and must reproduce the single-process result exactly
(iteration counts included)."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
sys.path.insert(0, sys.argv[4])
import numpy as np
from wgsassign_tpu.ops.emmaf import em_maf_pops
from wgsassign_tpu.parallel.mesh import make_runtime

rng = np.random.default_rng(7)
m, n, k = 64, 12, 3
raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
g0, g1 = raw[:, :, 0], raw[:, :, 1]
pop_index = (np.arange(n) % k).astype(np.int32)
membership = np.zeros((n, k), dtype=np.float32)
membership[np.arange(n), pop_index] = 1.0
sw = np.ones(m, np.float32)

rt = make_runtime()  # all 4 global devices
assert rt.n_devices == 4
f, iters, conv = em_maf_pops(
    rt.shard_sites(g0), rt.shard_sites(g1), rt.replicate(membership),
    rt.replicate(pop_index), rt.shard_sites(sw), m, 200, 1e-4,
)
from jax.experimental import multihost_utils
f_all = multihost_utils.process_allgather(f, tiled=True)
if pid == 0:
    np.savez(sys.argv[5], f=np.asarray(f_all), iters=np.asarray(iters))
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_em(tmp_path):
    repo = str(pathlib.Path(__file__).parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    out = tmp_path / "result.npz"
    port = "9923"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", port, repo, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{log[-3000:]}"
        assert f"WORKER_OK {i}" in log

    # single-process reference
    import jax

    from wgsassign_tpu.ops.emmaf import em_maf_pops
    from wgsassign_tpu.parallel.mesh import make_runtime

    rng = np.random.default_rng(7)
    m, n, k = 64, 12, 3
    raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
    g0, g1 = raw[:, :, 0], raw[:, :, 1]
    pop_index = (np.arange(n) % k).astype(np.int32)
    membership = np.zeros((n, k), dtype=np.float32)
    membership[np.arange(n), pop_index] = 1.0
    rt = make_runtime(jax.devices()[:4])
    f_ref, iters_ref, _ = em_maf_pops(
        rt.shard_sites(g0), rt.shard_sites(g1), rt.replicate(membership),
        rt.replicate(pop_index), rt.shard_sites(np.ones(m, np.float32)),
        m, 200, 1e-4,
    )
    got = np.load(out)
    np.testing.assert_array_equal(got["iters"], np.asarray(iters_ref))
    np.testing.assert_allclose(got["f"], np.asarray(f_ref), atol=1e-6)


_WORKER_SHARDED_LOAD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
sys.path.insert(0, sys.argv[4])
import numpy as np
from wgsassign_tpu.ops.loglik import assign_loglik
from wgsassign_tpu.parallel.mesh import (
    make_runtime, make_global_sites_array, process_row_range,
)

# deterministic synthetic "file": every process can build all rows but only
# loads its own block, as a real per-host Beagle shard loader would
rng = np.random.default_rng(11)
m, n, k = 50, 6, 2
raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
af = rng.uniform(0.1, 0.9, size=(m, k)).astype(np.float32)

rt = make_runtime()
lo, hi, per = process_row_range(m, multiple=rt.n_devices // nproc)
m_pad = per * nproc

def pad_block(rows, fill):
    out = np.full((per,) + rows.shape[1:], fill, dtype=rows.dtype)
    out[: rows.shape[0]] = rows
    return out

g0 = make_global_sites_array(rt, pad_block(raw[lo:hi, :, 0], 1.0), m_pad)
g1 = make_global_sites_array(rt, pad_block(raw[lo:hi, :, 1], 0.0), m_pad)
afd = make_global_sites_array(rt, pad_block(af[lo:hi], 0.5), m_pad)
w = make_global_sites_array(
    rt, pad_block(np.ones(hi - lo, np.float32), 0.0), m_pad
)
ll = assign_loglik(g0, g1, afd, w)
from jax.experimental import multihost_utils
ll_all = multihost_utils.process_allgather(ll, tiled=True)
if pid == 0:
    np.savez(sys.argv[5], ll=np.asarray(ll_all))
print("WORKER_OK", pid, flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_loading(tmp_path):
    """Per-process row-block loading -> global array -> sharded LL reduce,
    vs a single-process full computation."""
    repo = str(pathlib.Path(__file__).parent.parent)
    worker = tmp_path / "worker2.py"
    worker.write_text(_WORKER_SHARDED_LOAD)
    out = tmp_path / "res.npz"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", "9929", repo, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"worker {i} failed:\n{log[-3000:]}"

    from wgsassign_tpu.ops.loglik import assign_loglik as ll_fn
    import jax

    from wgsassign_tpu.parallel.mesh import make_runtime

    rng = np.random.default_rng(11)
    m, n, k = 50, 6, 2
    raw = rng.dirichlet(np.ones(3), size=(m, n)).astype(np.float32)
    af = rng.uniform(0.1, 0.9, size=(m, k)).astype(np.float32)
    rt = make_runtime(jax.devices()[:4])
    # same padded size the workers used (m=50 -> per-proc 26 -> 52 rows)
    expect = np.asarray(
        ll_fn(
            rt.shard_sites(np.concatenate([raw[:, :, 0], np.ones((2, n), np.float32)])),
            rt.shard_sites(np.concatenate([raw[:, :, 1], np.zeros((2, n), np.float32)])),
            rt.shard_sites(np.concatenate([af, np.full((2, k), 0.5, np.float32)])),
            rt.shard_sites(np.concatenate([np.ones(m, np.float32), np.zeros(2, np.float32)])),
        )
    )
    got = np.load(out)["ll"]
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-4)
