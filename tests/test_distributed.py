"""Multi-host bring-up test: two REAL processes join a jax.distributed
coordinator over localhost (the reference tests its MPI path the same way
— mpirun-on-one-box, tests/test_parallel_linearsolver.cpp:30-80) and run
a global-view sharded computation over the union of their CPU devices."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["OPM_TPU_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import opm_tpu
from opm_tpu.parallel.distributed import (global_cell_mesh,
                                          initialize_distributed)

coord, pid = sys.argv[1], int(sys.argv[2])
rank, nproc = initialize_distributed(coordinator_address=coord,
                                     num_processes=2, process_id=pid)
assert (rank, nproc) == (pid, 2), (rank, nproc)
assert jax.device_count() == 4, jax.device_count()   # 2 procs x 2 devices

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_cell_mesh()
n = 64
# global-view array sharded over all 4 devices across both processes
arr = jax.make_array_from_callback(
    (n,), NamedSharding(mesh, P("cells")),
    lambda idx: np.arange(n, dtype=np.float64)[idx])

@jax.jit
def total(a):
    return jnp.sum(a)          # cross-process psum under the hood

out = float(total(arr))
expect = n * (n - 1) / 2.0
assert out == expect, (out, expect)

# shard_map psum across the full mesh (the convergence-norm pattern)
from functools import partial
@partial(jax.shard_map, mesh=mesh, in_specs=P("cells"), out_specs=P())
def norm1(a):
    return jax.lax.psum(jnp.sum(jnp.abs(a)), "cells")[None]

out2 = float(np.asarray(norm1(arr))[0])
assert out2 == expect, (out2, expect)
print(f"proc {rank}/{nproc}: OK global sum {out}")
"""


@pytest.mark.slow
def test_two_process_global_view(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    wfile = tmp_path / "worker.py"
    wfile.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["OPM_TPU_REPO"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(wfile), coord, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK global sum" in out
