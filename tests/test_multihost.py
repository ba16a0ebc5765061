"""Multi-host (DCN tier) tests: two real processes, each feeding 4 virtual
devices, coordinate into one 8-device mesh — the closest single-box rehearsal
of the pod-scale deployment (one JAX process per host)."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent("""
    import os, sys
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    os.environ["OMPC_COORDINATOR"] = f"localhost:{port}"
    os.environ["OMPC_NUM_PROCESSES"] = str(nproc)
    os.environ["OMPC_PROCESS_ID"] = str(pid)
    from openmp_parallel_computing_tpu import parallel
    parallel.initialize_multihost()
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc

    import numpy as np
    import jax.numpy as jnp
    from openmp_parallel_computing_tpu.models.mpc import (
        DistributedMPC, Scenario)
    from openmp_parallel_computing_tpu.utils.config import MPCConfig

    cfg = MPCConfig(horizon=4, num_features=2, ilqr_iters=1, admm_iters=1)
    mesh = parallel.make_mesh(data=jax.device_count(), model=1)
    dmpc = DistributedMPC(cfg, mesh)
    rng = np.random.default_rng(pid)
    m = cfg.num_features
    local = 8  # scenarios ingested by this host
    scen = Scenario(
        p0=jnp.asarray(rng.uniform(-0.5, 0.5, (local, 2 * m)), jnp.float32),
        target=jnp.zeros((local, 2 * m), jnp.float32),
        depth=jnp.ones((local, m), jnp.float32) * 2.0,
        us0=jnp.zeros((local, cfg.horizon, 6), jnp.float32))
    frame = np.zeros((3, 16, 128), np.uint8)
    u0, mean_cost, res = dmpc.solve(frame, scen)
    assert u0.shape[0] == local * nproc
    assert bool(jnp.isfinite(mean_cost))

    # Model-sharded mesh across hosts: the frame must be assembled into a
    # GLOBAL array sharded over MODEL (regression: _prepare used to leave
    # it host-local in multi-process mode, which only the fully-replicated
    # spec tolerates).
    mesh2 = parallel.make_mesh(data=jax.device_count() // 2, model=2)
    dmpc2 = DistributedMPC(cfg, mesh2)
    u0b, cost_b, _ = dmpc2.solve(frame, scen)
    assert u0b.shape[0] == local * nproc
    assert abs(float(cost_b) - float(mean_cost)) < 1e-3 * (
        1.0 + abs(float(mean_cost)))
    print(f"OK proc={pid} cost={float(mean_cost):.4f}")
""")


def test_two_process_distributed_solve(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ,
               PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=220)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"OK proc={i}" in out
    # both processes computed the same global mean cost
    costs = [out.split("cost=")[1].split()[0] for out in outs]
    assert costs[0] == costs[1]
