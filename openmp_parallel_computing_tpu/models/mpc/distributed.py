"""Pod-scale scenario dispatch: the MPC solve sharded over a device mesh.

BASELINE config 5 ("pod-scale MPC: 4096 scenarios sharded across hosts, ADMM
QP with ICI collectives, H=50"): scenarios shard over the mesh's data axis
(each device solves its local batch — the TPU-native replacement of the
reference's competing queue consumers), perception can shard spatially over
the model axis, and the only cross-device traffic is the diagnostics
reduction (psum/pmax) — by construction the solve itself needs no
communication, which is what makes >=85% multi-host scaling efficiency
attainable: efficiency loss is bounded by the collective latency on scalars.

Multi-host: call ``parallel.initialize_multihost()`` first (one process per
host); build the mesh over ``jax.devices()`` and feed each host its local
shard via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openmp_parallel_computing_tpu import parallel
from openmp_parallel_computing_tpu.models.mpc import costs
from openmp_parallel_computing_tpu.models.mpc import solver as _solver
from openmp_parallel_computing_tpu.models.mpc.solver import Scenario
from openmp_parallel_computing_tpu.utils.config import MPCConfig


class DistributedMPC:
    """Scenario-sharded MPC over a (data, model) mesh."""

    def __init__(self, cfg: MPCConfig, mesh: Mesh):
        self.cfg = cfg
        self.mesh = mesh
        self._step = self._build()

    def _build(self):
        cfg = self.cfg
        mesh = self.mesh
        data_axis = parallel.DATA_AXIS
        use_spatial = mesh.shape[parallel.MODEL_AXIS] > 1

        @jax.jit
        def step(frame, scen: Scenario):
            if use_spatial:
                edge_img = parallel.sharded_edge_pipeline(frame, mesh)
            else:
                from openmp_parallel_computing_tpu.ops.pipeline import (
                    edge_pipeline)
                edge_img = edge_pipeline(frame)
            edge = edge_img[0].astype(jnp.float32)
            pyramid = costs.build_cost_pyramid(edge)
            sol = jax.vmap(
                lambda s: _solver._solve_single(pyramid, edge.shape, s,
                                                cfg))(scen)
            # Mesh-wide diagnostics; XLA inserts the collectives (the ADMM
            # QP's only cross-device reduction).
            return (sol.us[:, 0], jnp.mean(sol.cost),
                    jnp.max(sol.primal_residual))

        return step

    def shard_scenarios(self, scen: Scenario) -> Scenario:
        """Shard a scenario batch over the data axis.

        Single-process: ``scen`` is the global batch (device_put spreads
        it). Multi-host: ``scen`` is this process's LOCAL batch; the global
        array is assembled from per-process shards (the DCN feed pattern —
        each host contributes the scenarios it ingested, replacing the
        reference's per-worker queue consumption)."""
        sharding = NamedSharding(self.mesh, P(parallel.DATA_AXIS))
        if jax.process_count() > 1:
            return jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(
                    sharding, a), scen)
        return jax.tree.map(lambda a: jax.device_put(a, sharding), scen)

    def solve(self, frame, scen: Scenario):
        """frame (C, H, W) u8 (replicated or spatially sharded), scenario
        batch divisible by the data-axis size. Returns (u0 batch, mean cost,
        max primal residual)."""
        n = self.mesh.shape[parallel.DATA_AXIS]
        global_batch = scen.p0.shape[0] * jax.process_count()
        if global_batch % n:
            raise ValueError(
                f"global scenario batch {global_batch} not divisible by "
                f"data axis {n}")
        return self._step(frame, self.shard_scenarios(scen))
