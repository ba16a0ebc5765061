"""Shared warm-start-chain measurement harness for the MPC benches.

One implementation of the repo's throughput methodology (see the repo-root
``bench.py`` docstring for the full rationale): reps form a warm-start
dependency chain (each rep's ``us0`` is the previous rep's shifted plan),
so the device executes them strictly in order and the final
result-dependent fetch proves the whole chain ran — per-call host syncs
would measure the dev relay's ~30 ms RTT instead of the device
(results/tpu_v5e/latency_floor.json). Used by ``bench.mpc_batch``,
``bench.pack_study``, and ``bench.chains`` so methodology fixes land once.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def load_headline_frame() -> jax.Array:
    """The canonical 1080p benchmark input as a planar (C, H, W) u8 array.

    Ships in-package (``openmp_parallel_computing_tpu.data``) so the bench
    runs from a clean checkout without the reference mount."""
    from openmp_parallel_computing_tpu import data

    return data.load_frame_planar()


def chain_throughput(mpc, frame, batch: int, reps: int,
                     trials: int = 1, seed: int = 0) -> list[float]:
    """Measure ``trials`` back-to-back warm-start chains of ``reps`` full
    control steps; returns solves/s per trial. Compile + sync happen before
    timing; the final controls are asserted finite (a NaN-producing kernel
    regression must fail the bench, not report a plausible number)."""
    scen = mpc.random_scenarios(jax.random.PRNGKey(seed), batch)
    scen = jax.tree.map(jax.device_put, scen)

    def step(s):
        u0, sol = mpc.control_step(frame, s)
        return u0, s._replace(us0=jnp.roll(sol.us, -1, axis=1))

    u0, s = step(scen)
    np.asarray(u0)  # compile + honest sync (relay: block_until_ready lies)

    vals = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            u0, s = step(s)
        np.asarray(u0)  # result-dependent fetch == chain completion
        vals.append(batch * reps / (time.perf_counter() - t0))
    assert np.all(np.isfinite(np.asarray(u0)))
    return vals
