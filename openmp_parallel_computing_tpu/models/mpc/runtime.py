"""Receding-horizon MPC runtime: the per-frame production control loop.

Holds the warm-start state between frames (shift-by-one control sequences —
the standard receding-horizon warm start), applies the first control, and
supports checkpoint/resume of the full runtime state
(``utils.checkpoint``) so a restarted controller continues from its last
solution instead of cold-starting — the persistence capability the
reference's stack lacks entirely (its frontend loses all job state on
restart, ``event-driven/frontend/app.py:38``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from openmp_parallel_computing_tpu.models.mpc.dynamics import CONTROL_DIM
from openmp_parallel_computing_tpu.models.mpc.solver import (
    Scenario,
    VisualServoMPC,
)
from openmp_parallel_computing_tpu.utils import checkpoint
from openmp_parallel_computing_tpu.utils.config import MPCConfig


class MPCRuntime:
    def __init__(self, cfg: MPCConfig | None = None,
                 ckpt_dir: str | os.PathLike | None = None):
        self.cfg = cfg or MPCConfig()
        self.mpc = VisualServoMPC(self.cfg)
        self.ckpt_dir = ckpt_dir
        self.scen: Scenario | None = None
        self.frame_idx = 0

    # -- lifecycle --------------------------------------------------------

    def reset(self, p0, target, depth) -> None:
        """Start a control episode for a scenario batch."""
        n = np.asarray(p0).shape[0]
        self.scen = self.mpc._seed_duals(Scenario(
            p0=jnp.asarray(p0), target=jnp.asarray(target),
            depth=jnp.asarray(depth),
            us0=jnp.zeros((n, self.cfg.horizon, CONTROL_DIM),
                          jnp.float32)))
        self.frame_idx = 0

    def step(self, frame) -> jax.Array:
        """One camera frame in -> first controls out; warm-starts the next
        frame by shifting the optimized sequence one step."""
        if self.scen is None:
            raise RuntimeError("call reset() first")
        u0, sol = self.mpc.control_step(jnp.asarray(frame), self.scen)
        # Receding horizon: advance the predicted state, shift controls.
        shifted = jnp.concatenate(
            [sol.us[:, 1:], jnp.zeros_like(sol.us[:, :1])], axis=1)
        # Dual warm start (MPCConfig.dual_warm_start; seeded by reset()
        # via _seed_duals, so sol.dual is present exactly when the carry
        # is active): shift last solve's decayed ADMM scaled duals the
        # same zero-fill way the control plan is shifted — the one
        # convention every loop and quality study shares
        # (solver._shift_tail_zero).
        y0 = None
        if sol.dual is not None:
            y0 = self.cfg.dual_decay * jnp.concatenate(
                [sol.dual[:, 1:], jnp.zeros_like(sol.dual[:, :1])], axis=1)
        self.scen = Scenario(p0=sol.ps[:, 1], target=self.scen.target,
                             depth=self.scen.depth, us0=shifted, y0=y0)
        self.frame_idx += 1
        if self.ckpt_dir is not None:
            self.save_checkpoint()
        return u0

    # -- persistence ------------------------------------------------------

    def save_checkpoint(self) -> None:
        checkpoint.save(
            os.path.join(self.ckpt_dir, f"ckpt_{self.frame_idx:08d}.npz"),
            {"frame_idx": np.int64(self.frame_idx),
             "scen": self.scen._asdict()})

    def restore_latest(self) -> bool:
        """Resume from the newest checkpoint; returns True if one existed."""
        path = checkpoint.latest(self.ckpt_dir)
        if path is None:
            return False
        state = checkpoint.restore(path)
        self.frame_idx = int(state["frame_idx"])
        s = state["scen"]
        y0 = s.get("y0")  # absent in pre-dual-carry checkpoints
        self.scen = self.mpc._seed_duals(Scenario(
            p0=jnp.asarray(s["p0"]),
            target=jnp.asarray(s["target"]),
            depth=jnp.asarray(s["depth"]),
            us0=jnp.asarray(s["us0"]),
            y0=None if y0 is None else jnp.asarray(y0)))
        return True
