"""Model families: the vision pipeline and the visual-servo MPC engine."""

from openmp_parallel_computing_tpu.models import mpc  # noqa: F401
