"""Config, timing, and checkpoint utilities."""

from openmp_parallel_computing_tpu.utils import config, timing  # noqa: F401
