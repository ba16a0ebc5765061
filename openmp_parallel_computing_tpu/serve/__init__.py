"""Synchronous HTTP serving layer (reference microservice contract)."""

from openmp_parallel_computing_tpu.serve.client import run_request  # noqa: F401
from openmp_parallel_computing_tpu.serve.server import serve  # noqa: F401

