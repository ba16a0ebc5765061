"""Asynchronous batch tier: durable queue + object store + worker + frontend."""

from openmp_parallel_computing_tpu.dispatch.queue import DurableQueue, Job  # noqa: F401
from openmp_parallel_computing_tpu.dispatch.store import ObjectStore  # noqa: F401
from openmp_parallel_computing_tpu.dispatch.worker import Worker  # noqa: F401
