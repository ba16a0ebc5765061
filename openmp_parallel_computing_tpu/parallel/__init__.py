"""Mesh topology, shardings, and collectives — the framework's parallel core."""

from openmp_parallel_computing_tpu.parallel import collectives  # noqa: F401
from openmp_parallel_computing_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    MeshSpec,
    data_sharding,
    initialize_multihost,
    make_mesh,
    replicated,
)
from openmp_parallel_computing_tpu.parallel.spatial import (  # noqa: F401
    sharded_edge_pipeline,
    sharded_gaussian_blur,
    sharded_grayscale,
    sharded_sobel,
)
