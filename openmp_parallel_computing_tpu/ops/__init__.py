"""Pallas TPU kernels + pure-jnp twins for the framework's stencil/reduction ops."""

from openmp_parallel_computing_tpu.ops import xla_ref  # noqa: F401
from openmp_parallel_computing_tpu.ops.conv import conv3x3, gaussian_blur  # noqa: F401
from openmp_parallel_computing_tpu.ops.grayscale import grayscale  # noqa: F401
from openmp_parallel_computing_tpu.ops.pipeline import (  # noqa: F401
    edge_pipeline,
    edge_pyramid_base,
)
from openmp_parallel_computing_tpu.ops.reductions import (  # noqa: F401
    channel_mean,
    channel_sum,
    grayscale_mean_minmax,
)
from openmp_parallel_computing_tpu.ops.sobel import sobel  # noqa: F401
from openmp_parallel_computing_tpu.ops.xla_ref import (  # noqa: F401
    chw_to_hwc,
    hwc_to_chw,
)
from openmp_parallel_computing_tpu.ops.runner import (  # noqa: F401,E402
    # imported last: runner's built-in registration needs the ops above
    KernelSpec,
    kernel_names,
    make_runner,
    register_kernel,
    unregister_kernel,
)
