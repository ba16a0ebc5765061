"""Visual-servo MPC engine: dynamics, costs, Riccati/iLQR+ADMM solver."""

from openmp_parallel_computing_tpu.models.mpc import (  # noqa: F401
    costs,
    dynamics,
    riccati,
)
from openmp_parallel_computing_tpu.models.mpc.distributed import (  # noqa: F401
    DistributedMPC,
)
from openmp_parallel_computing_tpu.models.mpc.runtime import (  # noqa: F401
    MPCRuntime,
)
from openmp_parallel_computing_tpu.models.mpc.sysid import (  # noqa: F401
    DepthEstimator,
)
from openmp_parallel_computing_tpu.models.mpc.solver import (  # noqa: F401
    Scenario,
    Solution,
    VisualServoMPC,
)
