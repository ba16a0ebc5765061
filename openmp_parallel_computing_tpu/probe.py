"""Capability probe.

Twin of the reference's only compiled "test", the OpenMP support probe
(``monolithic/src/test_openmp.c:7-14`` printing the ``_OPENMP`` macro):
reports whether the TPU runtime is available, what the device fleet looks
like, and whether the Pallas compute path actually works (a tiny kernel is
compiled and executed).

    python -m openmp_parallel_computing_tpu.probe
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def probe() -> dict:
    info: dict = {
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "device_count": jax.device_count(),
        "process_count": jax.process_count(),
    }
    try:
        from openmp_parallel_computing_tpu import ops

        x = jnp.zeros((3, 8, 128), jnp.uint8)
        out = ops.grayscale(x)
        jax.block_until_ready(out)
        info["pallas"] = "supported"
    except Exception as exc:  # pragma: no cover - environment specific
        info["pallas"] = f"NOT supported: {exc!r}"
    return info


def main() -> None:
    info = probe()
    if info["pallas"] == "supported":
        print(f"TPU compute path supported: backend={info['backend']} "
              f"devices={info['device_count']} "
              f"processes={info['process_count']}")
    else:
        print(f"TPU compute path NOT supported ({info['pallas']}); "
              f"backend={info['backend']}")
    for d in info["devices"]:
        print(f"  {d}")


if __name__ == "__main__":
    main()
