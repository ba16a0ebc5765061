"""In-package benchmark fixtures.

The reference repo ships its benchmark inputs in-tree
(``/root/reference/images/``; the canonical 1080p input is named at
``README.md:28``). This package does the same so every bench, study, and
example runs from a clean checkout — no external mount required.

``frame_1080p.png`` is a lossless re-encode of the canonical 1920x1080
benchmark photograph (the same pixels the golden-parity fixtures in
``tests/golden/`` were generated from, so bench inputs and parity inputs
agree byte-for-byte).
"""

from __future__ import annotations

from pathlib import Path

_HERE = Path(__file__).resolve().parent

# Optional richer fixture set: used only when the reference repo is mounted
# (multi-megapixel inputs for the size-scaling studies).
REFERENCE_IMAGES = Path("/root/reference/images")


def frame_path() -> Path:
    """Path of the canonical 1080p benchmark frame (1920x1080 RGB PNG)."""
    return _HERE / "frame_1080p.png"


def load_frame_hwc():
    """Decode the canonical benchmark frame to an (H, W, C) u8 array."""
    from openmp_parallel_computing_tpu import imgio

    return imgio.load(frame_path())


def load_frame_planar():
    """Decode the canonical benchmark frame to a planar (C, H, W) u8
    jax array — the layout every kernel and the MPC front-end consume."""
    import jax.numpy as jnp
    import numpy as np

    return jnp.asarray(np.transpose(load_frame_hwc(), (2, 0, 1)))
