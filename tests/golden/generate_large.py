"""Regenerate the LARGE-fixture goldens from the reference C binaries.

Round-4 VERDICT missing #1: golden parity stopped at 1080p while the
reference keeps multi-megapixel fixtures (its ``images/`` tree) and kept
per-thread-count outputs for correctness-under-parallelism (SURVEY §4.4).
This script builds the reference monolithic sources UNMODIFIED
(``monolithic/src/main.c`` grayscale driver and ``main_with_sobel.c``
gray→Sobel pipeline driver, with the repo's own Makefile flags
``-O3 -march=native -ffast-math -funroll-loops -fopenmp``) and runs them
on the in-package PNG fixtures (lossless, so both pipelines decode
identical pixels — stb vs libjpeg JPEG IDCTs differ by ±2):

    data/photo_half_mega.png  (~0.5 MP)
    data/photo_6mp.png        (6 MP)

Outputs committed as single-channel PNGs (the reference writes equal RGB
gray planes; channel 0 carries everything — 2-3x smaller goldens):

    tests/golden/gray_half_mega.png   tests/golden/edge_half_mega.png
    tests/golden/gray_6mp.png         tests/golden/edge_6mp.png

Usage (repo root):  python tests/golden/generate_large.py
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
REF = Path("/root/reference/monolithic")
CFLAGS = ["-O3", "-march=native", "-ffast-math", "-funroll-loops",
          "-fopenmp"]


def main() -> None:
    sys.path.insert(0, str(HERE.parents[1]))
    from openmp_parallel_computing_tpu import data, imgio

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        gray_exe, edge_exe = td / "gray", td / "edge"
        for exe, mains in ((gray_exe, ["main.c", "parallel_to_grayscale.c"]),
                           (edge_exe, ["main_with_sobel.c",
                                       "parallel_to_grayscale.c",
                                       "sobel.c"])):
            subprocess.run(
                ["gcc", *CFLAGS, "-I", str(REF / "include"),
                 *[str(REF / "src" / m) for m in mains],
                 "-o", str(exe), "-lm"], check=True)

        for name, fixture in (("half_mega", data.half_mega_path()),
                              ("6mp", data.six_mp_path())):
            for tag, exe in (("gray", gray_exe), ("edge", edge_exe)):
                out = td / f"{tag}_{name}.png"
                subprocess.run([str(exe), str(fixture), str(out), "1"],
                               check=True, capture_output=True)
                img = imgio.load(out)
                # equal RGB planes -> keep channel 0 (edge driver already
                # writes 1 channel; gray driver writes the frame's count)
                imgio.save_png(HERE / f"{tag}_{name}.png",
                               np.ascontiguousarray(img[:, :, 0]))
                print(f"{tag}_{name}.png  {img.shape}")


if __name__ == "__main__":
    main()
