"""Regenerate legacy_golden.npz from the reference C kernels.

Builds /root/reference/old/parallel_convolution.c:8-24 and
old/parallel_to_grayscale.c:7-38 UNMODIFIED (their missing utils.h is
supplied here — SURVEY C17 notes the reference never committed it)
against driver.c, feeds them a deterministic crop of the canonical
golden input (tests/golden/input_1080p.png), and wraps the raw outputs
into legacy_golden.npz:

    input    (96, 128, 3)  u8   the crop (also stored, so the test needs
                                no image decode at run time)
    gblur    (96, 128, 3)  i32  1-2-1 Gaussian, truncating /16
    asym     (96, 128, 3)  i32  1..9 kernel (pins tap orientation), /16
    gray     (96, 128, 3)  i32  channel-mean grayscale
    minmax   (2,)          i32  fused min/max of the gray plane

Run from the repo root (gcc + libomp required, same toolchain as the
main golden recipe in .claude/skills/verify/SKILL.md):

    python tests/golden/legacy/generate.py
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent
REF_OLD = Path("/root/reference/old")
ROWS, COLS = 96, 128


def main() -> None:
    sys.path.insert(0, str(HERE.parents[2]))
    from openmp_parallel_computing_tpu import imgio

    img = imgio.load(HERE.parent / "input_1080p.png")          # (H, W, 3)
    # Deterministic crop: the highest-variance 96x128 tile of the frame
    # (std 74 u8 — full-range texture, so min/max and the stencils see
    # real contrast), away from borders.
    y0, x0 = 672, 896
    crop = np.ascontiguousarray(img[y0:y0 + ROWS, x0:x0 + COLS, :3])
    assert crop.shape == (ROWS, COLS, 3)

    with tempfile.TemporaryDirectory() as td:
        td = Path(td)
        exe = td / "driver"
        subprocess.run(
            ["gcc", "-O3", "-fopenmp", "-I", str(HERE),
             str(HERE / "driver.c"),
             str(REF_OLD / "parallel_convolution.c"),
             str(REF_OLD / "parallel_to_grayscale.c"),
             "-o", str(exe)],
            check=True)
        (td / "in.raw").write_bytes(crop.tobytes())
        subprocess.run(
            [str(exe), str(td / "in.raw"), str(td / "conv.raw"),
             str(td / "gray.raw"), str(td / "minmax.raw")], check=True)
        conv = np.fromfile(td / "conv.raw", np.int32).reshape(
            2, ROWS, COLS, 3)
        gray = np.fromfile(td / "gray.raw", np.int32).reshape(
            ROWS, COLS, 3)
        minmax = np.fromfile(td / "minmax.raw", np.int32)

    np.savez_compressed(HERE / "legacy_golden.npz", input=crop,
                        gblur=conv[0], asym=conv[1], gray=gray,
                        minmax=minmax)
    print(f"wrote {HERE / 'legacy_golden.npz'}: "
          f"gblur mean {conv[0].mean():.2f}, gray min/max {minmax}")


if __name__ == "__main__":
    main()
