"""Mosaic-lowerability guards that run on CPU.

Interpret mode executes kernels with XLA ops, so a kernel body can pass
every CPU test yet fail to lower on real TPU. These tests trace the
kernel jaxprs and assert no op that Mosaic cannot lower sneaks in.

Known trap (hit in round 2): mixing an integer index with ``None`` in one
subscript (``a[k, :, None, ...]``) routes through jnp's advanced-indexing
path and emits a >2D ``gather`` — Mosaic raises ``NotImplementedError:
Only 2D gather is supported`` at compile time on the real chip. The
slice-style idioms (``a[k][:, None, ...]``, ``a[k:k+1]``) lower to
slice/squeeze/broadcast, which Mosaic supports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import pytest

from openmp_parallel_computing_tpu.models.mpc import riccati_pallas as rp
from openmp_parallel_computing_tpu.models.mpc import sweep_pallas as sp

H, M, B = 4, 8, 128
N, C = 2 * M, 6


def _gather_count(fn, *args) -> int:
    return str(jax.make_jaxpr(fn)(*args)).count("gather[")


@pytest.mark.parametrize("pack", [False, True])
def test_unified_sweep_has_no_gather(pack):
    bs = (8, 128) if pack else (B,)
    f = functools.partial(sp.unified_sweep, m=M, q=1.0, r=0.1, rho=1.0,
                          qe=0.5, dt=0.1, reg=1e-6, pack=pack)
    args = (jnp.zeros((N,) + bs), jnp.zeros((H + 1, N) + bs),
            jnp.zeros((H, C) + bs), jnp.zeros((H, C) + bs),
            jnp.zeros((H, C) + bs), jnp.zeros((H + 1, N) + bs),
            jnp.zeros((N,) + bs), jnp.ones((M,) + bs))
    assert _gather_count(f, *args) == 0


def test_split_sweep_kernels_have_no_gather():
    f = functools.partial(sp.backward_sweep, m=M, q=1.0, r=0.1, rho=1.0,
                          qe=0.5, dt=0.1, reg=1e-6)
    args = (jnp.zeros((H + 1, N, B)), jnp.zeros((H, C, B)),
            jnp.zeros((H, C, B)), jnp.zeros((H, C, B)),
            jnp.zeros((H + 1, N, B)), jnp.zeros((N, B)),
            jnp.ones((M, B)))
    assert _gather_count(f, *args) == 0

    g = functools.partial(sp.forward_sweep, m=M, q=1.0, r=0.1, rho=1.0,
                          qe=0.5, dt=0.1)
    gargs = (jnp.zeros((N, B)), jnp.zeros((H + 1, N, B)),
             jnp.zeros((H, C, B)), jnp.zeros((H, C, N, B)),
             jnp.zeros((H, C, B)), jnp.zeros((H, C, B)),
             jnp.zeros((H, C, B)), jnp.zeros((H + 1, N, B)),
             jnp.zeros((N, B)), jnp.ones((M, B)))
    assert _gather_count(g, *gargs) == 0


def test_fused_backward_has_no_gather():
    f = functools.partial(rp.backward_batched, reg=1e-6)
    Bb = 4
    args = (jnp.zeros((Bb, H, N, N)), jnp.zeros((Bb, H, N, C)),
            jnp.zeros((Bb, H, N)), jnp.zeros((Bb, H, C)),
            jnp.zeros((Bb, H, N, N)), jnp.zeros((Bb, H, C, C)),
            jnp.zeros((Bb, H, C, N)), jnp.zeros((Bb, N)),
            jnp.zeros((Bb, N, N)))
    assert _gather_count(f, *args) == 0


def test_multi_sweep_has_no_gather():
    f = functools.partial(sp.multi_sweep, m=M, q=1.0, r=0.1, rho=1.0,
                          qe=0.5, dt=0.1, sweeps=3, reg=1e-6)
    args = (jnp.zeros((N, B)), jnp.zeros((H + 1, N, B)),
            jnp.zeros((H, C, B)), jnp.zeros((H, C, B)),
            jnp.zeros((H, C, B)), jnp.zeros((H + 1, N, B)),
            jnp.zeros((N, B)), jnp.ones((M, B)))
    assert _gather_count(f, *args) == 0


def test_edge_pyramid_base_has_no_gather():
    from openmp_parallel_computing_tpu.ops.pipeline import edge_pyramid_base

    img = jnp.zeros((3, 64, 256), jnp.uint8)
    assert _gather_count(functools.partial(edge_pyramid_base, s=16),
                         img) == 0


def test_full_solve_has_no_gather():
    f = functools.partial(sp.full_solve, m=M, q=1.0, r=0.1, rho=1.0,
                          qe=0.5, dt=0.1, sweeps=3, admm_iters=2,
                          u_limit=1.0, reg=1e-6)
    args = (jnp.zeros((N, B)), jnp.zeros((H + 1, N, B)),
            jnp.zeros((H, C, B)), jnp.zeros((H + 1, N, B)),
            jnp.zeros((N, B)), jnp.ones((M, B)))
    assert _gather_count(f, *args) == 0
