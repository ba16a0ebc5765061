"""Stage costs for the visual-servo MPC.

Two ingredients:

- quadratic feature tracking + control effort (classic IBVS objective);
- an edge-attraction term evaluated on the device-resident Sobel edge map
  produced by ``ops.edge_pipeline`` — the stage cost "evaluated on
  edge-feature cost maps" of the BASELINE north star. Features are pulled
  toward strong edges via bilinear sampling of the (negated, normalized)
  edge magnitude; gradients flow through the sampler by autodiff.

All functions are per-scenario; batch with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(field: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample a (H, W) float field at continuous pixel coords.

    xy is (m, 2) as (x, y) in pixel units; out-of-bounds clamps to the
    border. Differentiable in xy.
    """
    h, w = field.shape
    x = jnp.clip(xy[:, 0], 0.0, float(w - 1))
    y = jnp.clip(xy[:, 1], 0.0, float(h - 1))
    # Clamp the *cell* index so the +1 gather stays in bounds; the fractional
    # weight then reaches exactly 1.0 at the far border (exact on-grid
    # values everywhere, including the last row/column).
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = x - x0
    fy = y - y0
    v00 = field[y0, x0]
    v01 = field[y0, x0 + 1]
    v10 = field[y0 + 1, x0]
    v11 = field[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


def normalized_to_pixels(p: jax.Array, height: int, width: int) -> jax.Array:
    """(2m,) normalized coords in [-1, 1] -> (m, 2) pixel coords."""
    pts = p.reshape(-1, 2)
    x = (pts[:, 0] + 1.0) * 0.5 * (width - 1)
    y = (pts[:, 1] + 1.0) * 0.5 * (height - 1)
    return jnp.stack([x, y], axis=-1)


def edge_cost(edge_map: jax.Array, p: jax.Array) -> jax.Array:
    """Edge-attraction cost: mean (1 - E/255) over features; E from the u8
    Sobel magnitude map. Low where features sit on strong edges."""
    xy = normalized_to_pixels(p, *edge_map.shape)
    e = bilinear_sample(edge_map, xy) / 255.0
    return jnp.mean(1.0 - e)


# Pyramid scales for the edge cost-to-go field. A raw edge map gives zero
# gradient more than one pixel from an edge (bilinear support); coarse
# average-pooled levels extend the basin of attraction across the whole
# frame, coarse-to-fine, like a soft distance transform.
PYRAMID_SCALES = (1, 8, 64)


def avg_pool(field: jax.Array, s: int) -> jax.Array:
    """(H, W) -> (ceil(H/s), ceil(W/s)) mean pooling (zero-padded)."""
    if s == 1:
        return field
    summed = jax.lax.reduce_window(
        field, 0.0, jax.lax.add, (s, s), (s, s), "SAME")
    return summed / float(s * s)


def build_cost_pyramid(edge_map: jax.Array,
                       scales=PYRAMID_SCALES) -> tuple[jax.Array, ...]:
    """Precompute the multi-scale edge field once per frame (device-resident,
    shared by every scenario in the batch)."""
    return tuple(avg_pool(edge_map, s) for s in scales)


def edge_cost_pyramid(pyramid, p: jax.Array, height: int,
                      width: int, scales=PYRAMID_SCALES) -> jax.Array:
    """Mean edge-attraction cost over pyramid levels; differentiable in p
    with non-vanishing gradients at every distance from an edge."""
    xy = normalized_to_pixels(p, height, width)
    total = 0.0
    for level, s in zip(pyramid, scales):
        e = bilinear_sample(level, xy / s) / 255.0
        total = total + jnp.mean(1.0 - e)
    return total / len(pyramid)


def make_stage_cost(pyramid, shape: tuple[int, int], target: jax.Array,
                    q_track: float, r_ctrl: float, q_edge: float):
    """Build l(p, u) for one scenario over a precomputed cost pyramid.

    ``pyramid`` from ``build_cost_pyramid``; ``shape`` is the (H, W) of the
    base edge map.
    """
    h, w = shape

    def l(p, u):
        track = q_track * jnp.sum((p - target) ** 2)
        ctrl = r_ctrl * jnp.sum(u ** 2)
        edge = q_edge * edge_cost_pyramid(pyramid, p, h, w)
        return track + ctrl + edge

    return l


def make_terminal_cost(pyramid, shape: tuple[int, int], target: jax.Array,
                       q_track: float, q_edge: float):
    h, w = shape

    def lf(p):
        return (q_track * jnp.sum((p - target) ** 2)
                + q_edge * edge_cost_pyramid(pyramid, p, h, w))

    return lf
