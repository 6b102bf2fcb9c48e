"""Device line setup: point chains -> per-line rasterization coefficients.

The XLA counterpart of `SegmentBuffer::fill_cpu_view`
(`forma/src/segment.rs:275-402`): one fused elementwise pass over the SoA
line arrays — per-geometry gather, affine transform, cull, grid-crossing
coefficients, Manhattan lengths — followed by `jnp.cumsum`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import consts


@partial(jax.jit, static_argnames=("width", "height"))
def line_setup(
    px,  # f32 [L+1] point x
    py,  # f32 [L+1] point y
    line_slot,  # i32 [L]  index into geometry tables, -1 = no line
    g_order,  # u32 [G]
    g_valid,  # bool [G]  enabled & bound to an order
    g_t,  # f32 [G, 6]  affine transform (ux, uy, vx, vy, tx, ty)
    g_has_t,  # bool [G]
    width: int,
    height: int,
):
    """Returns (orders, x0, y0, dx, dy, a, b, c, d, sum_lengths)."""
    p0x, p0y = px[:-1], py[:-1]
    p1x, p1y = px[1:], py[1:]

    slot = jnp.maximum(line_slot, 0)
    valid = (line_slot >= 0) & g_valid[slot]
    orders = g_order[slot]

    t = g_t[slot]
    has_t = g_has_t[slot]
    tp0x = t[:, 0] * p0x + (t[:, 2] * p0y + t[:, 4])
    tp0y = t[:, 1] * p0x + (t[:, 3] * p0y + t[:, 5])
    tp1x = t[:, 0] * p1x + (t[:, 2] * p1y + t[:, 4])
    tp1y = t[:, 1] * p1x + (t[:, 3] * p1y + t[:, 5])
    p0x = jnp.where(has_t, tp0x, p0x)
    p0y = jnp.where(has_t, tp0y, p0y)
    p1x = jnp.where(has_t, tp1x, p1x)
    p1y = jnp.where(has_t, tp1y, p1y)

    w = jnp.float32(width)
    h = jnp.float32(height)
    skip = (
        (p0y == p1y)
        | ((p0y >= h) & (p1y >= h))
        | ((p0x >= w) & (p1x >= w))
        | ((p0y <= 0.0) & (p1y <= 0.0))
    )
    valid &= ~skip

    dx = p1x - p0x
    dy = p1y - p0y
    dx_recip = 1.0 / dx
    dy_recip = 1.0 / dy

    t_offset_x = jnp.where(
        dx != 0.0,
        jnp.maximum((jnp.ceil(p0x) - p0x) * dx_recip, (jnp.floor(p0x) - p0x) * dx_recip),
        0.0,
    )
    t_offset_y = jnp.where(
        dy != 0.0,
        jnp.maximum((jnp.ceil(p0y) - p0y) * dy_recip, (jnp.floor(p0y) - p0y) * dy_recip),
        0.0,
    )

    a = jnp.abs(dx_recip)
    b = jnp.abs(dy_recip)

    def integers_between(u, v):
        mn = jnp.minimum(u, v)
        mx = jnp.maximum(u, v)
        return jnp.maximum((jnp.ceil(mx) - jnp.floor(mn) - 1.0).astype(jnp.int32), 0)

    lengths = (
        integers_between(p0x, p1x) + integers_between(p0y, p1y) + 1
    ).astype(jnp.uint32)
    lengths = jnp.where(valid, lengths, jnp.uint32(0))

    pw = jnp.float32(consts.PIXEL_WIDTH)
    z = jnp.float32(0.0)
    sel = lambda v: jnp.where(valid, v, z)  # noqa: E731
    return (
        jnp.where(valid, orders, 0).astype(jnp.uint32),
        sel(p0x * pw),
        sel(p0y * pw),
        sel(dx * pw),
        sel(dy * pw),
        sel(a),
        sel(b),
        sel(t_offset_x),
        sel(t_offset_y),
        jnp.cumsum(lengths, dtype=jnp.uint32),
    )
