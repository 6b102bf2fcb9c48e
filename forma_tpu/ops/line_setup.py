"""Device line setup: point chains -> per-line rasterization coefficients.

The XLA counterpart of `SegmentBuffer::fill_cpu_view`
(`forma/src/segment.rs:275-402`): one fused elementwise pass over the SoA
line arrays — per-geometry gather, affine transform, cull, grid-crossing
coefficients, Manhattan lengths — followed by `jnp.cumsum`.

v2: all per-line quantities, including the ff64 progression constants the
rasterizer needs (`rasterizer.wgsl:294-323`), are packed into ONE [L, 14]
f32 matrix + ONE [L, 2] i32 matrix, so the virtual-line expansion
downstream costs two row-gathers instead of ten scalar gathers — on TPU,
gather cost is per *row*, not per element.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import consts
from . import ff64

# params_f32 column layout:
PX0, PY0, PDX, PDY, PA, PB, PC, PD = range(8)
PAOH, PAOL, PBOH, PBOL, PCDH, PCDL = range(8, 14)
# Slot and length ride in the SAME f32 matrix as exact VALUE conversions
# (slot < 2^21, length < 2^24 — both exact in f32), so the rasterizer's
# virtual-line expansion does ONE row gather, not two.  (This is value
# conversion, NOT the round-2 bitcast that hit TPU denormal flushing.)
PSLOT, PLEN = 14, 15
N_PARAMS = 16


@partial(jax.jit, static_argnames=("width", "height", "k_seg"))
def line_setup(
    px,  # f32 [L+1] point x
    py,  # f32 [L+1] point y
    line_slot,  # i32 [L]  index into geometry tables, -1 = no line
    g_slot,  # i32 [G]  layer style slot (index into st_orders), -1 = none
    g_valid,  # bool [G]  enabled & bound to an order
    g_t,  # f32 [G, 6]  affine transform (ux, uy, vx, vy, tx, ty)
    g_has_t,  # bool [G]
    width: int,
    height: int,
    k_seg: int = 8,
):
    """Returns (params f32 [L, 14], slots i32 [L], lengths i32 [L],
    vline_ends u32 [L] inclusive-cumsum of per-line virtual-line counts)."""
    return line_setup_pairs(
        px[:-1], py[:-1], px[1:], py[1:], line_slot,
        g_slot, g_valid, g_t, g_has_t, width, height, k_seg,
    )


def line_setup_pairs(
    p0x,  # f32 [L] line start x
    p0y,  # f32 [L] line start y
    p1x,  # f32 [L] line end x
    p1y,  # f32 [L] line end y
    line_slot,  # i32 [L]  index into geometry tables, -1 = no line
    g_slot,
    g_valid,
    g_t,
    g_has_t,
    width: int,
    height: int,
    k_seg: int = 8,
):
    """`line_setup` on explicit endpoint pairs instead of a point chain.

    The line-sharded multi-chip path round-robin-permutes lines across
    shards for spatial load balance, which breaks the [L+1] chain adjacency
    — each shard gets its own (p0, p1) pair arrays instead."""

    gi = jnp.maximum(line_slot, 0)
    # ONE [L]-index row gather for all per-geometry data (gathers cost per
    # index on TPU; four separate gathers here measured ~6 ms at paris
    # scale).  slot < 2^21 and flags are exact f32 value conversions; the
    # [G, 9] pack is G-sized (~30k) and ~free.
    gmat = jnp.concatenate(
        [
            jnp.stack(
                [
                    g_slot.astype(jnp.float32),
                    g_valid.astype(jnp.float32),
                    g_has_t.astype(jnp.float32),
                ],
                axis=1,
            ),
            g_t,
        ],
        axis=1,
    )  # [G, 9] f32
    GM = gmat[gi]  # [L, 9]
    gslot_l = GM[:, 0].astype(jnp.int32)
    valid = (line_slot >= 0) & (GM[:, 1] == 1.0) & (gslot_l >= 0)
    slots = jnp.where(valid, gslot_l, 0)

    t = GM[:, 3:9]
    has_t = GM[:, 2] == 1.0
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
    c = t_offset_x
    d = t_offset_y

    def integers_between(u, v):
        mn = jnp.minimum(u, v)
        mx = jnp.maximum(u, v)
        return jnp.maximum((jnp.ceil(mx) - jnp.floor(mn) - 1.0).astype(jnp.int32), 0)

    lengths = integers_between(p0x, p1x) + integers_between(p0y, p1y) + 1
    lengths = jnp.where(valid, lengths, 0)

    # ff64 progression constants, hoisted to line granularity
    # (`rasterizer.wgsl:294-323`; round 1 recomputed them per pixel segment).
    s = a + b
    degenerate = ~jnp.isfinite(s)
    sum_ff = ff64.add(ff64.ff(a), ff64.ff(b))
    recip = ff64.div(ff64.ff(jnp.ones_like(a)), sum_ff)

    def sel_ff(x):
        return ff64.FF(
            jnp.where(degenerate, 0.0, x.hi), jnp.where(degenerate, 0.0, x.lo)
        )

    a_over = sel_ff(ff64.mul(ff64.ff(a), recip))
    b_over = sel_ff(ff64.mul(ff64.ff(b), recip))
    cd_over = sel_ff(ff64.mul(ff64.sub(ff64.ff(c), ff64.ff(d)), recip))

    pw = jnp.float32(consts.PIXEL_WIDTH)
    z = jnp.float32(0.0)
    sel = lambda v: jnp.where(valid, v, z)  # noqa: E731
    params = jnp.stack(
        [
            sel(p0x * pw),
            sel(p0y * pw),
            sel(dx * pw),
            sel(dy * pw),
            sel(a),
            sel(b),
            sel(c),
            sel(d),
            sel(a_over.hi),
            sel(a_over.lo),
            sel(b_over.hi),
            sel(b_over.lo),
            sel(cd_over.hi),
            sel(cd_over.lo),
            slots.astype(jnp.float32),
            lengths.astype(jnp.float32),
        ],
        axis=1,
    )

    n_v = -(-lengths // k_seg)  # ceil; 0 for culled lines
    vline_ends = jnp.cumsum(n_v.astype(jnp.uint32), dtype=jnp.uint32)
    return params, slots, lengths, vline_ends
