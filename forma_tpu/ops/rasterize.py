"""Device rasterizer: lines -> sorted packed pixel segments.

The XLA counterpart of `Rasterizer::{rasterize,sort}`
(`forma/src/cpu/rasterizer.rs`).  Work is sharded per output pixel segment:
slot i binary-searches the length prefix sum for its owning line (the same
searchsorted trick as `PrefixScanIter` / `rasterizer.wgsl:199-214`), then
computes the i-th element of the merged grid-crossing progressions in
float-float arithmetic (`ops/ff64.py`) to match the reference CPU's f64.

Pixel segments are packed into two u32 sort keys

    key_hi = (tile_y + 1) << 13 | (tile_x + 1)       (sentinel 0xFFFFFFFF)
    key_lo = layer_id

plus two u32 payload words; `jax.lax.sort` with num_keys=2 reproduces the
reference's (tile_y, tile_x, layer) u64 ordering.  Payload sub-fields
(local x/y, area, cover) need no sorting because downstream accumulation is
integer addition.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import consts
from . import ff64

SENTINEL = jnp.uint32(0xFFFFFFFF)
TX_BITS = 13  # tile_x+1 fits 13 bits (max 4096 tiles of width 16)


def _find(i, a_over, b_over, cd_over, a, b, c, d):
    """i-th element of the merged progressions (`rasterizer.rs:32-61`)."""
    fi = i.astype(jnp.float32)
    ja = jnp.where(
        jnp.isfinite(b),
        ff64.ceil(ff64.sub(ff64.mul(b_over, ff64.ff(fi)), cd_over)),
        fi,
    )
    jb = jnp.where(
        jnp.isfinite(a),
        ff64.ceil(ff64.add(ff64.mul(a_over, ff64.ff(fi)), cd_over)),
        fi,
    )
    guess_a = a * ja + c
    guess_b = b * jb + d
    # Rust f32::min returns the non-NaN operand.
    guess_a = jnp.where(jnp.isnan(guess_a), jnp.inf, guess_a)
    guess_b = jnp.where(jnp.isnan(guess_b), jnp.inf, guess_b)
    return jnp.minimum(guess_a, guess_b)


@partial(jax.jit, static_argnames=("seg_cap", "rows", "tiles_x"))
def rasterize_sort(
    orders,
    x0,
    y0,
    dx,
    dy,
    a,
    b,
    c,
    d,
    sum_lengths,  # u32 [L] inclusive prefix sum
    total,  # u32 scalar, actual segment count (<= seg_cap)
    seg_cap: int,
    rows: int,
    tiles_x: int,
    row_lo=0,  # traced: first tile row owned by this shard
):
    """Returns sorted (key_hi, key_lo, pos, ac) u32 arrays of length seg_cap.

    pos = local_x << 4 | local_y;  ac = (area + 1024) << 6 | (cover + 16).
    Tile rows are shard-local: a segment in absolute row r gets key row
    r - row_lo, and rows outside [row_lo, row_lo + rows) are dropped — this
    is what lets `shard_map` split the framebuffer across chips.
    """
    i = jnp.arange(seg_cap, dtype=jnp.uint32)
    li = jnp.searchsorted(sum_lengths, i, side="right").astype(jnp.int32)
    li = jnp.minimum(li, sum_lengths.shape[0] - 1)
    base = jnp.where(li > 0, sum_lengths[jnp.maximum(li - 1, 0)], 0)
    seg_i = (i - base).astype(jnp.int32)
    in_range = i < total

    av, bv, cv, dv = a[li], b[li], c[li], d[li]

    # get_ith_pixel_segment_params (`rasterizer.rs:63-76`).
    ii = seg_i - (cv != 0.0).astype(jnp.int32) - (dv != 0.0).astype(jnp.int32)

    s = av + bv
    degenerate = ~jnp.isfinite(s)
    sum_ff = ff64.add(ff64.ff(av), ff64.ff(bv))
    recip = ff64.div(ff64.ff(jnp.ones_like(av)), sum_ff)
    zero_ff = ff64.ff(jnp.zeros_like(av))

    def sel_ff(x):
        return ff64.FF(
            jnp.where(degenerate, 0.0, x.hi), jnp.where(degenerate, 0.0, x.lo)
        )

    a_over = sel_ff(ff64.mul(ff64.ff(av), recip))
    b_over = sel_ff(ff64.mul(ff64.ff(bv), recip))
    cd_over = sel_ff(ff64.mul(ff64.sub(ff64.ff(cv), ff64.ff(dv)), recip))
    del zero_ff

    t0 = jnp.maximum(_find(ii, a_over, b_over, cd_over, av, bv, cv, dv), 0.0)
    t1 = jnp.minimum(_find(ii + 1, a_over, b_over, cd_over, av, bv, cv, dv), 1.0)

    x0v, y0v, dxv, dyv = x0[li], y0[li], dx[li], dy[li]
    x0f = t0 * dxv + x0v
    y0f = t0 * dyv + y0v
    x1f = t1 * dxv + x0v
    y1f = t1 * dyv + y0v

    def round_(v):
        return jnp.floor(v + 0.5).astype(jnp.int32)

    x0s, x1s, y0s, y1s = round_(x0f), round_(x1f), round_(y0f), round_(y1f)

    border_x = jnp.minimum(x0s, x1s) >> consts.PIXEL_SHIFT
    border_y = jnp.minimum(y0s, y1s) >> consts.PIXEL_SHIFT

    tile_x = border_x >> consts.TILE_WIDTH_SHIFT
    tile_y = border_y >> consts.TILE_HEIGHT_SHIFT
    local_x = (border_x & (consts.TILE_WIDTH - 1)).astype(jnp.uint32)
    local_y = (border_y & (consts.TILE_HEIGHT - 1)).astype(jnp.uint32)

    border = (border_x << consts.PIXEL_SHIFT) + consts.PIXEL_WIDTH
    cover = y1s - y0s
    mult = jnp.abs(x1s - x0s) + 2 * (border - jnp.maximum(x0s, x1s))
    area = mult * cover

    # Tiles left of the viewport clamp to tile -1 (cover-carry catch-all);
    # rows above/below and tiles right of the viewport are dropped — they can
    # never affect painted pixels (`pixel_segment.rs:47-52`,
    # `painter/mod.rs:732-734`).
    tile_x = jnp.maximum(tile_x, -1)
    tile_y = tile_y - jnp.int32(row_lo)
    valid = in_range & (tile_y >= 0) & (tile_y < rows) & (tile_x < tiles_x)

    key_hi = ((tile_y + 1).astype(jnp.uint32) << TX_BITS) | (tile_x + 1).astype(
        jnp.uint32
    )
    key_hi = jnp.where(valid, key_hi, SENTINEL)
    key_lo = jnp.where(valid, orders[li] & jnp.uint32(consts.LAYER_LIMIT), 0)

    pos = (local_x << 4) | local_y
    ac = ((area + 1024).astype(jnp.uint32) << 6) | (cover + 16).astype(jnp.uint32)
    zero_ac = (jnp.uint32(1024) << 6) | jnp.uint32(16)
    ac = jnp.where(valid, ac, zero_ac)
    pos = jnp.where(valid, pos, 0)

    key_hi, key_lo, pos, ac = jax.lax.sort(
        (key_hi, key_lo, pos, ac), num_keys=2
    )
    return key_hi, key_lo, pos, ac


def unpack_ac(ac):
    """ac u32 -> (area i32, cover i32)."""
    area = (ac >> 6).astype(jnp.int32) - 1024
    cover = (ac & jnp.uint32(63)).astype(jnp.int32) - 16
    return area, cover


def unpack_pos(pos):
    """pos u32 -> (local_x, local_y) i32."""
    return (pos >> 4).astype(jnp.int32), (pos & jnp.uint32(15)).astype(jnp.int32)
