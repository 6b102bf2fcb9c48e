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


@partial(jax.jit, static_argnames=("seg_cap", "rows", "tiles_x", "slot_bits"))
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
    st_orders=None,  # u32 [SL] sorted styled layer ids; enables slot keys
    slot_bits: int = 0,  # >0: single packed u32 sort key [row|tx|slot]
):
    """Returns sorted (key_hi, key_lo, payload) u32 arrays of length seg_cap.

    key_lo is the *style slot* (index into st_orders) when st_orders is
    given, else the raw layer id; slot order equals layer order, so sorting
    is unchanged.  With slot_bits > 0 the two keys pack into ONE u32
    (minimal row/tx bits + slot_bits), halving the sort's key traffic —
    the fast path whenever row_bits + tx_bits + slot_bits <= 32.

    payload = local_x << 21 | local_y << 17 | (area + 1024) << 6 | (cover + 16).
    Tile rows are shard-local: a segment in absolute row r gets key row
    r - row_lo, and rows outside [row_lo, row_lo + rows) are dropped — this
    is what lets `shard_map` split the framebuffer across chips.
    """
    i = jnp.arange(seg_cap, dtype=jnp.uint32)
    # Owning line per output slot: instead of a binary search over the prefix
    # sums (log2(L) gather rounds, slow on TPU), scatter each line's end
    # position and take prefix sums -- line_id[i] = #{lines ending <= i},
    # base[i] = largest line end <= i.
    ends = jnp.minimum(sum_lengths, jnp.uint32(seg_cap)).astype(jnp.int32)
    line_id = jnp.cumsum(
        jnp.zeros(seg_cap + 1, jnp.int32).at[ends].add(1, mode="drop")[:-1]
    )
    base = jax.lax.cummax(
        jnp.zeros(seg_cap + 1, jnp.uint32).at[ends].max(sum_lengths, mode="drop")[:-1]
    )
    li = jnp.minimum(line_id, sum_lengths.shape[0] - 1)
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
    layer = orders[li] & jnp.uint32(consts.LAYER_LIMIT)
    if st_orders is not None:
        key_lo = jnp.minimum(
            jnp.searchsorted(st_orders, layer), st_orders.shape[0] - 1
        ).astype(jnp.uint32)
    else:
        key_lo = layer
    key_lo = jnp.where(valid, key_lo, 0)

    payload = (
        (local_x << 21)
        | (local_y << 17)
        | ((area + 1024).astype(jnp.uint32) << 6)
        | (cover + 16).astype(jnp.uint32)
    )
    zero_payload = (jnp.uint32(1024) << 6) | jnp.uint32(16)
    payload = jnp.where(valid, payload, zero_payload)

    if slot_bits > 0:
        # Packed single-key sort: [rowb | txb | slot] in minimal bits.
        tx_bits = max((tiles_x + 1).bit_length(), 1)
        packed = (
            (((tile_y + 1).astype(jnp.uint32) << tx_bits)
             | (tile_x + 1).astype(jnp.uint32)) << slot_bits
        ) | key_lo
        packed = jnp.where(valid, packed, SENTINEL)
        packed, payload = jax.lax.sort((packed, payload), num_keys=1)
        invalid = packed == SENTINEL
        txb = (packed >> slot_bits) & jnp.uint32((1 << tx_bits) - 1)
        rowb = packed >> (slot_bits + tx_bits)
        key_hi = jnp.where(invalid, SENTINEL, (rowb << TX_BITS) | txb)
        key_lo = jnp.where(invalid, 0, packed & jnp.uint32((1 << slot_bits) - 1))
    else:
        key_hi, key_lo, payload = jax.lax.sort(
            (key_hi, key_lo, payload), num_keys=2
        )
    return key_hi, key_lo, payload


def unpack_payload(payload):
    """payload u32 -> (local_x, local_y, area, cover) i32."""
    lx = (payload >> 21).astype(jnp.int32) & 15
    ly = (payload >> 17).astype(jnp.int32) & 15
    area = ((payload >> 6) & jnp.uint32(0x7FF)).astype(jnp.int32) - 1024
    cover = (payload & jnp.uint32(63)).astype(jnp.int32) - 16
    return lx, ly, area, cover
