"""Device rasterizer: lines -> sorted packed pixel segments.

The XLA counterpart of `Rasterizer::{rasterize,sort}`
(`forma/src/cpu/rasterizer.rs`).  v2 reshapes the work to match TPU cost
reality (gathers cost per row, elementwise is ~free):

1. Lines expand into **virtual lines** of at most `k_seg` pixel segments
   each (scatter + cumsum/cummax over the vline index space — the same
   balanced-sharding job as `PrefixScanIter` / `findLineId`,
   `rasterizer.wgsl:199-214`, without any per-segment binary search).
2. Per-line parameters arrive via two ROW gathers ([V, 14] f32, [V, 2] i32).
3. The i-th-intersection math (`rasterizer.rs:22-76`) runs densely over
   [V, k_seg] in float-float arithmetic (`ops/ff64.py`) — pure elementwise.
4. One `jax.lax.sort` orders the packed (tile_y, tile_x, layer-slot) key
   with a packed payload; padding slots carry the 0xFFFFFFFF sentinel and
   sort to the end.

Pixel segments pack as

    key_hi = (tile_y + 1) << 13 | (tile_x + 1)       (sentinel 0xFFFFFFFF)
    key_lo = layer style slot
    payload = local_x << 21 | local_y << 17 | (area + 1024) << 6 | (cover + 16)

and when row/tx/slot bits fit in 31, the two keys fuse into ONE u32 so the
sort moves half the key bytes.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from .. import consts
from . import ff64
from .line_setup import (
    N_PARAMS,
    PA,
    PAOH,
    PAOL,
    PB,
    PBOH,
    PBOL,
    PC,
    PCDH,
    PCDL,
    PD,
    PDX,
    PDY,
    PLEN,
    PSLOT,
    PX0,
    PY0,
)

SENTINEL = np.uint32(0xFFFFFFFF)  # numpy scalar: embeds as a literal in Pallas kernels
TX_BITS = 13  # tile_x+1 fits 13 bits (max 4096 tiles of width 16)


def _expand_backend() -> str:
    """Per-line parameter expansion backend: the Pallas MXU monotonic-expand
    kernel on TPU (bit-identical, ~5x cheaper than the XLA gather path —
    see ops/expand_pallas.py), the gather elsewhere.
    FORMA_EXPAND=xla|pallas|fused overrides (A/B benches; "fused" moves the
    whole ff64 emit into the kernel — a RECORDED NEGATIVE: bit-exact but
    528 ms/frame vs 98.5, Mosaic lowers the ff64 chain poorly)."""
    env = os.environ.get("FORMA_EXPAND")
    if env in ("xla", "pallas", "fused"):
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _find(fi, a_over, b_over, cd_over, a, b, c, d):
    """i-th element of the merged progressions (`rasterizer.rs:32-61`).

    All operands broadcast; fi is f32."""
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


def _emit_core(col, j, v_live, k_seg: int, rows: int, tiles_x: int, row_lo):
    """The dense per-segment math (`rasterizer.rs:63-76` + payload packing)
    over [k_seg, V'] given per-vline param accessors.

    `col(i)` returns param row i as a 1-D [V'] f32 vector; `j`/`v_live` are
    [V'] (intra-line vline index, liveness).  Returns (tile_x, tile_y,
    key_lo2, payload, valid), all [k_seg, V'].  Shared verbatim by the XLA
    path and the fused Pallas rasterize kernel so the two are bit-identical
    by construction."""
    slot_v = col(PSLOT).astype(jnp.int32)
    len_v = col(PLEN).astype(jnp.int32)

    av = col(PA)[None, :]
    bv = col(PB)[None, :]
    cv = col(PC)[None, :]
    dv = col(PD)[None, :]
    a_over = ff64.FF(col(PAOH)[None, :], col(PAOL)[None, :])
    b_over = ff64.FF(col(PBOH)[None, :], col(PBOL)[None, :])
    cd_over = ff64.FF(col(PCDH)[None, :], col(PCDL)[None, :])

    seg_lo = j * k_seg
    i_rel = seg_lo[None, :] + jnp.arange(k_seg, dtype=jnp.int32)[:, None]
    in_range = v_live[None, :] & (i_rel < len_v[None, :])

    # get_ith_pixel_segment_params (`rasterizer.rs:63-76`).
    # (Sharing the k_seg+1 boundaries between consecutive segments looks
    # cheaper on paper but the off-by-one slices break XLA's fusion of the
    # ff64 chain — measured 2x slower end to end; keep the direct form.)
    ii = i_rel - (cv != 0.0).astype(jnp.int32) - (dv != 0.0).astype(jnp.int32)
    t0 = jnp.maximum(
        _find(ii.astype(jnp.float32), a_over, b_over, cd_over, av, bv, cv, dv),
        0.0,
    )
    t1 = jnp.minimum(
        _find(
            (ii + 1).astype(jnp.float32), a_over, b_over, cd_over, av, bv, cv, dv
        ),
        1.0,
    )

    x0v = col(PX0)[None, :]
    y0v = col(PY0)[None, :]
    dxv = col(PDX)[None, :]
    dyv = col(PDY)[None, :]
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
    # rows above/below and tiles right of the viewport are dropped — they
    # can never affect painted pixels (`pixel_segment.rs:47-52`,
    # `painter/mod.rs:732-734`).
    tile_x = jnp.maximum(tile_x, -1)
    tile_y = tile_y - jnp.int32(row_lo)
    valid = in_range & (tile_y >= 0) & (tile_y < rows) & (tile_x < tiles_x)

    key_lo2 = jnp.broadcast_to(
        slot_v[None, :].astype(jnp.uint32), i_rel.shape
    )
    payload = (
        (local_x << 21)
        | (local_y << 17)
        | ((area + 1024).astype(jnp.uint32) << 6)
        | (cover + 16).astype(jnp.uint32)
    )
    zero_payload = np.uint32((1024 << 6) | 16)
    payload = jnp.where(valid, payload, zero_payload)
    return tile_x, tile_y, key_lo2, payload, valid


def _emit_packed(
    col, j, v_live, k_seg: int, rows: int, tiles_x: int, row_lo,
    slot_bits: int, tx_bits: int,
):
    """_emit_core + single-u32 key packing ([rowb | slot | txb]); sentinel
    where invalid.

    Layer slot sits ABOVE tile_x so the segment sort directly yields runs
    in (row, layer, tile_x) order — the carry-chain order — which lets
    `runs.run_data(presorted=True)` skip its key2 re-sort + inverse-
    permutation sort entirely.  Rows stay in the TOP bits, so the
    line-sharded path's destination-band slicing (`pipeline.py`) is
    unchanged.  The unit sort in `build_units` re-establishes (tile, layer)
    paint order either way."""
    tile_x, tile_y, key_lo2, payload, valid = _emit_core(
        col, j, v_live, k_seg, rows, tiles_x, row_lo
    )
    packed = (
        (
            ((tile_y + 1).astype(jnp.uint32) << slot_bits)
            | key_lo2
        )
        << tx_bits
    ) | (tile_x + 1).astype(jnp.uint32)
    packed = jnp.where(valid, packed, SENTINEL)
    return packed, payload


def _emit_two_key(col, j, v_live, k_seg: int, rows: int, tiles_x: int, row_lo):
    """_emit_core + the two-key form (layer slots too wide to pack)."""
    tile_x, tile_y, key_lo2, payload, valid = _emit_core(
        col, j, v_live, k_seg, rows, tiles_x, row_lo
    )
    key_hi = ((tile_y + 1).astype(jnp.uint32) << TX_BITS) | (
        tile_x + 1
    ).astype(jnp.uint32)
    key_hi = jnp.where(valid, key_hi, SENTINEL)
    key_lo = jnp.where(valid, key_lo2, 0)
    return key_hi, key_lo, payload


def _expand_emit_packed(
    params, lengths, vline_ends, v_total,
    v_cap: int, k_seg: int, rows: int, tiles_x: int, row_lo,
    slot_bits: int, tx_bits: int,
):
    """Virtual-line expansion (Pallas kernel on TPU, XLA elsewhere) + packed
    single-u32 emit; returns flat unsorted (packed, payload) u32
    [v_cap * k_seg].  Shared by `rasterize_sort` and the line-sharded
    multi-chip path (which exchanges segments across chips BEFORE sorting)."""
    L = params.shape[0]
    if _expand_backend() == "pallas":
        from .expand_pallas import expand_params_pallas

        iota_v = jnp.arange(v_cap, dtype=jnp.uint32)
        v_live = iota_v < v_total
        PT, j = expand_params_pallas(
            params, lengths > 0, vline_ends, v_cap,
            interpret=jax.default_backend() != "tpu",
        )
        col = lambda i: PT[i]  # noqa: E731
    else:
        iota_v = jnp.arange(v_cap, dtype=jnp.uint32)
        v_live = iota_v < v_total
        ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
        line_id = jnp.cumsum(
            jnp.zeros(v_cap + 1, jnp.int32).at[ends].add(1, mode="drop")[:-1]
        )
        base = jax.lax.cummax(
            jnp.zeros(v_cap + 1, jnp.uint32)
            .at[ends]
            .max(vline_ends, mode="drop")[:-1]
        )
        li = jnp.minimum(line_id, L - 1)
        j = (iota_v - base).astype(jnp.int32)
        P = params[li]  # [V, 16]
        col = lambda i: P[:, i]  # noqa: E731

    packed, payload = _emit_packed(
        col, j, v_live, k_seg, rows, tiles_x, row_lo, slot_bits, tx_bits
    )
    return packed.reshape(-1), payload.reshape(-1)


def unpack_packed_keys(packed, slot_bits: int, tx_bits: int):
    """Packed [rowb | slot | txb] u32 -> (key_hi, key_lo) in the canonical
    (rowb << TX_BITS | txb, layer-slot) form the runs stage consumes."""
    invalid = packed == SENTINEL
    txb = packed & jnp.uint32((1 << tx_bits) - 1)
    rowb = packed >> (slot_bits + tx_bits)
    key_hi = jnp.where(invalid, SENTINEL, (rowb << TX_BITS) | txb)
    key_lo = jnp.where(
        invalid, 0, (packed >> tx_bits) & jnp.uint32((1 << slot_bits) - 1)
    )
    return key_hi, key_lo


@partial(
    jax.jit,
    static_argnames=("v_cap", "k_seg", "rows", "tiles_x", "slot_bits"),
)
def rasterize_sort(
    params,  # f32 [L, 14] per-line constants (line_setup layout)
    slots,  # i32 [L] layer style slot
    lengths,  # i32 [L] pixel-segment counts
    vline_ends,  # u32 [L] inclusive cumsum of ceil(len / k_seg)
    v_total,  # u32 scalar: actual virtual-line count (<= v_cap)
    v_cap: int,
    k_seg: int,
    rows: int,
    tiles_x: int,
    row_lo=0,  # traced: first tile row owned by this shard
    slot_bits: int = 0,  # >0: single packed u32 sort key [row|slot|tx]
):
    """Returns sorted (key_hi, key_lo, payload) u32 arrays of length
    v_cap * k_seg.  Tile rows are shard-local (row - row_lo), which is what
    lets `shard_map` split the framebuffer across chips."""
    L = params.shape[0]
    backend = _expand_backend()

    # All dense math runs in [k_seg, V] orientation: V in the minor (lane)
    # dimension keeps the VPU fully occupied — a [V, 8] layout would pad 8
    # lanes to 128 and waste 94% of both compute and memory.
    if backend == "fused" and slot_bits > 0:
        # Fully fused expand + emit inside the kernel.  RECORDED NEGATIVE
        # (see _expand_backend) — kept for A/B and as the working example
        # of tracing shared jnp code into a kernel.
        from .expand_pallas import rasterize_blocks_pallas

        tx_bits = max((tiles_x + 1).bit_length(), 1)
        packed, payload = rasterize_blocks_pallas(
            params, lengths > 0, vline_ends, v_total,
            jnp.int32(row_lo), v_cap, k_seg, rows, tiles_x,
            slot_bits, tx_bits,
        )
        packed = packed.reshape(-1)
        payload = payload.reshape(-1)
        tx_bits = max((tiles_x + 1).bit_length(), 1)
    elif slot_bits > 0:
        # Monotonic-expand MXU kernel on TPU (~22 ms -> ~4 ms at paris
        # scale), XLA scatter/prefix path elsewhere — see _expand_emit_packed.
        tx_bits = max((tiles_x + 1).bit_length(), 1)
        packed, payload = _expand_emit_packed(
            params, lengths, vline_ends, v_total,
            v_cap, k_seg, rows, tiles_x, row_lo, slot_bits, tx_bits,
        )
    else:
        # Two-key fallback (layer slots too wide to pack into one u32).
        iota_v = jnp.arange(v_cap, dtype=jnp.uint32)
        v_live = iota_v < v_total
        if backend == "pallas":
            from .expand_pallas import expand_params_pallas

            PT, j = expand_params_pallas(
            params, lengths > 0, vline_ends, v_cap,
            interpret=jax.default_backend() != "tpu",
        )
            col = lambda i: PT[i]  # noqa: E731
        else:
            ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
            line_id = jnp.cumsum(
                jnp.zeros(v_cap + 1, jnp.int32).at[ends].add(1, mode="drop")[:-1]
            )
            base = jax.lax.cummax(
                jnp.zeros(v_cap + 1, jnp.uint32)
                .at[ends]
                .max(vline_ends, mode="drop")[:-1]
            )
            li = jnp.minimum(line_id, L - 1)
            j = (iota_v - base).astype(jnp.int32)
            P = params[li]  # [V, 16]
            col = lambda i: P[:, i]  # noqa: E731
        key_hi, key_lo, payload = _emit_two_key(
            col, j, v_live, k_seg, rows, tiles_x, row_lo
        )
        key_hi, key_lo, payload = jax.lax.sort(
            (
                key_hi.reshape(-1),
                key_lo.reshape(-1),
                payload.reshape(-1),
            ),
            num_keys=2,
            is_stable=False,
        )
        return key_hi, key_lo, payload

    # Packed single-key sort: [rowb | slot | txb] in minimal bits.
    # Unstable: equal (tile, layer) keys' payloads are summed by the grid
    # accumulation, so their order is irrelevant — and stability costs a
    # third sorted operand (a hidden iota tiebreak; measured 30.4 ms for
    # the stable 3-operand sort at 8.9M).
    packed, payload = jax.lax.sort(
        (packed, payload), num_keys=1, is_stable=False
    )
    key_hi, key_lo = unpack_packed_keys(packed, slot_bits, tx_bits)
    return key_hi, key_lo, payload


def unpack_payload(payload):
    """payload u32 -> (local_x, local_y, area, cover) i32."""
    lx = (payload >> 21).astype(jnp.int32) & 15
    ly = (payload >> 17).astype(jnp.int32) & 15
    area = ((payload >> 6) & jnp.uint32(0x7FF)).astype(jnp.int32) - 1024
    cover = (payload & jnp.uint32(63)).astype(jnp.int32) - 16
    return lx, ly, area, cover
