"""Pixel-segment packing battery, ported from the reference
(`cpu/pixel_segment.rs:211-369`), adapted to this build's split-u32
representation (consts.py docstring): key_hi = biased (tile_y, tile_x),
key_lo = layer slot, payload = (local_x, local_y, area+1024, cover+16).
"""

import numpy as np

import jax.numpy as jnp

from forma_tpu import consts
from forma_tpu.ops.rasterize import TX_BITS, unpack_payload


def pack_payload(local_x, local_y, area, cover):
    """The exact inline packing of `rasterize_sort` (rasterize.py)."""
    return np.uint32(
        (local_x << 21) | (local_y << 17) | ((area + 1024) << 6) | (cover + 16)
    )


def pack_key_hi(tile_x, tile_y):
    return np.uint32(((tile_y + 1) << TX_BITS) | (tile_x + 1))


def test_bit_layout_matches_reference():
    # `BitFieldMap::new::<16, 16>()` (consts.rs:50-104).
    assert consts.bit_field_lengths() == (11, 12, 21, 4, 4, 6, 6)
    assert consts.LAYER_LIMIT == (1 << 21) - 1
    assert consts.PIXEL_DOUBLE_WIDTH == 32


def _roundtrip(local_x, local_y, area, cover):
    pl = jnp.asarray([pack_payload(local_x, local_y, area, cover)])
    lx, ly, a, c = (np.asarray(v)[0] for v in unpack_payload(pl))
    assert (lx, ly, a, c) == (local_x, local_y, area, cover)


def test_payload_roundtrip_reference_values():
    # `pixel_segment()` (pixel_segment.rs:221-250): mult=8, cover=9
    # -> double_area = 72.
    _roundtrip(6, 7, 8 * 9, 9)


def test_payload_roundtrip_max():
    # `pixel_segment_max()` (pixel_segment.rs:252-287): the extreme legal
    # double_area = PIXEL_DOUBLE_WIDTH * PIXEL_WIDTH = 512, cover = 16.
    _roundtrip(15, 15, consts.PIXEL_DOUBLE_WIDTH * consts.PIXEL_WIDTH, 16)


def test_payload_roundtrip_min():
    # `pixel_segment_min()` (pixel_segment.rs:289-318).
    _roundtrip(0, 0, 0, -consts.PIXEL_WIDTH)
    _roundtrip(0, 0, -consts.PIXEL_DOUBLE_WIDTH * consts.PIXEL_WIDTH, -16)


def test_key_order_matches_tuple_order():
    """(tile_y, tile_x, layer) ordering by plain integer compare of
    (key_hi, key_lo) — the property `pixel_segment.rs:161-171` pins for the
    u64, incl. tile -1 (the cover-carry catch-all)."""
    tuples = [
        (ty, tx, layer)
        for ty in (-1, 0, 1, 5)
        for tx in (-1, 0, 3)
        for layer in (0, 1, consts.LAYER_LIMIT)
    ]
    keys = [(int(pack_key_hi(tx, ty)), layer) for ty, tx, layer in tuples]
    order_by_tuple = sorted(range(len(tuples)), key=lambda i: tuples[i])
    order_by_key = sorted(range(len(keys)), key=lambda i: keys[i])
    assert order_by_tuple == order_by_key


def test_negative_tile_clamps_to_minus_one():
    """`pixel_segment_clipping()` (pixel_segment.rs:320-345): any tile left
    of the viewport clamps to tile -1 — exercised through the real
    rasterizer on a line far left of the viewport."""
    from forma_tpu.ops.line_setup import line_setup
    from forma_tpu.ops.rasterize import SENTINEL, rasterize_sort

    # A vertical-ish line at x = -40 (tile -3), y spanning the viewport.
    px = jnp.asarray([-40.0, -39.0], jnp.float32)
    py = jnp.asarray([0.0, 32.0], jnp.float32)
    line_slot = jnp.asarray([0, -1], jnp.int32)
    g_slot = jnp.asarray([0], jnp.int32)
    g_valid = jnp.asarray([True])
    g_t = jnp.zeros((1, 6), jnp.float32)
    g_has_t = jnp.asarray([False])
    params, slots, lengths, vline_ends = line_setup(
        px, py, line_slot, g_slot, g_valid, g_t, g_has_t, 64, 64, k_seg=8
    )
    key_hi, key_lo, payload = rasterize_sort(
        params, slots, lengths, vline_ends, vline_ends[-1],
        16, 8, 4, 4, jnp.int32(0), slot_bits=0,
    )
    kh = np.asarray(key_hi)
    valid = kh != np.uint32(0xFFFFFFFF)
    assert valid.any(), "line produced no segments"
    txs = (kh[valid] & ((1 << TX_BITS) - 1)).astype(int) - 1
    assert (txs == -1).all(), f"expected tile -1, got {set(txs)}"
