"""Run extraction, cover-carry chains and paint-unit expansion.

The reference walks each tile row left-to-right, carrying per-layer
accumulated covers between tiles (`painter/mod.rs:486-568`).  That sequential
dependency re-casts into three data-parallel steps over the sorted segments:

1. **Runs**: group sorted segments into (tile_y, tile_x, layer) runs and
   scatter their covers/areas into dense per-run 16x16 grids.
2. **Carry chains**: re-sort the runs by (row, layer, tile_x); a segmented
   prefix sum along each (row, layer) group yields every run's carry-in —
   the covers accumulated in all tiles to its left — in one scan.
3. **Virtual units**: a layer fully covering tiles between two of its runs
   has no segments there but still paints (the reference's cover-carry queue,
   `layer_workbench/mod.rs:196-234`); such gaps expand into "virtual" paint
   units with uniform coverage equal to the carry.

Real and virtual units merge into a per-tile slot table that drives the dense
K-slot paint fold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import consts
from .rasterize import SENTINEL, TX_BITS, unpack_payload

TH = consts.TILE_HEIGHT
TW = consts.TILE_WIDTH
_LAYER_MASK = jnp.uint32(consts.LAYER_LIMIT)


@jax.jit
def extract_runs(key_hi, key_lo):
    """Per-segment run ids over the sorted keys; returns (run_id, num_runs)."""
    prev_hi = jnp.roll(key_hi, 1)
    prev_lo = jnp.roll(key_lo, 1)
    new_run = (key_hi != prev_hi) | (key_lo != prev_lo)
    new_run = new_run.at[0].set(True)
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    return run_id, run_id[-1] + 1


def _first_of_group(new_group):
    iota = jnp.arange(new_group.shape[0], dtype=jnp.int32)
    return jax.lax.cummax(jnp.where(new_group, iota, 0))


@partial(jax.jit, static_argnames=("run_cap", "tiles_x"))
def run_data(
    key_hi,
    key_lo,
    payload,
    run_id,
    num_runs,
    st_orders,  # u32 [SL] sorted layer ids with styles
    st_fill_rule,  # i32 [SL]
    run_cap: int,
    tiles_x: int,
):
    """Builds per-run grids and carry chains.

    Returns a dict of per-run arrays (original run order and the
    (row, layer, tile_x)-sorted order used for carries/virtual units).
    """
    seg_cap = key_hi.shape[0]

    first_idx = jnp.searchsorted(run_id, jnp.arange(run_cap, dtype=jnp.int32))
    first_clamped = jnp.minimum(first_idx, seg_cap - 1)
    run_hi = key_hi[first_clamped]
    run_layer = key_lo[first_clamped]
    r_valid = (jnp.arange(run_cap) < num_runs) & (run_hi != SENTINEL)
    run_hi = jnp.where(r_valid, run_hi, SENTINEL)

    # Scatter segment covers/areas into per-run 16x16 grids.  Padding
    # segments carry zero area/cover, so scattering them is harmless.
    lx, ly, area, cover = unpack_payload(payload)
    rid = jnp.minimum(run_id, run_cap - 1)
    area_grid = jnp.zeros((run_cap, TH, TW), jnp.int32).at[rid, ly, lx].add(
        area, mode="drop"
    )
    cover_grid = jnp.zeros((run_cap, TH, TW), jnp.int32).at[rid, ly, lx].add(
        cover, mode="drop"
    )
    rowcov = cover_grid.sum(axis=2)  # [R, 16] total cover per pixel row

    # Re-sort runs by (row, layer, tile_x) for the carry chains.
    rowb = run_hi >> TX_BITS  # biased row + 1
    txb = run_hi & jnp.uint32((1 << TX_BITS) - 1)  # biased tile_x + 1
    key2 = jnp.where(r_valid, (rowb << 21) | run_layer, SENTINEL)
    txb_key = jnp.where(r_valid, txb, SENTINEL)
    key2_s, txb_s, orig = jax.lax.sort(
        (key2, txb_key, jnp.arange(run_cap, dtype=jnp.int32)), num_keys=2
    )

    rowcov_s = rowcov[orig]
    new_group = key2_s != jnp.roll(key2_s, 1)
    new_group = new_group.at[0].set(True)
    cum = jnp.cumsum(rowcov_s, axis=0)
    excl = cum - rowcov_s
    gfirst = _first_of_group(new_group)
    carry_in_s = excl - excl[gfirst]
    carry_after_s = carry_in_s + rowcov_s

    valid_s = key2_s != SENTINEL
    tx_s = txb_s.astype(jnp.int32) - 1
    next_same = jnp.roll(key2_s, -1) == key2_s
    next_same = next_same.at[-1].set(False)
    tx_next = jnp.roll(tx_s, -1)
    span = jnp.where(next_same, tx_next - tx_s - 1, (tiles_x - 1) - tx_s)
    span = jnp.maximum(span, 0)

    # A gap only paints if the carry is non-empty under the layer's fill rule
    # (`painter/mod.rs:187-198`).
    slot_s = jnp.minimum(
        (key2_s & _LAYER_MASK).astype(jnp.int32), st_fill_rule.shape[0] - 1
    )
    fr_s = st_fill_rule[slot_s]
    empty_nz = jnp.all(carry_after_s == 0, axis=1)
    empty_eo = jnp.all((jnp.abs(carry_after_s) & 31) == 0, axis=1)
    empty = jnp.where(fr_s == 1, empty_eo, empty_nz)
    span = jnp.where(valid_s & ~empty, span, 0)
    cumspan = jnp.cumsum(span)

    carry_in = jnp.zeros((run_cap, TH), jnp.int32).at[orig].set(carry_in_s)

    return dict(
        run_hi=run_hi,
        run_layer=run_layer,
        r_valid=r_valid,
        area_grid=area_grid,
        cover_grid=cover_grid,
        carry_in=carry_in,
        # sorted-by-(row, layer, tile_x) domain:
        key2_s=key2_s,
        tx_s=tx_s,
        carry_after_s=carry_after_s,
        span=span,
        cumspan=cumspan,
        v_total=cumspan[-1],
    )


@partial(jax.jit, static_argnames=("v_cap",))
def build_units(
    run_hi,
    run_layer,
    r_valid,
    key2_s,
    tx_s,
    span,
    cumspan,
    v_total,
    v_cap: int,
):
    """Merges real runs and virtual (gap) units into one per-tile-slot order.

    Returns sorted unit arrays (key, layer, src index, is_virtual, slot k)
    plus the maximum slot count K (to be read back for the paint fold).
    """
    run_cap = run_hi.shape[0]

    # Real paint units: runs in painted tiles (tile_x >= 0, i.e. biased > 0).
    txb = run_hi & jnp.uint32((1 << TX_BITS) - 1)
    real_key = jnp.where(r_valid & (txb > 0), run_hi, SENTINEL)
    real_layer = run_layer
    real_src = jnp.arange(run_cap, dtype=jnp.int32)

    # Virtual units from gap expansion.
    vj = jnp.arange(v_cap, dtype=jnp.int32)
    v_valid = vj < v_total
    owner = jnp.minimum(
        jnp.searchsorted(cumspan, vj, side="right"), run_cap - 1
    )
    off = vj - (cumspan[owner] - span[owner])
    v_tx = tx_s[owner] + 1 + off
    v_rowb = key2_s[owner] >> 21
    v_layer = (key2_s[owner] & _LAYER_MASK).astype(jnp.uint32)
    v_key = jnp.where(
        v_valid, (v_rowb << TX_BITS) | (v_tx + 1).astype(jnp.uint32), SENTINEL
    )

    key_u = jnp.concatenate([real_key, v_key])
    layer_u = jnp.concatenate([real_layer, v_layer])
    src_u = jnp.concatenate([real_src, owner])
    virt_u = jnp.concatenate(
        [jnp.zeros(run_cap, jnp.int32), jnp.ones(v_cap, jnp.int32)]
    )

    key_u, layer_u, src_u, virt_u = jax.lax.sort(
        (key_u, layer_u, src_u, virt_u), num_keys=2
    )

    new_tile = key_u != jnp.roll(key_u, 1)
    new_tile = new_tile.at[0].set(True)
    first = _first_of_group(new_tile)
    k = jnp.arange(key_u.shape[0], dtype=jnp.int32) - first
    u_valid = key_u != SENTINEL
    k_needed = jnp.max(jnp.where(u_valid, k, -1)) + 1

    return key_u, layer_u, src_u, virt_u, k, u_valid, k_needed
