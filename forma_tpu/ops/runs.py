"""Run extraction, cover-carry chains and paint-unit expansion.

The reference walks each tile row left-to-right, carrying per-layer
accumulated covers between tiles (`painter/mod.rs:486-568`).  That sequential
dependency re-casts into three data-parallel steps over the sorted segments:

1. **Runs**: group sorted segments into (tile_y, tile_x, layer) runs.  Areas
   and covers scatter-add into per-run 16x16 grids as ONE packed i32
   (area in the high half, cover in the low half — both stay within i16,
   the same bound the reference's i16/i8 tile accumulators rely on,
   `painter/mod.rs:232-245`).  Run metadata (key, layer, first index) comes
   from a stream-compaction sort of the run-boundary positions instead of
   any per-run binary search (searchsorted is pathological on TPU).
2. **Carry chains**: re-sort the runs by (row, layer, tile_x); a segmented
   prefix sum along each (row, layer) group yields every run's carry-in —
   the covers accumulated in all tiles to its left — in one scan.
3. **Virtual units**: a layer fully covering tiles between two of its runs
   has no segments there but still paints (the reference's cover-carry queue,
   `layer_workbench/mod.rs:196-234`); such gaps expand into "virtual" paint
   units with uniform coverage equal to the carry.

Real and virtual units merge into a per-tile slot table that drives the
paint fold.  Every indexed access here is a row gather/scatter or a sort —
the only per-element scatter is the unavoidable grid accumulation.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .. import consts
from .rasterize import SENTINEL, TX_BITS, unpack_payload

TH = consts.TILE_HEIGHT
TW = consts.TILE_WIDTH
_LAYER_MASK = jnp.uint32(consts.LAYER_LIMIT)


def _grid_backend() -> str:
    """Grid accumulation backend: the Pallas MXU kernel on TPU (6.5x faster
    than the XLA scatter, bit-identical — tools/pallas_grid_probe.py), the
    scatter elsewhere.  FORMA_GRID=xla|pallas overrides (A/B benches)."""
    env = os.environ.get("FORMA_GRID")
    if env in ("xla", "pallas"):
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _build_grid(rid, cell, area, cover, run_cap: int, key_hi=None, key_lo=None):
    """Packed [run_cap, 256] i32 grid (area sums in the high 16 bits, cover
    in the low 16 — exact because per-cell sums stay within i16, the same
    bound the reference's tile accumulators rely on) plus the per-run
    [run_cap, 16] row sums of cover (the carry-chain input).

    Returns (grid, rowcov, runkeys): on the Pallas path `runkeys` is the
    per-run [run_cap, 2] u32 (key_hi, key_lo) emitted at flush time, which
    replaces the blocked-compaction key extraction in `run_data`; the XLA
    path returns None and the caller compacts."""
    if _grid_backend() == "pallas":
        from .grid_pallas import B as _B
        from .grid_pallas import grid_build_pallas

        n = rid.shape[0]
        pad = -n % _B
        if pad:
            # Padding keeps rid nondecreasing and gapless (edge mode) and
            # contributes zero; edge-padded keys add no first occurrence.
            rid = jnp.pad(rid, (0, pad), mode="edge")
            cell = jnp.pad(cell, (0, pad))
            area = jnp.pad(area, (0, pad))
            cover = jnp.pad(cover, (0, pad))
            if key_hi is not None:
                key_hi = jnp.pad(key_hi, (0, pad), mode="edge")
                key_lo = jnp.pad(key_lo, (0, pad), mode="edge")
        out = grid_build_pallas(
            rid, cell, area, cover, run_cap, key_hi=key_hi, key_lo=key_lo,
            interpret=jax.default_backend() != "tpu",
        )
        if key_hi is not None:
            grid, rowcov, runkeys = out
            return grid[:run_cap], rowcov[:run_cap], runkeys[:run_cap]
        grid, rowcov = out
        return grid[:run_cap], rowcov[:run_cap], None
    val = area * 65536 + cover  # zero for padding segments
    grid = (
        jnp.zeros((run_cap, TH * TW), jnp.int32)
        .at[rid, cell]
        .add(val, mode="drop")
    )
    _, cover_cells = unpack_grid(grid)
    rowcov = cover_cells.reshape(run_cap, TH, TW).sum(axis=2)
    return grid, rowcov, None


@jax.jit
def extract_runs(key_hi, key_lo):
    """Per-segment run ids over the sorted keys; returns
    (run_id, num_runs_incl_sentinel, new_run)."""
    prev_hi = jnp.roll(key_hi, 1)
    prev_lo = jnp.roll(key_lo, 1)
    new_run = (key_hi != prev_hi) | (key_lo != prev_lo)
    new_run = new_run.at[0].set(True)
    run_id = jnp.cumsum(new_run.astype(jnp.int32)) - 1
    return run_id, run_id[-1] + 1, new_run


def _first_of_group(new_group):
    iota = jnp.arange(new_group.shape[0], dtype=jnp.int32)
    return jax.lax.cummax(jnp.where(new_group, iota, 0))


def unpack_grid(grid):
    """packed i32 grid -> (area, cover) i32 (area = high 16, cover = low 16,
    both sign-extended; exact because per-cell sums stay within i16)."""
    cover = (grid << 16) >> 16
    area = (grid - cover) >> 16
    return area, cover


@partial(jax.jit, static_argnames=("run_cap", "tiles_x", "presorted"))
def run_data(
    key_hi,
    key_lo,
    payload,
    run_id,
    new_run,
    num_runs,
    st_pidx,  # i32 [SL] layer slot -> distinct-props row
    st_fill_rule,  # i32 [P] per distinct props
    st_opaque,  # bool [P] solid, alpha 1, Over, draw, not clipped
    st_isclip,  # bool [P] func == Clip
    st_solid,  # bool [P] solid-fill draw, not clipped (any alpha/blend)
    run_cap: int,
    tiles_x: int,
    style_pack=None,  # i32 [SL, SW] per-slot style rows in the Pallas
    #                   fold's lane layout (paint.style_pack_for_fold);
    #                   when given, per-run style rows ride the existing
    #                   slot gather (gathers cost per index, not per byte)
    presorted: bool = False,  # segments were sorted by the [row|slot|tx]
    #                   packed key, so runs already arrive in carry-chain
    #                   (row, layer, tile_x) order: the key2 re-sort, the
    #                   inverse-permutation sort and the rowcov re-gather
    #                   all collapse to identity
):
    """Builds per-run packed grids and carry chains.

    Returns a dict of per-run arrays (original run order and the
    (row, layer, tile_x)-sorted order used for carries/virtual units).
    """
    seg_n = key_hi.shape[0]

    # Packed grid accumulation (Pallas MXU kernel on TPU, XLA scatter
    # elsewhere — see _build_grid).  The Pallas kernel also emits each
    # run's (key_hi, key_lo) at flush time, selected from the run's first
    # segment.
    lx, ly, area, cover = unpack_payload(payload)
    rid = jnp.minimum(run_id, run_cap - 1)
    cell = ly * TW + lx
    # FORMA_RUNKEYS=on|off selects kernel-emitted run keys vs the blocked
    # compaction.  Default ON: validated bit-exact on the real chip
    # (tools/pallas_grid_probe.py: KEYS MATCH on 295k runs, +0.85 ms in
    # kernel) and the committed-state A/B measured 10.82 -> 11.17 FPS on
    # paris@1080p (the blocked compaction it replaces cost ~3 ms).
    want_keys = os.environ.get("FORMA_RUNKEYS", "on").lower() not in (
        "off", "0", "false",
    )
    grid, rowcov, runkeys = _build_grid(
        rid, cell, area, cover, run_cap,
        key_hi=key_hi if want_keys else None,
        key_lo=key_lo if want_keys else None,
    )

    r = jnp.arange(run_cap, dtype=jnp.int32)
    if runkeys is not None:
        run_hi = runkeys[:, 0]
        run_layer = runkeys[:, 1]
    else:
        # Run metadata by BLOCKED stream compaction: a batched per-block
        # sort moves boundary segments to each block's front (batched row
        # sorts are ~free on TPU, unlike one full-array sort), cheap prefix
        # ops map run ordinals to (block, slot), and the keys arrive via
        # run-count scalar gathers.  Replaces both the searchsorted of
        # `PrefixScanIter` and a full-size compaction sort.
        B = 128
        assert seg_n % B == 0, "segment capacity must be a multiple of 128"
        nb = seg_n // B
        lane = jnp.arange(B, dtype=jnp.int32)[None, :]
        nr2 = new_run.reshape(nb, B)
        blk_key = jnp.where(nr2, lane, lane + B)
        # Unstable sorts throughout: every key set below is unique (lane
        # ids, full run keys, permutations), so stability only costs XLA a
        # hidden iota tiebreak operand.
        blk_key_s, kh_s, kl_s = jax.lax.sort(
            (blk_key, key_hi.reshape(nb, B), key_lo.reshape(nb, B)),
            num_keys=1,
            dimension=1,
            is_stable=False,
        )
        counts = jnp.sum(nr2, axis=1, dtype=jnp.int32)  # boundaries per blk
        offs = jnp.cumsum(counts) - counts  # ordinal of block's first
        bidx = jnp.arange(nb, dtype=jnp.int32)
        has = counts > 0
        start_pos = jnp.where(has, offs, run_cap)  # dropped when empty
        block_of = jax.lax.cummax(
            jnp.zeros(run_cap, jnp.int32).at[start_pos].max(bidx, mode="drop")
        )
        base_of = jax.lax.cummax(
            jnp.zeros(run_cap, jnp.int32).at[start_pos].max(offs, mode="drop")
        )
        slot_in_blk = jnp.minimum(r - base_of, B - 1)
        # One 2-wide row gather instead of two scalar gathers (gathers cost
        # per INDEX on TPU, not per byte).
        kv = jnp.stack([kh_s, kl_s], axis=-1)[block_of, slot_in_blk]  # [R,2]
        run_hi = kv[:, 0]
        run_layer = kv[:, 1]
    r_valid = (r < num_runs) & (run_hi != SENTINEL)
    run_hi = jnp.where(r_valid, run_hi, SENTINEL)

    # Carry chains need runs in (row, layer, tile_x) order.
    rowb = run_hi >> TX_BITS  # biased row + 1
    txb = run_hi & jnp.uint32((1 << TX_BITS) - 1)  # biased tile_x + 1
    key2 = jnp.where(r_valid, (rowb << 21) | run_layer, SENTINEL)
    if presorted:
        # The [row|slot|tx] segment sort already delivered this order:
        # sorted domain == original domain (saves two run_cap sorts + the
        # [R, 16] rowcov re-gather).
        key2_s = key2
        txb_s = jnp.where(r_valid, txb, SENTINEL)
        inv = jnp.arange(run_cap, dtype=jnp.int32)
        rowcov_s = rowcov
    else:
        txb_key = jnp.where(r_valid, txb, SENTINEL)
        key2_s, txb_s, orig = jax.lax.sort(
            (key2, txb_key, jnp.arange(run_cap, dtype=jnp.int32)), num_keys=2,
            is_stable=False,
        )
        # Inverse permutation (original run -> sorted position): lets REAL
        # paint units address the sorted-domain carry arrays directly,
        # replacing the [R, 16] carry scatter-back this code used to do
        # (~11 ms at paris scale; a [R]-keyed sort is ~1 ms).
        _, inv = jax.lax.sort(
            (orig, jnp.arange(run_cap, dtype=jnp.int32)), num_keys=1,
            is_stable=False,
        )
        rowcov_s = rowcov[orig]  # row gather [R, 16]
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
    # (`painter/mod.rs:187-198`).  All per-run style bits arrive via ONE
    # packed [R]-index gather: the per-slot pack below is SL-sized (cheap),
    # while each [R] gather costs ~2.3 ms at paris scale — this replaces
    # five of them.
    slot_s = jnp.minimum(
        (key2_s & _LAYER_MASK).astype(jnp.int32), st_pidx.shape[0] - 1
    )
    sl_flags = (
        st_fill_rule[st_pidx]
        | (st_isclip[st_pidx].astype(jnp.int32) << 1)
        | (st_opaque[st_pidx].astype(jnp.int32) << 2)
        | (st_solid[st_pidx].astype(jnp.int32) << 3)
    )  # i32 [SL]
    style_s = None
    if style_pack is None:
        f_s = sl_flags[slot_s]
    else:
        # Widen the ONE per-run gather (gathers cost per index, not per
        # byte) so the Pallas paint fold gets its full per-run style row
        # (color, fill rule, blend, fill/func kinds, clip range, gradient
        # params + stops) without a second run-cap-index gather.
        sl_pack = jnp.concatenate([sl_flags[:, None], style_pack], axis=1)
        packed_s = sl_pack[slot_s]  # [R, 1 + SW]
        f_s = packed_s[:, 0]
        style_s = packed_s[:, 1:]  # [R, SW] kernel-layout style rows
    fr_eo = (f_s & 1) == 1
    isclip_s = (f_s & 2) != 0
    opaque_s = (f_s & 4) != 0
    solid_s = (f_s & 8) != 0
    empty_nz = jnp.all(carry_after_s == 0, axis=1)
    empty_eo = jnp.all((jnp.abs(carry_after_s) & 31) == 0, axis=1)
    empty = jnp.where(fr_eo, empty_eo, empty_nz)
    span = jnp.where(valid_s & ~empty, span, 0)
    cumspan = jnp.cumsum(span)

    # Unit flags for the occlusion-culling pass
    # (`skip_fully_covered_layers.rs` + `Cover::is_full`,
    # `painter/mod.rs:200-214`): a GAP unit is full-cover when every pixel
    # row's carried cover is exactly +-16 (NonZero) or +-16 mod 32 (EvenOdd);
    # with an opaque solid Over style it occludes everything beneath.
    ac = jnp.abs(carry_after_s)
    full_nz = jnp.all(ac == consts.PIXEL_WIDTH, axis=1)
    full_eo = jnp.all((ac & 31) == consts.PIXEL_WIDTH, axis=1)
    full_s = jnp.where(fr_eo, full_eo, full_nz)
    gap_flags_s = (
        jnp.where(full_s & opaque_s, 2, 0)  # FLAG_FULL_OPAQUE
        | jnp.where(isclip_s, 4, 0)  # FLAG_CLIP
        # FLAG_FULL_SOLID: uniform coverage 1 with a solid fill — eligible
        # for the per-tile scalar color fold (`TileWriteOp::Solid`,
        # `skip_fully_covered_layers.rs:27-119`).
        | jnp.where(full_s & solid_s, 8, 0)
        # FLAG_FULL_CLIP: a clip whose carried cover is full — it admits
        # everything, so `skip_trivial_clips` drops it and un-clips the
        # draws it governs (`skip_trivial_clips.rs:27-112`, full-clip arm).
        | jnp.where(full_s & isclip_s, 16, 0)
    ).astype(jnp.int32)
    if presorted:
        real_flags = jnp.where(isclip_s, 4, 0).astype(jnp.int32)
    else:
        real_flags = (
            jnp.zeros(run_cap, jnp.int32)
            .at[orig]
            .set(jnp.where(isclip_s, 4, 0).astype(jnp.int32))
        )

    return dict(
        run_hi=run_hi,
        run_layer=run_layer,
        r_valid=r_valid,
        real_flags=real_flags,
        grid=grid,
        style_s=style_s,
        inv=inv,  # original run -> sorted position
        # sorted-by-(row, layer, tile_x) domain:
        key2_s=key2_s,
        tx_s=tx_s,
        carry_in_s=carry_in_s,
        carry_after_s=carry_after_s,
        gap_flags_s=gap_flags_s,
        span=span,
        cumspan=cumspan,
        v_total=cumspan[-1],
    )


@partial(jax.jit, static_argnames=("v_cap",))
def build_units(
    run_hi,
    run_layer,
    r_valid,
    real_flags,  # i32 [R] FLAG_CLIP per real run (original order)
    inv,  # i32 [R] original run -> sorted-domain position
    key2_s,
    tx_s,
    gap_flags_s,  # i32 [R] FLAG_FULL_OPAQUE/FLAG_CLIP per gap ((row,layer,tx) order)
    span,
    cumspan,
    v_total,
    v_cap: int,
):
    """Merges real runs and virtual (gap) units into one per-tile-slot order.

    Returns sorted unit arrays (key, layer, src index, sorted-domain src2
    index, flags, slot k) plus the maximum slot count K (to be read back for
    the paint fold).  flags carry FLAG_VIRTUAL / FLAG_FULL_OPAQUE /
    FLAG_CLIP bits for the culling pass.  `src` addresses original-order
    run data (the grid); `src2` addresses the sorted-domain carry arrays.
    """
    run_cap = run_hi.shape[0]

    # Real paint units: runs in painted tiles (tile_x >= 0, i.e. biased > 0).
    txb = run_hi & jnp.uint32((1 << TX_BITS) - 1)
    real_key = jnp.where(r_valid & (txb > 0), run_hi, SENTINEL)
    real_layer = run_layer
    real_src = jnp.arange(run_cap, dtype=jnp.int32)
    real_src2 = inv

    # Virtual units from gap expansion: scatter each gap run's start into the
    # gap index space, prefix-max recovers the owner (no binary search).
    vj = jnp.arange(v_cap, dtype=jnp.int32)
    v_valid = vj < v_total
    starts = cumspan - span  # exclusive
    has = span > 0
    sidx = jnp.arange(run_cap, dtype=jnp.int32)
    start_pos = jnp.where(has, starts, v_cap)  # dropped when span == 0
    owner = jax.lax.cummax(
        jnp.zeros(v_cap, jnp.int32).at[start_pos].max(sidx, mode="drop")
    )
    # starts = cumsum(span) - span is nondecreasing in run index, so the
    # owner's start IS the prefix-max of scattered starts — a [v_cap]-sized
    # gather instead of a second run_cap-index scatter (~2 ms at paris).
    # ONE 4-wide row gather serves every per-owner column (gathers cost per
    # INDEX on TPU, not per byte — three separate [v_cap] gathers here were
    # ~2.3 ms each at paris scale); key2_s rides as an i32 bit pattern.
    own4 = jnp.stack(
        [starts, tx_s, gap_flags_s,
         jax.lax.bitcast_convert_type(key2_s, jnp.int32)], axis=1
    )[owner]  # [v_cap, 4] i32
    base = own4[:, 0]
    off = vj - base
    v_tx = own4[:, 1] + 1 + off
    v_flags = own4[:, 2] | 1  # FLAG_VIRTUAL
    v_key2 = jax.lax.bitcast_convert_type(own4[:, 3], jnp.uint32)
    v_rowb = v_key2 >> 21
    v_layer = (v_key2 & _LAYER_MASK).astype(jnp.uint32)
    v_key = jnp.where(
        v_valid, (v_rowb << TX_BITS) | (v_tx + 1).astype(jnp.uint32), SENTINEL
    )

    key_u = jnp.concatenate([real_key, v_key])
    layer_u = jnp.concatenate([real_layer, v_layer])
    src_u = jnp.concatenate([real_src, owner])
    src2_u = jnp.concatenate([real_src2, owner])
    virt_u = jnp.concatenate([real_flags, v_flags])

    key_u, layer_u, src_u, src2_u, virt_u = jax.lax.sort(
        (key_u, layer_u, src_u, src2_u, virt_u), num_keys=2, is_stable=False
    )

    new_tile = key_u != jnp.roll(key_u, 1)
    new_tile = new_tile.at[0].set(True)
    first = _first_of_group(new_tile)
    k = jnp.arange(key_u.shape[0], dtype=jnp.int32) - first
    u_valid = key_u != SENTINEL
    k_needed = jnp.max(jnp.where(u_valid, k, -1)) + 1

    return key_u, layer_u, src_u, src2_u, virt_u, k, u_valid, k_needed
