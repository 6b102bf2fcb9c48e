"""Single-dispatch device pipeline and its multi-chip sharding.

`render_frame` fuses every stage — line setup, virtual-line expansion,
rasterize, sort, runs, carries, units, occlusion culling, paint, sRGB —
into ONE jittable program with static capacity buckets and no host
round-trips.  It returns the packed frame plus a small diagnostics vector
(actual totals vs capacities); the renderer fetches both in a single device
sync and re-renders with bigger buckets only on overflow (optimistic
capacities).

`render_frame_sharded` wraps the same program in `jax.shard_map` over a 1D
device mesh, splitting the framebuffer by tile rows: geometry and styles are
replicated (broadcast once over ICI), each chip rasterizes and paints only
its row slice, and the output is natively sharded — no collectives needed in
steady state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import consts
from . import line_setup as _ls
from . import paint as _paint
from . import rasterize as _raster
from . import runs as _runs
from . import srgb as _srgb
from .paint import Features

K_SEG = 8  # pixel segments per virtual line


class Caps(NamedTuple):
    """Static capacity buckets for one compiled pipeline configuration."""

    vline: int = 512  # virtual lines (each up to K_SEG pixel segments)
    run: int = 512
    virt: int = 512
    k: int = 4


# Indices into the diagnostics vector.  DIAG_DMG (number of changed tiles)
# is meaningful only for cached renders; it reads 0 elsewhere.
DIAG_VLINES, DIAG_RUNS, DIAG_VIRT, DIAG_K, DIAG_SEGS, DIAG_DMG = range(6)

# Static capacity of the compact damaged-tile readback (bytes fetched per
# cached frame = DMG_CAP * TILE_HEIGHT * TILE_WIDTH * C).  NOT a growth
# bucket: frames with more damage fall back to a full-frame fetch (the frame
# is on device either way), so overflow costs bandwidth, never a recompile.
DMG_CAP = 1024


def _unit_tiles(key_u, u_valid, tiles_x, n_tiles):
    from .rasterize import TX_BITS

    rowb = (key_u >> TX_BITS).astype(jnp.int32) - 1
    txu = (key_u & jnp.uint32((1 << TX_BITS) - 1)).astype(jnp.int32) - 1
    return jnp.where(u_valid, rowb * tiles_x + txu, n_tiles)


def slot_bits_for(n_slots: int, rows: int, tiles_x: int) -> int:
    """Bits for the layer slot in the packed single-u32 sort key; 0 when
    [row | slot | tx] cannot fit 31 bits (two-key fallback)."""
    slot_bits = max((n_slots - 1).bit_length(), 1)
    row_bits = (rows + 1).bit_length()
    tx_bits = max((tiles_x + 1).bit_length(), 1)
    if row_bits + tx_bits + slot_bits > 31:
        return 0
    return slot_bits


def _slot_bits(st, rows: int, tiles_x: int) -> int:
    return slot_bits_for(st["orders"].shape[0], rows, tiles_x)


def _core(
    px, py, line_slot,
    g_slot, g_valid, g_t, g_has_t,
    st, clear, row_lo,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels,
    cull: bool = True,
    cache=None,  # (prev_frame u8, prev_counts i32 [T], st_unchanged bool [SL], cache_ok bool)
    crop_x=None,  # traced (tile_x_lo, tile_x_hi): tiles outside skip painting
    crop_y=None,  # traced (tile_row_lo, tile_row_hi): rows outside skip painting
):
    params, slots, lengths, vline_ends = _ls.line_setup(
        px, py, line_slot, g_slot, g_valid, g_t, g_has_t, width, height,
        k_seg=K_SEG,
    )
    v_total = vline_ends[-1]
    total_segs = jnp.sum(lengths, dtype=jnp.int32)

    # Pack the sort key into one u32 when [row | slot | tx] fits.
    slot_bits = _slot_bits(st, rows, tiles_x)
    key_hi, key_lo, payload = _raster.rasterize_sort(
        params, slots, lengths, vline_ends,
        jnp.minimum(v_total, jnp.uint32(caps.vline)),
        caps.vline, K_SEG, rows, tiles_x, row_lo,
        slot_bits=slot_bits,
    )
    return _back(
        key_hi, key_lo, payload, v_total, total_segs,
        st, clear, row_lo, rows, tiles_x, caps, features, channels,
        cull, cache, crop_x, crop_y, presorted=slot_bits > 0,
    )


def _back(
    key_hi, key_lo, payload,  # sorted segment stream (shard-local rows)
    v_total, total_segs,  # diagnostics scalars from the front half
    st, clear, row_lo,
    rows: int, tiles_x: int,
    caps: Caps, features: Features, channels,
    cull: bool = True,
    cache=None,
    crop_x=None,
    crop_y=None,
    presorted: bool = False,  # segments sorted by [row|slot|tx]: runs
    #                           already arrive in carry-chain order
):
    """Everything after the segment sort: runs, carries, units, optimizer
    passes, paint, sRGB.  Split out so the line-sharded multi-chip path can
    interpose the all_to_all segment exchange between sort halves."""
    run_id, num_runs, new_run = _runs.extract_runs(key_hi, key_lo)

    st_opaque = (
        (st["func"] == 0)
        & (st["fill_type"] == 0)
        & (st["color"][:, 3] == 1.0)
        & (st["blend"] == 0)
        & (~st["is_clipped"])
    )
    st_isclip = st["func"] == 1
    st_solid = (
        (st["func"] == 0) & (st["fill_type"] == 0) & (~st["is_clipped"])
    )

    rd = _runs.run_data(
        key_hi, key_lo, payload, run_id, new_run,
        jnp.minimum(num_runs, caps.run),
        st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid,
        caps.run, tiles_x, presorted=presorted,
        style_pack=_paint.style_pack_for_fold(
            features,
            st["orders"], st["pidx"], st["fill_rule"], st["func"],
            st["clip_n"], st["is_clipped"], st["blend"], st["fill_type"],
            st["color"], st["grad"], st["stops"],
        ),
    )

    key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid, k_pre = (
        _runs.build_units(
            rd["run_hi"], rd["run_layer"], rd["r_valid"], rd["real_flags"],
            rd["inv"], rd["key2_s"], rd["tx_s"], rd["gap_flags_s"],
            rd["span"], rd["cumspan"],
            jnp.minimum(rd["v_total"], caps.virt),
            caps.virt,
        )
    )

    n_tiles = rows * tiles_x
    counts = None
    tile_unch = None
    if cache is not None:
        # tile_unchanged (`passes/tile_unchanged.rs:24-57`): a tile whose
        # unit count matches the cached count AND whose every layer is
        # unchanged re-emits the previous frame's pixels.  Counts are
        # pre-cull so they're stable across optimizer decisions.
        prev_frame, prev_counts, st_unchanged, cache_ok = cache
        tile_of = _unit_tiles(key_u, u_valid, tiles_x, n_tiles)
        counts = (
            jnp.zeros((n_tiles,), jnp.int32)
            .at[tile_of]
            .add(1, mode="drop")
        )
        slot_u = jnp.minimum(layer_u.astype(jnp.int32), st["orders"].shape[0] - 1)
        unch_u = jnp.where(u_valid, st_unchanged[slot_u].astype(jnp.int32), 1)
        all_unch = (
            jnp.ones((n_tiles,), jnp.int32)
            .at[tile_of]
            .min(unch_u, mode="drop")
        )
        tile_unch = cache_ok & (counts == prev_counts) & (all_unch == 1)

    if cull:
        # Layer-workbench passes, FUSED into one keep-mask + ONE unit
        # re-sort (a 5-operand u_cap sort costs ~3 ms at paris scale; the
        # two passes used to renumber separately).  The occlusion analysis
        # legally runs on the pre-clip-pass list — see cull_units_keep.
        keep = _paint.cull_units_keep(key_u, virt_u, k_u, u_valid)
        if features.has_clip:
            # Trivial-clip elimination (`passes/skip_trivial_clips.rs`):
            # compiles away entirely for clip-free frames via the static
            # feature flag.
            slot_u = jnp.minimum(
                layer_u.astype(jnp.int32), st["orders"].shape[0] - 1
            )
            pi_u = st["pidx"][slot_u]
            id_u = (
                st["orders"][slot_u] & jnp.uint32(consts.LAYER_LIMIT)
            ).astype(jnp.int32)
            cend_u = id_u + st["clip_n"][pi_u]
            clipped_u = st["is_clipped"][pi_u] & (st["func"][pi_u] == 0)
            keep_c, virt_u = _paint.skip_trivial_clips_keep(
                key_u, virt_u, u_valid, id_u, cend_u, clipped_u
            )
            keep &= keep_c
        key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid, k_needed = (
            _paint._renumber_units(
                key_u, layer_u, src_u, src2_u, virt_u, keep
            )
        )
    else:
        k_needed = k_pre

    tile_skip = tile_unch
    out_of_crop = None
    if crop_x is not None or crop_y is not None:
        # Tiles outside the crop never paint (`cpu/renderer.rs:38-53` +
        # `painter/mod.rs:504-516`); covers still carry correctly because
        # carries come from the run chains, not painted tiles.
        tx_t = jnp.arange(n_tiles, dtype=jnp.int32) % tiles_x
        row_t = jnp.arange(n_tiles, dtype=jnp.int32) // tiles_x
        out_of_crop = jnp.zeros((n_tiles,), bool)
        if crop_x is not None:
            out_of_crop |= (tx_t < crop_x[0]) | (tx_t >= crop_x[1])
        if crop_y is not None:
            out_of_crop |= (row_t < crop_y[0]) | (row_t >= crop_y[1])
        tile_skip = out_of_crop if tile_skip is None else (tile_skip | out_of_crop)

    if cache is not None or crop_x is not None or crop_y is not None:
        # Depth needed over painted tiles only.
        tile_of2 = _unit_tiles(key_u, u_valid, tiles_x, n_tiles)
        kmax_t = (
            jnp.zeros((n_tiles,), jnp.int32)
            .at[tile_of2]
            .max(k_u + 1, mode="drop")
        )
        k_needed = jnp.max(jnp.where(tile_skip, 0, kmax_t))

    frame = _paint.paint(
        key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
        rd["grid"], rd["carry_in_s"], rd["carry_after_s"],
        st["orders"], st["pidx"], st["fill_rule"], st["func"], st["clip_n"],
        st["is_clipped"], st["blend"], st["fill_type"], st["color"],
        st["grad"], st["stops"], st["tex"], st["atlas"], clear,
        rows, tiles_x, caps.k, features, row_lo,
        k_active=jnp.minimum(k_needed, caps.k),
        tile_unchanged=tile_skip,
        style_s=rd["style_s"],
        tx_s=rd["tx_s"],
        presorted=presorted,
    )
    packed = _srgb.pack_srgb(frame, channels)

    n_dmg = jnp.int32(0)
    dmg = None
    if cache is not None:
        # Unchanged AND out-of-crop tiles re-emit the previous frame's
        # pixels, so the returned frame is directly the next cache state
        # (out-of-crop staleness is tracked by the caller leaving the
        # layers' is_unchanged bits clear on cropped renders).
        reemit = tile_unch if out_of_crop is None else (tile_unch | out_of_crop)
        pix_unch = jnp.repeat(
            jnp.repeat(
                reemit.reshape(rows, tiles_x), consts.TILE_HEIGHT, axis=0
            ),
            consts.TILE_WIDTH,
            axis=1,
        )
        packed = jnp.where(pix_unch[:, :, None], prev_frame, packed)

        # Damage-aware readback: compact the changed tiles so the host can
        # fetch kilobytes instead of the whole frame.  This is the transfer
        # analog of the reference's TileWriteOp::None — unchanged tiles are
        # simply never written to the user's buffer
        # (`layer_workbench/mod.rs:280-342` break path).  Tiles beyond
        # DMG_CAP aren't gathered; the caller falls back to the full frame.
        changed = ~reemit  # [n_tiles]
        n_dmg = jnp.sum(changed, dtype=jnp.int32)
        pos = jnp.cumsum(changed.astype(jnp.int32)) - 1
        tgt = jnp.where(changed & (pos < DMG_CAP), pos, DMG_CAP)
        dmg_idx = (
            jnp.full((DMG_CAP + 1,), n_tiles, jnp.int32)
            .at[tgt]
            .set(jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")[:DMG_CAP]
        )
        tiles8 = (
            packed.reshape(
                rows, consts.TILE_HEIGHT, tiles_x,
                consts.TILE_WIDTH * len(channels),
            )
            .transpose(0, 2, 1, 3)
            .reshape(n_tiles, consts.TILE_HEIGHT, -1)
        )
        dmg_tiles = tiles8[jnp.minimum(dmg_idx, n_tiles - 1)]
        dmg = (dmg_idx, dmg_tiles)

    diag = jnp.stack(
        [
            v_total.astype(jnp.int32),
            num_runs.astype(jnp.int32),
            rd["v_total"].astype(jnp.int32),
            k_needed.astype(jnp.int32),
            total_segs,
            n_dmg,
        ]
    )
    if cache is not None:
        return packed, diag, counts, dmg
    return packed, diag


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rows", "tiles_x", "caps", "features", "channels", "cull",
    ),
)
def render_frame(
    px, py, line_slot,
    g_slot, g_valid, g_t, g_has_t,
    st, clear,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels,
    cull: bool = True,
    row_lo=None,  # traced: first tile row to render (crop), default 0
    crop_x=None,  # traced (tile_x_lo, tile_x_hi) paint crop, default full
):
    """Single-chip render of tile rows [row_lo, row_lo + rows); returns
    (u8 frame, i32[5] diagnostics)."""
    return _core(
        px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear,
        jnp.int32(0) if row_lo is None else row_lo,
        width, height, rows, tiles_x, caps, features, channels,
        cull, crop_x=crop_x,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rows", "tiles_x", "caps", "features", "channels", "cull",
    ),
)
def render_frame_cached(
    px, py, line_slot,
    g_slot, g_valid, g_t, g_has_t,
    st, clear,
    prev_frame, prev_counts, st_unchanged, cache_ok,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels,
    cull: bool = True,
    crop_x=None,  # traced (tile_x_lo, tile_x_hi): paint crop, default full
    crop_y=None,  # traced (tile_row_lo, tile_row_hi): paint crop, default full
):
    """Damage-aware render: unchanged tiles re-emit `prev_frame` pixels and
    contribute nothing to the fold depth.  With a crop, out-of-crop tiles
    also re-emit `prev_frame` (the cache survives cropped renders, matching
    `cpu/renderer.rs:38-53`).  Returns (u8 frame, diag, per-tile unit counts
    to store for the next frame, (dmg_idx [DMG_CAP], dmg_tiles
    [DMG_CAP, TILE_HEIGHT, TILE_WIDTH*C]) — the first diag[DIAG_DMG] entries
    are the changed tiles' indices/pixels for compact host readback)."""
    return _core(
        px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear,
        jnp.int32(0), width, height, rows, tiles_x, caps, features, channels,
        cull, cache=(prev_frame, prev_counts, st_unchanged, cache_ok),
        crop_x=crop_x, crop_y=crop_y,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rows", "tiles_x", "caps", "features", "channels",
        "mesh", "cull",
    ),
)
def render_frame_sharded(
    px, py, line_slot,
    g_slot, g_valid, g_t, g_has_t,
    st, clear,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels, mesh,
    cull: bool = True,
):
    """Framebuffer-sharded render over a 1D mesh axis "rows".

    `rows` must be the padded per-shard row count (total rows / mesh size).
    Inputs are replicated; the returned frame is sharded along its first
    axis, diagnostics are the elementwise maximum over shards.
    """
    from jax.sharding import PartitionSpec as P

    def shard_fn(px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear):
        row_lo = jax.lax.axis_index("rows").astype(jnp.int32) * rows
        frame, diag = _core(
            px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear,
            row_lo, width, height, rows, tiles_x, caps, features, channels,
            cull,
        )
        return frame, jax.lax.pmax(diag, "rows")

    # check_vma=False: pallas_call outputs carry no varying-axes metadata,
    # so the vma checker rejects any Pallas kernel under shard_map; the
    # out_specs above declare the sharding explicitly instead.
    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P("rows"), P()),
        check_vma=False,
    )(px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear)


# Extra diagnostics entries for the line-sharded path: the largest per-
# (source, destination) exchange block actually needed (vs the static xcap),
# and the largest per-shard received-segment population (the back half's
# true work share — ideal is total segments / N).
DIAG_XPAIR = 6
DIAG_XRECV = 7


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rows", "tiles_x", "caps", "features", "channels",
        "mesh", "xcap", "cull",
    ),
)
def render_frame_sharded_lines(
    p0x, p0y, p1x, p1y, line_slot,  # sharded [L] line-endpoint pair arrays
    g_slot, g_valid, g_t, g_has_t,
    st, clear,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels, mesh,
    xcap: int,  # per-(src, dst) exchange block capacity (multiple of 128)
    cull: bool = True,
):
    """Fully work-sharded render: LINES shard across chips (not just the
    framebuffer), so line setup, virtual-line expansion, the ff64 emit AND
    the segment sort all scale ~1/N — the row-replicated
    `render_frame_sharded` repeats that whole front half on every chip.

    Per shard: rasterize own lines with GLOBAL tile rows, sort locally
    (which groups segments by destination row band, contiguously and
    pre-masked), slice the per-destination blocks, `all_to_all` them over
    ICI, re-bias rows to shard-local, and sort the received ~S/N segments.
    The back half (runs/carries/units/paint) is unchanged and was already
    1/N (`tools/shard_scaling_probe.py`).

    `rows` is the per-shard tile-row count; the frame shards by rows.
    Requires the packed single-u32 key (raises if [row|tx|slot] exceeds 31
    bits — such scenes fall back to `render_frame_sharded`).
    Diagnostics gain DIAG_XPAIR: the max per-(src, dst) block population,
    to grow `xcap` on overflow (oversubscribed blocks drop segments, so the
    frame is invalid until the growth loop converges — the same contract as
    every other capacity bucket)."""
    from jax.sharding import PartitionSpec as P

    n = mesh.devices.size
    rows_total = rows * n
    slot_bits = _slot_bits(st, rows_total, tiles_x)
    if slot_bits == 0:
        raise ValueError(
            "line-sharded path needs the packed u32 key; "
            "use render_frame_sharded"
        )
    tx_bits = max((tiles_x + 1).bit_length(), 1)
    # A shard can never send more than its own segment capacity to one
    # destination, so xcap is bounded by it (also keeps dynamic_slice legal).
    xcap = min(xcap, caps.vline * K_SEG)
    assert xcap % 128 == 0, "xcap must be a multiple of 128"

    def shard_fn(p0x, p0y, p1x, p1y, line_slot,
                 g_slot, g_valid, g_t, g_has_t, st, clear):
        shard = jax.lax.axis_index("rows").astype(jnp.int32)
        row_lo = shard * rows

        # Front half over OWN lines, tile rows kept global for routing.
        params, slots, lengths, vline_ends = _ls.line_setup_pairs(
            p0x, p0y, p1x, p1y, line_slot,
            g_slot, g_valid, g_t, g_has_t, width, height, k_seg=K_SEG,
        )
        v_total = vline_ends[-1]
        segs_own = jnp.sum(lengths, dtype=jnp.int32)
        packed, payload = _raster._expand_emit_packed(
            params, lengths, vline_ends,
            jnp.minimum(v_total, jnp.uint32(caps.vline)),
            caps.vline, K_SEG, rows_total, tiles_x, jnp.int32(0),
            slot_bits, tx_bits,
        )
        # Local sort: ascending key = ascending global row = grouped by
        # destination shard, each group internally sorted; sentinels last.
        packed, payload = jax.lax.sort(
            (packed, payload), num_keys=1, is_stable=False
        )

        # Destination shard of each segment (tile rows band-partition).
        rowb = (packed >> (slot_bits + tx_bits)).astype(jnp.int32)
        valid = packed != _raster.SENTINEL
        dst = jnp.where(valid, (rowb - 1) // rows, n)
        # Per-destination population in one compare-reduce (no per-element
        # scatter: [S_loc, n] bool then a column sum).
        counts = jnp.sum(
            dst[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :],
            axis=0, dtype=jnp.int32,
        )  # [n]
        starts = jnp.cumsum(counts) - counts
        max_pair = jnp.max(counts)

        # Sorted → group d is the contiguous slice [starts[d], +counts[d]);
        # n dynamic slices (contiguous DMAs) build the exchange blocks.
        s_loc = packed.shape[0]
        zero_payload = jnp.uint32((1024 << 6) | 16)
        blk_k = []
        blk_p = []
        for d in range(n):
            start = jnp.minimum(starts[d], s_loc - xcap)
            kk = jax.lax.dynamic_slice(packed, (start,), (xcap,))
            pp = jax.lax.dynamic_slice(payload, (start,), (xcap,))
            gidx = start + jnp.arange(xcap, dtype=jnp.int32)
            keep = (gidx >= starts[d]) & (gidx < starts[d] + counts[d])
            blk_k.append(jnp.where(keep, kk, _raster.SENTINEL))
            blk_p.append(jnp.where(keep, pp, zero_payload))
        blk_k = jnp.stack(blk_k)  # [n, xcap]
        blk_p = jnp.stack(blk_p)

        # The exchange: row d of the result is the block shard d sent here.
        recv_k = jax.lax.all_to_all(blk_k, "rows", 0, 0).reshape(-1)
        recv_p = jax.lax.all_to_all(blk_p, "rows", 0, 0).reshape(-1)

        # Re-bias rows to shard-local and order the received ~S/N segments.
        adj = (row_lo.astype(jnp.uint32)) << (slot_bits + tx_bits)
        recv_k = jnp.where(recv_k == _raster.SENTINEL, recv_k, recv_k - adj)
        recv_valid = jnp.sum(recv_k != _raster.SENTINEL, dtype=jnp.int32)
        recv_k, recv_p = jax.lax.sort(
            (recv_k, recv_p), num_keys=1, is_stable=False
        )
        key_hi, key_lo = _raster.unpack_packed_keys(recv_k, slot_bits, tx_bits)

        frame, diag = _back(
            key_hi, key_lo, recv_p,
            v_total, jax.lax.psum(segs_own, "rows"),
            st, clear, row_lo, rows, tiles_x, caps, features, channels, cull,
            presorted=True,
        )
        diag = jnp.concatenate([diag, max_pair[None], recv_valid[None]])
        return frame, jax.lax.pmax(diag, "rows")

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P("rows"), P("rows"), P("rows"), P("rows"), P("rows"),
            P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P("rows"), P()),
        check_vma=False,
    )(p0x, p0y, p1x, p1y, line_slot,
      g_slot, g_valid, g_t, g_has_t, st, clear)


def style_tables_device(st) -> dict:
    """Uploads host StyleTables to device arrays (a dict pytree)."""
    import jax.numpy as jnp

    return dict(
        orders=jnp.asarray(st.orders),
        pidx=jnp.asarray(st.pidx),
        fill_rule=jnp.asarray(st.fill_rule),
        func=jnp.asarray(st.func),
        clip_n=jnp.asarray(st.clip_n),
        is_clipped=jnp.asarray(st.is_clipped),
        blend=jnp.asarray(st.blend),
        fill_type=jnp.asarray(st.fill_type),
        color=jnp.asarray(st.color),
        grad=jnp.asarray(st.grad),
        stops=jnp.asarray(st.stops),
        tex=jnp.asarray(st.tex),
        atlas=jnp.asarray(st.atlas),
    )
