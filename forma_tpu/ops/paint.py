"""Device paint: per-tile K-slot blend fold over run-indexed packed grids.

The XLA counterpart of `Painter::paint_tile_row` + the layer workbench
(`forma/src/cpu/painter/`).  Every (tile, layer) paint unit references its
run's packed 16x16 area|cover grid; tiles blend their units bottom-to-top in
a `fori_loop` over K slots — every tile blends slot k of its own unit list
simultaneously, so the whole framebuffer advances one layer per step on the
VPU.  Blending a zero-coverage unit is a no-op, which is what makes the
dense fold equivalent to the reference's sparse per-tile layer lists.

v2 performance structure (TPU cost model: row gathers ~free, per-element
gathers ~8ns each):

- the fold's only big memory op per step is a ROW gather of [T, 256] packed
  i32 grid rows; coverage integration (carry + exclusive cumsum) happens
  inside the step, so no [U, 16, 16] f32 coverage tensor ever materialises;
- full-cover opaque units cull everything beneath them per tile (the
  `skip_fully_covered_layers` pass, `passes/skip_fully_covered_layers.rs`),
  then units re-sort so the fold runs only over surviving depth;
- fill evaluation (solid / gradient / texture-atlas) and the 16 blend modes
  follow `painter/styling.rs` select-tree semantics; modes and fill kinds
  the frame doesn't use compile away via the static `features` tuple.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import consts
from .rasterize import SENTINEL, TX_BITS
from .runs import _first_of_group, unpack_grid


def _paint_backend() -> str:
    """Per-pixel fold backend: "tree" (chunked affine-composition fold,
    Over-only frames), "chunk" (chunked schedule + batched gathers with
    exact sequential application) or "wave" (sequential wave fold, the
    general path).  FORMA_PAINT=wave|tree|chunk overrides for A/B benches."""
    env = os.environ.get("FORMA_PAINT")
    if env in ("wave", "tree", "chunk"):
        return env
    # "wave" wins on TPU — the tree/chunk variants are RECORDED NEGATIVES
    # (paris@1080p paint stage, device_get-fenced: wave 30 ms, chunked
    # sequential 48 ms, chunked affine-tree 64 ms; see docs/ARCHITECTURE.md).
    return "wave"


def _fold_backend() -> str:
    """Pixel-fold backend for simple frames (Over-only, solid fills, no
    clip/gradient/texture): the Pallas VMEM-resident fold on TPU, the XLA
    wave fold elsewhere.  FORMA_FOLD=xla|pallas overrides (A/B benches)."""
    env = os.environ.get("FORMA_FOLD")
    if env in ("xla", "pallas"):
        return env
    # Default: the Pallas VMEM-resident fold on TPU.  The TB=32 + MXU-prefix
    # revision won its committed-state A/B on the real chip (paris@1080p:
    # 10.82 FPS wave -> 11.75 FPS pallas, goldens bit-exact); the TB=8
    # revision had lost (9.67 vs 10.43) and stayed off.  Non-TPU backends
    # keep the XLA wave fold (the kernel's DMA/MXU layout is TPU-tuned and
    # interpret mode is test-only).
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _fold_pallas_eligible(features: "Features", k_slots: int, ms: int) -> bool:
    """The Pallas fold covers solid + gradient fills, all 16 blend modes,
    clips, and cached/cropped frames.  Texture frames take the wave fold (a
    texture unit needs per-pixel atlas gathers — a recorded cost-model
    negative, see ops/paint_pallas.py docstring), as do frames whose
    gradient stop capacity overflows the unit row's lane budget or whose
    fold depth exceeds the VMEM window."""
    from . import paint_pallas as _pp

    return (
        not features.has_texture
        and k_slots <= 256
        and 256 + 16 + _pp.style_layout(features, ms).width <= _pp.UW
    )


def style_pack_for_fold(
    features,
    st_orders, st_pidx, st_fill_rule, st_func, st_clip_n, st_is_clipped,
    st_blend, st_fill_type, st_color, st_grad, st_stops,
):
    """Per-layer-slot style rows in the Pallas fold's FEATURE-DEPENDENT
    lane layout (`paint_pallas.style_layout`), i32 [SL, lay.width].  Built
    as one [P]-row matrix + ONE [SL]-index gather by pidx.  Lane groups
    the frame's features don't need are omitted entirely — the per-unit
    gather downstream costs per LANE beyond ~8 lanes (a solid/Over frame
    at the full 38-lane row measured +18 ms/frame,
    tools/fold_prep_probe.py)."""
    from . import paint_pallas as _pp

    P = st_color.shape[0]
    ms = st_stops.shape[1]
    lay = _pp.style_layout(features, ms)
    cols = [
        jax.lax.bitcast_convert_type(st_color, jnp.int32),  # 4
        st_fill_rule[:, None],
    ]
    if lay.blend >= 0:
        cols.append(st_blend[:, None])
    if lay.ft >= 0:
        cols.append(st_fill_type[:, None])
    if lay.func >= 0:
        cols.extend(
            [
                st_func[:, None],
                jnp.zeros((P, 1), jnp.int32),  # layer id (per slot, below)
                st_clip_n[:, None],  # becomes cend below
                st_is_clipped[:, None].astype(jnp.int32),
            ]
        )
    if lay.grad >= 0:
        cols.extend(
            [
                jax.lax.bitcast_convert_type(st_grad, jnp.int32),  # 6
                jax.lax.bitcast_convert_type(
                    st_stops.reshape(P, 5 * ms), jnp.int32
                ),
            ]
        )
    p_mat = jnp.concatenate(cols, axis=1)  # [P, lay.width]
    sl = p_mat[st_pidx]  # the one gather
    if lay.func < 0:
        return sl
    layer_id = (st_orders & jnp.uint32(consts.LAYER_LIMIT)).astype(jnp.int32)
    return jnp.concatenate(
        [
            sl[:, : lay.layer],
            layer_id[:, None],
            (layer_id + sl[:, lay.cend])[:, None],
            sl[:, lay.clipped :],
        ],
        axis=1,
    )


def _paint_fold_pallas(
    key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
    grid, carry_in_s, carry_after_s, style_s,
    clear_color, rows: int, tiles_x: int, k_slots: int,
    features: "Features", ms: int, row_lo=0, tile_unchanged=None,
    tx_s=None,  # i32 [R] per-run tile x ((row,layer,tx)-sorted order);
    #             with presorted keys it enables the one-gather table prep
    presorted: bool = False,
    interpret: bool = False,
):
    """XLA-side prep + Pallas fold; returns the frame as [T, TH, TW, 4] f32.

    Builds the per-unit matrix U, the per-tile unit spans, and the
    per-block SMEM descriptors, then runs the VMEM-resident fold
    (ops/paint_pallas.py), specialized on the frame's static features.

    U comes from one of two preps:
    - TABLE MODE (presorted keys, no clips): ONE per-run table
      [grid | carry_in | carry_after | run_tx | style] and ONE wide
      [u_cap, 384] gather by src2_u — the kernel derives each unit's
      virtuality from run_tx on-chip.  Measured 3.1 ms vs 11.7 ms for the
      assembly below at paris shapes (tools/profile_r5.py probe): wide
      gathers ride an efficient row-DMA path, and the index padding folds
      the DMA-slack pad into the gather.  Requires src_u == src2_u per
      unit, which holds exactly when the segment sort used the packed
      [row|slot|tx] key (presorted).  Clip frames carry a per-UNIT
      FLAG_UNCLIPPED fixup, so they keep the assembly prep.
    - ASSEMBLY (fallback): grid-row gather + carry|style gather + concat
      + pad, with virtuality baked into the rows.

    Bit-compatible with the wave fold: same integer coverage math, same
    fill/blend/clip expression trees.  Skipped tiles (damage cache / crop)
    fold zero units and come back as the clear color, exactly like the
    wave fold's skip mask; the caller re-emits previous pixels for them.
    """
    from . import paint_pallas as _pp

    n_tiles = rows * tiles_x
    TBp = _pp.TB
    t8 = -(-n_tiles // TBp) * TBp
    nblk = t8 // TBp
    u_cap = key_u.shape[0]
    run_cap = grid.shape[0]
    lay = _pp.style_layout(features, ms)
    assert style_s.shape[1] == lay.width, (style_s.shape, lay)
    table_mode = (
        presorted
        and tx_s is not None
        and not features.has_clip
        and 256 + 33 + lay.width <= _pp.UW
    )

    rowb = (key_u >> TX_BITS).astype(jnp.int32) - 1
    txu = (key_u & jnp.uint32((1 << TX_BITS) - 1)).astype(jnp.int32) - 1
    tile_of = jnp.where(u_valid, rowb * tiles_x + txu, t8 + 1)

    # First-unit position per tile.  Units are (tile, layer)-sorted, so the
    # group boundaries (<= one per tile) compact to the front of ONE sort
    # and a t8-sized scatter — a u_cap-index scatter would cost ~10 ns/index
    # (~3.5 ms at paris scale).
    iota_u = jnp.arange(u_cap, dtype=jnp.int32)
    boundary = u_valid & (
        (tile_of != jnp.roll(tile_of, 1)) | (iota_u == 0)
    )
    skey = jnp.where(boundary, tile_of, t8 + 1).astype(jnp.uint32)
    # Unstable: boundary keys are unique (one per tile).
    skey_s, pos_s = jax.lax.sort((skey, iota_u), num_keys=1, is_stable=False)
    ntake = min(t8 + 1, u_cap)
    ust = (
        jnp.full((t8 + 2,), u_cap, jnp.int32)
        .at[skey_s[:ntake].astype(jnp.int32)]
        .min(pos_s[:ntake], mode="drop")[: t8 + 1]
    )
    n_valid = jnp.sum(u_valid, dtype=jnp.int32)
    ust = ust.at[t8].min(n_valid)
    # Backfill empty tiles with the next tile's start (reverse cummin).
    ust = jnp.flip(jax.lax.cummin(jnp.flip(ust)))
    depth = ust[1:] - ust[:-1]  # [t8] true per-tile unit counts
    cnt = jnp.minimum(depth, k_slots)
    if tile_unchanged is not None:
        # Skipped tiles (damage cache / crop) fold zero units: the kernel
        # leaves them at the clear color and the caller re-emits previous
        # pixels — the same contract as the wave fold's skip mask.
        skip = jnp.pad(tile_unchanged, (0, t8 - n_tiles))
        cnt = jnp.where(skip, 0, cnt)

    win = -(-(TBp * k_slots + _pp.CH + 8) // _pp.CH) * _pp.CH
    if table_mode:
        # ONE per-run table + ONE wide gather; the padded index array folds
        # the DMA-slack rows into the gather (row 0 garbage, masked by cnt).
        T = jnp.concatenate(
            [
                grid, carry_in_s, carry_after_s,
                tx_s[:, None],
                style_s,
                jnp.zeros((run_cap, _pp.UW - 289 - style_s.shape[1]), jnp.int32),
            ],
            axis=1,
        )  # [R, UW]
        idx = jnp.pad(jnp.minimum(src2_u, run_cap - 1), (0, win))
        u_mat = T[idx]  # [u_cap + win, UW]
    else:
        # The unit matrix: [grid row (zero for virtual) | carry | style row].
        virt = (virt_u & FLAG_VIRTUAL) != 0
        g_rows = jnp.where(
            (virt | ~u_valid)[:, None], 0, grid[jnp.minimum(src_u, run_cap - 1)]
        )
        carr_ext = jnp.concatenate(
            [
                jnp.concatenate([carry_in_s, style_s], axis=1),
                jnp.concatenate([carry_after_s, style_s], axis=1),
            ],
            axis=0,
        )  # [2R, 16 + sw]
        cidx = jnp.minimum(src2_u, run_cap - 1) + jnp.where(virt, run_cap, 0)
        m_rows = carr_ext[cidx]  # [u_cap, 16 + sw]
        if features.has_clip:
            # Draws whose governing full clip was dropped draw unclipped
            # (`skip_trivial_clips`, FLAG_UNCLIPPED) — a per-UNIT bit, fixed
            # up on the gathered style lane (elementwise, no extra gather).
            unclip = (virt_u & FLAG_UNCLIPPED) != 0
            lane = jnp.arange(m_rows.shape[1], dtype=jnp.int32)
            m_rows = jnp.where(
                (lane == 16 + lay.clipped)[None, :] & unclip[:, None],
                0,
                m_rows,
            )
        u_mat = jnp.concatenate([g_rows, m_rows], axis=1)  # [u_cap, 272 + sw]
        u_mat = jnp.pad(u_mat, ((0, win), (0, _pp.UW - u_mat.shape[1])))

    # Per-block descriptors (SMEM).
    ust_t = ust[:t8].reshape(nblk, TBp)
    cnt_t = cnt.reshape(nblk, TBp)
    start_al = (ust_t[:, 0] // 8) * 8  # 8-aligned DMA starts
    span_end = jnp.concatenate([ust_t[1:, 0], ust[t8 : t8 + 1]])
    kmax = jnp.max(cnt_t, axis=1)
    nch = jnp.minimum(
        -(-(span_end - start_al) // _pp.CH), win // _pp.CH
    )
    nch = jnp.where(kmax > 0, nch, 0)
    # Per-tile global pixel origins (gradient coordinate space; row_lo
    # offsets sharded framebuffers into absolute rows).
    tile_i = jnp.arange(t8, dtype=jnp.int32)
    x0_t = ((tile_i % tiles_x) * TW).reshape(nblk, TBp)
    y0_t = ((tile_i // tiles_x + jnp.int32(row_lo)) * TH).reshape(nblk, TBp)
    blkinfo = jnp.concatenate(
        [
            start_al[:, None], nch[:, None], kmax[:, None],
            jnp.zeros((nblk, 5), jnp.int32),
            ust_t - start_al[:, None],
            cnt_t,
            x0_t,
            y0_t,
        ],
        axis=1,
    )  # [nblk, BI_W]

    out = _pp.paint_fold_pallas(
        u_mat, blkinfo, clear_color, k_slots=k_slots,
        features=features, ms=ms, table_mode=table_mode, interpret=interpret,
    )
    return out[:n_tiles].reshape(n_tiles, 4, TH, TW).transpose(0, 2, 3, 1)


# The tree fold's FIXED chunk grid: (band_lo, band_hi, chunk_size).  Chunk
# boundaries are ABSOLUTE positions in k, so a tile's composition grouping
# is a function of its own unit list only — never of the wave schedule or
# prefix sizes.  That keeps sharded == single-chip and cached == fresh
# renders bit-identical even though their depth distributions (and hence
# wave bounds) differ.  Chunks grow with k because the tile population
# shrinks with k: most tiles are shallow (fine chunks bound their dead
# work to <2x) while the few deep tiles want few big sequential steps.
TREE_BANDS = ((0, 8, 2), (8, 16, 4), (16, 32, 8), (32, 64, 16), (64, None, 32))

TH = consts.TILE_HEIGHT
TW = consts.TILE_WIDTH
_PDA = consts.PIXEL_DOUBLE_AREA  # 512

# virt_u flag bits (see runs.run_data / build_units callers).
FLAG_VIRTUAL = 1
FLAG_FULL_OPAQUE = 2
FLAG_CLIP = 4
FLAG_FULL_SOLID = 8  # full cover + solid fill: scalar-foldable
FLAG_FULL_CLIP = 16  # full-cover clip: all-pass, droppable
FLAG_UNCLIPPED = 32  # draw whose governing clip was a dropped full clip


class Features(NamedTuple):
    """Static per-frame feature set; drives code specialisation."""

    blend_modes: Tuple[int, ...] = (0,)
    has_gradient: bool = False
    has_texture: bool = False
    has_clip: bool = False


def _coverage(da, fill_rule_is_eo):
    """doubled area i32 -> coverage f32 (`painter/mod.rs:76-94`);
    fill_rule_is_eo broadcasts against da."""
    recip = jnp.float32(1.0 / _PDA)
    nz = jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)
    folded = _PDA - jnp.abs((da & (2 * _PDA - 1)) - _PDA)
    eo = folded.astype(jnp.float32) * recip
    return jnp.where(fill_rule_is_eo, eo, nz)


# -- fills -------------------------------------------------------------------


def _gradient_at(grad, stops, xg, yg):
    """grad [T, 6] = (type, sx, sy, dx, dy, dot_recip); stops [T, MS, 5].

    Stops are host-padded with (last_color, +inf) so the select chain needs
    no per-style stop counts (see `painter/styling.rs:84-143`).
    """
    gtype = grad[:, 0][:, None, None]
    sx = grad[:, 1][:, None, None]
    sy = grad[:, 2][:, None, None]
    gdx = grad[:, 3][:, None, None]
    gdy = grad[:, 4][:, None, None]
    dot_recip = grad[:, 5][:, None, None]

    tx = (xg - sx) * gdx * dot_recip
    t_lin = (yg - sy) * gdy * dot_recip + tx
    px = xg - sx
    py = yg - sy
    t_rad = jnp.sqrt((py * py + px * px) * dot_recip)
    t = jnp.where(gtype == 1, t_rad, t_lin)

    ms = stops.shape[1]
    chans = [jnp.zeros_like(t) for _ in range(4)]
    mask = t <= stops[:, 0, 4][:, None, None]
    for ch in range(4):
        chans[ch] = jnp.where(mask, stops[:, 0, ch][:, None, None], chans[ch])
    acc = mask
    for i in range(1, ms):
        start_stop = stops[:, i - 1, 4][:, None, None]
        end_stop = stops[:, i, 4][:, None, None]
        m = acc ^ (t < end_stop)
        local_t = (t - start_stop) * (1.0 / (end_stop - start_stop))
        for ch in range(4):
            sc = stops[:, i - 1, ch][:, None, None]
            ec = stops[:, i, ch][:, None, None]
            v = local_t * ec + (-local_t * sc + sc)
            chans[ch] = jnp.where(m, v, chans[ch])
        acc = acc | m
    return chans


def _texture_at(tex, atlas, xg, yg):
    """tex [T, 10] = (ux, uy, vx, vy, tx, ty, max_x, max_y, ax, ay)."""
    ux = tex[:, 0][:, None, None]
    uy = tex[:, 1][:, None, None]
    vx = tex[:, 2][:, None, None]
    vy = tex[:, 3][:, None, None]
    ttx = tex[:, 4][:, None, None]
    tty = tex[:, 5][:, None, None]
    max_x = tex[:, 6][:, None, None]
    max_y = tex[:, 7][:, None, None]
    ax = tex[:, 8][:, None, None].astype(jnp.int32)
    ay = tex[:, 9][:, None, None].astype(jnp.int32)

    sx = xg * ux + (vx * yg + ttx)
    sy = xg * uy + (vy * yg + tty)
    # Saturating f32 -> u32: negatives clamp to zero.
    ix = jnp.clip(jnp.trunc(jnp.minimum(sx, max_x)), 0, None).astype(jnp.int32)
    iy = jnp.clip(jnp.trunc(jnp.minimum(sy, max_y)), 0, None).astype(jnp.int32)
    texel = atlas[ay + iy, ax + ix]  # [T, 16, 16, 4]
    return [texel[..., ch] for ch in range(4)]


# -- blend modes (select-tree semantics, painter/styling.rs:342-594) ---------


def _lum(r, g, b):
    return r * 0.3 + (g * 0.59 + b * 0.11)


def _clip_color(r, g, b):
    l = _lum(r, g, b)
    n = jnp.minimum(r, jnp.minimum(g, b))
    x = jnp.maximum(r, jnp.maximum(g, b))
    l_1 = l - 1.0
    x_l_recip = 1.0 / (x - l)
    l_n_recip_l = (1.0 / (l - n)) * l

    def one(ch):
        low = jnp.where(n < 0.0, l_n_recip_l * (ch - l) + l, ch)
        high = x_l_recip * (l * (l_1 - ch) + ch) + l
        return jnp.where(x > 1.0, high, low)

    return [one(r), one(g), one(b)]


def _set_lum(r, g, b, l):
    d = l - _lum(r, g, b)
    return _clip_color(r + d, g + d, b + d)


def _set_sat(sat_dst, r, g, b):
    mn = jnp.minimum(r, jnp.minimum(g, b))
    mx = jnp.maximum(r, jnp.maximum(g, b))
    mid = r + g + b - mn - mx
    lt = mn < mx
    sat_mid = jnp.where(lt, (sat_dst * mid - sat_dst * mn) / (mx - mn), 0.0)
    sat_max = jnp.where(lt, sat_dst, 0.0)

    def one(ch):
        return jnp.where(ch == mx, sat_max, jnp.where(ch == mn, 0.0, sat_mid))

    return [one(r), one(g), one(b)]


def _blend_one(mode, dr, dg, db, sr, sg, sb):
    if mode == 0:  # Over
        return [sr, sg, sb]
    if mode == 1:  # Multiply
        return [dr * sr, dg * sg, db * sb]
    if mode == 2:  # Screen
        return [d + s - d * s for d, s in ((dr, sr), (dg, sg), (db, sb))]
    if mode in (3, 8):  # Overlay / HardLight
        out = []
        for d, s in ((dr, sr), (dg, sg), (db, sb)):
            lo = d * s * 2.0
            hi = 2.0 * (d + s - (d * s + 0.5))
            sel = d <= 0.5 if mode == 3 else s <= 0.5
            out.append(jnp.where(sel, lo, hi))
        return out
    if mode == 4:  # Darken
        return [jnp.minimum(dr, sr), jnp.minimum(dg, sg), jnp.minimum(db, sb)]
    if mode == 5:  # Lighten
        return [jnp.maximum(dr, sr), jnp.maximum(dg, sg), jnp.maximum(db, sb)]
    if mode == 6:  # ColorDodge
        return [
            jnp.where(s == 1.0, 1.0, jnp.minimum(1.0, d / (1.0 - s)))
            for d, s in ((dr, sr), (dg, sg), (db, sb))
        ]
    if mode == 7:  # ColorBurn
        return [
            jnp.where(s == 0.0, 0.0, 1.0 - jnp.minimum(1.0, (1.0 - d) / s))
            for d, s in ((dr, sr), (dg, sg), (db, sb))
        ]
    if mode == 9:  # SoftLight
        out = []
        for d, s in ((dr, sr), (dg, sg), (db, sb)):
            dd = jnp.where(
                d <= 0.25, ((16.0 * d - 12.0) * d + 4.0) * d, jnp.sqrt(d)
            )
            lo = d * (1.0 - d) * (2.0 * s - 1.0) + d
            hi = (dd - d) * (2.0 * s - 1.0) + d
            out.append(jnp.where(s <= 0.5, lo, hi))
        return out
    if mode == 10:  # Difference
        return [jnp.abs(dr - sr), jnp.abs(dg - sg), jnp.abs(db - sb)]
    if mode == 11:  # Exclusion
        return [
            -2.0 * d * s + d + s for d, s in ((dr, sr), (dg, sg), (db, sb))
        ]
    if mode == 12:  # Hue
        r, g, b = _set_sat(
            jnp.maximum(dr, jnp.maximum(dg, db)) - jnp.minimum(dr, jnp.minimum(dg, db)),
            sr, sg, sb,
        )
        return _set_lum(r, g, b, _lum(dr, dg, db))
    if mode == 13:  # Saturation
        r, g, b = _set_sat(
            jnp.maximum(sr, jnp.maximum(sg, sb)) - jnp.minimum(sr, jnp.minimum(sg, sb)),
            dr, dg, db,
        )
        return _set_lum(r, g, b, _lum(dr, dg, db))
    if mode == 14:  # Color
        return _set_lum(sr, sg, sb, _lum(dr, dg, db))
    if mode == 15:  # Luminosity
        return _set_lum(dr, dg, db, _lum(sr, sg, sb))
    raise ValueError(mode)


def _blend(blend_code, modes, dr, dg, db, sr, sg, sb):
    blended = [sr, sg, sb]
    for mode in modes:
        if mode == 0:
            continue
        res = _blend_one(mode, dr, dg, db, sr, sg, sb)
        sel = (blend_code == mode)[:, None, None]
        blended = [jnp.where(sel, r, o) for r, o in zip(res, blended)]
    return blended


# -- occlusion culling --------------------------------------------------------


def _seg_ffill(gid, values, valid):
    """Segmented forward-fill: for each position, the most recent `values`
    entry with `valid` set within its gid group (-1 when none)."""

    def op(a, b):
        ag, av, af = a
        bg, bv, bf = b
        same = bg == ag
        take_b = bf | ~same
        return bg, jnp.where(take_b, bv, av), bf | (same & af)

    init = jnp.where(valid, values, -1)
    _, out, got = jax.lax.associative_scan(op, (gid, init, valid))
    return jnp.where(got, out, -1)


def _renumber_units(key_u, layer_u, src_u, src2_u, virt_u, keep):
    """Drops units where ~keep, re-sorts, recomputes per-tile slot indices."""
    n = key_u.shape[0]
    key2 = jnp.where(keep, key_u, SENTINEL)
    # Unstable: (key, layer) pairs are unique per unit (sentinels masked),
    # and a stable sort makes XLA sort a hidden iota tiebreak operand.
    key2, layer_u, src_u, src2_u, virt_u = jax.lax.sort(
        (key2, layer_u, src_u, src2_u, virt_u), num_keys=2, is_stable=False
    )
    new_tile = key2 != jnp.roll(key2, 1)
    new_tile = new_tile.at[0].set(True)
    first = _first_of_group(new_tile)
    k2 = jnp.arange(n, dtype=jnp.int32) - first
    u_valid = key2 != SENTINEL
    k_needed = jnp.max(jnp.where(u_valid, k2, -1)) + 1
    return key2, layer_u, src_u, src2_u, virt_u, k2, u_valid, k_needed


def skip_trivial_clips_keep(key_u, virt_u, u_valid, id_u, cend_u, clipped_u):
    """`skip_trivial_clips_pass` (`passes/skip_trivial_clips.rs:27-112`)
    ANALYSIS: clipped draw layers outside any active clip range are
    invisible and drop; clip units no clipped layer references drop;
    FULL-cover clips admit everything, so they drop too and the draws they
    govern get FLAG_UNCLIPPED (paint then skips the clip-mask multiply —
    numerically identical since a full clip's mask is exactly 1.0, but one
    fewer fold slot per tile).

    Returns (keep, virt_u-with-FLAG_UNCLIPPED); the caller renumbers —
    combined with the occlusion pass's keep so clip frames pay ONE unit
    re-sort, not two.

    id_u/cend_u: layer id and clip range end per unit; clipped_u: the unit is
    a clipped Draw.
    """
    n = key_u.shape[0]
    is_clip = ((virt_u & FLAG_CLIP) != 0) & u_valid
    full_clip = is_clip & ((virt_u & FLAG_FULL_CLIP) != 0)

    new_tile = key_u != jnp.roll(key_u, 1)
    new_tile = new_tile.at[0].set(True)
    gid = jnp.cumsum(new_tile.astype(jnp.int32))

    iota = jnp.arange(n, dtype=jnp.int32)
    last_clip_end = _seg_ffill(gid, cend_u, is_clip)
    last_clip_pos = _seg_ffill(gid, iota, is_clip)
    last_clip_full = _seg_ffill(gid, full_clip.astype(jnp.int32), is_clip)

    orphan = clipped_u & u_valid & ((last_clip_pos < 0) | (id_u > last_clip_end))
    governed = clipped_u & u_valid & ~orphan
    gov_by_full = governed & (last_clip_full == 1)
    virt_u = virt_u | jnp.where(gov_by_full, FLAG_UNCLIPPED, 0)

    used = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(governed & ~gov_by_full, last_clip_pos, n)]
        .max(1, mode="drop")
    )
    unused_clip = is_clip & (used == 0)

    keep = u_valid & ~(orphan | unused_clip | full_clip)
    return keep, virt_u


@jax.jit
def skip_trivial_clips(key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid, id_u, cend_u, clipped_u):
    """skip_trivial_clips_keep + renumber (standalone form, kept for the
    pass batteries; the pipeline fuses both passes into one renumber)."""
    keep, virt_u = skip_trivial_clips_keep(
        key_u, virt_u, u_valid, id_u, cend_u, clipped_u
    )
    return _renumber_units(key_u, layer_u, src_u, src2_u, virt_u, keep)


def _seg_cummax(gid, values):
    """Segmented prefix max over `values` within equal-gid groups (gid
    nondecreasing).  associative_scan with the classic segmented-max
    operator: log(n) elementwise passes, no gathers, no width limits."""

    def op(a, b):
        ag, av = a
        bg, bv = b
        return bg, jnp.where(bg == ag, jnp.maximum(av, bv), bv)

    _, out = jax.lax.associative_scan(op, (gid, values))
    return out


def cull_units_keep(key_u, virt_u, k_u, u_valid):
    """Occlusion-pass ANALYSIS (`skip_fully_covered_layers.rs:27-119`):
    marks every unit hidden beneath a full-cover opaque unit of its tile.
    Tiles containing any clip unit are left untouched (clip masks must
    still accumulate).

    Runs on the PRE-clip-pass unit list when fused with
    `skip_trivial_clips_keep`: units that pass drops (orphan clipped draws,
    unused/full clips) are never FULL_OPAQUE, so occlusion decisions are
    unchanged; a dropped clip can only make `tile_has_clip` conservative
    (keep more), and keeping a hidden unit is bit-exact — an Over-blended
    opaque solid on top yields `fill * (1 - dst_a) + fill * dst_a`
    independent of dst below it.
    """
    n = key_u.shape[0]
    new_tile = key_u != jnp.roll(key_u, 1)
    new_tile = new_tile.at[0].set(True)

    full_opaque = ((virt_u & FLAG_FULL_OPAQUE) != 0) & u_valid
    is_clip = ((virt_u & FLAG_CLIP) != 0) & u_valid

    def rev(x):
        return jnp.flip(x, axis=0)

    # Reverse-segmented cummax of (full_opaque ? k+1 : 0): for each unit, the
    # highest full-opaque slot at-or-after it within its tile.
    tail_new = jnp.roll(new_tile, -1).at[-1].set(True)  # last of each group
    gid_r = jnp.cumsum(rev(tail_new).astype(jnp.int32))
    fo_k1 = jnp.where(full_opaque, k_u + 1, 0)
    k_top1 = rev(_seg_cummax(gid_r, rev(fo_k1)))

    # Tile-has-clip = segmented any over the whole group: forward "at or
    # before" OR reverse "at or after".
    gid_f = jnp.cumsum(new_tile.astype(jnp.int32))
    clip_v = is_clip.astype(jnp.int32)
    clip_fwd = _seg_cummax(gid_f, clip_v)
    clip_rev = rev(_seg_cummax(gid_r, rev(clip_v)))
    tile_has_clip = (clip_fwd | clip_rev) > 0

    return u_valid & ((k_u + 1 >= k_top1) | tile_has_clip)


@jax.jit
def cull_units(key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid):
    """cull_units_keep + renumber (standalone form, kept for the pass
    batteries; the pipeline fuses both workbench passes into one
    renumber)."""
    keep = cull_units_keep(key_u, virt_u, k_u, u_valid)
    return _renumber_units(key_u, layer_u, src_u, src2_u, virt_u, keep)


# -- the fold -----------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("rows", "tiles_x", "k_slots", "features", "wave", "presorted"),
)
def paint(
    # paint units (sorted by (tile, layer), culled):
    key_u,
    layer_u,
    src_u,  # original-order run index (addresses `grid`)
    src2_u,  # sorted-domain run index (addresses the carry arrays)
    virt_u,  # FLAG_* bits
    k_u,
    u_valid,
    # per-run data:
    grid,  # [run_cap, 256] packed area|cover i32
    carry_in_s,  # [run_cap, 16] i32 ((row,layer,tx)-sorted order)
    carry_after_s,  # [run_cap, 16] i32 ((row,layer,tx)-sorted order)
    # style tables:
    st_orders,  # u32 [SL] sorted layer ids
    st_pidx,  # i32 [SL] layer slot -> distinct-props row
    st_fill_rule,  # i32 [P]
    st_func,  # 0 draw, 1 clip
    st_clip_n,
    st_is_clipped,
    st_blend,
    st_fill_type,  # 0 solid, 1 gradient, 2 texture
    st_color,  # [P, 4]
    st_grad,  # [P, 6]
    st_stops,  # [P, MS, 5]
    st_tex,  # [P, 10]
    atlas,  # [AH, AW, 4]
    clear_color,  # f32 [4]
    rows: int,
    tiles_x: int,
    k_slots: int,
    features: Features,
    row_lo=0,  # traced: absolute index of this shard's first tile row
    k_active=None,  # traced: actual max slots this frame (<= k_slots)
    tile_unchanged=None,  # traced bool [T]: tiles to skip (damage cache/crop)
    wave=None,  # static (shrink, floor) of the wave prefix schedule;
    #             None -> FORMA_WAVE="shrink,floor" env or (4, 256)
    style_s=None,  # i32 [R, 5] per-run rgba bits + fill rule (run_data);
    #                enables the Pallas VMEM-resident fold on simple frames
    tx_s=None,  # i32 [R] per-run tile x; with `presorted` it enables the
    #             fold's one-gather table prep (see _paint_fold_pallas)
    presorted=False,  # static: segments were sorted by the packed
    #                   [row|slot|tx] key (src_u == src2_u per unit)
):
    """Returns the painted frame as linear f32 [rows*16, tiles_x*16, 4].

    `row_lo` offsets global pixel coordinates so gradients/textures evaluate
    in absolute space when the framebuffer is sharded by tile rows.

    The fold runs in DEPTH-SORTED WAVES: tiles permute by their unit count
    (descending) and each wave processes a geometrically shrinking static
    prefix for the k-range only those tiles still need, so total blend work
    tracks the sum of per-tile depths instead of tiles x max-depth (one
    250-layer tile no longer forces 250 full-framebuffer passes).  Nested
    prefixes in the permuted layout make every wave a static slice — no
    per-wave gathers.
    """
    n_tiles = rows * tiles_x
    u_cap = key_u.shape[0]
    run_cap = grid.shape[0]

    # Pallas VMEM-resident fold for every non-texture frame: the wave
    # fold's dominant cost is the framebuffer carry round-tripping HBM on
    # every k step (~0.73 ms/step at 8k tiles — tools/paint_state_probe.py;
    # XLA cannot fuse consecutive blend steps into one dst pass —
    # tools/paint_chunk_fusion_probe.py), which the kernel removes by
    # keeping each tile block's pixels in VMEM for its whole unit list.
    if (
        style_s is not None
        and _fold_backend() == "pallas"
        and _fold_pallas_eligible(features, k_slots, st_stops.shape[1])
    ):
        frame_t = _paint_fold_pallas(
            key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
            grid, carry_in_s, carry_after_s, style_s,
            clear_color, rows, tiles_x, k_slots,
            features, st_stops.shape[1],
            row_lo=row_lo, tile_unchanged=tile_unchanged,
            tx_s=tx_s, presorted=presorted,
            interpret=jax.default_backend() != "tpu",
        )
        frame = frame_t.reshape(rows, tiles_x, TH, TW, 4)
        return frame.transpose(0, 2, 1, 3, 4).reshape(
            rows * TH, tiles_x * TW, 4
        )

    # Per-tile slot table — ONE scatter carries everything per-tile passes
    # need: the unit index in the low 24 bits (u_cap < 2^24 asserted below)
    # plus a NOT-full-solid flag in bit 24, so per-tile depth and the
    # all-solid test come from cheap [T, K] reduces instead of two more
    # u_cap-index scatters (~3 ms each at paris scale).
    assert u_cap < (1 << 24)
    rowb = (key_u >> TX_BITS).astype(jnp.int32) - 1
    txu = (key_u & jnp.uint32((1 << TX_BITS) - 1)).astype(jnp.int32) - 1
    tile_t = jnp.where(
        u_valid & (k_u < k_slots), rowb * tiles_x + txu, n_tiles
    )
    notsolid = ((virt_u & FLAG_FULL_SOLID) == 0).astype(jnp.int32)
    table = (
        jnp.full((n_tiles, k_slots), -1, jnp.int32)
        .at[tile_t, jnp.minimum(k_u, k_slots - 1)]
        .set(
            jnp.arange(u_cap, dtype=jnp.int32) | (notsolid << 24),
            mode="drop",
        )
    )
    slot_present = table >= 0  # [T, K]
    iota_k = jnp.arange(k_slots, dtype=jnp.int32)[None, :]

    # Depth per tile (0 for skipped tiles) and the descending permutation.
    kmax_raw = jnp.max(jnp.where(slot_present, iota_k + 1, 0), axis=1)

    # TileWriteOp::Solid (`skip_fully_covered_layers.rs:27-119` +
    # `painter/mod.rs:553-566`): a tile whose every unit is a full-cover
    # solid-fill draw folds to ONE color with per-TILE scalar blending —
    # those tiles leave the per-pixel wave entirely.  cov == 1.0 exactly for
    # full covers, so the scalar fold is bit-identical to the pixel fold.
    any_notsolid = jnp.max(
        jnp.where(slot_present, (table >> 24) & 1, 0), axis=1
    )
    tile_solid = (any_notsolid == 0) & (kmax_raw > 0)
    if tile_unchanged is not None:
        tile_solid &= ~tile_unchanged
        kmax_t = jnp.where(tile_unchanged | tile_solid, 0, kmax_raw)
    else:
        kmax_t = jnp.where(tile_solid, 0, kmax_raw)

    # Unstable: equal-depth tiles may permute, but tiles are independent
    # and the final unpermute scatter restores positions bit-exactly.
    neg_depth, perm = jax.lax.sort(
        (-kmax_t, jnp.arange(n_tiles, dtype=jnp.int32)), num_keys=1,
        is_stable=False,
    )
    depth_sorted = -neg_depth

    table_kt = table[perm].T  # [K, T] in permuted tile order
    skip_solid_p = tile_solid[perm]
    if tile_unchanged is not None:
        skip_p = tile_unchanged[perm] | skip_solid_p
    else:
        skip_p = skip_solid_p

    # Global pixel coordinates per (permuted) tile.
    tx_t = perm % tiles_x
    row_t = perm // tiles_x
    xg = (
        tx_t[:, None, None] * TW + jnp.arange(TW, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) * jnp.ones((1, TH, 1), jnp.float32)
    yg = (
        (row_t[:, None, None] + jnp.int32(row_lo)) * TH
        + jnp.arange(TH, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.float32) * jnp.ones((1, 1, TW), jnp.float32)

    # Consolidated per-unit metadata: ONE [u_cap] row gather up front
    # replaces ~12 small per-step gathers inside the fold (measured: the
    # fold was gather-op-count bound, not flop bound).  Every column is an
    # exact f32 value conversion (all ints < 2^24).
    SL = st_orders.shape[0]
    assert run_cap < (1 << 24)
    style_mat = jnp.concatenate(
        [
            jnp.stack(
                [
                    st_fill_rule[st_pidx],
                    st_func[st_pidx],
                    st_blend[st_pidx],
                    st_fill_type[st_pidx],
                    st_clip_n[st_pidx],
                    st_is_clipped[st_pidx].astype(jnp.int32),
                    (st_orders & jnp.uint32(consts.LAYER_LIMIT)).astype(
                        jnp.int32
                    ),
                    st_pidx,
                ],
                axis=1,
            ).astype(jnp.float32),
            st_color[st_pidx],  # [SL, 4]
        ],
        axis=1,
    )  # [SL, 12] f32
    slot_all = jnp.minimum(layer_u.astype(jnp.int32), SL - 1)
    umeta = jnp.concatenate(
        [
            style_mat[slot_all],  # the one big row gather
            jnp.stack(
                [
                    jnp.minimum(src_u, run_cap - 1),
                    virt_u,
                ],
                axis=1,
            ).astype(jnp.float32),
        ],
        axis=1,
    )  # [u_cap, 14] f32
    (M_FR, M_FUNC, M_BLEND, M_FT, M_CLIPN, M_ISCL, M_LAYER, M_SI,
     M_R, M_G, M_B, M_A, M_SRC, M_VFLAGS) = range(14)
    # Carries pre-selected per unit (real -> carry-in, virtual -> carry-
    # after, both sorted-domain) via one concatenated row gather.
    virt_all = (virt_u & FLAG_VIRTUAL) != 0
    carr_cat = jnp.concatenate([carry_in_s, carry_after_s], axis=0)
    cidx = jnp.minimum(src2_u, run_cap - 1) + jnp.where(virt_all, run_cap, 0)
    carry_u = carr_cat[cidx]  # [u_cap, 16] i32
    # Fold-step gathers cost per INDEX, so meta and carry ride ONE [u_cap,
    # 30] i32 matrix (f32 meta bitcast to i32 bits — an exact round-trip;
    # gathers never flush denormals, unlike the f32 compute path) and each
    # wave step gathers it once instead of twice (~345k total step rows at
    # paris scale = ~2.7 ms of pure gather cost removed).
    metacarry = jnp.concatenate(
        [jax.lax.bitcast_convert_type(umeta, jnp.int32), carry_u], axis=1
    )  # [u_cap, 30] i32

    shape = (n_tiles, TH, TW)
    # The *0 terms tie the fori_loop carry's initial value to row_lo so its
    # varying-axes type matches the loop body under shard_map (the frame is
    # sharded by rows; a replicated init would fail the vma check).
    vary_f = jnp.float32(row_lo) * 0.0
    vary_i = jnp.int32(row_lo) * 0
    dst0 = tuple(jnp.full(shape, clear_color[ch]) + vary_f for ch in range(4))
    if features.has_clip:
        clip_state0 = (
            jnp.zeros(shape, jnp.float32) + vary_f,
            jnp.full((n_tiles,), -1, jnp.int32) + vary_i,
        )
    else:  # no clip state carried through the fold at all
        clip_state0 = ()

    def step_wave(p, k, state, live=None):
        dst = state[:4]
        if features.has_clip:
            clip_mask, clip_last = state[4:]
        shape = (p, TH, TW)
        u = jax.lax.dynamic_index_in_dim(table_kt, k, axis=0, keepdims=False)[:p]
        present = u >= 0
        if live is not None:  # manual-unroll tail guard: a dead step no-ops
            present &= live
        if skip_p is not None:
            present &= ~skip_p[:p]
        uc = jnp.maximum(u, 0) & 0xFFFFFF  # strip the not-solid table bit

        # Two row gathers per step: consolidated meta|carry, packed grid.
        mc = metacarry[uc]  # [p, 30] i32
        m = jax.lax.bitcast_convert_type(mc[:, :14], jnp.float32)
        layer = m[:, M_LAYER].astype(jnp.int32)
        src = m[:, M_SRC].astype(jnp.int32)
        vflags = m[:, M_VFLAGS].astype(jnp.int32)
        virt = (vflags & FLAG_VIRTUAL) != 0

        g = grid[src]  # [T, 256] i32
        area, cover = unpack_grid(g)
        area = jnp.where(virt[:, None], 0, area).reshape(shape)
        cover = jnp.where(virt[:, None], 0, cover).reshape(shape)
        carry = mc[:, 14:30]  # [T, 16] i32

        exc = jnp.cumsum(cover, axis=2) - cover
        acc = carry[:, :, None] + exc
        da = consts.PIXEL_DOUBLE_WIDTH * acc + area
        cov = _coverage(da, (m[:, M_FR] == 1.0)[:, None, None])
        cov = cov * present[:, None, None]

        func = m[:, M_FUNC]
        is_clip_unit = present & (func == 1.0)
        draw = present & (func == 0.0)

        if features.has_clip:
            # Clip expiry precedes everything (`painter/mod.rs:302-306`).
            expired = (clip_last >= 0) & (clip_last < layer) & present
            clip_last = jnp.where(expired, -1, clip_last)
            new_clip = is_clip_unit & (clip_last < 0)
            clip_last = jnp.where(
                new_clip, layer + m[:, M_CLIPN].astype(jnp.int32), clip_last
            )
            clip_mask = jnp.where(is_clip_unit[:, None, None], cov, clip_mask)

        # Fill evaluation.
        ftype = m[:, M_FT]
        fill = [m[:, M_R + ch][:, None, None] * jnp.ones(shape[1:]) for ch in range(4)]
        if features.has_gradient or features.has_texture:
            si = m[:, M_SI].astype(jnp.int32)
        if features.has_gradient:
            gf = _gradient_at(st_grad[si], st_stops[si], xg[:p], yg[:p])
            selg = (ftype == 1.0)[:, None, None]
            fill = [jnp.where(selg, gg, f) for gg, f in zip(gf, fill)]
        if features.has_texture:
            tf = _texture_at(st_tex[si], atlas, xg[:p], yg[:p])
            selt = (ftype == 2.0)[:, None, None]
            fill = [jnp.where(selt, t, f) for t, f in zip(tf, fill)]

        src_a = fill[3] * cov
        if features.has_clip:
            # Draws whose governing full clip was dropped draw unclipped
            # (`skip_trivial_clips`, FLAG_UNCLIPPED).
            clipped = (m[:, M_ISCL] == 1.0) & ((vflags & FLAG_UNCLIPPED) == 0)
            active = clip_last >= 0
            src_a = jnp.where(
                clipped[:, None, None],
                jnp.where(active[:, None, None], src_a * clip_mask, 0.0),
                src_a,
            )
        src_a = src_a * draw[:, None, None]

        blended = _blend(
            m[:, M_BLEND].astype(jnp.int32), features.blend_modes,
            dst[0], dst[1], dst[2],
            fill[0], fill[1], fill[2],
        )

        inv_dst_a = 1.0 - dst[3]
        inv_dst_a_src_a = inv_dst_a * src_a
        inv_src_a = 1.0 - src_a
        dst_a_src_a = dst[3] * src_a
        new = tuple(
            dst[ch] * inv_src_a + (fill[ch] * inv_dst_a_src_a + blended[ch] * dst_a_src_a)
            for ch in range(3)
        ) + (dst[3] * inv_src_a + src_a,)
        if features.has_clip:
            return new + (clip_mask, clip_last)
        return new

    if k_active is None:
        upper = jnp.int32(k_slots)
    else:
        upper = jnp.minimum(k_active, k_slots).astype(jnp.int32)

    # Wave schedule: shrinking static prefixes; wave i runs k in
    # [e_i, e_{i+1}) where e_{i+1} = depth of the first tile OUTSIDE the
    # next prefix — every shallower tile is already finished.
    # Env-resolved at trace time (constant within a process): lets schedule
    # A/Bs run as bench invocations without code edits.  Two forms:
    #   FORMA_WAVE=shrink,floor     geometric ladder (default 4,256)
    #   FORMA_WAVE=f:0.38,0.17,...  explicit prefix-size fractions of
    #                               n_tiles (a host-DP-derived ladder; the
    #                               schedule only changes WORK GROUPING —
    #                               output is bit-identical either way)
    if wave is None:
        env = os.environ.get("FORMA_WAVE")
        if env and env.startswith("f:"):
            wave = tuple(float(v) for v in env[2:].split(","))
        elif env:
            wave = tuple(int(v) for v in env.split(","))
        else:
            # DP-derived fractional ladder (tools/wave_schedule_probe.py):
            # 1.17x ideal tile-steps vs the geometric (4,256) ladder's
            # 1.44x, dominant on every tested depth shape; on-chip A/B
            # measured 10.82 -> 10.92 FPS with the XLA wave fold active
            # (schedule provably cannot change output — bit-equal verified).
            wave = (0.38, 0.17, 0.09, 0.03)
    if any(isinstance(v, float) for v in wave):
        prefixes = sorted(
            {min(n_tiles, max(1, int(-(-f * n_tiles // 1)))) for f in wave}
            | {n_tiles},
            reverse=True,
        )
    else:
        shrink, floor_p = wave
        prefixes = [n_tiles]
        while prefixes[-1] > floor_p:
            prefixes.append(max(prefixes[-1] // shrink, floor_p))
    bounds = [jnp.int32(0)]
    for nxt in prefixes[1:]:
        # Max depth of any tile outside the next prefix (sorted descending).
        bounds.append(jnp.minimum(depth_sorted[nxt], upper))
    bounds.append(upper)

    # Over-only frames (src-over is affine in dst: new = dst*(1-src_a) +
    # fill*src_a) take the TREE fold: chunks of TREE_C consecutive k-slots
    # compose into ONE affine map per pixel by log2(TREE_C) pair-compose
    # levels, then apply to dst once — ~C× fewer sequential fori steps, and
    # each step is large enough to occupy the VPU.  Identity maps (m=1, b=0)
    # make absent slots exact no-ops, and chunks align to absolute multiples
    # of TREE_C, so results don't depend on the wave schedule (sharded ==
    # single-chip, cached == fresh stay bit-identical).  Frames with
    # non-Over modes, clips (sequential mask state) or textures (atlas
    # gathers would pay per dead slot) use the wave fold.
    backend = _paint_backend()
    use_tree = (
        backend in ("tree", "chunk")
        and features.blend_modes == (0,)
        and not features.has_clip
        and not features.has_texture
    )
    seq_apply = backend == "chunk"
    if use_tree:
        # Everything stays in [..., 256] layout: 256 in the minor dim is two
        # full 128-lane groups, whereas a [..., 16, 16] shape pads its minor
        # 16 up to 128 lanes — 8x wasted memory traffic on every
        # intermediate (the chunk bodies materialise many of them).
        CMAX = max(s for (_, _, s) in TREE_BANDS)
        state = tuple(d.reshape(n_tiles, TH * TW) for d in dst0)
        table_ktp = jnp.concatenate(
            [table_kt, jnp.full((CMAX, n_tiles), -1, jnp.int32)], axis=0
        )
        lane16 = jnp.arange(TH * TW, dtype=jnp.int32) % TW  # x within row

        def align(b):
            # Next chunk-grid boundary at or after b (traced).
            s = jnp.int32(TREE_BANDS[-1][2])
            for blo, bhi, bs in reversed(TREE_BANDS[:-1]):
                s = jnp.where(b <= bhi, bs, s)
            return ((b + s - 1) // s) * s

        bounds_t = [jnp.int32(0)] + [align(b) for b in bounds[1:]]

        def chunk_fold(it, dst, _p, _lo, C):
            k0 = _lo + it * C
            u = jax.lax.dynamic_slice_in_dim(table_ktp, k0, C, axis=0)[:, :_p]
            present = u >= 0  # [C, p]
            if skip_p is not None:
                present &= ~skip_p[None, :_p]
            uc = (jnp.maximum(u, 0) & 0xFFFFFF).reshape(-1)  # [C*p]

            m = umeta[uc]  # [C*p, 14]
            src = m[:, M_SRC].astype(jnp.int32)
            virt = (m[:, M_VFLAGS].astype(jnp.int32) & FLAG_VIRTUAL) != 0
            g = grid[src]  # [C*p, 256]
            area, cover = unpack_grid(g)
            area = jnp.where(virt[:, None], 0, area).reshape(C, _p, TH * TW)
            cover = jnp.where(virt[:, None], 0, cover).reshape(C, _p, TH * TW)
            # Exclusive prefix sum of cover along x within each 16-lane row:
            # log2(16) masked shift-adds, integer-exact, no [.., 16, 16]
            # relayout.
            acc = cover
            for s in (1, 2, 4, 8):
                acc = acc + jnp.where(
                    lane16 >= s, jnp.roll(acc, s, axis=-1), 0
                )
            carry = jnp.repeat(carry_u[uc], TW, axis=-1).reshape(
                C, _p, TH * TW
            )
            acc = carry + (acc - cover)
            da = consts.PIXEL_DOUBLE_WIDTH * acc + area
            cov = _coverage(
                da, (m[:, M_FR] == 1.0).reshape(C, _p)[..., None]
            )
            draw = present & (m[:, M_FUNC] == 0.0).reshape(C, _p)
            cov = cov * draw[..., None]

            fill = [m[:, M_R + ch].reshape(C, _p, 1) for ch in range(4)]
            if features.has_gradient:
                si = m[:, M_SI].astype(jnp.int32)
                xgb = jnp.broadcast_to(
                    xg[None, :_p], (C, _p, TH, TW)
                ).reshape(C * _p, TH, TW)
                ygb = jnp.broadcast_to(
                    yg[None, :_p], (C, _p, TH, TW)
                ).reshape(C * _p, TH, TW)
                gf = _gradient_at(st_grad[si], st_stops[si], xgb, ygb)
                selg = (m[:, M_FT] == 1.0).reshape(C, _p, 1)
                fill = [
                    jnp.where(selg, gg.reshape(C, _p, TH * TW), f)
                    for gg, f in zip(gf, fill)
                ]

            src_a = fill[3] * cov  # [C, p, 256]
            if seq_apply:
                # Exact sequential application (the wave fold's op order) —
                # isolates the benefit of batched gathers / fewer fori
                # iterations from the affine-composition arithmetic.
                for kk in range(C):
                    sa = src_a[kk]
                    inv_dst_a_sa = (1.0 - dst[3]) * sa
                    dst_a_sa = dst[3] * sa
                    inv_sa = 1.0 - sa
                    dst = tuple(
                        dst[ch] * inv_sa
                        + (fill[ch][kk] * inv_dst_a_sa + fill[ch][kk] * dst_a_sa)
                        for ch in range(3)
                    ) + (dst[3] * inv_sa + sa,)
                return dst

            # Pair-compose adjacent k (left = lower k, applied first):
            # (m, b) := (m_l*m_r, b_l*m_r + b_r).
            mm = 1.0 - src_a
            bb = [fill[ch] * src_a for ch in range(3)] + [src_a]
            while mm.shape[0] > 1:
                rm = mm[1::2]
                bb = [b[0::2] * rm + b[1::2] for b in bb]
                mm = mm[0::2] * rm
            return tuple(dst[ch] * mm[0] + bb[ch][0] for ch in range(4))

        for i, pfx in enumerate(prefixes):
            sub = jax.tree_util.tree_map(lambda x: x[:pfx], state)
            lo = jnp.maximum(bounds_t[i], 0)
            hi = jnp.maximum(bounds_t[i + 1], lo)

            # Walk the wave's [lo, hi) range band by band; each band runs
            # its own fori over static-size chunks.  lo/hi are grid-aligned
            # so band-clamped endpoints stay multiples of the band's size.
            for blo, bhi, cs in TREE_BANDS:
                if blo >= k_slots:
                    break
                bhi_eff = k_slots if bhi is None else min(bhi, k_slots)
                bhi_al = ((bhi_eff + cs - 1) // cs) * cs
                wlo = jnp.clip(lo, blo, bhi_al)
                whi = jnp.clip(hi, blo, bhi_al)

                def body(it, s, _p=pfx, _lo=wlo, _cs=cs):
                    return chunk_fold(it, s, _p, _lo, _cs)

                sub = jax.lax.fori_loop(0, (whi - wlo) // cs, body, sub)
            state = jax.tree_util.tree_map(
                lambda full, part: full.at[: part.shape[0]].set(part),
                state, sub,
            )
        state = tuple(d.reshape(n_tiles, TH, TW) for d in state)
    else:
        # Manual 2x unroll: each step's real work is small (one [p, 256] row
        # gather + elementwise), so the fori's fixed per-iteration overhead
        # is a large fraction of paint time at depth ~250.  Bounds are
        # traced, so fori_loop's own `unroll` is unavailable; dead tail
        # steps no-op through the `live` mask (bit-exact: src_a becomes 0).
        UNROLL = 2  # 4 measured within noise (10.05 vs 10.15 FPS)
        state = dst0 + clip_state0
        for i, pfx in enumerate(prefixes):
            sub = jax.tree_util.tree_map(lambda x: x[:pfx], state)
            lo = bounds[i]
            hi = jnp.maximum(bounds[i + 1], bounds[i])

            def body(it, s, _p=pfx, _lo=lo, _hi=hi):
                for u in range(UNROLL):
                    k = _lo + it * UNROLL + u
                    s = step_wave(_p, k, s, live=k < _hi)
                return s

            sub = jax.lax.fori_loop(0, (hi - lo + UNROLL - 1) // UNROLL, body, sub)
            state = jax.tree_util.tree_map(
                lambda full, part: full.at[: part.shape[0]].set(part), state, sub
            )
    dst = state[:4]

    # Scalar color fold for the solid tiles (same blend formulas on
    # [T, 1, 1] shapes with cov == 1, so results are bit-identical to the
    # pixel fold this replaces — at 1/256th the work per unit).
    k_solid = jnp.max(jnp.where(tile_solid, kmax_raw, 0))
    table_t = table.T  # [K, T] original tile order
    sol0 = tuple(
        jnp.full((n_tiles, 1, 1), clear_color[ch]) + vary_f for ch in range(4)
    )

    def solid_step(k, cols, live=None):
        u = jax.lax.dynamic_index_in_dim(table_t, k, axis=0, keepdims=False)
        present = (u >= 0) & tile_solid
        if live is not None:
            present &= live
        uc = jnp.maximum(u, 0) & 0xFFFFFF  # strip the not-solid table bit
        m = umeta[uc]  # [T, 14]
        fill = [m[:, M_R + ch][:, None, None] for ch in range(4)]
        src_a = fill[3] * present[:, None, None]
        blended = _blend(
            m[:, M_BLEND].astype(jnp.int32), features.blend_modes,
            cols[0], cols[1], cols[2],
            fill[0], fill[1], fill[2],
        )
        inv_dst_a = 1.0 - cols[3]
        inv_dst_a_src_a = inv_dst_a * src_a
        inv_src_a = 1.0 - src_a
        dst_a_src_a = cols[3] * src_a
        return tuple(
            cols[ch] * inv_src_a
            + (fill[ch] * inv_dst_a_src_a + blended[ch] * dst_a_src_a)
            for ch in range(3)
        ) + (cols[3] * inv_src_a + src_a,)

    # The body is a handful of [T]-sized ops — at depth ~250 the loop is
    # pure per-iteration overhead, so unroll aggressively (manual, traced
    # bound; dead steps no-op via the live mask).
    SUNROLL = 8

    def solid_body(it, cols):
        for u in range(SUNROLL):
            k = it * SUNROLL + u
            cols = solid_step(k, cols, live=k < k_solid)
        return cols

    sol = jax.lax.fori_loop(
        0, (k_solid + SUNROLL - 1) // SUNROLL, solid_body, sol0
    )
    solid_rgba = jnp.stack([c[:, 0, 0] for c in sol], axis=-1)  # [T, 4]

    # Unpermute and assemble: [T, 16, 16] x4 -> [rows*16, tiles_x*16, 4]
    frame = jnp.stack(dst, axis=-1)  # [T, 16, 16, 4] permuted tile order
    frame = jnp.zeros_like(frame).at[perm].set(frame)
    frame = jnp.where(
        tile_solid[:, None, None, None], solid_rgba[:, None, None, :], frame
    )
    frame = frame.reshape(rows, tiles_x, TH, TW, 4)
    frame = frame.transpose(0, 2, 1, 3, 4).reshape(rows * TH, tiles_x * TW, 4)
    return frame
