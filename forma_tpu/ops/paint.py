"""Device paint: per-tile K-slot blend fold over dense coverage grids.

The XLA counterpart of `Painter::paint_tile_row` + the layer workbench
(`forma/src/cpu/painter/`).  Instead of walking tiles sequentially, every
(tile, layer) paint unit gets a dense 16x16 coverage grid:

    DA = PIXEL_DOUBLE_WIDTH * (carry_in + exclusive-cumsum_x(covers)) + areas

and tiles blend their units bottom-to-top in a `fori_loop` over K slots —
every tile blends slot k of its own unit list simultaneously, so the whole
framebuffer advances one layer per step on the VPU.  Blending a zero-coverage
unit is a no-op, which is what makes the dense fold equivalent to the
reference's sparse per-tile layer lists.

Fill evaluation (solid / gradient / texture-atlas) and the 16 blend modes
follow `painter/styling.rs` select-tree semantics; modes and fill kinds that
the frame doesn't use compile away via the static `features` tuple.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import consts
from .rasterize import SENTINEL, TX_BITS

TH = consts.TILE_HEIGHT
TW = consts.TILE_WIDTH
_PDA = consts.PIXEL_DOUBLE_AREA  # 512


class Features(NamedTuple):
    """Static per-frame feature set; drives code specialisation."""

    blend_modes: Tuple[int, ...] = (0,)
    has_gradient: bool = False
    has_texture: bool = False
    has_clip: bool = False


def _coverage(da, fill_rule):
    """doubled area i32 -> coverage f32, vectorised over per-unit fill rules
    (`painter/mod.rs:76-94`)."""
    recip = jnp.float32(1.0 / _PDA)
    nz = jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)
    folded = _PDA - jnp.abs((da & (2 * _PDA - 1)) - _PDA)
    eo = folded.astype(jnp.float32) * recip
    return jnp.where(fill_rule[:, None, None] == 1, eo, nz)


def _style_index(st_orders, layer):
    return jnp.minimum(jnp.searchsorted(st_orders, layer), st_orders.shape[0] - 1)


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


# -- the fold -----------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("rows", "tiles_x", "k_slots", "features"),
)
def paint(
    # paint units (sorted by (tile, layer)):
    key_u,
    layer_u,
    src_u,
    virt_u,
    k_u,
    u_valid,
    # per-run grids:
    area_grid,
    cover_grid,
    carry_in,
    carry_after_s,
    # style tables:
    st_orders,
    st_fill_rule,
    st_func,  # 0 draw, 1 clip
    st_clip_n,
    st_is_clipped,
    st_blend,
    st_fill_type,  # 0 solid, 1 gradient, 2 texture
    st_color,  # [SL, 4]
    st_grad,  # [SL, 6]
    st_stops,  # [SL, MS, 5]
    st_tex,  # [SL, 10]
    atlas,  # [AH, AW, 4]
    clear_color,  # f32 [4]
    rows: int,
    tiles_x: int,
    k_slots: int,
    features: Features,
    row_lo=0,  # traced: absolute index of this shard's first tile row
    k_active=None,  # traced: actual max slots this frame (<= k_slots)
):
    """Returns the painted frame as linear f32 [rows*16, tiles_x*16, 4].

    `row_lo` offsets global pixel coordinates so gradients/textures evaluate
    in absolute space when the framebuffer is sharded by tile rows.
    """
    n_tiles = rows * tiles_x
    u_cap = key_u.shape[0]

    # Per-unit coverage grids.
    exc = jnp.cumsum(cover_grid, axis=2) - cover_grid
    acc = carry_in[:, :, None] + exc
    da_real = consts.PIXEL_DOUBLE_WIDTH * acc + area_grid  # [R, 16, 16]

    src = src_u
    da_u = jnp.where(
        (virt_u == 1)[:, None, None],
        consts.PIXEL_DOUBLE_WIDTH * carry_after_s[src][:, :, None],
        da_real[src],
    )
    # layer_u carries style slots (indices into the style tables); slot order
    # equals layer-id order, and real ids are recovered from st_orders only
    # where clip bookkeeping needs arithmetic on them.
    sidx_u = jnp.minimum(layer_u.astype(jnp.int32), st_orders.shape[0] - 1)
    cov_u = _coverage(da_u, st_fill_rule[sidx_u])  # [U, 16, 16] f32

    # Per-tile slot table.
    rowb = (key_u >> TX_BITS).astype(jnp.int32) - 1
    txu = (key_u & jnp.uint32((1 << TX_BITS) - 1)).astype(jnp.int32) - 1
    tile_t = jnp.where(
        u_valid & (k_u < k_slots), rowb * tiles_x + txu, n_tiles
    )
    table = (
        jnp.full((n_tiles, k_slots), -1, jnp.int32)
        .at[tile_t, jnp.minimum(k_u, k_slots - 1)]
        .set(jnp.arange(u_cap, dtype=jnp.int32), mode="drop")
    )
    table_kt = table.T  # [K, T]

    # Global pixel coordinates per tile.
    t_idx = jnp.arange(n_tiles, dtype=jnp.int32)
    tx_t = t_idx % tiles_x
    row_t = t_idx // tiles_x
    xg = (
        tx_t[:, None, None] * TW + jnp.arange(TW, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) * jnp.ones((1, TH, 1), jnp.float32)
    yg = (
        (row_t[:, None, None] + jnp.int32(row_lo)) * TH
        + jnp.arange(TH, dtype=jnp.int32)[None, :, None]
    ).astype(jnp.float32) * jnp.ones((1, 1, TW), jnp.float32)

    shape = (n_tiles, TH, TW)
    # The *0 terms tie the fori_loop carry's initial value to row_lo so its
    # varying-axes type matches the loop body under shard_map (the frame is
    # sharded by rows; a replicated init would fail the vma check).
    vary_f = jnp.float32(row_lo) * 0.0
    vary_i = jnp.int32(row_lo) * 0
    dst0 = tuple(jnp.full(shape, clear_color[ch]) + vary_f for ch in range(4))
    clip_mask0 = jnp.zeros(shape, jnp.float32) + vary_f
    clip_last0 = jnp.full((n_tiles,), -1, jnp.int32) + vary_i

    def step(k, state):
        dst, clip_mask, clip_last = state
        u = jax.lax.dynamic_index_in_dim(table_kt, k, axis=0, keepdims=False)
        present = u >= 0
        uc = jnp.maximum(u, 0)

        cov = cov_u[uc] * present[:, None, None]
        si = sidx_u[uc]
        layer = (st_orders[si] & jnp.uint32(consts.LAYER_LIMIT)).astype(jnp.int32)

        func = st_func[si]
        is_clip_unit = present & (func == 1)
        draw = present & (func == 0)

        if features.has_clip:
            # Clip expiry precedes everything (`painter/mod.rs:302-306`).
            expired = (clip_last >= 0) & (clip_last < layer) & present
            clip_last = jnp.where(expired, -1, clip_last)
            new_clip = is_clip_unit & (clip_last < 0)
            clip_last = jnp.where(
                new_clip, layer + st_clip_n[si], clip_last
            )
            clip_mask = jnp.where(is_clip_unit[:, None, None], cov, clip_mask)

        # Fill evaluation.
        ftype = st_fill_type[si]
        color = st_color[si]
        fill = [color[:, ch][:, None, None] * jnp.ones(shape[1:]) for ch in range(4)]
        if features.has_gradient:
            gf = _gradient_at(st_grad[si], st_stops[si], xg, yg)
            sel = (ftype == 1)[:, None, None]
            fill = [jnp.where(sel, g, f) for g, f in zip(gf, fill)]
        if features.has_texture:
            tf = _texture_at(st_tex[si], atlas, xg, yg)
            sel = (ftype == 2)[:, None, None]
            fill = [jnp.where(sel, t, f) for t, f in zip(tf, fill)]

        src_a = fill[3] * cov
        if features.has_clip:
            clipped = st_is_clipped[si]
            active = clip_last >= 0
            src_a = jnp.where(
                clipped[:, None, None],
                jnp.where(active[:, None, None], src_a * clip_mask, 0.0),
                src_a,
            )
        src_a = src_a * draw[:, None, None]

        blended = _blend(
            st_blend[si], features.blend_modes, dst[0], dst[1], dst[2],
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
        return new, clip_mask, clip_last

    upper = k_slots if k_active is None else jnp.minimum(k_active, k_slots)
    dst, _, _ = jax.lax.fori_loop(
        0, upper, step, (dst0, clip_mask0, clip_last0)
    )

    # [T, 16, 16] x4 -> [rows*16, tiles_x*16, 4]
    frame = jnp.stack(dst, axis=-1)  # [T, 16, 16, 4]
    frame = frame.reshape(rows, tiles_x, TH, TW, 4)
    frame = frame.transpose(0, 2, 1, 3, 4).reshape(rows * TH, tiles_x * TW, 4)
    return frame
