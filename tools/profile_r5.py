"""Round-5 attribution probe: where exactly the runs stage's non-kernel
time and the paint stage's prep time go, at real paris-30k@1080p shapes.

The round-4 verdict's plan items 1-2 target "paint prep ~12 ms -> ~6" and
"runs remainder ~12-15 ms -> ~8"; the round-3 lesson is to re-attribute
BEFORE optimizing (the "22 ms cumsum" was two gathers).  This probe times:

  runs:   grid kernel alone | run_data total | run_data w/o style widening
  units:  build_units | cull keep+renumber
  paint:  fold prep pieces (boundary sort, grid-row gather, carry/style
          gather, concat+pad, blkinfo) | kernel alone | paint total

Every number includes one dispatch round-trip (floor printed first).
"""

import sys

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from forma_tpu import Color, Composition
from forma_tpu import consts
from forma_tpu.demos import scenes
from forma_tpu.profiling import _timeit
from forma_tpu.renderer import Renderer
from forma_tpu.ops import line_setup as _ls
from forma_tpu.ops import paint as _paint
from forma_tpu.ops import pipeline as _pipe
from forma_tpu.ops import rasterize as _raster
from forma_tpu.ops import runs as _runs


def main(paths=30000, width=1920, height=1080):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    clear_color = Color(1, 1, 1, 1)
    r.render_device(comp, width, height, clear_color)
    caps = r._caps
    rows = -(-height // consts.TILE_HEIGHT)
    tiles_x = -(-width // consts.TILE_WIDTH)
    print(f"caps: {caps}")

    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host, st = r._styles_cache
    g = r._geom_tables(comp, uniq, st_host.orders)
    features = st_host.features
    clear = jnp.asarray(clear_color.to_array(), jnp.float32)
    floor = _timeit(lambda z: z + 1.0, jnp.zeros((8, 128), jnp.float32))
    print(f"dispatch floor: {floor:.2f} ms")

    slot_bits = _pipe.slot_bits_for(st["orders"].shape[0], rows, tiles_x)
    assert slot_bits > 0

    params, slots, lengths, vline_ends = jax.jit(
        lambda *a: _ls.line_setup(*a, width, height, k_seg=_pipe.K_SEG)
    )(px, py, line_slot, *g)
    v_total = jnp.minimum(vline_ends[-1], jnp.uint32(caps.vline))
    kh, kl, payload = jax.jit(
        lambda *a: _raster.rasterize_sort(
            *a, caps.vline, _pipe.K_SEG, rows, tiles_x, slot_bits=slot_bits
        )
    )(params, slots, lengths, vline_ends, v_total)
    run_id, num_runs, new_run = jax.jit(_runs.extract_runs)(kh, kl)
    nr = jnp.minimum(num_runs, caps.run)

    st_opaque = (
        (st["func"] == 0) & (st["fill_type"] == 0)
        & (st["color"][:, 3] == 1.0) & (st["blend"] == 0) & (~st["is_clipped"])
    )
    st_isclip = st["func"] == 1
    st_solid = (st["func"] == 0) & (st["fill_type"] == 0) & (~st["is_clipped"])
    style_pack = jax.jit(_paint.style_pack_for_fold, static_argnums=(0,))(
        features,
        st["orders"], st["pidx"], st["fill_rule"], st["func"],
        st["clip_n"], st["is_clipped"], st["blend"], st["fill_type"],
        st["color"], st["grad"], st["stops"],
    )
    print(f"style row lanes: {style_pack.shape[1]}")

    # --- runs attribution -------------------------------------------------
    lx, ly, area, cover = jax.jit(_raster.unpack_payload)(payload)
    rid = jnp.minimum(run_id, caps.run - 1)
    cell = ly * consts.TILE_WIDTH + lx

    t = _timeit(
        lambda rid, cell, area, cover, kh, kl: _runs._build_grid(
            rid, cell, area, cover, caps.run, key_hi=kh, key_lo=kl
        ),
        rid, cell, area, cover, kh, kl,
    )
    print(f"grid kernel (incl runkeys):            {t:8.2f} ms")

    def do_runs(sp, kh, kl, payload, run_id, new_run, nr, pidx, fr, op, ic, so):
        return _runs.run_data(
            kh, kl, payload, run_id, new_run, nr, pidx, fr, op, ic, so,
            caps.run, tiles_x, style_pack=sp, presorted=True,
        )

    t_rd = _timeit(
        lambda *a: do_runs(*a),
        style_pack, kh, kl, payload, run_id, new_run, nr,
        st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid,
    )
    print(f"run_data total:                        {t_rd:8.2f} ms")
    t_rd0 = _timeit(
        lambda *a: {k: v for k, v in do_runs(None, *a).items() if v is not None},
        kh, kl, payload, run_id, new_run, nr,
        st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid,
    )
    print(f"run_data w/o style widening:           {t_rd0:8.2f} ms")

    rd = jax.jit(do_runs)(
        style_pack, kh, kl, payload, run_id, new_run, nr,
        st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid,
    )

    # carry scans only (from precomputed grid/rowcov + runkeys)
    def carries(rowcov, key2_s):
        new_group = key2_s != jnp.roll(key2_s, 1)
        new_group = new_group.at[0].set(True)
        cum = jnp.cumsum(rowcov, axis=0)
        excl = cum - rowcov
        gfirst = _runs._first_of_group(new_group)
        carry_in_s = excl - excl[gfirst]
        return carry_in_s + rowcov

    grid, rowcov, runkeys = jax.jit(
        lambda rid, cell, area, cover, kh, kl: _runs._build_grid(
            rid, cell, area, cover, caps.run, key_hi=kh, key_lo=kl
        )
    )(rid, cell, area, cover, kh, kl)
    t = _timeit(carries, rowcov, rd["key2_s"])
    print(f"carry scans (cumsum+gfirst gather):    {t:8.2f} ms")

    # style widening gather alone: [R, 1+SW] by slot
    sl_flags = jnp.zeros((st["pidx"].shape[0],), jnp.int32)
    def style_gather(key2_s, sp, sl_flags):
        slot_s = jnp.minimum(
            (key2_s & jnp.uint32(consts.LAYER_LIMIT)).astype(jnp.int32),
            sp.shape[0] - 1,
        )
        return jnp.concatenate([sl_flags[:, None], sp], axis=1)[slot_s]
    t = _timeit(style_gather, rd["key2_s"], style_pack, sl_flags)
    print(f"style [R,1+SW] gather alone:           {t:8.2f} ms")

    # --- units ------------------------------------------------------------
    vt = jnp.minimum(rd["v_total"], caps.virt)
    def do_units(rd, vt):
        return _runs.build_units(
            rd["run_hi"], rd["run_layer"], rd["r_valid"], rd["real_flags"],
            rd["inv"], rd["key2_s"], rd["tx_s"], rd["gap_flags_s"],
            rd["span"], rd["cumspan"], vt, caps.virt,
        )
    t = _timeit(do_units, rd, vt)
    print(f"build_units:                           {t:8.2f} ms")
    bu = jax.jit(do_units)(rd, vt)
    key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid, k_pre = bu

    def do_cull(key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid):
        keep = _paint.cull_units_keep(key_u, virt_u, k_u, u_valid)
        return _paint._renumber_units(
            key_u, layer_u, src_u, src2_u, virt_u, keep
        )
    t = _timeit(do_cull, *bu[:7])
    print(f"cull keep+renumber:                    {t:8.2f} ms")
    cu = jax.jit(do_cull)(*bu[:7])
    key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid, k_needed = cu
    k_active = int(np.asarray(jnp.minimum(k_needed, caps.k)))
    print(f"k_active = {k_active}, units = {int(np.asarray(jnp.sum(u_valid)))}")

    # --- paint fold prep pieces --------------------------------------------
    from forma_tpu.ops import paint_pallas as _pp

    ms = st["stops"].shape[1]
    lay = _pp.style_layout(features, ms)
    n_tiles = rows * tiles_x
    TBp = _pp.TB
    t8 = -(-n_tiles // TBp) * TBp
    nblk = t8 // TBp
    u_cap = key_u.shape[0]
    run_cap = grid.shape[0]
    k_slots = caps.k

    def boundary_ust(key_u, u_valid):
        rowb = (key_u >> _raster.TX_BITS).astype(jnp.int32) - 1
        txu = (key_u & jnp.uint32((1 << _raster.TX_BITS) - 1)).astype(jnp.int32) - 1
        tile_of = jnp.where(u_valid, rowb * tiles_x + txu, t8 + 1)
        iota_u = jnp.arange(u_cap, dtype=jnp.int32)
        boundary = u_valid & ((tile_of != jnp.roll(tile_of, 1)) | (iota_u == 0))
        skey = jnp.where(boundary, tile_of, t8 + 1).astype(jnp.uint32)
        skey_s, pos_s = jax.lax.sort((skey, iota_u), num_keys=1, is_stable=False)
        ntake = min(t8 + 1, u_cap)
        ust = (
            jnp.full((t8 + 2,), u_cap, jnp.int32)
            .at[skey_s[:ntake].astype(jnp.int32)]
            .min(pos_s[:ntake], mode="drop")[: t8 + 1]
        )
        n_valid = jnp.sum(u_valid, dtype=jnp.int32)
        ust = ust.at[t8].min(n_valid)
        return jnp.flip(jax.lax.cummin(jnp.flip(ust)))

    t = _timeit(boundary_ust, key_u, u_valid)
    print(f"prep: boundary sort + ust:             {t:8.2f} ms")

    def grow(grid, src_u, virt_u, u_valid):
        virt = (virt_u & _paint.FLAG_VIRTUAL) != 0
        return jnp.where(
            (virt | ~u_valid)[:, None], 0, grid[jnp.minimum(src_u, run_cap - 1)]
        )
    t = _timeit(grow, grid, src_u, virt_u, u_valid)
    print(f"prep: [u_cap,256] grid-row gather:     {t:8.2f} ms")

    def mrows(carry_in_s, carry_after_s, style_s, src2_u, virt_u):
        virt = (virt_u & _paint.FLAG_VIRTUAL) != 0
        carr_ext = jnp.concatenate(
            [
                jnp.concatenate([carry_in_s, style_s], axis=1),
                jnp.concatenate([carry_after_s, style_s], axis=1),
            ],
            axis=0,
        )
        cidx = jnp.minimum(src2_u, run_cap - 1) + jnp.where(virt, run_cap, 0)
        return carr_ext[cidx]
    t = _timeit(mrows, rd["carry_in_s"], rd["carry_after_s"], rd["style_s"],
                src2_u, virt_u)
    print(f"prep: carry|style [u_cap,16+SW] gather:{t:8.2f} ms")

    g_rows = jax.jit(grow)(grid, src_u, virt_u, u_valid)
    m_rows = jax.jit(mrows)(rd["carry_in_s"], rd["carry_after_s"],
                            rd["style_s"], src2_u, virt_u)

    def concat_pad(g_rows, m_rows):
        u_mat = jnp.concatenate([g_rows, m_rows], axis=1)
        win = -(-(TBp * k_slots + _pp.CH + 8) // _pp.CH) * _pp.CH
        return jnp.pad(u_mat, ((0, win), (0, _pp.UW - u_mat.shape[1])))
    t = _timeit(concat_pad, g_rows, m_rows)
    print(f"prep: concat+pad u_mat:                {t:8.2f} ms")

    # full prep + kernel via the real entry, then kernel alone
    def fold_total(key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
                   grid, ci, ca, ss, clear):
        return _paint._paint_fold_pallas(
            key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
            grid, ci, ca, ss, clear, rows, tiles_x, k_slots,
            features, ms,
        )
    t_fold = _timeit(
        fold_total, key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
        grid, rd["carry_in_s"], rd["carry_after_s"], rd["style_s"], clear,
    )
    print(f"paint fold total (assembly prep):      {t_fold:8.2f} ms")

    def fold_table(key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
                   grid, ci, ca, ss, txs, clear):
        return _paint._paint_fold_pallas(
            key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
            grid, ci, ca, ss, clear, rows, tiles_x, k_slots,
            features, ms, tx_s=txs, presorted=True,
        )
    t_foldt = _timeit(
        fold_table, key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
        grid, rd["carry_in_s"], rd["carry_after_s"], rd["style_s"],
        rd["tx_s"], clear,
    )
    print(f"paint fold total (table-mode prep):    {t_foldt:8.2f} ms")

    u_mat = jax.jit(concat_pad)(g_rows, m_rows)
    ust = jax.jit(boundary_ust)(key_u, u_valid)
    depth = ust[1:] - ust[:-1]
    cnt = jnp.minimum(depth, k_slots)
    ust_t = ust[:t8].reshape(nblk, TBp)
    cnt_t = cnt.reshape(nblk, TBp)
    start_al = (ust_t[:, 0] // 8) * 8
    span_end = jnp.concatenate([ust_t[1:, 0], ust[t8 : t8 + 1]])
    kmax = jnp.max(cnt_t, axis=1)
    win = -(-(TBp * k_slots + _pp.CH + 8) // _pp.CH) * _pp.CH
    nch = jnp.minimum(-(-(span_end - start_al) // _pp.CH), win // _pp.CH)
    nch = jnp.where(kmax > 0, nch, 0)
    tile_i = jnp.arange(t8, dtype=jnp.int32)
    x0_t = ((tile_i % tiles_x) * consts.TILE_WIDTH).reshape(nblk, TBp)
    y0_t = ((tile_i // tiles_x) * consts.TILE_HEIGHT).reshape(nblk, TBp)
    blkinfo = jnp.concatenate(
        [start_al[:, None], nch[:, None], kmax[:, None],
         jnp.zeros((nblk, 5), jnp.int32),
         ust_t - start_al[:, None], cnt_t, x0_t, y0_t], axis=1,
    )
    t = _timeit(
        lambda u_mat, blkinfo, clear: _pp.paint_fold_pallas(
            u_mat, blkinfo, clear, k_slots=k_slots, features=features, ms=ms
        ),
        u_mat, blkinfo, clear,
    )
    print(f"paint kernel alone:                    {t:8.2f} ms")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    a = ap.parse_args()
    main(a.paths, a.width, a.height)
