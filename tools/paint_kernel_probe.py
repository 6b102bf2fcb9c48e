"""Attribute the Pallas paint-fold path's cost on real paris inputs.

Times: the XLA wave fold, the full kernel path, the XLA-side prep alone
(U matrix + spans + blkinfo), and the kernel alone on materialized inputs.

Usage: python tools/paint_kernel_probe.py [--paths N]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from forma_tpu import Color, Composition, consts
from forma_tpu.buffer import RGBA
from forma_tpu.demos import scenes
from forma_tpu.ops import line_setup as _ls
from forma_tpu.ops import paint as _paint
from forma_tpu.ops import paint_pallas as _pp
from forma_tpu.ops import pipeline as _pipe
from forma_tpu.ops import rasterize as _raster
from forma_tpu.ops import runs as _runs
from forma_tpu.profiling import _timeit
from forma_tpu.renderer import Renderer


def main(paths=30000, width=1920, height=1080):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    clear_color = Color(1, 1, 1, 1)

    frame, diag = r.render_device(comp, width, height, clear_color, RGBA)
    caps = r._caps
    rows = -(-height // consts.TILE_HEIGHT)
    tiles_x = -(-width // consts.TILE_WIDTH)

    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host, st = r._styles_cache
    g = r._geom_tables(comp, uniq, st_host.orders)
    features = st_host.features
    clear = jnp.asarray(clear_color.to_array(), jnp.float32)

    sl = st["orders"].shape[0]
    slot_bits = max((sl - 1).bit_length(), 1)
    if (rows + 1).bit_length() + max((tiles_x + 1).bit_length(), 1) + slot_bits > 31:
        slot_bits = 0

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
    st_opaque = (
        (st["func"] == 0) & (st["fill_type"] == 0)
        & (st["color"][:, 3] == 1.0) & (st["blend"] == 0) & (~st["is_clipped"])
    )
    st_isclip = st["func"] == 1
    st_solid = (st["func"] == 0) & (st["fill_type"] == 0) & (~st["is_clipped"])
    rd = jax.jit(
        lambda *a, col: _runs.run_data(*a, caps.run, tiles_x, st_color=col)
    )(kh, kl, payload, run_id, new_run, jnp.minimum(num_runs, caps.run),
      st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid,
      col=st["color"])
    bu = jax.jit(
        lambda rd, vt: _runs.build_units(
            rd["run_hi"], rd["run_layer"], rd["r_valid"], rd["real_flags"],
            rd["inv"], rd["key2_s"], rd["tx_s"], rd["gap_flags_s"],
            rd["span"], rd["cumspan"], vt, caps.virt,
        )
    )(rd, jnp.minimum(rd["v_total"], caps.virt))
    cu = jax.jit(_paint.cull_units)(*bu[:7])
    ka = jnp.minimum(cu[7], caps.k)
    print(f"caps={caps} k_active={int(np.asarray(cu[7]))}", flush=True)

    def do_paint(cu7, rd, st, clear, ka, style_s):
        return _paint.paint(
            *cu7, rd["grid"], rd["carry_in_s"], rd["carry_after_s"],
            st["orders"], st["pidx"], st["fill_rule"], st["func"],
            st["clip_n"], st["is_clipped"], st["blend"], st["fill_type"],
            st["color"], st["grad"], st["stops"], st["tex"], st["atlas"],
            clear, rows, tiles_x, caps.k, features, k_active=ka,
            style_s=style_s,
        )

    t_wave = _timeit(do_paint, tuple(cu[:7]), rd, st, clear, ka, None)
    print(f"paint WAVE:   {t_wave:8.2f} ms (incl floor)", flush=True)
    t_kern = _timeit(do_paint, tuple(cu[:7]), rd, st, clear, ka, rd["style_s"])
    print(f"paint PALLAS: {t_kern:8.2f} ms (incl floor)", flush=True)

    # Prep alone (U matrix, spans, blkinfo — everything before pallas_call).
    k_slots = caps.k

    def prep_only(cu7, rd, style_s):
        key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid = cu7
        # replicate _paint_fold_pallas's prep by calling it with a stub
        # kernel?  Simpler: call the real thing and sum the inputs it
        # builds — reproduce here via the module internals.
        from forma_tpu.ops.paint import TX_BITS as _txb  # noqa: F401
        return _paint._paint_fold_pallas.__wrapped__(
            key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid,
            rd["grid"], rd["carry_in_s"], rd["carry_after_s"], style_s,
            clear, rows, tiles_x, k_slots,
        ) if False else None

    # Materialize U/blkinfo once via a copy of the prep (import internals).
    from forma_tpu.ops.paint import _paint_fold_pallas as _pfp  # noqa

    # Time the kernel alone by materializing its inputs with the real prep
    # code path split: run prep inside jit and return U + blkinfo.
    import forma_tpu.ops.paint as paint_mod

    def build_inputs(cu7, rd, style_s):
        key_u, layer_u, src_u, src2_u, virt_u, k_u, u_valid = cu7
        n_tiles = rows * tiles_x
        TBp = _pp.TB
        t8 = -(-n_tiles // TBp) * TBp
        nblk = t8 // TBp
        u_cap = key_u.shape[0]
        run_cap = rd["grid"].shape[0]
        from forma_tpu.ops.rasterize import TX_BITS
        rowb = (key_u >> TX_BITS).astype(jnp.int32) - 1
        txu = (key_u & jnp.uint32((1 << TX_BITS) - 1)).astype(jnp.int32) - 1
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
        ust = jnp.flip(jax.lax.cummin(jnp.flip(ust)))
        depth = ust[1:] - ust[:-1]
        cnt = jnp.minimum(depth, k_slots)
        virt = (virt_u & paint_mod.FLAG_VIRTUAL) != 0
        g_rows = jnp.where(
            (virt | ~u_valid)[:, None], 0,
            rd["grid"][jnp.minimum(src_u, run_cap - 1)],
        )
        carr_ext = jnp.concatenate(
            [
                jnp.concatenate([rd["carry_in_s"], style_s], axis=1),
                jnp.concatenate([rd["carry_after_s"], style_s], axis=1),
            ],
            axis=0,
        )
        cidx = jnp.minimum(src2_u, run_cap - 1) + jnp.where(virt, run_cap, 0)
        m_rows = carr_ext[cidx]
        u_mat = jnp.concatenate([g_rows, m_rows], axis=1)
        win = -(-(TBp * k_slots + _pp.CH + 8) // _pp.CH) * _pp.CH
        u_mat = jnp.pad(u_mat, ((0, win), (0, _pp.UW - u_mat.shape[1])))
        ust_t = ust[:t8].reshape(nblk, TBp)
        cnt_t = cnt.reshape(nblk, TBp)
        start_al = (ust_t[:, 0] // 8) * 8
        span_end = jnp.concatenate([ust_t[1:, 0], ust[t8 : t8 + 1]])
        kmax = jnp.max(cnt_t, axis=1)
        nch = jnp.minimum(-(-(span_end - start_al) // _pp.CH), win // _pp.CH)
        nch = jnp.where(kmax > 0, nch, 0)
        blkinfo = jnp.concatenate(
            [
                start_al[:, None], nch[:, None], kmax[:, None],
                jnp.zeros((nblk, 5), jnp.int32),
                ust_t - start_al[:, None], cnt_t,
            ],
            axis=1,
        )
        return u_mat, blkinfo

    t_prep = _timeit(build_inputs, tuple(cu[:7]), rd, rd["style_s"])
    print(f"prep alone:   {t_prep:8.2f} ms (incl floor)", flush=True)

    u_mat, blkinfo = jax.jit(build_inputs)(tuple(cu[:7]), rd, rd["style_s"])

    def kern_only(u_mat, blkinfo, clear):
        return _pp.paint_fold_pallas(u_mat, blkinfo, clear, k_slots=k_slots)

    t_k = _timeit(kern_only, u_mat, blkinfo, clear)
    print(f"kernel alone: {t_k:8.2f} ms (incl floor)", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    args = ap.parse_args()
    main(paths=args.paths)
