"""A/B the paint wave-prefix schedule on real pipeline inputs.

The wave fold pads each wave's work to a static tile prefix; coarse
prefixes (shrink 4, floor 256) mean dead rows wherever the depth
distribution steps down inside a prefix.  This probe builds paris-30k
paint inputs once, then times `paint` under several (shrink, floor)
schedules — finer schedules trade more fori loops + state slice/set
copies for less dead work.

Usage: python tools/paint_wave_probe.py [--paths N]
"""

from __future__ import annotations

import argparse
import sys
import time

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
    channels = RGBA

    frame, diag = r.render_device(comp, width, height, clear_color, channels)
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
        lambda *a: _runs.run_data(*a, caps.run, tiles_x)
    )(kh, kl, payload, run_id, new_run, jnp.minimum(num_runs, caps.run),
      st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid)
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

    results = {}
    for wave in ((4, 256), (2, 64), (2, 128), (4, 64), (2, 256)):
        def do_paint(cu7, rd, st, clear, ka, _w=wave):
            return _paint.paint(
                *cu7, rd["grid"], rd["carry_in_s"], rd["carry_after_s"],
                st["orders"], st["pidx"], st["fill_rule"], st["func"],
                st["clip_n"], st["is_clipped"], st["blend"], st["fill_type"],
                st["color"], st["grad"], st["stops"], st["tex"], st["atlas"],
                clear, rows, tiles_x, caps.k, features, k_active=ka, wave=_w,
            )

        t0 = time.time()
        t = _timeit(do_paint, tuple(cu[:7]), rd, st, clear, ka)
        results[wave] = t
        print(f"wave {wave}: paint {t:8.2f} ms  (incl floor; setup {time.time()-t0:.0f}s)", flush=True)

    base = results[(4, 256)]
    for w, t in results.items():
        print(f"  {w}: {t:8.2f} ms  delta {t - base:+6.2f}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    args = ap.parse_args()
    main(paths=args.paths)
