"""Per-stage timing of the device pipeline on the current JAX device."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from forma_tpu import Color, Composition
from forma_tpu.demos import scenes
from forma_tpu.ops import line_setup as _ls
from forma_tpu.ops import paint as _paint
from forma_tpu.ops import pipeline as _pipe
from forma_tpu.ops import rasterize as _raster
from forma_tpu.ops import runs as _runs
from forma_tpu.ops import srgb as _srgb
from forma_tpu.ops import styles as _styles
from forma_tpu.renderer import Renderer


def timeit(name, fn, n=5):
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{name:<28} {dt:8.2f} ms")
    return out


def main(paths=2000, width=1920, height=1080):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    clear = Color(1, 1, 1, 1)
    # Warm up; grows caps.
    frame, diag = r.render_device(comp, width, height, clear)
    jax.block_until_ready(frame)
    caps = r._caps
    print("caps:", caps, "diag:", diag)

    rows = -(-height // 16)
    tiles_x = -(-width // 16)
    px, py, line_slot, uniq = r._prepare_geometry(comp)
    g = r._geom_tables(comp, uniq)
    st_host = _styles.build_style_tables(comp.layers)
    st = _pipe.style_tables_device(st_host)
    clear_a = jnp.asarray(clear.to_array(), jnp.float32)

    ls = timeit("line_setup", lambda: _ls.line_setup(px, py, line_slot, *g, width, height))
    total = jnp.minimum(ls[9][-1], jnp.uint32(caps.seg))

    rs = timeit(
        "rasterize+sort",
        lambda: _raster.rasterize_sort(*ls[:9], ls[9], total, caps.seg, rows, tiles_x),
    )
    er = timeit("extract_runs", lambda: _runs.extract_runs(rs[0], rs[1]))
    rd = timeit(
        "run_data(scatter+carries)",
        lambda: _runs.run_data(rs[0], rs[1], rs[2], rs[3], er[0],
                               jnp.minimum(er[1], caps.run),
                               st["orders"], st["fill_rule"], caps.run, tiles_x),
    )
    bu = timeit(
        "build_units",
        lambda: _runs.build_units(rd["run_hi"], rd["run_layer"], rd["r_valid"],
                                  rd["key2_s"], rd["tx_s"], rd["span"], rd["cumspan"],
                                  jnp.minimum(rd["v_total"], caps.virt), caps.virt),
    )
    pt = timeit(
        "paint(fold)",
        lambda: _paint.paint(*bu[:6], rd["area_grid"], rd["cover_grid"],
                             rd["carry_in"], rd["carry_after_s"],
                             st["orders"], st["fill_rule"], st["func"], st["clip_n"],
                             st["is_clipped"], st["blend"], st["fill_type"], st["color"],
                             st["grad"], st["stops"], st["tex"], st["atlas"], clear_a,
                             rows, tiles_x, caps.k, st_host.features),
    )
    timeit("pack_srgb", lambda: _srgb.pack_srgb(pt, (0, 1, 2, 3)))
    timeit(
        "FUSED render_frame",
        lambda: _pipe.render_frame(px, py, line_slot, *g, st, clear_a,
                                   width, height, rows, tiles_x,
                                   caps, st_host.features, (0, 1, 2, 3))[0],
    )

    def full():
        f, d = r.render_device(comp, width, height, clear)
        return f

    timeit("render_device (host loop)", full)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=2000)
    args = ap.parse_args()
    main(paths=args.paths)
