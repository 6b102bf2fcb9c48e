"""Per-stage timing of the device pipeline on the current JAX device.

Timing is fenced by `jax.device_get` of a small checksum of each stage's
output — on this TPU stack `block_until_ready` can return before execution
completes, so naive timing reads ~0 (round-1 bug).  The measured dispatch
floor (an empty round-trip, ~28 ms through the axon tunnel) prints first;
subtract it mentally from every stage number.  The stage sum (minus floors)
should approximate the fused frame time.

Usage: python tools/profile_stages.py [--paths N] [--width W] [--height H]
"""

import argparse
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
from forma_tpu.renderer import Renderer


def _checksum(x):
    if isinstance(x, (tuple, list)):
        return sum(_checksum(v) for v in x)
    if isinstance(x, dict):
        return sum(_checksum(v) for v in x.values())
    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    return x.reshape(-1)[:: max(x.size // 64, 1)].astype(jnp.float32).sum()


def timeit(name, fn, n=3):
    f = jax.jit(lambda: _checksum(fn()))
    jax.device_get(f())  # compile + first run
    times = []
    for _ in range(n):
        t0 = time.time()
        jax.device_get(f())
        times.append(time.time() - t0)
    dt = min(times) * 1000
    print(f"{name:<32} {dt:8.2f} ms", flush=True)
    return dt


def main(paths=2000, width=1920, height=1080):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    clear = Color(1, 1, 1, 1)
    frame, diag = r.render_device(comp, width, height, clear)  # warm + caps
    caps = r._caps
    print("caps:", caps, "diag:", diag)

    rows = -(-height // 16)
    tiles_x = -(-width // 16)
    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host, st = r._styles_cache
    g = r._geom_tables(comp, uniq, st_host.orders)
    clear_a = jnp.asarray(clear.to_array(), jnp.float32)
    features = st_host.features

    floor = timeit("dispatch floor", lambda: jnp.zeros((8, 128)) + 1.0)

    sl = st["orders"].shape[0]
    slot_bits = max((sl - 1).bit_length(), 1)
    if (rows + 1).bit_length() + max((tiles_x + 1).bit_length(), 1) + slot_bits > 31:
        slot_bits = 0

    ls = jax.jit(
        lambda: _ls.line_setup(px, py, line_slot, *g, width, height, k_seg=_pipe.K_SEG)
    )()
    timeit("line_setup", lambda: _ls.line_setup(
        px, py, line_slot, *g, width, height, k_seg=_pipe.K_SEG))
    params, slots, lengths, vline_ends = ls
    v_total = jnp.minimum(vline_ends[-1], jnp.uint32(caps.vline))

    def do_raster():
        return _raster.rasterize_sort(
            params, slots, lengths, vline_ends, v_total,
            caps.vline, _pipe.K_SEG, rows, tiles_x, slot_bits=slot_bits,
        )

    timeit("rasterize+sort", do_raster)
    kh, kl, payload = jax.jit(do_raster)()

    timeit("extract_runs", lambda: _runs.extract_runs(kh, kl))
    run_id, num_runs, new_run = jax.jit(lambda: _runs.extract_runs(kh, kl))()

    st_opaque = (
        (st["func"] == 0) & (st["fill_type"] == 0)
        & (st["color"][:, 3] == 1.0) & (st["blend"] == 0) & (~st["is_clipped"])
    )
    st_isclip = st["func"] == 1

    def do_runs():
        return _runs.run_data(
            kh, kl, payload, run_id, new_run, jnp.minimum(num_runs, caps.run),
            st["pidx"], st["fill_rule"], st_opaque, st_isclip, caps.run, tiles_x,
        )

    timeit("run_data(scatter+carries)", do_runs)
    rd = jax.jit(do_runs)()

    def do_units():
        return _runs.build_units(
            rd["run_hi"], rd["run_layer"], rd["r_valid"], rd["real_flags"],
            rd["key2_s"], rd["tx_s"], rd["gap_flags_s"], rd["span"],
            rd["cumspan"], jnp.minimum(rd["v_total"], caps.virt), caps.virt,
        )

    timeit("build_units", do_units)
    bu = jax.jit(do_units)()

    timeit("cull_units", lambda: _paint.cull_units(*bu[:6]))
    cu = jax.jit(lambda: _paint.cull_units(*bu[:6]))()

    def do_paint():
        return _paint.paint(
            *cu[:6], rd["grid"], rd["carry_in"], rd["carry_after_s"],
            st["orders"], st["pidx"], st["fill_rule"], st["func"], st["clip_n"],
            st["is_clipped"], st["blend"], st["fill_type"], st["color"],
            st["grad"], st["stops"], st["tex"], st["atlas"], clear_a,
            rows, tiles_x, caps.k, features,
            k_active=jnp.minimum(cu[6], caps.k),
        )

    timeit(f"paint(fold, k={int(cu[6])})", do_paint)
    pt = jax.jit(do_paint)()
    timeit("pack_srgb", lambda: _srgb.pack_srgb(pt, (0, 1, 2, 3)))

    timeit(
        "FUSED render_frame",
        lambda: _pipe.render_frame(
            px, py, line_slot, *g, st, clear_a, width, height, rows, tiles_x,
            caps, features, (0, 1, 2, 3),
        )[0],
    )
    print(f"(dispatch floor ~{floor:.1f} ms is included in every number)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=2000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    main(paths=args.paths, width=args.width, height=args.height)
