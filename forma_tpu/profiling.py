"""Per-stage timing: the `gpu::Timings` analog
(`forma/src/gpu/renderer/mod.rs:24-36,392-427`).

The production path dispatches ONE fused program per frame, so per-stage
numbers come from a profiling re-run that dispatches each stage separately
with `jax.device_get`-fenced timing (`block_until_ready` can return before
execution completes on the axon TPU tunnel — round-1 bug).  Every number
includes the dispatch floor (~28 ms through the tunnel), reported as
`dispatch_floor_ms` so callers can subtract it.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import numpy as np


class Timings(NamedTuple):
    """Stage wall times in ms (each includes one dispatch round-trip)."""

    line_setup: float
    rasterize_sort: float
    runs: float
    units: float
    cull: float
    paint: float
    srgb: float
    fused_frame: float  # the real single-dispatch frame time
    dispatch_floor_ms: float
    k_active: int


def _checksum(x):
    import jax.numpy as jnp

    if isinstance(x, (tuple, list)):
        return sum(_checksum(v) for v in x)
    if isinstance(x, dict):
        return sum(_checksum(v) for v in x.values())
    x = jnp.asarray(x)
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.int32)
    return x.reshape(-1)[:: max(x.size // 64, 1)].astype(jnp.float32).sum()


def _timeit(fn, *args, n=3):
    """Times fn(*args) with device_get fencing.  Arrays MUST be arguments —
    a no-arg closure embeds device arrays as HLO constants, ballooning the
    program past the remote-compile tunnel's size limit."""
    import jax

    f = jax.jit(lambda *a: _checksum(fn(*a)))
    jax.device_get(f(*args))  # compile + warm
    times = []
    for _ in range(n):
        t0 = time.time()
        jax.device_get(f(*args))
        times.append(time.time() - t0)
    return min(times) * 1000.0


def profile_frame(renderer, composition, width, height, clear_color, channels=None):
    """Runs every pipeline stage separately with fenced timing; returns
    `Timings` and stores it on `renderer.last_timings`."""
    import jax
    import jax.numpy as jnp

    from . import consts
    from .buffer import RGBA
    from .ops import line_setup as _ls
    from .ops import paint as _paint
    from .ops import pipeline as _pipe
    from .ops import rasterize as _raster
    from .ops import runs as _runs
    from .ops import srgb as _srgb

    channels = channels or RGBA
    chans = tuple(ch.value for ch in channels)

    # Warm caps through the normal path first.
    frame, diag = renderer.render_device(composition, width, height, clear_color, channels)
    caps = renderer._caps
    rows = -(-height // consts.TILE_HEIGHT)
    tiles_x = -(-width // consts.TILE_WIDTH)

    px, py, line_slot, uniq = renderer._prepare_geometry(composition)
    st_host, st = renderer._styles_cache
    g = renderer._geom_tables(composition, uniq, st_host.orders)
    features = st_host.features
    clear = jnp.asarray(clear_color.to_array(), jnp.float32)

    floor = _timeit(lambda z: z + 1.0, jnp.zeros((8, 128), jnp.float32))

    sl = st["orders"].shape[0]
    slot_bits = max((sl - 1).bit_length(), 1)
    if (rows + 1).bit_length() + max((tiles_x + 1).bit_length(), 1) + slot_bits > 31:
        slot_bits = 0

    def do_ls(px, py, line_slot, *g):
        return _ls.line_setup(px, py, line_slot, *g, width, height, k_seg=_pipe.K_SEG)

    t_ls = _timeit(do_ls, px, py, line_slot, *g)
    params, slots, lengths, vline_ends = jax.jit(do_ls)(px, py, line_slot, *g)
    v_total = jnp.minimum(vline_ends[-1], jnp.uint32(caps.vline))

    def do_raster(params, slots, lengths, vline_ends, v_total):
        return _raster.rasterize_sort(
            params, slots, lengths, vline_ends, v_total,
            caps.vline, _pipe.K_SEG, rows, tiles_x, slot_bits=slot_bits,
        )

    raster_args = (params, slots, lengths, vline_ends, v_total)
    t_rs = _timeit(do_raster, *raster_args)
    kh, kl, payload = jax.jit(do_raster)(*raster_args)
    run_id, num_runs, new_run = jax.jit(_runs.extract_runs)(kh, kl)

    st_opaque = (
        (st["func"] == 0) & (st["fill_type"] == 0)
        & (st["color"][:, 3] == 1.0) & (st["blend"] == 0) & (~st["is_clipped"])
    )
    st_isclip = st["func"] == 1
    st_solid = (
        (st["func"] == 0) & (st["fill_type"] == 0) & (~st["is_clipped"])
    )

    def do_runs(kh, kl, payload, run_id, new_run, nr, pidx, fr, op, ic, so, sp):
        return _runs.run_data(
            kh, kl, payload, run_id, new_run, nr,
            pidx, fr, op, ic, so, caps.run, tiles_x, style_pack=sp,
            presorted=slot_bits > 0,
        )

    style_pack = jax.jit(
        _paint.style_pack_for_fold, static_argnums=(0,)
    )(
        features,
        st["orders"], st["pidx"], st["fill_rule"], st["func"],
        st["clip_n"], st["is_clipped"], st["blend"], st["fill_type"],
        st["color"], st["grad"], st["stops"],
    )
    runs_args = (kh, kl, payload, run_id, new_run,
                 jnp.minimum(num_runs, caps.run),
                 st["pidx"], st["fill_rule"], st_opaque, st_isclip, st_solid,
                 style_pack)
    t_rd = _timeit(do_runs, *runs_args)
    rd = jax.jit(do_runs)(*runs_args)

    def do_units(rd, vt):
        return _runs.build_units(
            rd["run_hi"], rd["run_layer"], rd["r_valid"], rd["real_flags"],
            rd["inv"], rd["key2_s"], rd["tx_s"], rd["gap_flags_s"],
            rd["span"], rd["cumspan"], vt, caps.virt,
        )

    vt = jnp.minimum(rd["v_total"], caps.virt)
    t_bu = _timeit(do_units, rd, vt)
    bu = jax.jit(do_units)(rd, vt)

    t_cu = _timeit(lambda *u: _paint.cull_units(*u), *bu[:7])
    cu = jax.jit(_paint.cull_units)(*bu[:7])

    def do_paint(cu7, rd, st, clear, ka):
        return _paint.paint(
            *cu7, rd["grid"], rd["carry_in_s"], rd["carry_after_s"],
            st["orders"], st["pidx"], st["fill_rule"], st["func"], st["clip_n"],
            st["is_clipped"], st["blend"], st["fill_type"], st["color"],
            st["grad"], st["stops"], st["tex"], st["atlas"], clear,
            rows, tiles_x, caps.k, features,
            k_active=ka,
            style_s=rd["style_s"],
            tx_s=rd["tx_s"],
            presorted=slot_bits > 0,
        )

    ka = jnp.minimum(cu[7], caps.k)
    t_pt = _timeit(do_paint, tuple(cu[:7]), rd, st, clear, ka)
    pt = jax.jit(do_paint)(tuple(cu[:7]), rd, st, clear, ka)
    t_srgb = _timeit(lambda pt: _srgb.pack_srgb(pt, chans), pt)

    def do_fused(px, py, line_slot, g, st, clear):
        return _pipe.render_frame(
            px, py, line_slot, *g, st, clear, width, height, rows, tiles_x,
            caps, features, chans,
        )[0]

    t_fused = _timeit(do_fused, px, py, line_slot, g, st, clear)

    t = Timings(
        line_setup=t_ls,
        rasterize_sort=t_rs,
        runs=t_rd,
        units=t_bu,
        cull=t_cu,
        paint=t_pt,
        srgb=t_srgb,
        fused_frame=t_fused,
        dispatch_floor_ms=floor,
        k_active=int(np.asarray(cu[7])),
    )
    renderer.last_timings = t
    return t
