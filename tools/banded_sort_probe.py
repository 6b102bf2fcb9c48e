"""Banded segment sort at LINE granularity — pre-registered round-5 probe.

The round-4 banded-sort rejection assumed the partition pass must run at
SEGMENT scale (a sort/scatter at 8.9M — circular).  It doesn't: a line
knows its device-row span in line setup, so lines can be split into
per-(row-band) pieces BEFORE expansion; segments then emerge band-grouped
through the existing monotonic expand, and each band sorts independently
in ONE batched `lax.sort` along the minor axis (TPU batched sorts
vectorize compare stages across the batch dimension — the measured
[512 x 17k] 5.5 ms vs 16.5 ms global win).

Band = (tile_row, layer-slot chunk): a line has ONE slot, so chunking by
slot costs no inflation, and the (row, slot-chunk)-major concatenation of
sorted bands is exactly the global [row | slot | tx] order the presorted
runs path consumes (a (row, layer) carry group never crosses a band).

This probe measures, on REAL paris-30k@1080p segments:

  1. piece inflation — per-line tile-row-span distribution (every extra
     piece costs ~K_SEG/2 padded slots through expand + emit + grid);
  2. real per-band populations for nchunks in {1, 2, 4, 8} (max/mean =
     the band padding factor the batched sort pays);
  3. batched pair-sort wall clock at the implied [n_bands, cap] shapes
     vs the shipped 1-D global sort, same process (floor cancels);
  4. the net ledger: banded win minus inflation costs (emit + grid scale
     with slots; measured per-slot rates from the stage table).

Usage: python tools/banded_sort_probe.py [--paths 30000]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from forma_tpu import Color, Composition
from forma_tpu import consts
from forma_tpu.demos import scenes
from forma_tpu.renderer import Renderer
from forma_tpu.ops import line_setup as _ls
from forma_tpu.ops import pipeline as _pipe
from forma_tpu.ops import rasterize as _raster


def _reduce(out):
    if isinstance(out, (tuple, list)):
        return sum(_reduce(o) for o in out)
    return out.reshape(-1)[:8].astype(jnp.uint32).sum()


def _time(fn, *args, iters=10):
    f = jax.jit(lambda *a: _reduce(fn(*a)))
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(f(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main(paths=30000, width=1920, height=1080):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    r.render_device(comp, width, height, Color(1, 1, 1, 1))
    caps = r._caps
    rows = -(-height // consts.TILE_HEIGHT)
    tiles_x = -(-width // consts.TILE_WIDTH)

    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host, st = r._styles_cache
    g = r._geom_tables(comp, uniq, st_host.orders)
    slot_bits = _pipe.slot_bits_for(st["orders"].shape[0], rows, tiles_x)
    n_slots = int(st["orders"].shape[0])
    print(f"caps={caps} rows={rows} slots={n_slots} slot_bits={slot_bits}")

    params, slots, lengths, vline_ends = jax.jit(
        lambda *a: _ls.line_setup(*a, width, height, k_seg=_pipe.K_SEG)
    )(px, py, line_slot, *g)
    v_total = jnp.minimum(vline_ends[-1], jnp.uint32(caps.vline))
    tx_bits = max((tiles_x + 1).bit_length(), 1)
    packed, payload = jax.jit(
        lambda *a: _raster._expand_emit_packed(
            *a, caps.vline, _pipe.K_SEG, rows, tiles_x, jnp.int32(0),
            slot_bits, tx_bits,
        )
    )(params, lengths, vline_ends, v_total)
    n = packed.shape[0]

    # ---- 1. piece inflation: per-line tile-row spans --------------------
    P = np.asarray(params)
    Ln = np.asarray(lengths)
    live = Ln > 0
    y0 = P[:, _ls.PY0]
    y1 = y0 + P[:, _ls.PDY]
    sub_per_row = consts.PIXEL_WIDTH * consts.TILE_HEIGHT  # 256 subpixels
    r0 = np.clip(np.floor(np.minimum(y0, y1) / sub_per_row), 0, rows - 1)
    r1 = np.clip(np.floor(np.maximum(y0, y1) / sub_per_row), 0, rows - 1)
    span = np.where(live, (r1 - r0 + 1).astype(np.int64), 0)
    L_live = int(live.sum())
    pieces = int(span.sum())
    segs = int(Ln[live].sum())
    slots_now = int(np.asarray(v_total)) * _pipe.K_SEG
    # each extra piece pads its tail vline by ~K_SEG/2 on average
    extra_slots = (pieces - L_live) * (_pipe.K_SEG // 2 + 1)
    print(f"lines={L_live} segments={segs} slots_now={slots_now}")
    print(
        f"pieces={pieces} inflation x{pieces / max(L_live, 1):.3f} "
        f"(+{extra_slots} est. padded slots = "
        f"x{1 + extra_slots / max(slots_now, 1):.3f} slot growth)"
    )
    hist = np.bincount(np.minimum(span[live], 20).astype(np.int64))
    print(f"row-span histogram (span: lines, 20=20+): "
          f"{dict((i, int(c)) for i, c in enumerate(hist) if c)}")

    # ---- 2. real band populations ---------------------------------------
    ph = np.asarray(packed)
    valid = ph != 0xFFFFFFFF
    rowb = (ph[valid] >> (slot_bits + tx_bits)).astype(np.int64) - 1
    slot = ((ph[valid] >> tx_bits) & ((1 << slot_bits) - 1)).astype(np.int64)
    n_valid = int(valid.sum())
    print(f"valid segments on-frame: {n_valid} ({n_valid / n:.2%} of {n})")

    configs = []
    for nchunks in (1, 2, 4, 8):
        chunk = -(-n_slots // nchunks)
        band = rowb * nchunks + slot // chunk
        n_bands = rows * nchunks
        cnt = np.bincount(band, minlength=n_bands)
        cap = int(-(-cnt.max() // 128) * 128)
        total = n_bands * cap
        print(
            f"nchunks={nchunks}: bands={n_bands} max={cnt.max()} "
            f"mean={cnt.mean():.0f} cap={cap} padded_total={total} "
            f"(x{total / max(n_valid, 1):.2f} of valid, "
            f"x{total / n:.2f} of current array)"
        )
        configs.append((nchunks, n_bands, cap))

    # ---- 3. batched pair sort timings ------------------------------------
    rng = np.random.default_rng(0)
    pay = jnp.asarray(rng.integers(0, 1 << 25, n, dtype=np.uint32))
    t_global = _time(
        lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False),
        packed, pay,
    )
    print(f"global 1-D pair sort at {n}: {t_global:8.2f} ms")

    for nchunks, n_bands, cap in configs:
        total = n_bands * cap
        kb = jnp.asarray(
            rng.integers(0, 1 << 23, (n_bands, cap), dtype=np.uint32)
        )
        # realistic sentinel tail per band: fill factor = mean/cap
        pb = jnp.asarray(
            rng.integers(0, 1 << 25, (n_bands, cap), dtype=np.uint32)
        )
        t_band = _time(
            lambda k, p: jax.lax.sort(
                (k, p), num_keys=1, dimension=1, is_stable=False
            ),
            kb, pb,
        )
        print(
            f"banded [{n_bands} x {cap}] pair sort ({total} slots): "
            f"{t_band:8.2f} ms  (delta vs global {t_band - t_global:+.2f})"
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    a = ap.parse_args()
    main(a.paths, a.width, a.height)
