"""Measures the (run, cell) duplicate factor of the sorted pixel-segment
stream for the paris scene — the number the VERDICT's round-3 plan #1 rests
on.  If segments-per-unique-(run,cell) is well above 1, collapsing duplicates
before the grid scatter (`ops/runs.py` grid accumulation) divides the 85 ms
per-element scatter cost by that factor.

Runs the real pipeline stages up to the sort on the default device, fetches
the sorted keys + payload, and counts unique (key_hi, key_lo, cell) triples
host-side.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    width, height = 1920, 1080
    paths = int(sys.argv[1]) if len(sys.argv) > 1 else 30000

    import jax

    import forma_tpu
    from forma_tpu import Color, Composition

    forma_tpu.enable_compilation_cache()
    from forma_tpu.demos import scenes
    from forma_tpu.renderer import Renderer

    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    clear = Color(1.0, 1.0, 1.0, 1.0)
    # One full render to settle capacity buckets.
    frame, diag = r.render_device(comp, width, height, clear)
    print("diag:", diag, "caps:", r._caps, file=sys.stderr)

    # Re-run just line setup + rasterize_sort with the renderer's prepared
    # inputs, mirroring ops/pipeline._core.
    import jax.numpy as jnp

    from forma_tpu import consts
    from forma_tpu.ops import line_setup as _ls
    from forma_tpu.ops import pipeline as pipe
    from forma_tpu.ops import rasterize as _raster

    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host, st = r._styles_cache
    g_slot, g_valid, g_t, g_has_t = r._geom_tables(comp, uniq, st_host.orders)

    rows = -(-height // consts.TILE_HEIGHT)
    tiles_x = -(-width // consts.TILE_WIDTH)
    caps = r._caps

    params, slots, lengths, vline_ends = _ls.line_setup(
        px, py, line_slot, g_slot, g_valid, g_t, g_has_t, width, height,
        k_seg=pipe.K_SEG,
    )
    v_total = vline_ends[-1]
    sl = st["orders"].shape[0]
    slot_bits = max((sl - 1).bit_length(), 1)
    row_bits = (rows + 1).bit_length()
    tx_bits = max((tiles_x + 1).bit_length(), 1)
    if row_bits + tx_bits + slot_bits > 31:
        slot_bits = 0
    print(f"slot_bits={slot_bits} sl={sl}", file=sys.stderr)
    key_hi, key_lo, payload = _raster.rasterize_sort(
        params, slots, lengths, vline_ends,
        jnp.minimum(v_total, jnp.uint32(caps.vline)),
        caps.vline, pipe.K_SEG, rows, tiles_x, jnp.int32(0),
        slot_bits=slot_bits,
    )
    t0 = time.time()
    kh = np.asarray(jax.device_get(key_hi))
    kl = np.asarray(jax.device_get(key_lo))
    pl = np.asarray(jax.device_get(payload))
    print(f"fetched {kh.shape[0]} segs in {time.time()-t0:.1f}s", file=sys.stderr)

    valid = kh != 0xFFFFFFFF
    n = int(valid.sum())
    cell = (pl >> 17) & 0xFF  # (lx << 4 | ly) — any consistent cell id works
    # unique (key_hi, key_lo, cell)
    trip = (
        kh.astype(np.uint64) << np.uint64(32)
        | kl.astype(np.uint64) << np.uint64(8)
        | cell.astype(np.uint64)
    )[valid]
    uniq_trip = np.unique(trip).size
    runs = np.unique(
        (kh.astype(np.uint64) << np.uint64(32) | kl.astype(np.uint64))[valid]
    ).size
    print(
        f"segments={n} runs={runs} unique(run,cell)={uniq_trip} "
        f"dup_factor={n/uniq_trip:.2f} cells/run={uniq_trip/runs:.1f}"
    )


if __name__ == "__main__":
    main()
