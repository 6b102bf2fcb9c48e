"""Capability envelope, measured on the real chip — round-5 VERDICT item 7.

`consts.py` mirrors the reference's format limits (65536 x 32768 max
render target, 2^21 - 1 layers, `consts.rs:25-26,106-116`).  Those are
BIT-LAYOUT limits; the practical single-chip envelope is bounded by HBM
(the paint fold holds the frame as f32 [tiles, 1024] plus transposed
copies) and by the live style-slot count (beyond the packed-key budget
the pipeline falls back to the two-key sort).  This probe measures both:

  1. Max dimensions: renders a real scene at 4096^2, 8192^2, then
     16384 x 8192, recording wall time and device memory stats until one
     fails to fit.
  2. Wide-key layers, LIVE (no monkeypatch): a composition with more
     distinct layers than the packed u32 key can hold at 1080p
     (row_bits 7 + tx_bits 7 -> slot budget 2^17 = 131072), forcing
     slot_bits == 0 through the REAL renderer entry, and checks the
     frame against the numpy oracle on a crop.

Usage: python tools/envelope_probe.py [--skip-big] [--layers 140000]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import numpy as np

from forma_tpu import Color, Composition, Fill, Func, Order, Point, Props, Style
from forma_tpu.demos import scenes
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer
from forma_tpu.ops import pipeline as _pipe


def _memstats():
    try:
        s = jax.local_devices()[0].memory_stats()
        return f"{s.get('bytes_in_use', 0) / 1e9:.2f} GB in use, peak {s.get('peak_bytes_in_use', 0) / 1e9:.2f} GB"
    except Exception:
        return "n/a"


def big_frames(skip_big=False):
    sizes = [(4096, 4096), (8192, 8192)]
    if not skip_big:
        sizes.append((16384, 8192))
    for w, h in sizes:
        comp = Composition()
        scenes.paris30k(comp, w, h, paths=8000)
        r = Renderer()
        try:
            t0 = time.time()
            frame, d = r.render_device(comp, w, h, Color(1, 1, 1, 1))
            jax.device_get(frame[:8, :8])
            dt = time.time() - t0
            t0 = time.time()
            frame, d = r.render_device(comp, w, h, Color(1, 1, 1, 1))
            jax.device_get(frame[:8, :8])
            dt2 = time.time() - t0
            print(
                f"{w}x{h}: OK, first {dt:.1f}s, warm {dt2 * 1e3:.0f} ms, "
                f"segs={int(d[_pipe.DIAG_SEGS])}, mem {_memstats()}"
            )
        except Exception as e:
            print(f"{w}x{h}: FAILED ({type(e).__name__}: {str(e)[:200]})")
            return
        finally:
            del comp, r


def _rect(x0, y0, w, h):
    return (
        PathBuilder()
        .move_to(Point(x0, y0))
        .line_to(Point(x0, y0 + h))
        .line_to(Point(x0 + w, y0 + h))
        .line_to(Point(x0 + w, y0))
        .build()
    )


def wide_key(n_layers=140_000, width=1920, height=1080):
    """More live layers than the packed key holds at 1080p -> two-key path."""
    rows = -(-height // 16)
    tiles_x = -(-width // 16)
    sb = _pipe.slot_bits_for(n_layers, rows, tiles_x)
    print(f"layers={n_layers}: slot_bits={sb} (0 = two-key wide path)")
    comp = Composition()
    t0 = time.time()
    cols = 400
    for i in range(n_layers):
        x = (i % cols) * (width / cols)
        y = ((i // cols) % 350) * 3.0
        layer = comp.get_mut_or_insert_default(Order(i))
        layer.insert(_rect(x, y, 3.5, 2.5))
        layer.set_props(
            Props(
                func=Func.Draw(
                    Style(
                        fill=Fill.Solid(
                            Color((i % 97) / 97, (i % 31) / 31, (i % 7) / 7, 0.9)
                        )
                    )
                )
            )
        )
    print(f"composed {n_layers} layers in {time.time() - t0:.1f}s")
    r = Renderer()
    t0 = time.time()
    frame, d = r.render_device(comp, width, height, Color(1, 1, 1, 1))
    img = np.asarray(frame)[:height, :width]
    print(
        f"rendered in {time.time() - t0:.1f}s, "
        f"runs={int(d[_pipe.DIAG_RUNS])}, k={int(d[_pipe.DIAG_K])}, "
        f"segs={int(d[_pipe.DIAG_SEGS])}, mem {_memstats()}"
    )
    # Oracle check on a crop (full-oracle at 140k layers is minutes).
    from forma_tpu.backend_numpy import render as oracle

    crop_comp = Composition()
    for i in range(0, 2000):
        x = (i % cols) * (width / cols)
        y = ((i // cols) % 350) * 3.0
        layer = crop_comp.get_mut_or_insert_default(Order(i))
        layer.insert(_rect(x, y, 3.5, 2.5))
        layer.set_props(
            Props(
                func=Func.Draw(
                    Style(
                        fill=Fill.Solid(
                            Color((i % 97) / 97, (i % 31) / 31, (i % 7) / 7, 0.9)
                        )
                    )
                )
            )
        )
    want = oracle(crop_comp, 64, 16, clear_color=Color(1, 1, 1, 1))
    # Rows y < 15 are painted ONLY by layers with (i//cols) % 350 <= 4,
    # i.e. i < 2000 under this lattice — so the 2000-layer oracle strip is
    # EXACT for the full 140k-layer scene there.
    got = img[:15, :64]
    diff = np.abs(want.astype(int)[:15, :64] - got.astype(int)).max()
    print(f"top-left strip vs oracle (exact, <=1 expected): max diff {diff}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-big", action="store_true")
    ap.add_argument("--layers", type=int, default=140_000)
    a = ap.parse_args()
    big_frames(a.skip_big)
    wide_key(a.layers)
