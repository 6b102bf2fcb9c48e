"""Per-stage timing of the device pipeline on the current JAX device.

Thin CLI over `forma_tpu.profiling.profile_frame` (the `gpu::Timings`
analog).  Every number includes the dispatch round-trip floor, printed
first.

Usage: python tools/profile_stages.py [--paths N] [--width W] [--height H]
"""

import argparse
import sys

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

from forma_tpu import Color, Composition
from forma_tpu.demos import scenes
from forma_tpu.profiling import profile_frame
from forma_tpu.renderer import Renderer


def main(paths=2000, width=1920, height=1080):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    r = Renderer()
    t = profile_frame(r, comp, width, height, Color(1, 1, 1, 1))
    print(f"caps: {r._caps}  k_active={t.k_active}")
    for name in ("line_setup", "rasterize_sort", "runs", "units", "cull",
                 "paint", "srgb", "fused_frame"):
        print(f"{name:<16} {getattr(t, name):8.2f} ms")
    print(f"(dispatch floor ~{t.dispatch_floor_ms:.1f} ms included in each)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=2000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()
    main(paths=args.paths, width=args.width, height=args.height)
