"""Benchmark: paris-30k-style city map at 1080p on the default device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): the reference's north-star target of 60 FPS at 1080p
on one v5e chip; vs_baseline = fps / 60.

The reference's paris-30k.svg asset is not distributed; the scene is a
deterministic synthesized equivalent (~30k paths: buildings, roads, parks;
see forma_tpu/demos/scenes.py).

Flags: --paths N, --frames N, --width/--height, --scene {paris,circles},
--animate (per-frame full-scene transform changes: re-sort + repaint stress).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scene", default="paris", choices=["paris", "circles"])
    ap.add_argument("--animate", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax

    import forma_tpu
    from forma_tpu import AffineTransform, Color, Composition

    forma_tpu.enable_compilation_cache()
    from forma_tpu.demos import scenes
    from forma_tpu.renderer import Renderer

    t0 = time.time()
    comp = Composition()
    if args.scene == "paris":
        scenes.paris30k(comp, args.width, args.height, paths=args.paths)
    else:
        scenes.circles(comp, args.paths, args.width, args.height)
    build_s = time.time() - t0

    renderer = Renderer()
    clear = Color(1.0, 1.0, 1.0, 1.0)

    # Warm up: compile + capacity growth.
    t0 = time.time()
    frame, diag = renderer.render_device(comp, args.width, args.height, clear)
    jax.block_until_ready(frame)
    warm_s = time.time() - t0
    if args.verbose:
        print(
            f"# build {build_s:.1f}s warmup {warm_s:.1f}s "
            f"segments={diag[0]} runs={diag[1]} virtual={diag[2]} k={diag[3]} "
            f"caps={renderer._caps}",
            file=sys.stderr,
        )

    if args.animate:
        # Per-frame transform mutation forces full re-sort + repaint.
        sc = 0.9999
        for layer in comp.layers.values():
            pass

    t0 = time.time()
    n = args.frames
    for i in range(n):
        if args.animate:
            a = 0.0005 * (i + 1)
            t = AffineTransform(
                ux=math.cos(a) * 0.999,
                uy=math.sin(a) * 0.999,
                vx=-math.sin(a) * 0.999,
                vy=math.cos(a) * 0.999,
            )
            for layer in comp.layers.values():
                layer.set_transform(t)
        frame, diag = renderer.render_device(comp, args.width, args.height, clear)
    jax.block_until_ready(frame)
    dt = time.time() - t0
    fps = n / dt

    segs_per_s = float(diag[0]) * fps
    if args.verbose:
        print(
            f"# {fps:.2f} FPS, {dt / n * 1000:.1f} ms/frame, "
            f"{segs_per_s / 1e6:.1f} M pixel-segments/s",
            file=sys.stderr,
        )

    name = "paris30k" if args.scene == "paris" else f"circles{args.paths}"
    suffix = "_animated" if args.animate else ""
    print(
        json.dumps(
            {
                "metric": f"{name}_{args.width}x{args.height}{suffix}_fps",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
