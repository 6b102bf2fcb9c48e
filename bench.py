"""Benchmark: the BASELINE.md config matrix on the default device.

Default (no --scene): runs the full suite — one JSON line per config, the
headline paris-30k@1080p line LAST (the driver parses the final line):

  solid256           single solid-fill path at 256x256 (dispatch floor)
  styled 1080p       multi-layer gradient + blend-mode city scene
  texture 1080p      texture-atlas-filled buildings at paris scale
  svgparse 1080p     the paris scene serialized to SVG markup and run
                     through the full parser (demos/svg.py) before rendering
  spaceship          damage-cached incremental animation
  paris 4K animated  per-frame rotation at 3840x2160 (re-sort + repaint)
  paris 1080p anim   per-frame rotation at 1920x1080
  paris 1080p        the headline config (vs the 60 FPS north star)

Isolation: the suite runs every config (and the golden check) in its OWN
subprocess.  Round 4's driver run measured the 4K config 4.5x below its
standalone number because earlier configs' live device allocations and
compiled executables degraded it in-process (HBM pressure: 4K holds a
~530 MB framebuffer next to 8.9M-slot buffers); a fresh process per config
makes every suite number reproduce its standalone measurement.

With --scene X, runs that one config in-process (A/B workflows).  Baseline
(BASELINE.md): the reference's north-star target of 60 FPS at 1080p on one
v5e chip; vs_baseline = fps / 60 for every config.

The reference's paris-30k.svg asset is not distributed; the scene is a
deterministic synthesized equivalent (~30k paths: buildings, roads, parks;
see forma_tpu/demos/scenes.py).

Timing methodology: frames dispatch back-to-back WITHOUT per-frame host
fences (on this TPU stack a host round-trip costs ~28 ms and
`block_until_ready` is unreliable); the clock stops on a `device_get` of the
last frame's pixels, and every frame's diagnostics are fetched afterwards
to assert no capacity bucket overflowed mid-run (a silent overflow would
drop segments and fake speed).

Bit-exactness guard: unless --no-verify, the run first renders every
reference golden scene on the SAME device and compares against the goldens
(tolerance 8/255, `e2e-tests/tests/test_env.rs:278`); the headline JSON line
carries "goldens_ok".  A perf change that corrupts output flips goldens_ok
to false instead of showing up as a speedup (two round-2 optimizations
failed exactly this way; see docs/ARCHITECTURE.md).

Flags: --scene {paris,styled,circles,spaceship,solid}, --paths N, --frames N,
--width/--height, --animate, --shard N, --trace DIR, --no-verify.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time


def verify_goldens() -> tuple:
    """Renders the reference golden scenes on the default device; returns
    (num_passed, num_total, max_diff).  `max_diff` is the measured maximum
    per-channel difference across every golden — the pass criterion is the
    reference's own e2e tolerance (<= 8/255 per channel,
    `e2e-tests/tests/test_env.rs:278`), NOT byte identity; reporting the
    measured number keeps the claim checkable.  Uses the same scene registry
    as the test suite (tests/e2e_scenes.py)."""
    import numpy as np

    from forma_tpu import Color, Composition
    from forma_tpu.renderer import Renderer

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    import e2e_scenes as S

    goldens = os.environ.get(
        "FORMA_REFERENCE_EXPECTED", "/root/reference/e2e-tests/expected"
    )
    clear = Color(1.0, 1.0, 1.0, 0.0)
    renderer = Renderer()
    n_pass = n_total = max_diff = 0
    try:
        from PIL import Image as PILImage
    except ImportError:
        return 0, 0, 0
    for name, scene in S.all_scenes():
        path = os.path.join(goldens, f"{name}.png")
        if not os.path.exists(path):
            continue
        expected = np.asarray(PILImage.open(path).convert("RGBA"))
        comp = Composition()
        scene(comp)
        actual = renderer.render(comp, 64, 64, clear_color=clear)
        diff = np.abs(actual.astype(int) - expected.astype(int))
        max_diff = max(max_diff, int(diff.max()))
        bad = int((diff.max(axis=-1) > 8).sum())
        n_total += 1
        if bad == 0:
            n_pass += 1
        else:
            print(f"# GOLDEN FAIL {name}: {bad} bad pixels", file=sys.stderr)
    return n_pass, n_total, max_diff


def bench_spaceship(width, height, frames, verbose=False) -> dict:
    """Damaged-tile animation config (BASELINE.md): per-frame transform/
    order mutations through the CACHED path, fetching pixels into a host
    buffer every frame — the incremental-update workload the reference's
    spaceship demo showcases."""
    import numpy as np

    from forma_tpu import Buffer, Color, Composition, LinearLayout
    from forma_tpu.demos.spaceship import Spaceship
    from forma_tpu.renderer import Renderer

    comp = Composition()
    ship = Spaceship(width=width, height=height)
    ship.build(comp)
    renderer = Renderer()
    cache = renderer.create_buffer_layer_cache()
    backing = np.zeros((height, width * 4), np.uint8)
    buf = Buffer(
        buffer=backing,
        layout=LinearLayout(width, width * 4, height),
        layer_cache=cache,
    )
    clear = Color(0.02, 0.02, 0.08, 1.0)
    t0 = time.time()
    for _ in range(3):  # warm: compile + caps + cache priming
        ship.step()
        renderer.render_into(comp, buf, clear)
    warm_s = time.time() - t0
    # Pipelined damage readback: frame i's host fetch (~28 ms round-trip
    # floor on the bench tunnel) overlaps frame i+1's dispatch; every
    # frame's damaged tiles still land in the host buffer (one frame
    # late), and the flush completes the tail inside the timed region.
    # Pixel output is byte-identical to the synchronous path
    # (tests/test_pipelined_readback.py).
    t0 = time.time()
    for _ in range(frames):
        ship.step()
        renderer.render_into(comp, buf, clear, pipelined=True)
    renderer.flush_pending()
    dt = time.time() - t0
    fps = frames / dt
    return {
        "metric": f"spaceship_{width}x{height}_damage_cached_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 4),
        "warmup_s": round(warm_s, 1),
    }


def bench_scene(
    scene, width, height, frames, paths=30000, animate=False, shard=0,
    trace=None, verbose=False,
) -> dict:
    """Full-repaint pipeline configs: paris / styled / circles / solid."""
    import jax
    import numpy as np

    from forma_tpu import Color, Composition
    from forma_tpu.demos import scenes
    from forma_tpu.ops import pipeline as pipe
    from forma_tpu.renderer import Renderer

    t0 = time.time()
    comp = Composition()
    if scene == "paris":
        scenes.paris30k(comp, width, height, paths=paths)
    elif scene == "styled":
        scenes.paris30k_styled(comp, width, height, paths=paths)
    elif scene == "texture":
        scenes.paris30k_textured(comp, width, height, paths=paths)
    elif scene == "svgparse":
        # End-to-end parsed-SVG config: serialize the paris scene to SVG
        # markup and run it through the full parser (demos/svg.py) before
        # rendering — the reference's actual svg-demo input path.
        from forma_tpu.demos.svg import Svg

        Svg(scenes.paris30k_svg_text(width, height, paths=paths)).compose(comp)
    elif scene == "solid":
        # BASELINE.md's "single solid-fill path" config: one 256x256 black
        # square — measures the pipeline dispatch floor.
        from forma_tpu import Fill, Func, Order, PathBuilder, Point, Props, Style

        sq = (
            PathBuilder()
            .move_to(Point(16.0, 16.0))
            .line_to(Point(16.0, float(height - 16)))
            .line_to(Point(float(width - 16), float(height - 16)))
            .line_to(Point(float(width - 16), 16.0))
            .build()
        )
        comp.get_mut_or_insert_default(Order(0)).insert(sq).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 0, 1)))))
        )
    else:
        scenes.circles(comp, paths, width, height)
    build_s = time.time() - t0

    renderer = Renderer()
    clear = Color(1.0, 1.0, 1.0, 1.0)

    orders = np.asarray([o.as_u32() for o in comp.layers], np.uint32)

    def frame_transform(i):
        a = 0.0005 * (i + 1)
        row = np.asarray(
            [
                math.cos(a) * 0.999,
                math.sin(a) * 0.999,
                -math.sin(a) * 0.999,
                math.cos(a) * 0.999,
                0.0,
                0.0,
            ],
            np.float32,
        )
        return np.tile(row, (len(orders), 1))

    # Warm up: compile + capacity growth (including the animated extremes so
    # steady-state frames never regrow).
    t0 = time.time()
    frame, diag = renderer.render_device(comp, width, height, clear)
    if animate:
        comp.set_transforms(orders, frame_transform(frames - 1))
        frame, diag = renderer.render_device(comp, width, height, clear)
        comp.set_transforms(orders, frame_transform(0))
        frame, diag = renderer.render_device(comp, width, height, clear)
    if shard:
        frame, diag = renderer.render_device_sharded(
            comp, width, height, clear, n_shards=shard
        )
    jax.device_get(diag)
    warm_s = time.time() - t0
    if verbose:
        print(
            f"# build {build_s:.1f}s warmup {warm_s:.1f}s "
            f"vlines={diag[pipe.DIAG_VLINES]} runs={diag[pipe.DIAG_RUNS]} "
            f"virtual={diag[pipe.DIAG_VIRT]} k={diag[pipe.DIAG_K]} "
            f"segments={diag[pipe.DIAG_SEGS]} caps={renderer._caps}",
            file=sys.stderr,
        )

    caps = renderer._caps
    n = frames
    regrows = 0
    import contextlib

    for _attempt in range(3):
        trace_cm = (
            jax.profiler.trace(trace)
            if trace and _attempt == 0
            else contextlib.nullcontext()
        )
        diags = []
        t0 = time.time()
        with trace_cm:
            for i in range(n):
                if animate:
                    comp.set_transforms(orders, frame_transform(i))
                if shard:
                    frame, diag = renderer.render_device_sharded(
                        comp, width, height, clear,
                        n_shards=shard, check_caps=False,
                    )
                else:
                    frame, diag = renderer.render_device(
                        comp, width, height, clear, check_caps=False
                    )
                diags.append(diag)
            # Fence on actual pixels of the last frame.
            jax.device_get(frame[0, 0])
        dt = time.time() - t0
        # Validate: no frame overflowed its capacity buckets.
        ds = np.stack([np.asarray(d) for d in diags])
        ok = (
            (ds[:, pipe.DIAG_VLINES] <= caps.vline).all()
            and (ds[:, pipe.DIAG_RUNS] <= caps.run).all()
            and (ds[:, pipe.DIAG_VIRT] <= caps.virt).all()
            and (ds[:, pipe.DIAG_K] <= caps.k).all()
        )
        if ok:
            break
        # Grow to the observed maxima and re-time.
        regrows += 1
        renderer.render_device(comp, width, height, clear)
        caps = renderer._caps
        if verbose:
            print(f"# capacity regrew to {caps}; re-timing", file=sys.stderr)

    fps = n / dt
    segs_per_s = float(ds[-1, pipe.DIAG_SEGS]) * fps
    if verbose:
        print(
            f"# {fps:.2f} FPS, {dt / n * 1000:.1f} ms/frame, "
            f"{segs_per_s / 1e6:.1f} M pixel-segments/s",
            file=sys.stderr,
        )

    names = {
        "paris": "paris30k",
        "styled": "paris30k_styled",
        "texture": "paris30k_textured",
        "svgparse": "paris30k_svgparse",
        "solid": "solid1",
        "circles": f"circles{paths}",
    }
    suffix = "_animated" if animate else ""
    if shard:
        suffix += f"_shard{shard}"
    return {
        "metric": f"{names[scene]}_{width}x{height}{suffix}_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 4),
        "segments_per_s": round(segs_per_s),
        "warmup_s": round(warm_s, 1),
        "regrows": regrows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument(
        "--scene", default=None,
        choices=[
            "paris", "styled", "texture", "svgparse", "circles", "spaceship",
            "solid",
        ],
        help="run ONE config; default runs the whole BASELINE.md suite",
    )
    ap.add_argument(
        "--goldens-only", action="store_true",
        help="run only the golden check; print one JSON result line",
    )
    ap.add_argument("--animate", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed frames into DIR",
    )
    ap.add_argument(
        "--no-verify", action="store_true",
        help="skip the golden bit-exactness check before timing",
    )
    ap.add_argument(
        "--shard", type=int, default=0, metavar="N",
        help="shard the framebuffer by tile rows over an N-device mesh "
        "(requires >= N JAX devices; see conftest for the virtual CPU mesh)",
    )
    args = ap.parse_args()

    if args.scene is None and not args.goldens_only:
        return run_suite(args)

    import forma_tpu

    forma_tpu.enable_compilation_cache()

    if args.goldens_only:
        t0 = time.time()
        n_pass, n_total, max_diff = verify_goldens()
        print(
            json.dumps(
                {
                    "goldens_pass": n_pass,
                    "goldens_total": n_total,
                    "goldens_max_diff": max_diff,
                    "goldens_s": round(time.time() - t0, 1),
                }
            )
        )
        return

    goldens_ok = None
    goldens_max_diff = None
    if not args.no_verify:
        t0 = time.time()
        n_pass, n_total, goldens_max_diff = verify_goldens()
        goldens_ok = bool(n_total > 0 and n_pass == n_total)
        print(
            f"# goldens: {n_pass}/{n_total} within tol 8/255 "
            f"(measured max channel diff {goldens_max_diff}) in "
            f"{time.time()-t0:.1f}s",
            file=sys.stderr,
        )

    if args.scene == "spaceship":
        out = bench_spaceship(args.width, args.height, args.frames, args.verbose)
    else:
        out = bench_scene(
            args.scene, args.width, args.height, args.frames,
            paths=args.paths, animate=args.animate, shard=args.shard,
            trace=args.trace, verbose=args.verbose,
        )
    if goldens_ok is not None:
        out["goldens_ok"] = goldens_ok
        out["goldens_max_diff"] = goldens_max_diff
    print(json.dumps(out))


def run_suite(args):
    """BASELINE.md config matrix, one SUBPROCESS per config (+ one for the
    golden check) so configs cannot perturb each other — see the module
    docstring.  Emits each child's JSON line as it completes; headline last,
    annotated with the golden-check result."""
    import subprocess

    me = os.path.abspath(__file__)

    def child(extra):
        cmd = [sys.executable, me] + extra
        if args.verbose:
            cmd.append("--verbose")
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.stderr:
            sys.stderr.write(r.stderr)
            sys.stderr.flush()
        lines = [ln for ln in r.stdout.splitlines() if ln.strip()]
        if r.returncode != 0 or not lines:
            print(f"# SUITE CHILD FAILED ({' '.join(extra)}): rc={r.returncode}",
                  file=sys.stderr)
            return None
        return json.loads(lines[-1])

    gold = None
    if not args.no_verify:
        gold = child(["--goldens-only"])
        if gold is not None:
            print(
                f"# goldens: {gold['goldens_pass']}/{gold['goldens_total']} "
                f"within tol 8/255 (measured max channel diff "
                f"{gold['goldens_max_diff']}) in {gold['goldens_s']}s",
                file=sys.stderr,
            )

    common = [
        "--frames", str(args.frames), "--paths", str(args.paths), "--no-verify",
    ]
    configs = [
        ["--scene", "solid", "--width", "256", "--height", "256"],
        ["--scene", "styled", "--width", "1920", "--height", "1080"],
        ["--scene", "texture", "--width", "1920", "--height", "1080"],
        ["--scene", "svgparse", "--width", "1920", "--height", "1080"],
        ["--scene", "spaceship", "--width", "1920", "--height", "1080"],
        ["--scene", "paris", "--width", "3840", "--height", "2160", "--animate"],
        ["--scene", "paris", "--width", "1920", "--height", "1080", "--animate"],
        ["--scene", "paris", "--width", "1920", "--height", "1080"],  # headline
    ]
    failed = False
    for i, cfg in enumerate(configs):
        out = child(cfg + common)
        if out is None:
            failed = True
            continue
        if i == len(configs) - 1 and gold is not None:
            out["goldens_ok"] = bool(
                gold["goldens_total"] > 0
                and gold["goldens_pass"] == gold["goldens_total"]
            )
            out["goldens_max_diff"] = gold["goldens_max_diff"]
        print(json.dumps(out), flush=True)
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
