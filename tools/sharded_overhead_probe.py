"""Wall-clock under the multi-chip claim — round-5 VERDICT item 6.

The 60 FPS projection for `render_frame_sharded_lines` at N=8 rests on
work-count scaling measured on a virtual CPU mesh; this probe puts real
wall-clock under the one piece measurable on ONE chip: the exchange
machinery's overhead.  It times, on the real TPU over a 1-device mesh:

  A. `render_frame` (the shipped single-chip fused frame), pipelined
     20-frame batches, host fence at the end — the bench methodology;
  B. `render_frame_sharded_lines` at N=1 — same program PLUS the band
     slicing, per-destination block packing, all_to_all (self-loop at
     N=1), row re-bias and the second (received-segment) sort.

It also reports the exchange volume: bytes/frame = N^2 * xcap * 8 (keys +
payloads at 4 B each, every (src, dst) block padded to xcap), the actual
max block population (DIAG_XPAIR) and the received-population skew
(DIAG_XRECV vs ideal S/N) — the numbers the N=8 projection needs error
bars on.

Usage: python tools/sharded_overhead_probe.py [--paths 30000] [--frames 20]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import numpy as np

from forma_tpu import Color, Composition
from forma_tpu.demos import scenes
from forma_tpu.renderer import Renderer
from forma_tpu.ops import pipeline as _pipe


def main(paths=30000, width=1920, height=1080, frames=20):
    comp = Composition()
    scenes.paris30k(comp, width, height, paths=paths)
    clear = Color(1, 1, 1, 1)

    r = Renderer()

    # A: shipped single-chip path, bench methodology (no per-frame fence).
    frame, d = r.render_device(comp, width, height, clear)
    jax.device_get(frame[:8, :8])
    t0 = time.perf_counter()
    for _ in range(frames):
        frame, diag = r.render_device(
            comp, width, height, clear, check_caps=False
        )
    jax.device_get(frame[:8, :8])
    ms_single = (time.perf_counter() - t0) / frames * 1e3
    print(f"render_frame single-chip:        {ms_single:8.2f} ms/frame")

    # B: line-sharded path on a 1-device mesh (real chip).
    frame, d = r.render_device_sharded_lines(comp, width, height, clear, n_shards=1)
    jax.device_get(frame[:8, :8])
    t0 = time.perf_counter()
    for _ in range(frames):
        frame, diag = r.render_device_sharded_lines(
            comp, width, height, clear, n_shards=1, check_caps=False
        )
    jax.device_get(frame[:8, :8])
    ms_lines = (time.perf_counter() - t0) / frames * 1e3
    d = np.asarray(jax.device_get(diag))
    n = 1
    xcap = r._xcap
    xbytes = n * n * xcap * 8
    segs = int(d[_pipe.DIAG_SEGS])
    print(f"sharded_lines N=1:               {ms_lines:8.2f} ms/frame")
    print(
        f"overhead: {ms_lines - ms_single:+.2f} ms "
        f"({(ms_lines / ms_single - 1) * 100:+.1f}%)"
    )
    print(
        f"exchange: xcap={xcap} blocks -> {xbytes / 1e6:.2f} MB/frame "
        f"at N=1 ({n * n} blocks); scaling N^2*xcap*8:"
    )
    for N in (2, 4, 8):
        # xcap shrinks ~1/N with per-shard segment counts (measured receive
        # skew <= 18% at N=8, docs/ARCHITECTURE.md scaling table).
        xc = max(128 * (-(-xcap // (N * 128))), 1024)
        print(f"  N={N}: ~{N * N * xc * 8 / 1e6:.2f} MB/frame over ICI")
    print(
        f"diag: XPAIR={int(d[_pipe.DIAG_XPAIR])} (vs xcap {xcap}), "
        f"XRECV={int(d[_pipe.DIAG_XRECV])} (ideal S/N = {segs // n}), "
        f"segs={segs}"
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=20)
    a = ap.parse_args()
    main(a.paths, a.width, a.height, a.frames)
