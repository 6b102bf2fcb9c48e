"""Separates per-frame HOST dispatch cost from DEVICE compute in the
pipelined bench loop.

The bench (bench.py) dispatches frames back-to-back and fences once at the
end, so throughput = max(host issue cost, device compute) + pipeline fill.
The per-stage profile subtracts a ~28-35 ms "dispatch floor" measured with a
fenced trivial call — but a FENCED round-trip is latency, not necessarily a
throughput tax.  This probe answers: how much of the 170 ms/frame is host?

  issue_ms   — time to issue N dispatches with NO fetch (pure host path:
               Python renderer host code + jit arg processing + axon RPC
               submit).  If dispatch is async this is the host floor.
  e2e_ms     — issue + final one-element fetch (the bench methodology).
  fenced_ms  — dispatch + full device_get per frame (latency bound).

device compute/frame ~= e2e_ms - max(0, issue overlap); if issue_ms ~=
e2e_ms the loop is HOST-bound and Python/RPC work is the next target.

Usage: python tools/dispatch_overlap_probe.py [--paths 30000] [--frames 20]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=30000)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax

    import forma_tpu
    from forma_tpu import Color, Composition

    forma_tpu.enable_compilation_cache()
    from forma_tpu.demos import scenes
    from forma_tpu.renderer import Renderer

    comp = Composition()
    scenes.paris30k(comp, args.width, args.height, paths=args.paths)
    renderer = Renderer()
    clear = Color(1.0, 1.0, 1.0, 1.0)

    # Warm: compile + caps.
    frame, diag = renderer.render_device(comp, args.width, args.height, clear)
    jax.device_get(diag)

    n = args.frames

    # 1. Pure issue cost (no fetch at all; rely on the next run's fence to
    #    drain).  Run twice, report the second (queue effects).
    for rep in range(2):
        t0 = time.time()
        for _ in range(n):
            frame, diag = renderer.render_device(
                comp, args.width, args.height, clear, check_caps=False
            )
        issue_ms = (time.time() - t0) / n * 1000.0
        jax.device_get(frame[0, 0])  # drain
    print(f"issue_ms   = {issue_ms:8.2f}  (host-side per-frame cost)")

    # 2. Bench methodology: issue all, fence once.
    t0 = time.time()
    for _ in range(n):
        frame, diag = renderer.render_device(
            comp, args.width, args.height, clear, check_caps=False
        )
    jax.device_get(frame[0, 0])
    e2e_ms = (time.time() - t0) / n * 1000.0
    print(f"e2e_ms     = {e2e_ms:8.2f}  (pipelined throughput/frame)")

    # 3. Fully fenced per frame (latency).
    t0 = time.time()
    for _ in range(n):
        frame, diag = renderer.render_device(
            comp, args.width, args.height, clear, check_caps=False
        )
        jax.device_get(frame[0, 0])
    fenced_ms = (time.time() - t0) / n * 1000.0
    print(f"fenced_ms  = {fenced_ms:8.2f}  (per-frame latency incl fence)")

    print(
        f"# host-bound fraction ~ {min(issue_ms / e2e_ms, 1.0):.0%}; "
        f"fence tax ~ {fenced_ms - e2e_ms:.1f} ms"
    )


if __name__ == "__main__":
    main()
