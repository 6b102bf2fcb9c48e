"""Timing-only sweep of the grid kernel's B (segments/block) and CROWS
(chunk rows) at the real paris shape, with the realistic ~19% sentinel
tail so the sentinel-block skip engages.  Correctness is pinned separately
by tools/pallas_grid_probe.py and tests/test_grid_pallas.py; this sweep
skips the XLA reference compile (minutes through the remote toolchain)
and reports kernel time only.

Usage: FORMA_GRID_B=1024 FORMA_GRID_CROWS=32 python tools/grid_kernel_sweep.py
(one process per config — B/CROWS are read at import).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    N, R, NV = 1 << 23, 311296, 6_785_481
    rng = np.random.default_rng(0)
    run_len = rng.geometric(1.0 / 23.0, size=R)
    rid = np.repeat(np.arange(R), run_len)[:NV]
    n_runs = int(rid[-1]) + 1
    rid = np.concatenate([rid, np.full(N - NV, min(n_runs, R - 1))])
    cell = rng.integers(0, 256, size=N).astype(np.int32)
    area = rng.integers(-512, 512, size=N).astype(np.int32)
    cover = rng.integers(-16, 17, size=N).astype(np.int32)
    area[NV:] = 0
    cover[NV:] = 0
    kh_of_run = rng.integers(0, 2**31, size=R, dtype=np.uint32)
    kl_of_run = rng.integers(0, 2**31, size=R, dtype=np.uint32)
    kh_of_run[min(n_runs, R - 1)] = 0xFFFFFFFF  # sentinel run
    key_hi = jnp.asarray(kh_of_run[rid])
    key_lo = jnp.asarray(kl_of_run[rid])
    rid = jnp.asarray(rid, jnp.int32)
    cell = jnp.asarray(cell)
    area = jnp.asarray(area)
    cover = jnp.asarray(cover)

    from forma_tpu.ops import grid_pallas

    fn = grid_pallas.grid_build_pallas

    @jax.jit
    def timed(rid, cell, area, cover, kh, kl):
        g, rc, rk = fn(rid, cell, area, cover, run_cap=R, key_hi=kh, key_lo=kl)
        return (
            g[:R].sum(dtype=jnp.int32)[None]
            + rc[:R].sum(dtype=jnp.int32)
            + rk[:R].astype(jnp.int32).sum(dtype=jnp.int32)
        )

    t0 = time.time()
    ref = jax.device_get(timed(rid, cell, area, cover, key_hi, key_lo))
    print(f"compile+run {time.time()-t0:.1f}s checksum {int(ref[0])}")
    ts = []
    for _ in range(7):
        t0 = time.time()
        jax.device_get(timed(rid, cell, area, cover, key_hi, key_lo))
        ts.append(time.time() - t0)
    print(
        f"B={grid_pallas.B} CROWS={grid_pallas.CROWS} "
        f"grid+keys kernel: {min(ts)*1e3:.2f} ms (incl dispatch floor)"
    )


if __name__ == "__main__":
    main()
