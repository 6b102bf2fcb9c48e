"""Validates + times the Pallas grid-build kernel against the XLA scatter
it replaces, at the real paris shape (8.4M slots, ~300k runs).

Usage: python tools/pallas_grid_probe.py [--small]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def make_data(N, R, NV, seed=0):
    """Synthetic run-sorted segment stream shaped like paris."""
    rng = np.random.default_rng(seed)
    run_len = rng.geometric(1.0 / 23.0, size=R)
    rid = np.repeat(np.arange(R), run_len)[:NV]
    n_real_runs = int(rid[-1]) + 1
    # padding: one extra "sentinel run" like the real pipeline's clamp
    rid = np.concatenate([rid, np.full(N - NV, min(n_real_runs, R - 1))])
    cell = rng.integers(0, 256, size=N).astype(np.int32)
    area = rng.integers(-512, 512, size=N).astype(np.int32)
    cover = rng.integers(-16, 17, size=N).astype(np.int32)
    area[NV:] = 0
    cover[NV:] = 0
    return (
        jnp.asarray(rid, jnp.int32),
        jnp.asarray(cell),
        jnp.asarray(area),
        jnp.asarray(cover),
        n_real_runs,
    )


def main():
    small = "--small" in sys.argv
    interp = "--interpret" in sys.argv
    if small:
        N, R, NV = 1 << 13, 300, 6000
    else:
        N, R, NV = 1 << 23, 311296, 6_785_481

    import forma_tpu

    forma_tpu.enable_compilation_cache()
    from forma_tpu.ops import grid_pallas

    rid, cell, area, cover, n_runs = make_data(N, R, NV)
    print(f"N={N} R={R} valid={NV} real_runs={n_runs}")

    @jax.jit
    def xla_grid(rid, cell, area, cover):
        val = area * 65536 + cover
        return (
            jnp.zeros((R, 256), jnp.int32)
            .at[rid, cell]
            .add(val, mode="drop")
        )

    t0 = time.time()
    ref = np.asarray(jax.device_get(xla_grid(rid, cell, area, cover)))
    print(f"xla compile+run {time.time()-t0:.1f}s")

    fn = grid_pallas.grid_build_pallas
    if interp:
        import functools

        fn = functools.partial(grid_pallas.grid_build_pallas, interpret=True)
    t0 = time.time()
    got_pad = np.asarray(
        jax.device_get(fn(rid, cell, area, cover, run_cap=R)[0])
    )
    print(f"pallas compile+run {time.time()-t0:.1f}s")
    got = got_pad[:R]

    # Rows beyond the last run id are uninitialized in the pallas output.
    ok_rows = n_runs + 1 if n_runs < R else R
    if np.array_equal(got[:ok_rows], ref[:ok_rows]):
        print(f"MATCH on {ok_rows} rows")
    else:
        bad = np.argwhere(got[:ok_rows] != ref[:ok_rows])
        print(f"MISMATCH: {len(bad)} cells; first 10:\n{bad[:10]}")
        for r, c in bad[:5]:
            print(f"  row {r} cell {c}: got {got[r, c]} want {ref[r, c]}")
        sys.exit(1)

    # Timing.
    def timeit(name, f, *args, reps=5):
        jf = jax.jit(f) if not hasattr(f, "lower") else f
        jax.device_get(jf(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(jf(*args))
            ts.append(time.time() - t0)
        print(f"{name:50s} {min(ts)*1e3:9.2f} ms")

    # Run-key emission (replaces the blocked-compaction key extraction in
    # runs.run_data): per-run (key_hi, key_lo) selected from the run's
    # first segment.
    rng = np.random.default_rng(1)
    kh_of_run = rng.integers(0, 2**32, size=R, dtype=np.uint32)
    kl_of_run = rng.integers(0, 2**32, size=R, dtype=np.uint32)
    kh_of_run[min(n_runs, R - 1)] = 0xFFFFFFFF  # sentinel run
    rid_np = np.asarray(rid)
    key_hi = jnp.asarray(kh_of_run[rid_np])
    key_lo = jnp.asarray(kl_of_run[rid_np])
    runkeys = np.asarray(
        jax.device_get(
            fn(rid, cell, area, cover, run_cap=R,
               key_hi=key_hi, key_lo=key_lo)[2]
        )
    )[:ok_rows]
    if np.array_equal(runkeys[:, 0], kh_of_run[:ok_rows]) and np.array_equal(
        runkeys[:, 1], kl_of_run[:ok_rows]
    ):
        print(f"KEYS MATCH on {ok_rows} rows")
    else:
        bad = np.argwhere(
            (runkeys[:, 0] != kh_of_run[:ok_rows])
            | (runkeys[:, 1] != kl_of_run[:ok_rows])
        )
        print(f"KEYS MISMATCH: {len(bad)} runs; first 10: {bad[:10].ravel()}")
        sys.exit(1)

    # Fetch only a checksum — fetching the 318 MB grid itself costs seconds
    # through the tunnel and is not part of the frame (the grid stays on
    # device).
    timeit(
        "xla scatter grid (checksum fetch)",
        lambda a, b, c, d: xla_grid(a, b, c, d).sum(dtype=jnp.int32)[None],
        rid, cell, area, cover,
    )
    timeit(
        "pallas grid kernel (checksum fetch)",
        lambda a, b, c, d: fn(a, b, c, d, run_cap=R)[0][:R].sum(
            dtype=jnp.int32
        )[None],
        rid, cell, area, cover,
    )
    timeit(
        "pallas grid kernel + run keys (checksum fetch)",
        lambda a, b, c, d, kh, kl: fn(
            a, b, c, d, run_cap=R, key_hi=kh, key_lo=kl
        )[0][:R].sum(dtype=jnp.int32)[None],
        rid, cell, area, cover, key_hi, key_lo,
    )


if __name__ == "__main__":
    main()
