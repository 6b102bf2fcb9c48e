"""Cost of building the padded k-major unit stream (paint kernel v2 prep).

Candidates:
  A. row-scatter: scatter 345k x 384-lane rows into a zeroed [460k, 384]
  B. composed gather: 460k-index gathers (small-table index lookup + two
     row gathers by composed indices)
  C. the v1 dense gathers (unit-order) as the baseline

Usage: python tools/stream_build_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

U = 345_000 // 8 * 8
S = 460_800  # padded stream rows
R = 311_296
T8 = 8160
W = 384


def bench(name, fn, *args, iters=3, warmup=1):
    f = jax.jit(fn)
    t0 = time.time()
    jax.device_get(f(*args))
    compile_s = time.time() - t0
    for _ in range(warmup):
        jax.device_get(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.device_get(f(*args))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name:52s} {best * 1e3:9.3f} ms  (compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    rows = jax.random.randint(key, (U, W), -1000, 1000, dtype=jnp.int32)
    pos = jnp.sort(jax.random.randint(key, (U,), 0, S, dtype=jnp.int32))
    grid = jax.random.randint(key, (R, 256), -1000, 1000, dtype=jnp.int32)
    src_u = jnp.sort(jax.random.randint(key, (U,), 0, R, dtype=jnp.int32))
    small_tab = jax.random.randint(key, (T8,), 0, U, dtype=jnp.int32)
    tile_j = jax.random.randint(key, (S,), 0, T8, dtype=jnp.int32)

    bench(
        "A: scatter 345k x 384-lane rows -> [460k, 384]",
        lambda rows, pos: jnp.zeros((S, W), jnp.int32).at[pos].set(rows, mode="drop").sum(),
        rows, pos,
    )
    bench(
        "B1: gather small [T8] table at 460k indices",
        lambda tab, tj: (tab[tj]).sum(),
        small_tab, tile_j,
    )
    bench(
        "B2: gather grid rows at 460k indices",
        lambda grid, tj: grid[jnp.minimum(tj, R - 1)].sum(),
        grid, tile_j,
    )
    bench(
        "C: gather grid rows at 345k indices (v1)",
        lambda grid, s: grid[s].sum(),
        grid, src_u,
    )
    bench(
        "C2: scatter 345k scalars -> [460k]",
        lambda pos, s: jnp.zeros((S,), jnp.int32).at[pos].set(s, mode="drop").sum(),
        pos, src_u,
    )


if __name__ == "__main__":
    main()
