"""Can XLA fuse C consecutive blend applications into ONE dst pass?

The wave fold's cost is the dst carry round-tripping HBM every k step
(~0.73 ms/step at p=8192 — tools/paint_state_probe.py).  If C sub-steps'
inputs are gathered up front and the C applications are a pure elementwise
chain, XLA could read/write dst once per C steps — an ~C-fold cut in state
traffic.  The earlier FORMA_PAINT=chunk negative entangled this with
roll-based prefix math; this probe isolates JUST the application chain.

Variants:
  base     — C=1: the wave structure (40 dst round trips)
  chunk C  — C=4/8: one fori iteration gathers C grid rows per tile and
             applies C blends; 40/C dst round trips IF fusion happens.

Usage: python tools/paint_chunk_fusion_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

T = 8192
D = 40
RUN_CAP = 1 << 18
PDA = 512


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
    print(f"{name:40s} {best * 1e3:9.3f} ms  ({best * 1e3 / D:6.3f} ms/logical-step, compile {compile_s:.1f}s)", flush=True)
    return best


def coverage(da):
    recip = jnp.float32(1.0 / PDA)
    return jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)


def make_fold(C):
    def fold(grid, table, fills):
        dst = tuple(jnp.zeros((T, 256), jnp.float32) for _ in range(4))

        def step(it, dst):
            # Hoisted gathers for the C sub-steps.
            gs = []
            for c in range(C):
                u = jax.lax.dynamic_index_in_dim(
                    table, it * C + c, axis=0, keepdims=False
                )
                gs.append((grid[u], fills[u]))
            # Pure elementwise application chain.
            for c in range(C):
                g, f = gs[c]
                cov = coverage(g)
                src_a = f[:, 3][:, None] * cov
                inv = 1.0 - src_a
                dst = tuple(
                    dst[ch] * inv + f[:, ch][:, None] * src_a
                    for ch in range(4)
                )
            return dst

        dst = jax.lax.fori_loop(0, D // C, step, dst)
        return sum(d.sum() for d in dst)

    return fold


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    grid = jax.random.randint(key, (RUN_CAP, 256), -512, 512, dtype=jnp.int32)
    table = jnp.sort(
        jax.random.randint(key, (D, T), 0, RUN_CAP, dtype=jnp.int32), axis=1
    )
    fills = jax.random.uniform(key, (RUN_CAP, 4), jnp.float32)

    bench("C=1 (wave structure)", make_fold(1), grid, table, fills)
    bench("C=2", make_fold(2), grid, table, fills)
    bench("C=4", make_fold(4), grid, table, fills)
    bench("C=8", make_fold(8), grid, table, fills)


if __name__ == "__main__":
    main()
