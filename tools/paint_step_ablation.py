"""Ablate the wave-fold step to attribute its ~1 ms/step cost at p=8192.

Components: grid row gather, carry/fill row gathers, unpack+prefix+coverage
math, blend math, the fori loop carry itself.  Each variant removes one
piece; the deltas say what to attack.

Usage: python tools/paint_step_ablation.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

T = 8192
D = 40
RUN_CAP = 1 << 18
PDW = 32
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
    print(f"{name:44s} {best * 1e3:9.3f} ms  ({best * 1e3 / D:6.3f} ms/step, compile {compile_s:.1f}s)", flush=True)
    return best


def coverage(da):
    recip = jnp.float32(1.0 / PDA)
    return jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)


def make_fold(gather_grid, gather_meta, do_prefix, do_blend):
    def fold(grid, table, carry, fills):
        dst = tuple(jnp.zeros((T, 16, 16), jnp.float32) for _ in range(4))

        def step(k, dst):
            u = jax.lax.dynamic_index_in_dim(table, k, axis=0, keepdims=False)
            if gather_grid:
                g = grid[u]
            else:
                g = jax.lax.dynamic_slice_in_dim(grid, 0, T, axis=0)
            cover = (g << 16) >> 16
            area = (g - cover) >> 16
            area = area.reshape(T, 16, 16)
            cover = cover.reshape(T, 16, 16)
            if gather_meta:
                cr = carry[u]
                f = fills[u]
            else:
                cr = jax.lax.dynamic_slice_in_dim(carry, 0, T, axis=0)
                f = jax.lax.dynamic_slice_in_dim(fills, 0, T, axis=0)
            if do_prefix:
                exc = jnp.cumsum(cover, axis=2) - cover
                acc = cr[:, :, None] + exc
                da = PDW * acc + area
                cov = coverage(da)
            else:
                cov = (area + cr[:, :, None]).astype(jnp.float32) * (1.0 / PDA)
            src_a = f[:, 3][:, None, None] * cov
            if do_blend:
                inv = 1.0 - src_a
                return tuple(
                    dst[ch] * inv + f[:, ch][:, None, None] * src_a
                    for ch in range(4)
                )
            return tuple(dst[ch] + src_a for ch in range(4))

        dst = jax.lax.fori_loop(0, D, step, dst)
        return sum(d.sum() for d in dst)

    return fold


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    grid = jax.random.randint(key, (RUN_CAP, 256), -512, 512, dtype=jnp.int32)
    # Monotone-ish table (the real src order is sorted per step).
    table = jnp.sort(
        jax.random.randint(key, (D, T), 0, RUN_CAP, dtype=jnp.int32), axis=1
    )
    carry = jax.random.randint(key, (RUN_CAP, 16), -16, 16, dtype=jnp.int32)
    fills = jax.random.uniform(key, (RUN_CAP, 4), jnp.float32)
    args = (grid, table, carry, fills)

    full = bench("full step", make_fold(1, 1, 1, 1), *args)
    bench("no grid gather (slice)", make_fold(0, 1, 1, 1), *args)
    bench("no meta gathers (slice)", make_fold(1, 0, 1, 1), *args)
    bench("no gathers at all", make_fold(0, 0, 1, 1), *args)
    bench("no prefix/coverage math", make_fold(1, 1, 0, 1), *args)
    bench("no blend (add)", make_fold(1, 1, 1, 0), *args)
    bench("bare loop (slices, no math)", make_fold(0, 0, 0, 0), *args)


if __name__ == "__main__":
    main()
