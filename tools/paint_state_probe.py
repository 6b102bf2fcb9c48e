"""Why does the wave step move state at ~100 GB/s when HBM does 800?

Variants isolate the carry structure: 4 separate [T,256] channel arrays vs
one concatenated [T,1024] array vs pure-bandwidth baselines, plus a full
modeled step in concatenated layout.

Usage: python tools/paint_state_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

T = 8192
D = 40
RUN_CAP = 1 << 18
PDA = 512
PDW = 32


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
    gbps = 2 * 4 * T * 1024 * 4 * D / best / 1e9
    print(f"{name:44s} {best * 1e3:9.3f} ms  ({best * 1e3 / D:6.3f} ms/step ~{gbps:5.0f} GB/s-equiv, compile {compile_s:.1f}s)", flush=True)
    return best


def coverage(da):
    recip = jnp.float32(1.0 / PDA)
    return jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)


def fold_4arrays(x):
    dst = tuple(jnp.zeros((T, 256), jnp.float32) for _ in range(4))

    def step(k, dst):
        return tuple(d * 0.999 + 0.001 for d in dst)

    dst = jax.lax.fori_loop(0, D, step, dst)
    return sum(d.sum() for d in dst)


def fold_1array(x):
    dst = jnp.zeros((T, 1024), jnp.float32)

    def step(k, dst):
        return dst * 0.999 + 0.001

    dst = jax.lax.fori_loop(0, D, step, dst)
    return dst.sum()


def fold_1array_4T(x):
    dst = jnp.zeros((4 * T, 256), jnp.float32)

    def step(k, dst):
        return dst * 0.999 + 0.001

    dst = jax.lax.fori_loop(0, D, step, dst)
    return dst.sum()


def fold_full_concat(grid, table, carry, fills):
    """Full modeled step but state is ONE [T, 1024] array (channel-major
    blocks of 256)."""
    dst = jnp.zeros((T, 1024), jnp.float32)
    lane16 = jnp.arange(256, dtype=jnp.int32) % 16

    def step(k, dst):
        u = jax.lax.dynamic_index_in_dim(table, k, axis=0, keepdims=False)
        g = grid[u]
        cover = (g << 16) >> 16
        area = (g - cover) >> 16
        acc = cover
        for s in (1, 2, 4, 8):
            acc = acc + jnp.where(lane16 >= s, jnp.roll(acc, s, axis=-1), 0)
        exc = acc - cover
        cr = jnp.repeat(carry[u], 16, axis=-1)
        da = PDW * (cr + exc) + area
        cov = coverage(da)
        f = fills[u]  # [T, 4]
        src_a = f[:, 3][:, None] * cov  # [T, 256]
        inv = 1.0 - src_a  # [T, 256]
        # fill/alpha terms tiled to [T, 1024]
        fill_cat = jnp.repeat(f, 256, axis=-1)  # [T, 1024]
        src_cat = jnp.tile(src_a, (1, 4))
        inv_cat = jnp.tile(inv, (1, 4))
        return dst * inv_cat + fill_cat * src_cat

    dst = jax.lax.fori_loop(0, D, step, dst)
    return dst.sum()


def main():
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)
    grid = jax.random.randint(key, (RUN_CAP, 256), -512, 512, dtype=jnp.int32)
    table = jnp.sort(
        jax.random.randint(key, (D, T), 0, RUN_CAP, dtype=jnp.int32), axis=1
    )
    carry = jax.random.randint(key, (RUN_CAP, 16), -16, 16, dtype=jnp.int32)
    fills = jax.random.uniform(key, (RUN_CAP, 4), jnp.float32)

    bench("carry 4x[T,256], d*a+b", fold_4arrays, jnp.zeros(1))
    bench("carry 1x[T,1024], d*a+b", fold_1array, jnp.zeros(1))
    bench("carry 1x[4T,256], d*a+b", fold_1array_4T, jnp.zeros(1))
    bench("FULL modeled step, concat [T,1024]", fold_full_concat, grid, table, carry, fills)


if __name__ == "__main__":
    main()
