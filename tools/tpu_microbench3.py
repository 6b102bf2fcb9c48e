"""Third round: row-gather (slice-per-index) costs — the paint-fold design
hinges on whether gathering contiguous rows runs at bandwidth or at
per-element cost.  Plus the sort-based stream-compaction pattern.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


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
    print(f"{name:64s} {min(times) * 1e3:10.3f} ms   (compile {compile_s:.1f}s)", flush=True)
    return min(times)


def main():
    key = jax.random.PRNGKey(0)
    print("device:", jax.devices()[0], flush=True)

    # Row gathers: [n_idx] indices, each pulling a [w] contiguous row.
    for n_idx_lg, w in [(13, 256), (15, 256), (17, 256), (19, 16), (19, 64), (17, 64)]:
        n_idx = 1 << n_idx_lg
        U = 1 << 19
        src = jax.random.uniform(key, (U, w), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, U, dtype=jnp.int32)
        bench(
            f"row-gather [{n_idx}] x [{w}] f32 from [{U},{w}]",
            lambda s, i: s[i].sum(dtype=jnp.float32)[None],
            src, idx,
        )

    # Row scatter-add: [n_idx] rows scattered into [U, w].
    for n_idx_lg, w in [(15, 256), (17, 64)]:
        n_idx = 1 << n_idx_lg
        U = 1 << 19
        upd = jax.random.uniform(key, (n_idx, w), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, U, dtype=jnp.int32)
        bench(
            f"row-scatter-add [{n_idx}] x [{w}] f32 into [{U},{w}]",
            lambda u, i: jnp.zeros((U, w), jnp.float32).at[i].add(u).sum(dtype=jnp.float32)[None],
            upd, idx,
        )

    # Stream compaction by sort: (flagged iota, payload) at 2^23.
    N = 1 << 23
    k = jax.random.randint(key, (N,), 0, 1 << 29, dtype=jnp.int32).astype(jnp.uint32)
    flag = jax.random.randint(key, (N,), 0, 16, dtype=jnp.int32) == 0

    def compact(k, flag):
        iota = jnp.arange(N, dtype=jnp.uint32)
        pos = jnp.where(flag, iota, jnp.uint32(0xFFFFFFFF))
        pos_s, key_s = jax.lax.sort((pos, k), num_keys=1)
        return (pos_s[: 1 << 19].sum(dtype=jnp.uint32) + key_s[: 1 << 19].sum(dtype=jnp.uint32))[None]

    bench("compaction sort 2^23 (pos,key) -> first 2^19", compact, k, flag)

    # Small sorts at run/unit granularity: 2^19 with 3 payloads.
    R = 1 << 19
    kr = jax.random.randint(key, (R,), 0, 1 << 29, dtype=jnp.int32).astype(jnp.uint32)
    p1 = kr ^ jnp.uint32(1)
    p2 = kr ^ jnp.uint32(2)
    p3 = kr ^ jnp.uint32(3)
    bench(
        "sort 2^19 key+3payloads",
        lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=1)[3].sum(dtype=jnp.uint32)[None],
        kr, p1, p2, p3,
    )

    # Segmented associative scan over [2^19, 16] i32 (carry chains).
    x = jax.random.randint(key, (R, 16), -4, 4, dtype=jnp.int32)
    bench(
        "cumsum axis0 [2^19,16] i32",
        lambda x: jnp.cumsum(x, axis=0)[-1].sum(dtype=jnp.int32)[None],
        x,
    )

    # The forward-fill scan for vline param fill: associative_scan keep-last.
    V = 1 << 19
    vals = jax.random.uniform(key, (V, 12), jnp.float32)
    valid = jax.random.randint(key, (V, 1), 0, 4, dtype=jnp.int32) == 0

    def ffill(vals, valid):
        def op(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av), af | bf
        out, _ = jax.lax.associative_scan(op, (vals, valid & jnp.ones((1, 12), bool)))
        return out[-1].sum(dtype=jnp.float32)[None]

    bench("ffill assoc-scan [2^19,12] f32", ffill, vals, valid)


if __name__ == "__main__":
    main()
