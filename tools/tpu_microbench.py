"""TPU primitive micro-benchmarks with trustworthy fencing.

On this stack `jax.block_until_ready` can return before execution completes
(verified round 1: a 90s+ sort "timed" at 0.1 ms), so every timing here
fences by `jax.device_get` of a tiny reduction of the op's result — the
bytes cannot arrive on the host before the op has actually run.

Usage: python tools/tpu_microbench.py [--quick]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=3, warmup=1):
    """fn must return a small array; compile, warm, then time with fences."""
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args)
    jax.device_get(out)
    compile_s = time.time() - t0
    for _ in range(warmup):
        jax.device_get(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.time()
        jax.device_get(f(*args))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name:60s} {best * 1e3:10.3f} ms   (compile {compile_s:.1f}s)", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    print("device:", jax.devices()[0], flush=True)

    # Dispatch overhead floor.
    tiny = jnp.zeros((8, 128), jnp.float32)
    bench("dispatch floor (x+1 on 8x128)", lambda x: (x + 1.0).sum(), tiny)

    sizes = [18, 20, 21] if args.quick else [18, 20, 21, 22, 23]

    for lg in sizes:
        n = 1 << lg
        k = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
        v = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)

        bench(
            f"lax.sort 1D key+payload  2^{lg}",
            lambda k, v: jax.lax.sort((k, v), num_keys=1)[0][:8].astype(jnp.uint32).sum(),
            k, v,
        )

        # Batched sort along last dim (independent rows).
        for c_lg in ([10] if args.quick else [9, 11, 13]):
            c = 1 << c_lg
            if c > n:
                continue
            kb = k.reshape(n // c, c)
            vb = v.reshape(n // c, c)
            bench(
                f"lax.sort rows [{n // c}x{c}] key+payload  2^{lg}",
                lambda kb, vb: jax.lax.sort((kb, vb), num_keys=1, dimension=1)[0][:, :1].sum(),
                kb, vb,
            )

        idx = jax.random.randint(key, (n,), 0, n, dtype=jnp.int32)
        bench(f"gather x[idx]            2^{lg}", lambda x, i: x[i][:8].sum(), v, idx)
        bench(
            f"scatter-add zeros.at[idx] 2^{lg}",
            lambda i, x: jnp.zeros((1 << lg,), jnp.uint32).at[i].add(x)[:8].sum(),
            idx, v,
        )
        bench(
            f"scatter-add small dest [4096] 2^{lg}",
            lambda i, x: jnp.zeros((4096,), jnp.uint32).at[i & 4095].add(x)[:8].sum(),
            idx, v,
        )
        bench(f"cumsum                   2^{lg}", lambda x: jnp.cumsum(x)[-1:], v)
        bench(f"elementwise a*b+c        2^{lg}", lambda a, b: (a * b + a)[:8].sum(), v, k)

    # 2D cumsum along axis 0 of [N/64, 64] (radix-rank shape).
    n = 1 << (sizes[-1])
    v = jax.random.randint(key, (n // 64, 64), 0, 100, dtype=jnp.int32)
    bench(f"cumsum axis0 [{n // 64}x64]", lambda x: jnp.cumsum(x, axis=0)[-1, :1], v)


if __name__ == "__main__":
    main()
