"""Second-round TPU microbenchmarks: the specific access patterns the
renderer redesign hinges on.  Fences by device_get of a FULL checksum so no
partial-sort/top-k rewrite can fake the numbers.

Usage: python tools/tpu_microbench2.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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

    N = 1 << 23
    k = jax.random.randint(key, (N,), 0, 1 << 29, dtype=jnp.int32).astype(jnp.uint32)
    v = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    v2 = v ^ jnp.uint32(123)

    # 1. sort with full checksum; payload widths.
    bench(
        "sort 2^23 key+1payload (full checksum)",
        lambda k, v: jax.lax.sort((k, v), num_keys=1)[1].sum(dtype=jnp.uint32)[None],
        k, v,
    )
    bench(
        "sort 2^23 key+2payloads (full checksum)",
        lambda k, v, v2: jax.lax.sort((k, v, v2), num_keys=1)[2].sum(dtype=jnp.uint32)[None],
        k, v, v2,
    )
    n22 = 1 << 22
    bench(
        "sort 2^22 key+1payload (full checksum)",
        lambda k, v: jax.lax.sort((k[:n22], v[:n22]), num_keys=1)[1].sum(dtype=jnp.uint32)[None],
        k, v,
    )
    n24 = 1 << 24
    k24 = jnp.concatenate([k, k ^ jnp.uint32(7)])
    v24 = jnp.concatenate([v, v2])
    bench(
        "sort 2^24 key+1payload (full checksum)",
        lambda k, v: jax.lax.sort((k, v), num_keys=1)[1].sum(dtype=jnp.uint32)[None],
        k24, v24,
    )

    # 2. scatter-add sorted vs random indices (grid-build pattern).
    R = 1 << 19
    rid_sorted = jnp.sort(jax.random.randint(key, (N,), 0, R, dtype=jnp.int32))
    cell = jax.random.randint(key, (N,), 0, 256, dtype=jnp.int32)
    tgt_sorted = rid_sorted * 256 + cell
    tgt_rand = jax.random.randint(key, (N,), 0, R * 256, dtype=jnp.int32)

    def scat(idx, val, sorted_):
        return (
            jnp.zeros((R * 256,), jnp.int32)
            .at[idx]
            .add(val, indices_are_sorted=sorted_, mode="drop")
            .sum(dtype=jnp.int32)[None]
        )

    vi = v.astype(jnp.int32)
    bench("scatter-add 2^23 -> [2^19*256] run-sorted idx (flag on)",
          partial(scat, sorted_=False), tgt_sorted, vi)
    bench("scatter-add 2^23 -> [2^19*256] run-sorted idx flagged sorted",
          lambda i, x: jnp.zeros((R * 256,), jnp.int32).at[i].add(
              x, indices_are_sorted=True, mode="drop").sum(dtype=jnp.int32)[None],
          tgt_sorted, vi)
    bench("scatter-add 2^23 -> [2^19*256] random idx",
          partial(scat, sorted_=False), tgt_rand, vi)

    # 3. gather sorted vs random indices.
    src = v
    idx_sorted = jnp.sort(jax.random.randint(key, (N,), 0, N, dtype=jnp.int32))
    idx_rand = jax.random.randint(key, (N,), 0, N, dtype=jnp.int32)
    bench("gather 2^23 sorted idx",
          lambda s, i: s[i].sum(dtype=jnp.uint32)[None], src, idx_sorted)
    bench("gather 2^23 sorted idx (flagged)",
          lambda s, i: s.at[i].get(indices_are_sorted=True).sum(dtype=jnp.uint32)[None],
          src, idx_sorted)
    bench("gather 2^23 random idx",
          lambda s, i: s[i].sum(dtype=jnp.uint32)[None], src, idx_rand)
    V = 1 << 19
    idx_small = jax.random.randint(key, (V,), 0, N, dtype=jnp.int32)
    bench("gather 2^19 random idx from 2^23",
          lambda s, i: s[i].sum(dtype=jnp.uint32)[None], src, idx_small)

    # 4. searchsorted: 2^19 probes into sorted 2^23.
    probes = jnp.arange(V, dtype=jnp.int32) * 16
    bench("searchsorted(sorted 2^23, 2^19 probes)",
          lambda s, p: jnp.searchsorted(s, p.astype(jnp.uint32)).sum(dtype=jnp.int32)[None],
          jnp.sort(k), probes)

    # 5. throughput: 10 chained elementwise passes over 2^23, one fetch.
    def chain(x):
        def body(i, x):
            return x * jnp.uint32(1664525) + jnp.uint32(1013904223)
        return jax.lax.fori_loop(0, 10, body, x).sum(dtype=jnp.uint32)[None]
    bench("10x chained elementwise 2^23 (per-pass cost = /10)", chain, v)

    # 6. host-pipelined dispatches: 10 separate jit calls, fence once.
    f_step = jax.jit(lambda x: x * jnp.uint32(1664525) + jnp.uint32(1013904223))
    y = f_step(v); jax.device_get(y.sum())
    t0 = time.time()
    y = v
    for _ in range(10):
        y = f_step(y)
    jax.device_get(y.sum())
    print(f"{'10 separate dispatches 2^23, one fetch':64s} {(time.time()-t0)*1e3:10.3f} ms",
          flush=True)

    # 7. Pallas: sequential unit-stream viability — fori_loop doing dynamic
    # [2,128] read-modify-write per iteration.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    U = 1 << 18
    T = 1 << 10  # active tiles
    cov = jax.random.uniform(key, (U, 2, 128), jnp.float32)
    tile_of = jax.random.randint(key, (U,), 0, T, dtype=jnp.int32)

    def unit_stream_kernel(tile_ref, cov_ref, out_ref):
        def body(u, _):
            t = tile_ref[u]
            c = cov_ref[u]
            cur = out_ref[pl.ds(t * 2, 2), :]
            out_ref[pl.ds(t * 2, 2), :] = cur * (1.0 - c) + c
            return 0
        jax.lax.fori_loop(0, U, body, 0)

    def unit_stream(tile_of, cov):
        out = pl.pallas_call(
            unit_stream_kernel,
            out_shape=jax.ShapeDtypeStruct((T * 2, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tile_of, cov)
        return out.sum(dtype=jnp.float32)[None]

    try:
        bench(f"pallas unit-stream RMW {U} units [2,128]", unit_stream, tile_of, cov)
    except Exception as e:
        print("pallas unit-stream FAILED:", type(e).__name__, str(e)[:300], flush=True)

    # 8. Pallas: per-segment scalar loop cost (2^20 iterations, scalar adds).
    S = 1 << 20
    segs = jax.random.randint(key, (S,), 0, 256, dtype=jnp.int32)

    def seg_kernel(seg_ref, out_ref, acc_ref):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        def body(i, _):
            s = seg_ref[i]
            acc_ref[s // 128, s % 128] += 1.0
            return 0
        jax.lax.fori_loop(0, S, body, 0)
        out_ref[:] = acc_ref[:]

    def seg_loop(segs):
        out = pl.pallas_call(
            seg_kernel,
            out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((2, 128), jnp.float32)],
        )(segs)
        return out.sum(dtype=jnp.float32)[None]

    try:
        bench(f"pallas per-segment scalar RMW loop 2^20", seg_loop, segs)
    except Exception as e:
        print("pallas seg-loop FAILED:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
