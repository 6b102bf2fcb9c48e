"""Settles the round-3 grid-scatter question with measurements.

The dup-factor probe showed paris has only 1.07 segments per unique
(run, cell) — duplicate-collapsing alone cannot kill the 85 ms scatter.
This probe measures what CAN: the cost of the scatter under different index
orderings and XLA hints, at the real paris shape (8.4M capacity slots,
~300k runs x 256 cells), plus the extra sort cost of making indices sorted.

Run on the TPU: python tools/scatter_variants_probe.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=5):
    f = jax.jit(fn)
    t0 = time.time()
    out = jax.device_get(f(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(f(*args))
        times.append(time.time() - t0)
    print(f"{name:68s} {min(times) * 1e3:10.3f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return out


def main():
    import forma_tpu

    forma_tpu.enable_compilation_cache()
    N = 1 << 23  # capacity slots (v_cap * k_seg at paris scale)
    R = 311296  # run cap (paris bucket)
    NV = 6_785_481  # valid segments
    key = jax.random.PRNGKey(0)

    # Realistic index stream: runs of geometric-ish length ~23, cells random.
    rng = np.random.default_rng(0)
    run_len = rng.geometric(1.0 / 23.0, size=R)
    rid_np = np.repeat(np.arange(R), run_len)[:NV]
    rid_np = np.concatenate([rid_np, np.full(N - NV, R - 1)])  # padding tail
    cell_np = rng.integers(0, 256, size=N)
    val_np = rng.integers(-512, 512, size=N) * 65536 + rng.integers(-16, 17, size=N)
    val_np[NV:] = 0

    rid = jnp.asarray(rid_np, jnp.int32)
    cell = jnp.asarray(cell_np, jnp.int32)
    val = jnp.asarray(val_np, jnp.int32)
    tgt_runsorted = rid * 256 + cell  # sorted by run, random cell within run
    order = np.lexsort((cell_np, rid_np))
    tgt_fullsorted = jnp.asarray((rid_np * 256 + cell_np)[order], jnp.int32)
    val_fs = jnp.asarray(val_np[order], jnp.int32)

    # Unique compaction of the fully sorted stream (host-side for the probe).
    tgt_fs_np = np.asarray(tgt_fullsorted)
    val_fs_np = np.asarray(val_fs)
    uniq, inv = np.unique(tgt_fs_np, return_inverse=True)
    tot = np.zeros(len(uniq), np.int64)
    np.add.at(tot, inv, val_fs_np)
    U = len(uniq)
    # Pad unique stream to a bucket.
    UC = 1 << 23  # same bucket; also try exact-size
    uq = np.full(UC, R * 256, np.int32)  # out-of-bounds -> drop
    uq[:U] = uniq
    uv = np.zeros(UC, np.int32)
    uv[:U] = tot.astype(np.int64).astype(np.int32)
    uq_d = jnp.asarray(uq)
    uv_d = jnp.asarray(uv)
    # Tighter bucket: next pow2 >= U
    UC2 = 1 << int(U - 1).bit_length()
    uq2 = jnp.asarray(uq[:UC2])
    uv2 = jnp.asarray(uv[:UC2])
    print(f"N={N} valid={NV} runs={R} unique={U} UC2={UC2}")

    def scat_add(idx, v, sorted_=False, unique=False):
        return (
            jnp.zeros((R * 256,), jnp.int32)
            .at[idx]
            .add(v, indices_are_sorted=sorted_, unique_indices=unique,
                 mode="drop")
            .sum(dtype=jnp.int32)[None]
        )

    def scat_set(idx, v, sorted_=True):
        return (
            jnp.zeros((R * 256,), jnp.int32)
            .at[idx]
            .set(v, indices_are_sorted=sorted_, unique_indices=True,
                 mode="drop")
            .sum(dtype=jnp.int32)[None]
        )

    a = bench("A scatter-add 2^23 run-sorted (current pattern)",
              partial(scat_add), tgt_runsorted, val)
    b = bench("B scatter-add 2^23 run-sorted, flag sorted",
              partial(scat_add, sorted_=True), tgt_runsorted, val)
    c = bench("C scatter-add 2^23 fully sorted, flag sorted",
              partial(scat_add, sorted_=True), tgt_fullsorted, val_fs)
    d = bench("D scatter-add 2^23 fully sorted, no flags",
              partial(scat_add), tgt_fullsorted, val_fs)
    e = bench("E scatter-set unique 2^23-padded sorted+unique flags",
              partial(scat_set), uq_d, uv_d)
    f = bench(f"F scatter-set unique [{UC2}] sorted+unique flags",
              partial(scat_set), uq2, uv2)
    g = bench(f"G scatter-add unique [{UC2}] sorted flag only",
              partial(scat_add, sorted_=True), uq2, uv2)
    # sanity: same checksum
    print("checksums:", a, b, c, d, e, f, g)

    # 2D scatter (the actual runs.py pattern) vs flat.
    def scat2d(r, cl, v, sorted_=False):
        return (
            jnp.zeros((R, 256), jnp.int32)
            .at[r, cl]
            .add(v, indices_are_sorted=sorted_, mode="drop")
            .sum(dtype=jnp.int32)[None]
        )

    bench("H 2D scatter-add (r, cell) run-sorted (exact current code)",
          partial(scat2d), rid, cell, val)

    # Sort-cost delta: single key vs key+payload-as-second-key.
    pk = jnp.asarray(rng.integers(0, 1 << 31, size=N, dtype=np.int64) \
                     .astype(np.uint32))
    pl = jnp.asarray(rng.integers(0, 1 << 31, size=N, dtype=np.int64) \
                     .astype(np.uint32))
    bench("I sort u32 key + payload (current)",
          lambda k, v: jax.lax.sort((k, v), num_keys=1)[1]
          .sum(dtype=jnp.uint32)[None], pk, pl)
    bench("J sort u32 key + payload BOTH keys (cell-adjacency sort)",
          lambda k, v: jax.lax.sort((k, v), num_keys=2)[1]
          .sum(dtype=jnp.uint32)[None], pk, pl)
    # Cheaper variant: u32 key + u8 cell second key.
    cell8 = cell.astype(jnp.uint8)
    bench("K sort u32 key + u8 cell 2nd key + payload",
          lambda k, c, v: jax.lax.sort((k, c, v), num_keys=2)[2]
          .sum(dtype=jnp.uint32)[None], pk, cell8, pl)


if __name__ == "__main__":
    main()
