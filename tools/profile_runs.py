"""Micro-profile of run_data internals at paris scale: which of the grid
scatter / compaction sort / carry machinery dominates the runs stage."""

import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from forma_tpu.profiling import _timeit

N = 1 << 23
RUN_CAP = 327680

key = jax.random.PRNGKey(1)
rid = jnp.sort(jax.random.randint(key, (N,), 0, 295_000, dtype=jnp.int32))
cell = jax.random.randint(key, (N,), 0, 256, dtype=jnp.int32)
val = jax.random.randint(key, (N,), -1000, 1000, dtype=jnp.int32)
kh = jax.random.randint(key, (N,), 0, 1 << 14, dtype=jnp.int32).astype(jnp.uint32)
kl = jax.random.randint(key, (N,), 0, 1 << 15, dtype=jnp.int32).astype(jnp.uint32)
new_run = jnp.roll(rid, 1) != rid

print("floor:", _timeit(lambda z: z + 1.0, jnp.zeros((8, 128), jnp.float32)), flush=True)

# (2D scatter measured at 110 ms — same as 1D; skipped on reruns.)

print("scatter1d .at[rid*256+cell]:", _timeit(
    lambda rid, cell, val: jnp.zeros((RUN_CAP * 256,), jnp.int32).at[rid * 256 + cell].add(val, mode="drop"),
    rid, cell, val), flush=True)

print("compaction sort (pos,kh,kl):", _timeit(
    lambda new_run, kh, kl: jax.lax.sort(
        (jnp.where(new_run, jnp.arange(N, dtype=jnp.uint32), jnp.uint32(0xFFFFFFFF)), kh, kl),
        num_keys=1,
    )[1][:RUN_CAP],
    new_run, kh, kl), flush=True)

grid = jnp.zeros((RUN_CAP, 256), jnp.int32).at[rid, cell].add(val, mode="drop")
print("rowcov decode+sum:", _timeit(
    lambda grid: ((grid << 16) >> 16).reshape(RUN_CAP, 16, 16).sum(axis=2),
    grid), flush=True)

rh = jax.random.randint(key, (RUN_CAP,), 0, 1 << 20, dtype=jnp.int32).astype(jnp.uint32)
rl = jax.random.randint(key, (RUN_CAP,), 0, 1 << 15, dtype=jnp.int32).astype(jnp.uint32)
print("runs re-sort (key2,txb,orig):", _timeit(
    lambda rh, rl: jax.lax.sort(
        (rh, rl, jnp.arange(RUN_CAP, dtype=jnp.int32)), num_keys=2
    )[2],
    rh, rl), flush=True)

rowcov = ((grid << 16) >> 16).reshape(RUN_CAP, 16, 16).sum(axis=2)
orig = jax.random.permutation(key, RUN_CAP)
print("rowcov row-gather + cumsum + carry scatter:", _timeit(
    lambda rowcov, orig: jnp.zeros((RUN_CAP, 16), jnp.int32).at[orig].set(
        jnp.cumsum(rowcov[orig], axis=0)
    ),
    rowcov, orig), flush=True)

# the full sort for comparison
pay = val.astype(jnp.uint32)
print("main sort (packed key + payload):", _timeit(
    lambda kh, pay: jax.lax.sort((kh, pay), num_keys=1)[1],
    kh, pay), flush=True)
