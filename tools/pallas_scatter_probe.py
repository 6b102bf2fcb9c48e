"""Probe: can a Pallas kernel beat XLA's ~85 ms scatter-add for the run-grid
accumulation (8.4M segments -> [run_cap, 256] i32)?

Measures the achievable sequential per-segment accumulate rate: a kernel
streams (row, cell, val) triples through SMEM blocks and does a dynamic
[1, 256] read-modify-write per segment into a VMEM window.  If the rate is
well above ~100M segments/s, a windowed full implementation (sliding the
VMEM window over sorted rids with DMA flushes) is worth building in a
future round; if not, the XLA scatter stands.

Standalone tool — not wired into the pipeline.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 4096  # segments per grid step
WINDOW = 256  # VMEM accumulator rows


def kernel(row_ref, cell_ref, val_ref, out_ref, acc_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)

    def body(i, _):
        r = row_ref[i]
        c = cell_ref[i]
        v = val_ref[i]
        upd = jnp.where(lane == c, v, 0)
        acc_ref[pl.ds(r, 1), :] += upd
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def run(n_lg=20):
    n = 1 << n_lg
    key = jax.random.PRNGKey(0)
    row = jax.random.randint(key, (n,), 0, WINDOW, dtype=jnp.int32)
    cell = jax.random.randint(key, (n,), 0, 256, dtype=jnp.int32)
    val = jax.random.randint(key, (n,), -1000, 1000, dtype=jnp.int32)

    grid = (n // CHUNK,)
    f = jax.jit(
        lambda row, cell, val: pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (WINDOW, 256), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((WINDOW, 256), jnp.int32),
            scratch_shapes=[pltpu.VMEM((WINDOW, 256), jnp.int32)],
        )(row, cell, val).sum(dtype=jnp.int32)
    )
    t0 = time.time()
    ref = jax.device_get(f(row, cell, val))
    print(f"compile+first: {time.time() - t0:.1f}s", flush=True)
    # correctness
    expect = int(np.sum(np.asarray(val)))
    print("checksum ok:", int(ref) == expect, int(ref), expect, flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.device_get(f(row, cell, val))
        times.append(time.time() - t0)
    best = min(times)
    print(
        f"n=2^{n_lg}: {best * 1e3:.1f} ms -> {n / best / 1e6:.0f} M segments/s",
        flush=True,
    )


if __name__ == "__main__":
    run(20)
