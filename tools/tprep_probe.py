"""Round-5 probe: where does the table-mode paint prep's time go, and can a
split two-ref layout beat the 384-lane T materialisation?

`_paint_fold_pallas` table mode builds T = concat([grid(256) | ci(16) |
ca(16) | tx(1) | style(38) | pad], axis=1) at run scale and takes ONE wide
[u_cap, 384] gather.  profile_r5 attributes ~9.6 ms to the whole prep and
the concat (lane-misaligned writes at offsets 272/288/289/327) is the
suspected hot spot — minor-dim concats at non-native offsets force
relayouts on TPU.

Variants (paris shapes: R=311k runs, U=346k units):

  P1 concat+gather  T=concat(384); u = T[idx]                (shipped)
  P2 split refs     meta=concat(128); ug=grid[idx]; um=meta[idx]
                    (kernel would take two HBM refs, two DMAs per chunk)
  P3 gather-concat  u = concat([grid[idx], meta[idx]])       (one output)
  P4 meta-only      meta=concat(128) alone  (isolates the misaligned concat
                    at quarter width)
  P5 T-only         T=concat(384) alone     (isolates the full concat)
  P6 gather-only    u = T[idx] with T prebuilt (isolates the wide gather)

Decision: if P2 ~ P6 + P4-scale costs << P1, implement the split-ref kernel
path (FORMA_TPREP=split) and A/B end to end.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

R = 311296
U = 346112
SW = 38
WIN = 512
UW = 384


def _time(fn, *args, iters=10):
    f = jax.jit(fn)
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.integers(0, 1 << 20, (R, 256)).astype(np.int32))
    ci = jnp.asarray(rng.integers(-512, 512, (R, 16)).astype(np.int32))
    ca = jnp.asarray(rng.integers(-512, 512, (R, 16)).astype(np.int32))
    tx = jnp.asarray(rng.integers(0, 120, (R,)).astype(np.int32))
    st = jnp.asarray(rng.integers(0, 255, (R, SW)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, R, (U + WIN,)).astype(np.int32))

    def build_T(grid, ci, ca, tx, st):
        return jnp.concatenate(
            [grid, ci, ca, tx[:, None], st,
             jnp.zeros((R, UW - 289 - SW), jnp.int32)],
            axis=1,
        )

    def build_meta(ci, ca, tx, st):
        return jnp.concatenate(
            [ci, ca, tx[:, None], st,
             jnp.zeros((R, 128 - 33 - SW), jnp.int32)],
            axis=1,
        )

    t = _time(lambda *a: build_T(*a)[idx], grid, ci, ca, tx, st)
    print(f"P1 concat384 + wide gather:          {t:8.2f} ms")

    def p2(grid, ci, ca, tx, st, idx):
        meta = build_meta(ci, ca, tx, st)
        return grid[idx], meta[idx]

    t = _time(p2, grid, ci, ca, tx, st, idx)
    print(f"P2 meta concat128 + two gathers:     {t:8.2f} ms")

    def p3(grid, ci, ca, tx, st, idx):
        meta = build_meta(ci, ca, tx, st)
        return jnp.concatenate([grid[idx], meta[idx]], axis=1)

    t = _time(p3, grid, ci, ca, tx, st, idx)
    print(f"P3 gathers + concat at U scale:      {t:8.2f} ms")

    t = _time(lambda ci, ca, tx, st: build_meta(ci, ca, tx, st), ci, ca, tx, st)
    print(f"P4 meta concat128 alone:             {t:8.2f} ms")

    t = _time(lambda *a: build_T(*a), grid, ci, ca, tx, st)
    print(f"P5 T concat384 alone:                {t:8.2f} ms")

    T = jax.jit(build_T)(grid, ci, ca, tx, st)
    T.block_until_ready()
    t = _time(lambda T, idx: T[idx], T, idx)
    print(f"P6 wide gather alone (T prebuilt):   {t:8.2f} ms")

    g = jax.jit(lambda grid, idx: grid[idx])
    t = _time(g, grid, idx)
    print(f"   grid[idx] [U,256] gather alone:   {t:8.2f} ms")


if __name__ == "__main__":
    main()
