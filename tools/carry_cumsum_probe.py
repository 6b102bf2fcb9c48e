"""VERDICT round-3 #5: the carry-chain segmented scans run over [R, 16]
arrays — minor dim 16 of 128 lanes = 87% lane waste.  Measures the
alternatives at the paris run shape:

  A. cumsum [R, 16] axis 0            (current)
  B. transpose -> cumsum [16, R] axis 1 -> transpose back
  C. blocked: reshape [R/8, 8, 16], intra-block + block-prefix recursion

All three must produce identical i32 results (exact integer adds).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def blocked_cumsum0(x):
    """Exact cumsum along axis 0 of [R, C] via 8-wide blocking, recursing
    while the row count stays large."""
    R, C = x.shape
    if R % 8 != 0 or R <= 64:
        return jnp.cumsum(x, axis=0)
    xb = x.reshape(R // 8, 8, C)
    intra = jnp.cumsum(xb, axis=1)
    tot = intra[:, -1, :]
    pre = blocked_cumsum0(tot) - tot
    return (intra + pre[:, None, :]).reshape(R, C)


def main():
    import forma_tpu

    forma_tpu.enable_compilation_cache()
    R, C = 311296, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-16, 17, size=(R, C)), jnp.int32)

    def bench(name, fn, reps=7):
        f = jax.jit(fn)
        ref = jax.device_get(f(x))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(f(x))
            ts.append(time.time() - t0)
        print(f"{name:56s} {min(ts)*1e3:9.2f} ms")
        return ref

    a = bench("A cumsum [R,16] axis0 (current)",
              lambda x: jnp.cumsum(x, axis=0).sum(dtype=jnp.int32)[None])
    b = bench("B transpose / cumsum axis1 / back",
              lambda x: jnp.cumsum(x.T, axis=1).T.sum(dtype=jnp.int32)[None])
    c = bench("C blocked 8-wide recursion",
              lambda x: blocked_cumsum0(x).sum(dtype=jnp.int32)[None])
    print("checksums:", a, b, c)
    assert a == b == c

    # Value-level equality (not just checksum).
    va = np.asarray(jnp.cumsum(x, axis=0))
    vc = np.asarray(jax.jit(blocked_cumsum0)(x))
    np.testing.assert_array_equal(va, vc)
    print("values equal")


if __name__ == "__main__":
    main()
