"""Sort-stage A/B probe: `lax.sort` variants at paris scale (~8.9M slots).

The frame's dominant single op is the pixel-segment sort of
(packed u32 key, u32 payload) — ~17 ms at 8.9M (docs/ARCHITECTURE.md stage
table; the reference GPU's bottleneck was its conveyor sort too,
`gpu/conveyor_sort/sort.wgsl`).  Candidates measured here:

  pair      two-operand (key, payload), num_keys=1, unstable  [shipped]
  u64       ONE u64 operand (key << 32 | payload)             [fewer operands,
            wider compares; TPU has no native u64 — XLA emulates]
  stable    the pair sort, stable (hidden iota tiebreak)      [known -2x]
  keyonly   sort keys alone (lower bound: payload dropped)
  band      B batched row sorts of [B, N/B] along axis 1 — the lower bound
            for any two-level scheme (EXCLUDES the cost of getting segments
            into their band, which needs a partition pass)

Usage: python tools/sort_probe.py [--n 8900000] [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu  # noqa: F401  (compilation cache)

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _reduce(out):
    """Tiny fence value: forces the sort without shipping 71 MB back
    through the tunnel (the microbench pattern, tools/tpu_microbench.py)."""
    if isinstance(out, (tuple, list)):
        return sum(_reduce(o) for o in out)
    return out[:8].astype(jnp.uint32).sum()


def _time(fn, *args, iters=20):
    f = jax.jit(lambda *a: _reduce(fn(*a)))
    jax.device_get(f(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(f(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main(n=8_900_000, iters=20):
    n = -(-n // 1024) * 1024
    rng = np.random.default_rng(0)
    # Realistic key distribution: ~23 live bits, ~18% sentinel slots.
    keys = rng.integers(0, 1 << 23, n, dtype=np.uint32)
    keys[rng.random(n) < 0.18] = np.uint32(0xFFFFFFFF)
    payload = rng.integers(0, 1 << 25, n, dtype=np.uint32)
    k = jnp.asarray(keys)
    p = jnp.asarray(payload)

    def pair(k, p):
        return jax.lax.sort((k, p), num_keys=1, is_stable=False)

    import warnings

    jax.config.update("jax_enable_x64", True)  # real u64 for the 1-op variant

    def u64(k, p):
        kp = (k.astype(jnp.uint64) << 32) | p.astype(jnp.uint64)
        s = jax.lax.sort((kp,), num_keys=1, is_stable=False)[0]
        return (s >> 32).astype(jnp.uint32), s.astype(jnp.uint32)

    def stable(k, p):
        return jax.lax.sort((k, p), num_keys=1, is_stable=True)

    def keyonly(k):
        return jax.lax.sort((k,), num_keys=1, is_stable=False)

    def iota_pay(k):
        # Payload VALUES cannot change sort cost (the network moves them
        # blindly), but measure it anyway: if keys+iota != keys+data, the
        # two-sort permutation-recovery scheme (round-5 plan #3) has legs.
        return jax.lax.sort(
            (k, jax.lax.iota(jnp.uint32, k.shape[0])), num_keys=1, is_stable=False
        )

    def band(k, p, b=64):
        return jax.lax.sort(
            (k.reshape(b, -1), p.reshape(b, -1)),
            num_keys=1, dimension=1, is_stable=False,
        )

    t_pair = _time(pair, k, p, iters=iters)
    print(f"pair     (u32,u32) 2-op : {t_pair:7.2f} ms")
    t_u64 = _time(u64, k, p, iters=iters)
    print(f"u64      1-op           : {t_u64:7.2f} ms")
    t_key = _time(keyonly, k, iters=iters)
    print(f"keyonly  1-op           : {t_key:7.2f} ms")
    t_iota = _time(iota_pay, k, iters=iters)
    print(f"iota-pay (u32,iota) 2-op: {t_iota:7.2f} ms")
    t_st = _time(stable, k, p, iters=iters)
    print(f"stable   pair           : {t_st:7.2f} ms")
    for b in (8, 64, 512):
        t_b = _time(lambda k, p, b=b: band(k, p, b), k, p, iters=iters)
        print(f"band     {b:4d} x {n // b:>8d}  : {t_b:7.2f} ms  (partition cost NOT included)")

    # Correctness of the u64 variant vs the pair sort.
    ka, pa = jax.jit(pair)(k, p)
    kb, pb = jax.jit(u64)(k, p)
    ok_keys = bool(jnp.array_equal(ka, kb))
    # payloads may legally permute within equal keys; compare per-key sums
    sa = jnp.zeros((1 << 23,), jnp.uint64).at[
        jnp.minimum(ka, (1 << 23) - 1).astype(jnp.int32)
    ].add(pa.astype(jnp.uint64))
    sb = jnp.zeros((1 << 23,), jnp.uint64).at[
        jnp.minimum(kb, (1 << 23) - 1).astype(jnp.int32)
    ].add(pb.astype(jnp.uint64))
    ok_pay = bool(jnp.array_equal(sa, sb))
    print(f"u64 vs pair: keys equal={ok_keys} per-key payload sums equal={ok_pay}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_900_000)
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    main(a.n, a.iters)
