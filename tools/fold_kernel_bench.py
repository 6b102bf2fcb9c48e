"""Kernel-only bench for the Pallas paint fold on paris-shaped inputs.

Builds synthetic unit spans with a paris-like depth distribution
(~324k units over 8160 tiles, max depth 250, deep tiles clustered) and
times `paint_fold_pallas` alone — compile is ~40 s vs ~10 min for the
full pipeline, so kernel variants can iterate quickly.

Usage: python tools/fold_kernel_bench.py
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

import sys

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

from forma_tpu.ops import paint_pallas as _pp

ROWS, TILES_X = 68, 120
K_SLOTS = 256


def paris_like_depths(rng):
    t = ROWS * TILES_X
    depth = rng.poisson(30.0, t).astype(np.int64)
    # roads: clustered deep tiles along a few lines
    for _ in range(12):
        r0 = rng.integers(0, ROWS)
        for c in range(TILES_X):
            r = int(np.clip(r0 + rng.integers(-1, 2), 0, ROWS - 1))
            depth[r * TILES_X + c] += int(rng.integers(100, 220))
    return np.clip(depth, 0, 250)


def build_inputs(depth):
    t = depth.size
    TB = _pp.TB
    t8 = -(-t // TB) * TB
    depth8 = np.pad(depth, (0, t8 - t))
    ust = np.zeros(t8 + 1, np.int64)
    np.cumsum(depth8, out=ust[1:])
    total = int(ust[-1])
    print(f"units: {total}  sum-kmax(TB={TB}):",
          int(depth8.reshape(-1, TB).max(axis=1).sum()), flush=True)

    rng = np.random.default_rng(1)
    win = -(-(TB * K_SLOTS + _pp.CH + 8) // _pp.CH) * _pp.CH
    u_alloc = total + win
    u_mat = np.zeros((u_alloc, _pp.UW), np.int32)
    # grid section: random small area|cover packs
    u_mat[:total, 0:256] = (
        rng.integers(-40, 40, (total, 256)) * 65536
        + rng.integers(-16, 17, (total, 256))
    ).astype(np.int32)
    u_mat[:total, 256:272] = rng.integers(-16, 17, (total, 16)).astype(np.int32)
    # Style rows at the solid/Over layout: fill(4) | fr(1).
    fills = rng.random((total, 4), np.float32)
    u_mat[:total, 272:276] = fills.view(np.int32)
    u_mat[:total, 276] = rng.integers(0, 2, total).astype(np.int32)

    nblk = t8 // TB
    ust_t = ust[:t8].reshape(nblk, TB)
    cnt_t = np.minimum(depth8.reshape(nblk, TB), K_SLOTS)
    start_al = (ust_t[:, 0] // 8) * 8
    span_end = np.concatenate([ust_t[1:, 0], ust[t8:]])
    kmax = cnt_t.max(axis=1)
    nch = np.minimum(-(-(span_end - start_al) // _pp.CH), win // _pp.CH)
    nch = np.where(kmax > 0, nch, 0)
    tile_i = np.arange(t8, dtype=np.int64)
    x0_t = ((tile_i % TILES_X) * 16).reshape(nblk, TB)
    y0_t = ((tile_i // TILES_X) * 16).reshape(nblk, TB)
    blkinfo = np.concatenate(
        [
            start_al[:, None], nch[:, None], kmax[:, None],
            np.zeros((nblk, 5), np.int64),
            ust_t - start_al[:, None], cnt_t, x0_t, y0_t,
        ],
        axis=1,
    ).astype(np.int32)
    return jnp.asarray(u_mat), jnp.asarray(blkinfo)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    depth = paris_like_depths(rng)
    u_mat, blkinfo = build_inputs(depth)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)

    from forma_tpu.ops.paint import Features

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", default="solid",
                    choices=["solid", "grad", "blend", "clip", "all"])
    fa = ap.parse_args()
    feats = {
        "solid": Features(),
        "grad": Features(has_gradient=True),
        "blend": Features(blend_modes=tuple(range(16))),
        "clip": Features(has_clip=True),
        "all": Features(blend_modes=tuple(range(16)), has_gradient=True,
                        has_clip=True),
    }[fa.features]
    ms = 2
    f = jax.jit(
        lambda u, b, c: _pp.paint_fold_pallas(
            u, b, c, k_slots=K_SLOTS, features=feats, ms=ms
        ).sum()
    )
    t0 = time.time()
    jax.device_get(f(u_mat, blkinfo, clear))
    print(f"compile {time.time() - t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.time()
        jax.device_get(f(u_mat, blkinfo, clear))
        times.append(time.time() - t0)
    print(f"kernel: {min(times) * 1e3:.2f} ms (incl dispatch floor ~29)", flush=True)


if __name__ == "__main__":
    main()
