"""Isolates the XLA-side prep cost of the Pallas paint fold
(`paint._paint_fold_pallas` minus the kernel) at paris scale, and the
marginal cost of the round-4 style-row widening (21 -> 16+SW meta lanes).

Pieces timed (synthetic paris-shaped inputs, u_cap=346k, run_cap=311k):

  spans     first-unit positions per tile (boundary sort + scatter + cummin)
  gather21  m_rows = carr_ext[cidx] at the round-3 width (16 carry + 5)
  gatherSW  m_rows at the round-4 width (16 carry + 38 style lanes)
  umat      g_rows gather + concat + pad to the 384-lane unit matrix
  blk       per-block descriptors
  all       the whole prep (umat + spans + blk), round-4 shape

Usage: python tools/fold_prep_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from forma_tpu.ops import paint_pallas as _pp
from forma_tpu.ops.rasterize import TX_BITS

ROWS, TILES_X = 68, 120
K_SLOTS = 256
RUN_CAP = 311296
U_CAP = 346112
SW = 38  # style width at MS=4


def _time(fn, *args, iters=10):
    f = jax.jit(fn)
    jax.device_get(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    n_tiles = ROWS * TILES_X
    # (tile, layer)-sorted unit keys over ~330k live units.
    live = 330_000
    tiles = np.sort(rng.integers(0, n_tiles, live))
    rowb = tiles // TILES_X + 1
    txb = tiles % TILES_X + 1
    key_u = np.full(U_CAP, 0xFFFFFFFF, np.uint32)
    key_u[:live] = (rowb.astype(np.uint32) << TX_BITS) | txb.astype(np.uint32)
    u_valid = np.zeros(U_CAP, bool)
    u_valid[:live] = True
    src_u = rng.integers(0, RUN_CAP, U_CAP).astype(np.int32)
    src2_u = rng.integers(0, RUN_CAP, U_CAP).astype(np.int32)
    virt_u = (rng.random(U_CAP) < 0.1).astype(np.int32)  # FLAG_VIRTUAL
    grid = rng.integers(-(1 << 20), 1 << 20, (RUN_CAP, 256)).astype(np.int32)
    carry = rng.integers(-16, 17, (RUN_CAP, 16)).astype(np.int32)
    style5 = rng.integers(0, 1 << 30, (RUN_CAP, 5)).astype(np.int32)
    styleW = rng.integers(0, 1 << 30, (RUN_CAP, SW)).astype(np.int32)

    key_u = jnp.asarray(key_u)
    u_valid = jnp.asarray(u_valid)
    src_u = jnp.asarray(src_u)
    src2_u = jnp.asarray(src2_u)
    virt_u = jnp.asarray(virt_u)
    grid = jnp.asarray(grid)
    carry = jnp.asarray(carry)
    style5 = jnp.asarray(style5)
    styleW = jnp.asarray(styleW)

    def spans(key_u, u_valid):
        t8 = -(-n_tiles // _pp.TB) * _pp.TB
        rowb = (key_u >> TX_BITS).astype(jnp.int32) - 1
        txu = (key_u & jnp.uint32((1 << TX_BITS) - 1)).astype(jnp.int32) - 1
        tile_of = jnp.where(u_valid, rowb * TILES_X + txu, t8 + 1)
        iota_u = jnp.arange(U_CAP, dtype=jnp.int32)
        boundary = u_valid & ((tile_of != jnp.roll(tile_of, 1)) | (iota_u == 0))
        skey = jnp.where(boundary, tile_of, t8 + 1).astype(jnp.uint32)
        skey_s, pos_s = jax.lax.sort((skey, iota_u), num_keys=1, is_stable=False)
        ntake = min(t8 + 1, U_CAP)
        ust = (
            jnp.full((t8 + 2,), U_CAP, jnp.int32)
            .at[skey_s[:ntake].astype(jnp.int32)]
            .min(pos_s[:ntake], mode="drop")[: t8 + 1]
        )
        ust = jnp.flip(jax.lax.cummin(jnp.flip(ust)))
        return ust

    def gather(style, src2_u, virt_u, carry=carry):
        carr_ext = jnp.concatenate(
            [
                jnp.concatenate([carry, style], axis=1),
                jnp.concatenate([carry, style], axis=1),
            ],
            axis=0,
        )
        virt = (virt_u & 1) != 0
        cidx = jnp.minimum(src2_u, RUN_CAP - 1) + jnp.where(virt, RUN_CAP, 0)
        return carr_ext[cidx]

    def umat(grid, style, src_u, src2_u, virt_u, u_valid):
        m_rows = gather(style, src2_u, virt_u)
        virt = (virt_u & 1) != 0
        g_rows = jnp.where(
            (virt | ~u_valid)[:, None], 0, grid[jnp.minimum(src_u, RUN_CAP - 1)]
        )
        u = jnp.concatenate([g_rows, m_rows], axis=1)
        win = -(-(_pp.TB * K_SLOTS + _pp.CH + 8) // _pp.CH) * _pp.CH
        return jnp.pad(u, ((0, win), (0, _pp.UW - u.shape[1])))

    t = _time(spans, key_u, u_valid)
    print(f"spans            : {t:7.2f} ms", flush=True)
    t = _time(lambda c, st, s2, v: gather(st, s2, v, c).sum(), carry, style5, src2_u, virt_u)
    print(f"gather 16+5 lanes: {t:7.2f} ms", flush=True)
    t = _time(lambda c, st, s2, v: gather(st, s2, v, c).sum(), carry, styleW, src2_u, virt_u)
    print(f"gather 16+{SW} lanes: {t:7.2f} ms", flush=True)
    t = _time(
        lambda g, st, s, s2, v, uv: umat(g, st, s, s2, v, uv).sum(),
        grid, style5, src_u, src2_u, virt_u, u_valid,
    )
    print(f"umat (16+5)      : {t:7.2f} ms", flush=True)
    t = _time(
        lambda g, st, s, s2, v, uv: umat(g, st, s, s2, v, uv).sum(),
        grid, styleW, src_u, src2_u, virt_u, u_valid,
    )
    print(f"umat (16+{SW})     : {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
