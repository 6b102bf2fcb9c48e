"""Round-5 probe: can texture fills ride the Pallas VMEM paint fold?

The recorded cost-model negative (ops/paint_pallas.py docstring) rejected
per-pixel atlas gathers.  The round-4 VERDICT asks for the pre-registered
alternative to be probed with numbers: per-tile atlas-WINDOW access.  On
TPU the only vectorized "gather" inside a kernel is a one-hot matmul, so
the candidate designs are:

  A. whole-atlas rowsel: keep the (small) atlas resident in VMEM as
     [AH, AW*4] f32; per texture tile-step build a row one-hot
     [256, AH], matmul to pick each pixel's atlas row, then column-mask
     reduce to the 4 channels.  Cost scales with AH*AW — only viable for
     small atlases.
  B. per-tile slab: dynamic-slice a [SH, SW*4] slab from the VMEM atlas
     at the tile's footprint origin (scalar starts — allowed), one-hot
     [256, SH] @ slab, column-mask reduce.  Cost independent of atlas
     size; needs footprint <= slab (host checks per frame, falls back to
     the wave fold beyond it).

This probe measures the MARGINAL per-tile-step cost of each on the real
chip, inside a loop structurally identical to the paint fold's (fori over
k, unrolled python loop over TB tiles), against a baseline kernel with the
same loops and trivial per-step work.  It also measures the XLA-side
window slice-gather ([U, 32, 32, 4] crops at dynamic offsets) in case a
prep-side window table beats in-kernel sampling.

Decision input for: either a texture mode in ops/paint_pallas.py or a
recorded negative in docs/ARCHITECTURE.md.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 32
AH, AW = 256, 32  # atlas [AH, AW*4] f32 = 128 KB in VMEM
SH, SW = 32, 32  # slab


def _timeit(f, *args, reps=5):
    jf = jax.jit(f)
    jax.device_get(jf(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args))
        ts.append(time.time() - t0)
    return min(ts) * 1e3


def make_kernel(mode: str, kmax: int):
    """mode: 'base' | 'atlas_rowsel' | 'slab'."""

    def kernel(info_ref, atlas_ref, out_ref, dst, prm):
        # per-tile texture params: [TB, 8] (ux, uy, vx, vy, tx, ty, oy0, ox0)
        for t in range(TB):
            prm[pl.ds(t, 1), :] = (
                info_ref[pl.ds(t, 1), :8].astype(jnp.float32) * 0.001
            )
        dst[:, :] = jnp.zeros((TB, 1024), jnp.float32)
        jj = jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1)
        xg = (jj % 16).astype(jnp.float32)
        yg = (jj // 16).astype(jnp.float32)

        def step(k, _):
            # the affine coords every variant needs ([TB, 256] VPU math,
            # same class as the gradient eval)
            ux = prm[:, 0:1]
            uy = prm[:, 1:2]
            vx = prm[:, 2:3]
            vy = prm[:, 3:4]
            ttx = prm[:, 4:5] + jnp.float32(k)
            tty = prm[:, 5:6]
            sx = xg * ux + (yg * vx + ttx)
            sy = xg * uy + (yg * vy + tty)
            ix = jnp.clip(jnp.trunc(sx), 0, AW - 1).astype(jnp.int32)
            iy = jnp.clip(jnp.trunc(sy), 0, AH - 1).astype(jnp.int32)

            if mode == "base":
                # stand-in per-step work: reuse coords so nothing drops
                texel = [sx, sy, sx * sy, sx - sy]
            elif mode == "atlas_rowsel":
                texel = [jnp.zeros((TB, 256), jnp.float32) for _ in range(4)]
                lane = jax.lax.broadcasted_iota(jnp.int32, (256, AW * 4), 1)
                for t in range(TB):
                    iy_t = iy[t : t + 1, :]  # [1, 256]
                    ix_t = ix[t : t + 1, :]
                    rsel = (
                        iy_t.reshape(256, 1)
                        == jax.lax.broadcasted_iota(jnp.int32, (256, AH), 1)
                    ).astype(jnp.bfloat16)
                    rows = jnp.dot(
                        rsel, atlas_ref[:, :].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )  # [256, AW*4]
                    colm = (lane >> 2) == ix_t.reshape(256, 1)
                    for ch in range(4):
                        m = colm & ((lane & 3) == ch)
                        v = jnp.sum(
                            jnp.where(m, rows, 0.0), axis=1, keepdims=True
                        )
                        texel[ch] = jax.lax.dynamic_update_slice(
                            texel[ch], v.reshape(1, 256), (t, 0)
                        )
            elif mode == "slab":
                texel = [jnp.zeros((TB, 256), jnp.float32) for _ in range(4)]
                lane = jax.lax.broadcasted_iota(jnp.int32, (256, SW * 4), 1)
                for t in range(TB):
                    oy0 = info_ref[t, 6]
                    ox0 = info_ref[t, 7]
                    slab = atlas_ref[pl.ds(oy0, SH), :]  # [SH, AW*4]
                    iy_t = iy[t : t + 1, :].reshape(256, 1) - oy0
                    ix_t = ix[t : t + 1, :].reshape(256, 1) - ox0
                    rsel = (
                        jnp.clip(iy_t, 0, SH - 1)
                        == jax.lax.broadcasted_iota(jnp.int32, (256, SH), 1)
                    ).astype(jnp.bfloat16)
                    rows = jnp.dot(
                        rsel, slab.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    )  # [256, SW*4]
                    colm = (lane >> 2) == jnp.clip(ix_t, 0, SW - 1)
                    for ch in range(4):
                        m = colm & ((lane & 3) == ch)
                        v = jnp.sum(
                            jnp.where(m, rows, 0.0), axis=1, keepdims=True
                        )
                        texel[ch] = jax.lax.dynamic_update_slice(
                            texel[ch], v.reshape(1, 256), (t, 0)
                        )
            for ch in range(4):
                dst[:, ch * 256 : (ch + 1) * 256] = (
                    dst[:, ch * 256 : (ch + 1) * 256] + texel[ch]
                )
            return 0

        jax.lax.fori_loop(0, kmax, step, 0)
        out_ref[:, :] = dst[:, :]

    return kernel


@partial(jax.jit, static_argnames=("mode", "kmax", "nblk", "interpret"))
def run(info, atlas, mode: str, kmax: int, nblk: int, interpret: bool = False):
    return pl.pallas_call(
        make_kernel(mode, kmax),
        grid=(nblk,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((TB, 8), lambda b: (b, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, 1024), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * TB, 1024), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TB, 1024), jnp.float32),
            pltpu.VMEM((TB, 8), jnp.float32),
        ],
    )(info, atlas)


def main():
    nblk, kmax = 255, 44  # paris-shaped: 8160 tiles, ~350k more tile-steps
    tile_steps = nblk * TB * kmax
    rng = np.random.default_rng(0)
    info = jnp.asarray(
        rng.integers(0, 24, size=(nblk * TB, 8)).astype(np.int32)
    )
    atlas = jnp.asarray(rng.uniform(0, 1, (AH, AW * 4)).astype(np.float32))

    print(f"tile-steps: {tile_steps} ({nblk} blocks x TB={TB} x kmax={kmax})")
    base = _timeit(lambda i, a: run(i, a, "base", kmax, nblk), info, atlas)
    print(f"base kernel (coords only):        {base:8.2f} ms")
    for mode in ("slab", "atlas_rowsel"):
        t = _timeit(lambda i, a: run(i, a, mode, kmax, nblk), info, atlas)
        print(
            f"{mode:32s}  {t:8.2f} ms  (marginal {t - base:+7.2f} ms, "
            f"{(t - base) / tile_steps * 1e6:6.1f} ns/tile-step)"
        )

    # XLA-side window slice-gather: [U, 32, 32, 4] crops at dynamic offsets
    # (the prep-side window-table alternative).
    U = 49152
    at2 = jnp.asarray(rng.uniform(0, 1, (512, 512, 4)).astype(np.float32))
    oy = jnp.asarray(rng.integers(0, 480, size=U).astype(np.int32))
    ox = jnp.asarray(rng.integers(0, 480, size=U).astype(np.int32))

    def window_gather(at2, oy, ox):
        def one(o_y, o_x):
            return jax.lax.dynamic_slice(at2, (o_y, o_x, 0), (SH, SW, 4))

        return jax.vmap(one)(oy, ox)

    t = _timeit(window_gather, at2, oy, ox)
    print(f"XLA [U,32,32,4] window slice-gather at U={U}: {t:8.2f} ms")


if __name__ == "__main__":
    main()
