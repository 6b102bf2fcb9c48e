"""Ablate the Pallas paint-fold kernel's per-step cost.

Copies the production kernel with switchable pieces: dynamic row loads,
carry-expansion dots, prefix rolls, blend math.  Run on paris-shaped
synthetic inputs (tools/fold_kernel_bench.py shapes).

Usage: python tools/fold_kernel_ablate.py
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys

sys.path.insert(0, "/root/repo")

import forma_tpu

forma_tpu.enable_compilation_cache()

from forma_tpu.ops import paint_pallas as _pp
from tools.fold_kernel_bench import ROWS, TILES_X, K_SLOTS, paris_like_depths, build_inputs

TB = _pp.TB
CH = _pp.CH
UW = _pp.UW
BI = dict(START=0, NCHUNK=1, KMAX=2, BASE0=8, CNT0=16, W=24)
_PDA = 512
_PDW = 32


def make_kernel(loads=True, dots=True, rolls=True, blend=True):
    def _kernel(info_ref, clear_ref, u_hbm, out_ref, uwin, asm, cnt_v, dst, sems):
        win_rows = uwin.shape[0]
        start = info_ref[0, 0, BI["START"]]
        nchunk = info_ref[0, 0, BI["NCHUNK"]]
        kmax = info_ref[0, 0, BI["KMAX"]]

        def dma_start(c, _):
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(start + c * CH, 8), CH), :],
                uwin.at[pl.ds(pl.multiple_of(c * CH, 8), CH), :],
                sems.at[c],
            ).start()
            return 0

        jax.lax.fori_loop(0, nchunk, dma_start, 0)
        for ch in range(4):
            dst[:, ch * 256 : (ch + 1) * 256] = jnp.full(
                (TB, 256), clear_ref[ch], jnp.float32
            )
        for t in range(TB):
            cnt_v[pl.ds(t, 1), :] = jnp.full(
                (1, 1), info_ref[0, 0, BI["CNT0"] + t]
            )

        def dma_wait(c, _):
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(start + c * CH, 8), CH), :],
                uwin.at[pl.ds(pl.multiple_of(c * CH, 8), CH), :],
                sems.at[c],
            ).wait()
            return 0

        jax.lax.fori_loop(0, nchunk, dma_wait, 0)

        lane16 = jax.lax.broadcasted_iota(jnp.int32, (TB, 256), 1) % 16
        oh = (
            jax.lax.broadcasted_iota(jnp.int32, (16, 256), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (16, 256), 1) // 16
        ).astype(jnp.bfloat16)

        def step(k, _):
            if loads:
                for t in range(TB):
                    idx = jnp.minimum(
                        info_ref[0, 0, BI["BASE0"] + t] + k, win_rows - 1
                    )
                    asm[pl.ds(t, 1), :] = uwin[pl.ds(idx, 1), :]
            row = asm[:, :]
            g = row[:, 0:256]
            cover = (g << 16) >> 16
            area = (g - cover) >> 16
            if rolls:
                acc = cover
                for s in (1, 2, 4, 8):
                    acc = acc + jnp.where(
                        lane16 >= s, pltpu.roll(acc, s, axis=1), 0
                    )
                exc = acc - cover
            else:
                exc = cover
            meta = row[:, 256:384]
            c16 = meta[:, 0:16]
            if dots:
                clo = (c16 & 255).astype(jnp.bfloat16)
                cmid = ((c16 >> 8) & 255).astype(jnp.bfloat16)
                chi = (c16 >> 16).astype(jnp.bfloat16)
                ce = (
                    jnp.dot(chi, oh, preferred_element_type=jnp.float32) * 65536.0
                    + jnp.dot(cmid, oh, preferred_element_type=jnp.float32) * 256.0
                    + jnp.dot(clo, oh, preferred_element_type=jnp.float32)
                ).astype(jnp.int32)
            else:
                ce = jnp.zeros((TB, 256), jnp.int32)
            da = _PDW * (ce + exc) + area
            fr_eo = meta[:, 20:21] != 0
            recip = jnp.float32(1.0 / _PDA)
            nz = jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)
            folded = _PDA - jnp.abs((da & (2 * _PDA - 1)) - _PDA)
            eo = folded.astype(jnp.float32) * recip
            cov = jnp.where(fr_eo, eo, nz)
            present = (cnt_v[:, :] > k).astype(jnp.float32)
            cov = cov * present
            if blend:
                fill = jax.lax.bitcast_convert_type(meta[:, 16:20], jnp.float32)
                src_a = fill[:, 3:4] * cov
                dst_a = dst[:, 768:1024]
                inv_dst_a = 1.0 - dst_a
                inv_dst_a_src_a = inv_dst_a * src_a
                inv_src_a = 1.0 - src_a
                dst_a_src_a = dst_a * src_a
                for ch in range(3):
                    f = fill[:, ch : ch + 1]
                    dst[:, ch * 256 : (ch + 1) * 256] = dst[
                        :, ch * 256 : (ch + 1) * 256
                    ] * inv_src_a + (f * inv_dst_a_src_a + f * dst_a_src_a)
                dst[:, 768:1024] = dst_a * inv_src_a + src_a
            else:
                dst[:, 0:256] = dst[:, 0:256] + cov
            return 0

        jax.lax.fori_loop(0, kmax, step, 0)
        out_ref[:, :] = dst[:, :]

    return _kernel


@partial(jax.jit, static_argnames=("variant",))
def run(u_mat, blkinfo, clear, variant):
    loads, dots, rolls, blend = variant
    nblk = blkinfo.shape[0]
    win = -(-(TB * K_SLOTS + CH + 8) // CH) * CH
    out = pl.pallas_call(
        make_kernel(loads, dots, rolls, blend),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1, BI["W"]), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TB, 1024), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * TB, 1024), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((win, UW), jnp.int32),
            pltpu.VMEM((TB, UW), jnp.int32),
            pltpu.VMEM((TB, 1), jnp.int32),
            pltpu.VMEM((TB, 1024), jnp.float32),
            pltpu.SemaphoreType.DMA((win // CH,)),
        ],
        interpret=False,
    )(blkinfo.reshape(nblk, 1, BI["W"]), clear, u_mat)
    return out.sum()


def bench(name, u_mat, blkinfo, clear, variant):
    t0 = time.time()
    jax.device_get(run(u_mat, blkinfo, clear, variant))
    comp = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        jax.device_get(run(u_mat, blkinfo, clear, variant))
        times.append(time.time() - t0)
    print(f"{name:40s} {min(times) * 1e3:9.2f} ms (compile {comp:.0f}s)", flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    depth = paris_like_depths(rng)
    u_mat, blkinfo = build_inputs(depth)
    clear = jnp.asarray([1.0, 1.0, 1.0, 1.0], jnp.float32)
    bench("full (loads+dots+rolls+blend)", u_mat, blkinfo, clear, (True, True, True, True))
    bench("no loads", u_mat, blkinfo, clear, (False, True, True, True))
    bench("no dots", u_mat, blkinfo, clear, (True, False, True, True))
    bench("no rolls", u_mat, blkinfo, clear, (True, True, False, True))
    bench("no blend", u_mat, blkinfo, clear, (True, True, True, False))
    bench("loads only", u_mat, blkinfo, clear, (True, False, False, False))


if __name__ == "__main__":
    main()
