"""Pallas TPU kernel: the per-tile paint fold with VMEM-resident pixels.

The XLA wave fold's cost is structural: the framebuffer carry round-trips
HBM on EVERY k step (measured ~0.73 ms/step at 8192 tiles — the pure
`dst*a+b` carry update runs at ~366 GB/s and dominates; the blend math is
free, and XLA cannot fuse consecutive steps into one dst pass:
tools/paint_state_probe.py, tools/paint_chunk_fusion_probe.py).  The fold
is the compute analog of `Painter::paint_tile_row`
(`forma/src/cpu/painter/mod.rs:282-374`), which the reference solves by
keeping one tile's pixels in registers while iterating its layers — this
kernel does the TPU version of exactly that.

Structure: units (one per (tile, layer), sorted by tile then layer) are
pre-flattened into a matrix `U` [u_pad, 384] i32 whose row holds the
unit's packed area|cover grid row (zero for virtual gap units), its
16-entry cover carry, its solid fill color, and its fill rule.  Each
program owns TB=8 consecutive tiles, keeps their [8, 4*256] f32 pixels in
VMEM scratch for the whole fold, DMA-streams its tiles' contiguous unit
span, and walks k = 0..max-depth with all 8 tiles advancing in lockstep
(shallower tiles mask out).  The only HBM traffic is the unit stream
(once) and the final pixels (once) — versus once per k step for the XLA
fold.

Scope: solid fills, Over blending, both fill rules, real + virtual units
(a virtual unit's zero grid row makes `da = PDW * carry` fall out of the
same formula).  Frames with other blend modes, clips, gradients or
textures take the XLA wave fold (`paint._paint_fold_backend`).

Exactness: integer cover prefix and carry expansion are exact (carry
expands through a byte-split MXU one-hot — every product has one non-zero
bf16-exact term, sums < 2^24); the f32 blend uses the same expression
tree as the wave fold step (`paint.step_wave`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

TB = 32  # tiles per program (dst block [TB, 4*256] f32)
UW = 384  # U-matrix lanes: 256 grid | 16 carry | 4 fill | 1 fr | pad.
#           Must be a multiple of 128: the HBM unit matrix is (8,128)-tiled
#           and Mosaic can only DMA row windows whose lane extent matches
#           the physical tiling (288 lanes fails to lower).
CH = 256  # DMA chunk rows
_PDA = consts.PIXEL_DOUBLE_AREA
_PDW = consts.PIXEL_DOUBLE_WIDTH

# blkinfo lane layout (per block, SMEM)
BI_START = 0  # window start row in U (8-aligned)
BI_NCHUNK = 1  # chunks to DMA
BI_KMAX = 2  # fold steps (max clamped unit count of the block's tiles)
BI_BASE0 = 8  # TB lanes: per-tile first-unit row, relative to BI_START
BI_CNT0 = 8 + TB  # TB lanes: per-tile unit count (clamped to k_slots)
BI_W = 8 + 2 * TB


def _kernel(info_ref, clear_ref, u_hbm, out_ref, uwin, asm, cnt_v, dst, sems):
    """One program: fold TB consecutive tiles' units over VMEM pixels.

    info_ref SMEM [1, 1, BI_W] i32 — this block's offsets/counts.
    clear_ref SMEM [4] f32 — clear color.
    u_hbm [u_alloc, UW] i32 (ANY) — the unit matrix.
    out_ref [TB, 1024] f32 — folded pixels (channel-major blocks of 256).
    uwin [WIN, UW] i32 — unit window scratch.
    asm [TB, UW] i32 — per-step row assembly.
    cnt_v [TB, 1] i32 — per-tile unit counts as a vector.
    dst [TB, 1024] f32 — pixel accumulator.
    sems DMA((WIN // CH,)).
    """
    win_rows = uwin.shape[0]
    start = info_ref[0, 0, BI_START]
    nchunk = info_ref[0, 0, BI_NCHUNK]
    kmax = info_ref[0, 0, BI_KMAX]

    # Stream the block's unit span (chunked; starts are 8-aligned — the
    # pl.multiple_of annotations let Mosaic prove the sublane tiling).
    def dma_start(c, _):
        pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(start + c * CH, 8), CH), :],
            uwin.at[pl.ds(pl.multiple_of(c * CH, 8), CH), :],
            sems.at[c],
        ).start()
        return 0

    jax.lax.fori_loop(0, nchunk, dma_start, 0)

    # Init pixels and per-tile counts while the DMA flies.
    for ch in range(4):
        dst[:, ch * 256 : (ch + 1) * 256] = jnp.full(
            (TB, 256), clear_ref[ch], jnp.float32
        )
    for t in range(TB):
        cnt_v[pl.ds(t, 1), :] = jnp.full((1, 1), info_ref[0, 0, BI_CNT0 + t])

    def dma_wait(c, _):
        pltpu.make_async_copy(
            u_hbm.at[pl.ds(pl.multiple_of(start + c * CH, 8), CH), :],
            uwin.at[pl.ds(pl.multiple_of(c * CH, 8), CH), :],
            sems.at[c],
        ).wait()
        return 0

    jax.lax.fori_loop(0, nchunk, dma_wait, 0)

    # Carry expansion + exclusive cover prefix as ONE one-hot matrix on the
    # MXU (the VPU lane-roll prefix measured 27 ms/frame — the kernel's
    # single largest per-step cost; tools/fold_kernel_ablate.py).  Operand
    # row = [carry(16) | cover(256)]; matrix row i, output pixel lane j:
    #   i < 16 (carry i):        1 if i == j // 16   (expand to its row)
    #   i >= 16 (cover lane i'): 1 if same 16-block and i' < j (exclusive)
    # Byte-split dots are exact: operand bytes are bf16-exact (<= 255 and
    # signed-high < 128), each pixel sums <= 16 one-hot terms so every
    # partial product sum stays far below 2^24 (max |b2 sum * 65536| is
    # 143 * 65536 ~ 9.4M) — f32 accumulation is exact, i32 convert exact.
    ri = jax.lax.broadcasted_iota(jnp.int32, (16 + 256, 256), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (16 + 256, 256), 1)
    ci = ri - 16
    w_oh = (
        ((ri < 16) & (ri == cj // 16))
        | ((ri >= 16) & (ci // 16 == cj // 16) & (ci < cj))
    ).astype(jnp.bfloat16)

    def step(k, _):
        for t in range(TB):
            idx = jnp.minimum(info_ref[0, 0, BI_BASE0 + t] + k, win_rows - 1)
            asm[pl.ds(t, 1), :] = uwin[pl.ds(idx, 1), :]
        row = asm[:, :]  # [TB, UW]

        g = row[:, 0:256]
        cover = (g << 16) >> 16
        area = (g - cover) >> 16

        meta = row[:, 256:UW]  # [TB, 32]
        c16 = meta[:, 0:16]  # i32 carries
        ops = jnp.concatenate([c16, cover], axis=1)  # [TB, 272]
        b0 = (ops & 255).astype(jnp.bfloat16)
        b1 = ((ops >> 8) & 255).astype(jnp.bfloat16)
        b2 = (ops >> 16).astype(jnp.bfloat16)  # signed high, |.| < 128
        ce_exc = (
            jnp.dot(b2, w_oh, preferred_element_type=jnp.float32) * 65536.0
            + jnp.dot(b1, w_oh, preferred_element_type=jnp.float32) * 256.0
            + jnp.dot(b0, w_oh, preferred_element_type=jnp.float32)
        ).astype(jnp.int32)  # [TB, 256] carry + exclusive cover prefix

        da = _PDW * ce_exc + area
        fr_eo = meta[:, 20:21] != 0  # [TB, 1]
        recip = jnp.float32(1.0 / _PDA)
        nz = jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)
        folded = _PDA - jnp.abs((da & (2 * _PDA - 1)) - _PDA)
        eo = folded.astype(jnp.float32) * recip
        cov = jnp.where(fr_eo, eo, nz)

        present = (cnt_v[:, :] > k).astype(jnp.float32)  # [TB, 1]
        cov = cov * present

        fill = jax.lax.bitcast_convert_type(meta[:, 16:20], jnp.float32)
        src_a = fill[:, 3:4] * cov
        dst_a = dst[:, 768:1024]
        inv_dst_a = 1.0 - dst_a
        inv_dst_a_src_a = inv_dst_a * src_a
        inv_src_a = 1.0 - src_a
        dst_a_src_a = dst_a * src_a
        # Over: blended == fill; expression tree matches paint.step_wave.
        for ch in range(3):
            f = fill[:, ch : ch + 1]
            dst[:, ch * 256 : (ch + 1) * 256] = dst[
                :, ch * 256 : (ch + 1) * 256
            ] * inv_src_a + (f * inv_dst_a_src_a + f * dst_a_src_a)
        dst[:, 768:1024] = dst_a * inv_src_a + src_a
        return 0

    jax.lax.fori_loop(0, kmax, step, 0)
    out_ref[:, :] = dst[:, :]


@partial(jax.jit, static_argnames=("k_slots", "interpret"))
def paint_fold_pallas(
    u_mat,  # i32 [u_alloc, UW] unit rows (tile-then-layer order + DMA slack)
    blkinfo,  # i32 [nblk, BI_W] (reshaped to [nblk, 1, BI_W] for SMEM)
    clear,  # f32 [4]
    k_slots: int,
    interpret: bool = False,
):
    """Returns folded pixels f32 [nblk * TB, 1024] (channel blocks of 256).

    Rows beyond a tile's unit count read window garbage but are masked by
    the count; tiles with zero units return the clear color.
    """
    nblk = blkinfo.shape[0]
    win = TB * k_slots + CH + 8  # span cap + chunk overshoot + align slack
    win = -(-win // CH) * CH
    assert u_mat.shape[1] == UW

    out = pl.pallas_call(
        _kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BI_W), lambda b: (b, 0, 0), memory_space=pltpu.SMEM
            ),
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
        interpret=interpret,
    )(blkinfo.reshape(nblk, 1, BI_W), clear, u_mat)
    return out
