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
16-entry cover carry, and its style row (solid color, fill rule, blend
mode, fill/func kinds, clip range, gradient params + stops).  Each
program owns TB consecutive tiles, keeps their [TB, 4*256] f32 pixels in
VMEM scratch for the whole fold, DMA-streams its tiles' contiguous unit
span, and walks k = 0..max-depth with all TB tiles advancing in lockstep
(shallower tiles mask out).  The only HBM traffic is the unit stream
(once) and the final pixels (once) — versus once per k step for the XLA
fold.

Scope (round 4, generalized from the round-3 solid/Over kernel): solid
fills AND linear/radial gradients, ALL 16 blend modes, clip masks, both
fill rules, real + virtual units, damage-cached / cropped frames (skipped
tiles fold zero units and re-emit upstream).  The kernel body is
specialized per frame on the static `Features` set — frames without
gradients/clips compile none of that code, exactly like the wave fold.
Texture fills stay on the XLA wave fold: a texture unit needs per-pixel
gathers into a (potentially multi-MB) atlas, which Pallas would have to
either hold in VMEM (doesn't fit next to the unit window) or fetch with
per-pixel dynamic DMAs (~256 scalar DMAs per unit-step vs the wave fold's
one fused XLA gather) — a cost-model negative, recorded in
docs/ARCHITECTURE.md.

Exactness: integer cover prefix and carry expansion are exact (carry
expands through a byte-split MXU one-hot — every product has one non-zero
bf16-exact term, sums < 2^24); the f32 blend, gradient and clip math uses
the same expression trees as the wave fold step (`paint.step_wave`,
`paint._gradient_at`, `paint._blend_one`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import consts

TB = 32  # tiles per program (dst block [TB, 4*256] f32)
UW = 384  # U-matrix lanes: 256 grid | 16 carry | style row | pad.
#           Must be a multiple of 128: the HBM unit matrix is (8,128)-tiled
#           and Mosaic can only DMA row windows whose lane extent matches
#           the physical tiling (288 lanes fails to lower).
CH = 256  # DMA chunk rows
_PDA = consts.PIXEL_DOUBLE_AREA
_PDW = consts.PIXEL_DOUBLE_WIDTH

# Style-row lane layout (i32; f32 payloads ride as bitcast bits).  Built by
# `paint.style_pack_for_fold`, gathered per run in `runs.run_data`
# (style_s), and riding the carry rows into the unit matrix.  Offsets are
# relative to the style row; in the kernel's meta view (carry | style) add
# 16.
#
# The layout is FEATURE-DEPENDENT: a lane group exists only when the
# frame's static feature set needs it, because the per-UNIT style gather in
# the fold prep costs ~per-LANE beyond ~8 lanes (measured: 346k-row gather
# at 21 lanes = 4.9 ms, at 54 lanes = 22.8 ms — tools/fold_prep_probe.py),
# so a solid/Over frame must not pay for gradient stop lanes it never
# reads.  Groups, in order:
#   fill     4 lanes  solid rgba f32 bits                   (always)
#   fr       1 lane   fill rule is EvenOdd                  (always)
#   blend    1 lane   blend mode code                       (blend_modes != (0,))
#   ft       1 lane   fill type: 0 solid, 1 gradient        (has_gradient)
#   func     1 lane   0 draw, 1 clip                        (has_clip)
#   layer    1 lane   layer order id (clip expiry compare)  (has_clip)
#   cend     1 lane   layer id + clip_n (clip range end)    (has_clip)
#   clipped  1 lane   draw governed by a clip               (has_clip)
#   grad     6 lanes  (type, sx, sy, dx, dy, dot_recip)     (has_gradient)
#   stops    5*MS     (r, g, b, a, pos) f32 bits per stop   (has_gradient)
from typing import NamedTuple


class StyleLayout(NamedTuple):
    fill: int
    fr: int
    blend: int  # -1 when the frame has no non-Over blends
    ft: int  # -1 when no gradients
    func: int  # -1 when no clips
    layer: int
    cend: int
    clipped: int
    grad: int  # -1 when no gradients
    stops: int
    width: int


def style_layout(features, ms: int) -> StyleLayout:
    off = 0
    fill, off = off, off + 4
    fr, off = off, off + 1
    blend = ft = func = layer = cend = clipped = grad = stops = -1
    if tuple(features.blend_modes) != (0,):
        blend, off = off, off + 1
    if features.has_gradient:
        ft, off = off, off + 1
    if features.has_clip:
        func, off = off, off + 1
        layer, off = off, off + 1
        cend, off = off, off + 1
        clipped, off = off, off + 1
    if features.has_gradient:
        grad, off = off, off + 6
        stops, off = off, off + 5 * ms
    return StyleLayout(
        fill, fr, blend, ft, func, layer, cend, clipped, grad, stops, off
    )


# blkinfo lane layout (per block, SMEM)
BI_START = 0  # window start row in U (8-aligned)
BI_NCHUNK = 1  # chunks to DMA
BI_KMAX = 2  # fold steps (max clamped unit count of the block's tiles)
BI_BASE0 = 8  # TB lanes: per-tile first-unit row, relative to BI_START
BI_CNT0 = 8 + TB  # TB lanes: per-tile unit count (clamped to k_slots)
BI_X0 = 8 + 2 * TB  # TB lanes: per-tile global pixel x origin
BI_Y0 = 8 + 3 * TB  # TB lanes: per-tile global pixel y origin
BI_W = 8 + 4 * TB


def _gradient_fill(gm, stops, xg, yg, ms: int):
    """Per-unit gradient eval on [TB, 256] pixels; mirrors
    `paint._gradient_at`'s expression tree exactly (per-unit params are
    [TB, 1] instead of [T, 1, 1])."""
    gtype = gm[:, 0:1]
    sx = gm[:, 1:2]
    sy = gm[:, 2:3]
    gdx = gm[:, 3:4]
    gdy = gm[:, 4:5]
    dot_recip = gm[:, 5:6]

    tx = (xg - sx) * gdx * dot_recip
    t_lin = (yg - sy) * gdy * dot_recip + tx
    px = xg - sx
    py = yg - sy
    t_rad = jnp.sqrt((py * py + px * px) * dot_recip)
    t = jnp.where(gtype == 1, t_rad, t_lin)

    def stop(i, ch):
        return stops[:, 5 * i + ch : 5 * i + ch + 1]

    chans = [jnp.zeros_like(t) for _ in range(4)]
    mask = t <= stop(0, 4)
    for ch in range(4):
        chans[ch] = jnp.where(mask, stop(0, ch), chans[ch])
    acc = mask
    for i in range(1, ms):
        start_stop = stop(i - 1, 4)
        end_stop = stop(i, 4)
        m = acc ^ (t < end_stop)
        local_t = (t - start_stop) * (1.0 / (end_stop - start_stop))
        for ch in range(4):
            sc = stop(i - 1, ch)
            ec = stop(i, ch)
            v = local_t * ec + (-local_t * sc + sc)
            chans[ch] = jnp.where(m, v, chans[ch])
        acc = acc | m
    return chans


def _make_kernel(k_slots: int, features, ms: int, table_mode: bool = False):
    """Builds the fold kernel specialized on the frame's static features.

    `table_mode`: the unit matrix came from ONE per-RUN table gather
    (paint._paint_fold_pallas fast path) instead of per-unit assembly.
    Meta lanes are then [carry_in(16) | carry_after(16) | run_tx(1) |
    style...] and the kernel derives each unit's virtuality itself: a
    virtual (gap) unit's owner run sits in an EARLIER tile of the same
    row, so run_tx != the unit's own tile tx exactly when the unit is
    virtual.  Virtual units zero the grid half and take carry_after;
    real units take carry_in — the same rows the XLA prep used to bake
    in per unit, now selected on-chip (three [TB, *] selects per step,
    VPU-cheap) so the prep collapses to one wide gather."""
    from .paint import _blend_one  # shared blend expression trees

    has_grad = features.has_gradient
    has_clip = features.has_clip
    blend_modes = features.blend_modes
    lay = style_layout(features, ms)
    stb = 33 if table_mode else 16  # style base within the meta lanes
    assert not (table_mode and has_clip), (
        "clip frames carry per-UNIT unclip bits; table mode is per-run"
    )

    def _kernel(info_ref, clear_ref, u_hbm, out_ref, *scratch):
        """One program: fold TB consecutive tiles' units over VMEM pixels.

        info_ref SMEM [1, 1, BI_W] i32 — this block's offsets/counts.
        clear_ref SMEM [4] f32 — clear color.
        u_hbm [u_alloc, UW] i32 (ANY) — the unit matrix.
        out_ref [TB, 1024] f32 — folded pixels (channel-major blocks of 256).
        scratch: uwin [WIN, UW] i32, asm [TB, UW] i32, cnt_v [TB, 1] i32,
        dst [TB, 1024] f32, [xgyg [TB, 512] f32 when gradients,]
        [clipm [TB, 256] f32 + clipl [TB, 1] i32 when clips,]
        sems DMA((WIN // CH,)).
        """
        it = iter(scratch)
        uwin = next(it)
        asm = next(it)
        cnt_v = next(it)
        ttx_v = next(it) if table_mode else None
        dst = next(it)
        xgyg = next(it) if has_grad else None
        if has_clip:
            clipm = next(it)
            clipl = next(it)
        sems = next(it)

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

        # Init pixels and per-tile scalars while the DMA flies.
        for ch in range(4):
            dst[:, ch * 256 : (ch + 1) * 256] = jnp.full(
                (TB, 256), clear_ref[ch], jnp.float32
            )
        for t in range(TB):
            cnt_v[pl.ds(t, 1), :] = jnp.full((1, 1), info_ref[0, 0, BI_CNT0 + t])
        if table_mode:
            for t in range(TB):
                ttx_v[pl.ds(t, 1), :] = jnp.full(
                    (1, 1), info_ref[0, 0, BI_X0 + t] // consts.TILE_WIDTH
                )
        if has_grad:
            # Global pixel coordinates per tile: lane j of a 256-pixel tile
            # block is pixel (y = j // 16, x = j % 16).
            jj = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
            for t in range(TB):
                x0 = info_ref[0, 0, BI_X0 + t]
                y0 = info_ref[0, 0, BI_Y0 + t]
                xgyg[pl.ds(t, 1), 0:256] = (x0 + jj % 16).astype(jnp.float32)
                xgyg[pl.ds(t, 1), 256:512] = (y0 + jj // 16).astype(jnp.float32)
        if has_clip:
            clipm[:, :] = jnp.zeros((TB, 256), jnp.float32)
            clipl[:, :] = jnp.full((TB, 1), -1, jnp.int32)

        def dma_wait(c, _):
            pltpu.make_async_copy(
                u_hbm.at[pl.ds(pl.multiple_of(start + c * CH, 8), CH), :],
                uwin.at[pl.ds(pl.multiple_of(c * CH, 8), CH), :],
                sems.at[c],
            ).wait()
            return 0

        jax.lax.fori_loop(0, nchunk, dma_wait, 0)

        # Carry expansion + exclusive cover prefix as ONE one-hot matrix on
        # the MXU (the VPU lane-roll prefix measured 27 ms/frame — the
        # kernel's single largest per-step cost; tools/fold_kernel_ablate.py).
        # Operand row = [carry(16) | cover(256)]; matrix row i, output lane j:
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

        def step(k, carry_state):
            if has_clip:
                clip_last = carry_state
            for t in range(TB):
                idx = jnp.minimum(info_ref[0, 0, BI_BASE0 + t] + k, win_rows - 1)
                asm[pl.ds(t, 1), :] = uwin[pl.ds(idx, 1), :]
            row = asm[:, :]  # [TB, UW]

            g = row[:, 0:256]
            cover = (g << 16) >> 16
            area = (g - cover) >> 16

            meta = row[:, 256:UW]  # [TB, 128]
            if table_mode:
                # [ci(16) | ca(16) | run_tx(1) | style]: derive virtuality
                # from the owner run's tile x (see _make_kernel docstring).
                virt = meta[:, 32:33] != ttx_v[:, :]  # [TB, 1]
                c16 = jnp.where(virt, meta[:, 16:32], meta[:, 0:16])
                cover = jnp.where(virt, 0, cover)
                area = jnp.where(virt, 0, area)
            else:
                c16 = meta[:, 0:16]  # i32 carries (virt baked in by prep)
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
            fr_eo = meta[:, stb + lay.fr : stb + lay.fr + 1] != 0  # [TB, 1]
            recip = jnp.float32(1.0 / _PDA)
            nz = jnp.clip(jnp.abs(da.astype(jnp.float32) * recip), 0.0, 1.0)
            folded = _PDA - jnp.abs((da & (2 * _PDA - 1)) - _PDA)
            eo = folded.astype(jnp.float32) * recip
            cov = jnp.where(fr_eo, eo, nz)

            present = cnt_v[:, :] > k  # [TB, 1] bool
            cov = cov * present.astype(jnp.float32)

            if has_clip:
                func = meta[:, stb + lay.func : stb + lay.func + 1]  # [TB, 1]
                draw = present & (func == 0)
                layer = meta[:, stb + lay.layer : stb + lay.layer + 1]
                cend = meta[:, stb + lay.cend : stb + lay.cend + 1]
                is_clip_unit = present & (func == 1)
                # Clip expiry precedes everything (`painter/mod.rs:302-306`).
                expired = (clip_last >= 0) & (clip_last < layer) & present
                clip_last = jnp.where(expired, -1, clip_last)
                new_clip = is_clip_unit & (clip_last < 0)
                clip_last = jnp.where(new_clip, cend, clip_last)
                clipm[:, :] = jnp.where(is_clip_unit, cov, clipm[:, :])

            # Fill evaluation (same select tree as the wave fold).
            fill = [
                jax.lax.bitcast_convert_type(
                    meta[:, stb + lay.fill + ch : stb + lay.fill + ch + 1],
                    jnp.float32,
                )
                for ch in range(4)
            ]  # [TB, 1] solid channels
            if has_grad:
                gm = jax.lax.bitcast_convert_type(
                    meta[:, stb + lay.grad : stb + lay.grad + 6], jnp.float32
                )
                stops = jax.lax.bitcast_convert_type(
                    meta[:, stb + lay.stops : stb + lay.stops + 5 * ms],
                    jnp.float32,
                )
                gf = _gradient_fill(
                    gm, stops, xgyg[:, 0:256], xgyg[:, 256:512], ms
                )
                selg = meta[:, stb + lay.ft : stb + lay.ft + 1] == 1
                fill = [jnp.where(selg, gg, f) for gg, f in zip(gf, fill)]

            src_a = fill[3] * cov
            if has_clip:
                clipped = meta[:, stb + lay.clipped : stb + lay.clipped + 1] == 1
                active = clip_last >= 0
                src_a = jnp.where(
                    clipped,
                    jnp.where(active, src_a * clipm[:, :], 0.0),
                    src_a,
                )
                src_a = src_a * draw.astype(jnp.float32)
            # Clip-free frames carry no func lane: every unit is a draw, and
            # `cov` already folded the present mask (window/pad rows hold
            # finite values, so fill * 0.0 is exactly 0.0 — same as the wave
            # fold's draw-mask multiply).

            dr = dst[:, 0:256]
            dg = dst[:, 256:512]
            db = dst[:, 512:768]
            dst_a = dst[:, 768:1024]
            blended = [fill[0], fill[1], fill[2]]
            if blend_modes != (0,):
                bcode = meta[:, stb + lay.blend : stb + lay.blend + 1]
                for mode in blend_modes:
                    if mode == 0:
                        continue
                    res = _blend_one(mode, dr, dg, db, fill[0], fill[1], fill[2])
                    sel = bcode == mode
                    blended = [
                        jnp.where(sel, r, o) for r, o in zip(res, blended)
                    ]

            inv_dst_a = 1.0 - dst_a
            inv_dst_a_src_a = inv_dst_a * src_a
            inv_src_a = 1.0 - src_a
            dst_a_src_a = dst_a * src_a
            # Expression tree matches paint.step_wave.
            for ch in range(3):
                dst[:, ch * 256 : (ch + 1) * 256] = dst[
                    :, ch * 256 : (ch + 1) * 256
                ] * inv_src_a + (
                    fill[ch] * inv_dst_a_src_a + blended[ch] * dst_a_src_a
                )
            dst[:, 768:1024] = dst_a * inv_src_a + src_a
            if has_clip:
                return clip_last
            return 0

        if has_clip:
            jax.lax.fori_loop(0, kmax, step, jnp.full((TB, 1), -1, jnp.int32))
        else:
            jax.lax.fori_loop(0, kmax, step, 0)
        out_ref[:, :] = dst[:, :]

    return _kernel


@partial(jax.jit, static_argnames=("k_slots", "features", "ms", "table_mode", "interpret"))
def paint_fold_pallas(
    u_mat,  # i32 [u_alloc, UW] unit rows (tile-then-layer order + DMA slack)
    blkinfo,  # i32 [nblk, BI_W] (reshaped to [nblk, 1, BI_W] for SMEM)
    clear,  # f32 [4]
    k_slots: int,
    features,  # paint.Features — static kernel specialisation
    ms: int,  # gradient stop capacity (st_stops.shape[1])
    table_mode: bool = False,  # meta = [ci|ca|run_tx|style] from the
    #                            one-gather prep (see _make_kernel)
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
    stb = 33 if table_mode else 16
    assert 256 + stb + style_layout(features, ms).width <= UW

    scratch = [
        pltpu.VMEM((win, UW), jnp.int32),
        pltpu.VMEM((TB, UW), jnp.int32),
        pltpu.VMEM((TB, 1), jnp.int32),
    ]
    if table_mode:
        scratch.append(pltpu.VMEM((TB, 1), jnp.int32))
    scratch.append(pltpu.VMEM((TB, 1024), jnp.float32))
    if features.has_gradient:
        scratch.append(pltpu.VMEM((TB, 512), jnp.float32))
    if features.has_clip:
        scratch.append(pltpu.VMEM((TB, 256), jnp.float32))
        scratch.append(pltpu.VMEM((TB, 1), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((win // CH,)))

    out = pl.pallas_call(
        _make_kernel(k_slots, features, ms, table_mode=table_mode),
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
        scratch_shapes=scratch,
        interpret=interpret,
    )(blkinfo.reshape(nblk, 1, BI_W), clear, u_mat)
    return out
