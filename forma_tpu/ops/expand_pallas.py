"""Pallas TPU kernel: fused monotonic parameter expansion + rasterization.

The rasterizer needs every virtual line to carry its owning line's 16 f32
parameters, then runs dense per-segment math over them.  As XLA ops the
expansion is a gather (`params[li]`, ~12 ns/row: 13.8 ms at paris scale)
plus prefix-scan machinery and strided column slices (~9 ms more), and the
[16, V] parameter matrix makes a 71 MB HBM round trip.  But `li` is
NONDECREASING — the expansion is a run-length decode, which is MXU work,
not gather work:

    out[c, v] = params[li[v], c] = sum_t onehot[t, v] * window[c, t]

Per 1024-vline block, `li` advances at most 1023 (in COMPACT live-line
space — every live line owns >= 1 vline), so one dynamic 1024-line window
DMA covers the block and the expand is a single [67, 1152] x [1152, 1024]
bf16 matmul with f32 accumulation.  The fused kernel then evaluates the
ff64 i-th-intersection math and key/payload packing
(`rasterize._emit_packed` — the SAME jnp code the XLA path runs, traced
into the kernel, so the two paths are bit-identical by construction) on
the VMEM-resident parameters and emits sort-ready (packed key, payload)
blocks; the parameter matrix never exists in HBM.

Exactness: f32 params are bit-split into 4 unsigned bytes (and the
prev-end column into 3), each exactly representable in bf16; the one-hot
selector makes every output element a sum with exactly one non-zero term,
so accumulation is exact and the i32 reassembly + bitcast reproduces the
input bits.  The bitcast happens on integer-reassembled values inside the
kernel (NOT an f32 gather of integer bit patterns — the round-2 denormal
hazard, commit 7846741, does not apply: no f32 arithmetic ever touches
the bit patterns).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VB = 1024  # vlines per block == line-window span
VBW = VB + 128  # line window: VB span + 128 for lane-aligned DMA starts
NP = 16  # params per line (line_setup N_PARAMS)
NR = 4 * NP + 3  # matmul rows: 4 byte-parts x 16 cols + 3 prev-end bytes



def _expand_kernel(li_ref, pct_hbm, ends_hbm, pt_ref, j_ref, pwin, ewin, sems):
    """One grid step: expand block b's vlines.

    li_ref [1, 1, VB] i32 — compact line ids of this block's vlines (VMEM).
    pct_hbm [64, Lpad] bf16 — byte-split params, transposed (HBM/ANY).
    ends_hbm [1, Lpad] i32 — prev-end per compact line (HBM/ANY).
    pt_ref [16, VB] f32 out; j_ref [1, VB] i32 out.
    pwin [64, VBW] bf16, ewin [1, VBW] i32 — window scratch.
    """
    lo = li_ref[0, 0, 0]
    # DMA lane offsets must be provably 128-aligned; round the window start
    # down (the window is 128 wider than the block's max li span).
    lo_al = pl.multiple_of((lo // 128) * 128, 128)

    cp1 = pltpu.make_async_copy(
        pct_hbm.at[:, pl.ds(lo_al, VBW)], pwin, sems.at[0]
    )
    cp2 = pltpu.make_async_copy(
        ends_hbm.at[:, pl.ds(lo_al, VBW)], ewin, sems.at[1]
    )
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    li_rel = li_ref[0, 0, :] - lo_al  # [VB] in [0, VBW)
    sel = (
        jax.lax.broadcasted_iota(jnp.int32, (VBW, VB), 0)
        == li_rel[None, :]
    ).astype(jnp.bfloat16)  # [VBW(t), VB(v)] one-hot columns

    e = ewin[0, :]
    ebytes = jnp.concatenate(
        [
            (e & 255)[None, :],
            ((e >> 8) & 255)[None, :],
            ((e >> 16) & 255)[None, :],
        ],
        axis=0,
    ).astype(jnp.bfloat16)  # [3, VB]
    m = jnp.concatenate([pwin[:, :], ebytes], axis=0)  # [NR, VB(t)]

    out = jnp.dot(m, sel, preferred_element_type=jnp.float32)  # [NR, VB(v)]

    b = out.astype(jnp.int32)  # every element is an exact byte value
    words = (
        b[0:NP]
        | (b[NP : 2 * NP] << 8)
        | (b[2 * NP : 3 * NP] << 16)
        | (b[3 * NP : 4 * NP] << 24)
    )  # [16, VB] i32 — original f32 bit patterns
    pt_ref[:, :] = jax.lax.bitcast_convert_type(words, jnp.float32)

    base = (
        b[NR - 3 : NR - 2]
        | (b[NR - 2 : NR - 1] << 8)
        | (b[NR - 1 : NR] << 16)
    )  # [1, VB]
    v0 = pl.program_id(0) * VB
    vv = v0 + jax.lax.broadcasted_iota(jnp.int32, (1, VB), 1)
    j_ref[:, :] = vv - base


@partial(jax.jit, static_argnames=("v_cap", "interpret"))
def expand_params_pallas(
    params,  # f32 [L, 16] per-line constants
    live,  # bool [L] line emits >= 1 vline
    vline_ends,  # u32 [L] inclusive cumsum of per-line vline counts
    v_cap: int,
    interpret: bool = False,
):
    """Returns (params_t f32 [16, v_cap], j i32 [v_cap]).

    params_t[:, v] is row li[v] of `params` (li = owning line of vline v);
    j[v] is the vline's index within its line.  Rows for padding vlines
    (>= the true vline total) are ZERO — their line length is 0, which
    downstream masking already treats as dead.
    """
    L = params.shape[0]
    assert v_cap < (1 << 24)
    vpad = -(-v_cap // VB) * VB
    nb = vpad // VB
    Lpad = L + VBW  # window overrun room

    # Compact live-line space: cli[i] = #live lines before i.  In this
    # space li advances <= 1 per vline, bounding every block's window.
    live_i = live.astype(jnp.int32)
    cli = jnp.cumsum(live_i) - live_i  # exclusive: compact index per line

    # Byte-split params (bitcast -> 4 exact bf16 byte planes), scatter rows
    # to compact positions, transpose for contiguous window DMAs.
    w = jax.lax.bitcast_convert_type(params, jnp.int32)  # [L, 16]
    psplit = jnp.concatenate(
        [
            (w & 255),
            ((w >> 8) & 255),
            ((w >> 16) & 255),
            ((w >> 24) & 255),
        ],
        axis=1,
    ).astype(jnp.bfloat16)  # [L, 64]
    rows = jnp.where(live, cli, Lpad)  # drop dead lines
    pc = (
        jnp.zeros((Lpad, 4 * NP), jnp.bfloat16)
        .at[rows]
        .set(psplit, mode="drop")
    )
    pct = pc.T  # [64, Lpad]

    # Prev-end per compact line: ends_full[cli[i] + 1] = vline_ends[i] for
    # live i; ends_full[0] = 0.  (The window at compact line t then reads
    # its own exclusive vline start.)
    ends_full = (
        jnp.zeros((1, Lpad), jnp.int32)
        .at[0, jnp.where(live, cli + 1, Lpad)]
        .set(vline_ends.astype(jnp.int32), mode="drop")
    )

    # Compact line id per vline: 1 scatter + cumsum (live ends are strictly
    # increasing, so increments are <= 1 per position — the window bound).
    ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
    li_c = jnp.cumsum(
        jnp.zeros(vpad + 1, jnp.int32).at[ends].add(live_i, mode="drop")[:-1]
    )
    li_blk = li_c.reshape(nb, 1, VB)

    pt, j = pl.pallas_call(
        _expand_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1, VB), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((NP, VB), lambda b: (0, b)),
            pl.BlockSpec((1, VB), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, vpad), jnp.float32),
            jax.ShapeDtypeStruct((1, vpad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4 * NP, VBW), jnp.bfloat16),
            pltpu.VMEM((1, VBW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(li_blk, pct, ends_full)
    return pt[:, :v_cap], j[0, :v_cap]


@partial(
    jax.jit,
    static_argnames=(
        "v_cap", "k_seg", "rows", "tiles_x", "slot_bits", "tx_bits",
        "interpret",
    ),
)
def rasterize_blocks_pallas(
    params,  # f32 [L, 16] per-line constants
    live,  # bool [L] line emits >= 1 vline
    vline_ends,  # u32 [L] inclusive cumsum of per-line vline counts
    v_total,  # traced u32/i32 scalar: live vline count
    row_lo,  # traced i32 scalar: this shard's first tile row
    v_cap: int,
    k_seg: int,
    rows: int,
    tiles_x: int,
    slot_bits: int,
    tx_bits: int,
    interpret: bool = False,
):
    """Returns (packed u32 [k_seg, v_cap], payload u32 [k_seg, v_cap]) —
    exactly `rasterize._emit_packed` over the expanded parameters.

    RECORDED NEGATIVE RESULT (kept behind FORMA_EXPAND=fused): fusing the
    ff64 math into the kernel is bit-exact (32/32 on-device goldens) but
    ~400 us/block — Mosaic lowers the long ff64 select/compare chain on
    [8, 1024] tiles far worse than XLA's fused elementwise does at full
    width (528 ms/frame vs 98.5).  The default path is
    `expand_params_pallas` + the XLA-side `_emit_packed`."""
    from .rasterize import _emit_packed

    L = params.shape[0]
    assert v_cap < (1 << 24)
    vpad = -(-v_cap // VB) * VB
    nb = vpad // VB
    Lpad = L + VBW  # window overrun room

    # Compact live-line space: cli[i] = #live lines before i.  In this
    # space li advances <= 1 per vline, bounding every block's window.
    live_i = live.astype(jnp.int32)
    cli = jnp.cumsum(live_i) - live_i  # exclusive: compact index per line

    # Byte-split params (bitcast -> 4 exact bf16 byte planes), scatter rows
    # to compact positions, transpose for contiguous window DMAs.
    w = jax.lax.bitcast_convert_type(params, jnp.int32)  # [L, 16]
    psplit = jnp.concatenate(
        [
            (w & 255),
            ((w >> 8) & 255),
            ((w >> 16) & 255),
            ((w >> 24) & 255),
        ],
        axis=1,
    ).astype(jnp.bfloat16)  # [L, 64]
    rows_idx = jnp.where(live, cli, Lpad)  # drop dead lines
    pc = (
        jnp.zeros((Lpad, 4 * NP), jnp.bfloat16)
        .at[rows_idx]
        .set(psplit, mode="drop")
    )
    pct = pc.T  # [64, Lpad]

    # Prev-end per compact line: ends_full[cli[i] + 1] = vline_ends[i] for
    # live i; ends_full[0] = 0.  (The window at compact line t then reads
    # its own exclusive vline start.)
    ends_full = (
        jnp.zeros((1, Lpad), jnp.int32)
        .at[0, jnp.where(live, cli + 1, Lpad)]
        .set(vline_ends.astype(jnp.int32), mode="drop")
    )

    # Compact line id per vline: 1 scatter + cumsum (live ends are strictly
    # increasing, so increments are <= 1 per position — the window bound).
    ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
    li_c = jnp.cumsum(
        jnp.zeros(vpad + 1, jnp.int32).at[ends].add(live_i, mode="drop")[:-1]
    )
    li_blk = li_c.reshape(nb, 1, VB)

    scal = jnp.stack(
        [jnp.asarray(row_lo, jnp.int32), jnp.asarray(v_total, jnp.int32)]
    )

    def _kernel(scal_ref, li_ref, pct_hbm, ends_hbm,
                packed_ref, payload_ref, pwin, ewin, sems):
        """One grid step: expand + rasterize block b's vlines.

        scal_ref SMEM [2] i32 — (row_lo, v_total).
        li_ref [1, 1, VB] i32 — compact line ids of this block's vlines.
        pct_hbm [64, Lpad] bf16 / ends_hbm [1, Lpad] i32 — windows (ANY).
        packed_ref/payload_ref [k_seg, VB] u32 out.
        pwin [64, VBW] bf16, ewin [1, VBW] i32 — window scratch.
        """
        lo = li_ref[0, 0, 0]
        # DMA lane offsets must be provably 128-aligned; round the window
        # start down (the window is 128 wider than the block's max span).
        lo_al = pl.multiple_of((lo // 128) * 128, 128)

        cp1 = pltpu.make_async_copy(
            pct_hbm.at[:, pl.ds(lo_al, VBW)], pwin, sems.at[0]
        )
        cp2 = pltpu.make_async_copy(
            ends_hbm.at[:, pl.ds(lo_al, VBW)], ewin, sems.at[1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()

        li_rel = li_ref[0, 0, :] - lo_al  # [VB] in [0, VBW)
        sel = (
            jax.lax.broadcasted_iota(jnp.int32, (VBW, VB), 0)
            == li_rel[None, :]
        ).astype(jnp.bfloat16)  # [VBW(t), VB(v)] one-hot columns

        e = ewin[0, :]
        ebytes = jnp.concatenate(
            [
                (e & 255)[None, :],
                ((e >> 8) & 255)[None, :],
                ((e >> 16) & 255)[None, :],
            ],
            axis=0,
        ).astype(jnp.bfloat16)  # [3, VBW]
        m = jnp.concatenate([pwin[:, :], ebytes], axis=0)  # [NR, VBW(t)]

        out = jnp.dot(m, sel, preferred_element_type=jnp.float32)

        b = out.astype(jnp.int32)  # every element is an exact byte value
        words = (
            b[0:NP]
            | (b[NP : 2 * NP] << 8)
            | (b[2 * NP : 3 * NP] << 16)
            | (b[3 * NP : 4 * NP] << 24)
        )  # [16, VB] i32 — original f32 bit patterns
        pf = jax.lax.bitcast_convert_type(words, jnp.float32)

        base = (
            b[NR - 3 : NR - 2]
            | (b[NR - 2 : NR - 1] << 8)
            | (b[NR - 1 : NR] << 16)
        )  # [1, VB]
        v0 = pl.program_id(0) * VB
        vv = v0 + jax.lax.broadcasted_iota(jnp.int32, (1, VB), 1)
        j = (vv - base)[0, :]  # [VB] vline index within its line
        v_live = vv[0, :] < scal_ref[1]

        packed, payload = _emit_packed(
            lambda i: pf[i, :], j, v_live, k_seg, rows, tiles_x,
            scal_ref[0], slot_bits, tx_bits,
        )
        packed_ref[:, :] = packed
        payload_ref[:, :] = payload

    packed, payload = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, VB), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((k_seg, VB), lambda b: (0, b)),
            pl.BlockSpec((k_seg, VB), lambda b: (0, b)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k_seg, vpad), jnp.uint32),
            jax.ShapeDtypeStruct((k_seg, vpad), jnp.uint32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4 * NP, VBW), jnp.bfloat16),
            pltpu.VMEM((1, VBW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(scal, li_blk, pct, ends_full)
    return packed[:, :v_cap], payload[:, :v_cap]
