"""Pallas TPU kernel: monotonic per-line parameter expansion for the
rasterizer.

The rasterizer needs every virtual line to carry its owning line's 16
f32 parameters.  As an XLA gather (`params[li]`) this costs per INDEX
(~12 ns/row: 13.8 ms at paris scale), and the [V, 16] result forces seven
strided column slices (~9 ms more).  But `li` is NONDECREASING — the
expansion is a run-length decode, which is MXU work, not gather work:

    out[c, v] = params[li[v], c] = sum_t onehot[t, v] * window[c, t]

Per 1024-vline block, `li` advances at most 1023 (in COMPACT live-line
space — every live line owns >= 1 vline), so one dynamic 1024-line window
DMA covers the block and the expand is a single [67, 1024] x [1024, 1024]
bf16 matmul with f32 accumulation.

Exactness: f32 params are bit-split into 4 unsigned bytes (and the
prev-end column into 3), each exactly representable in bf16; the one-hot
selector makes every output element a sum with exactly one non-zero term,
so accumulation is exact and the i32 reassembly + bitcast reproduces the
input bits. The bitcast happens on integer-reassembled values inside the
kernel (NOT an f32 gather of integer bit patterns — the round-2 denormal
hazard, commit 7846741, does not apply: no f32 arithmetic ever touches
the bit patterns).

Outputs: params transposed [16, V] f32 (row reads replace the column
slices) and j [V] i32, the vline's index within its line (replacing the
prefix-max `base` machinery).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VB = 1024  # vlines per block == line-window size
VBW = VB + 128  # line window: VB span + 128 for lane-aligned DMA starts
NP = 16  # params per line (line_setup N_PARAMS)
NR = 4 * NP + 3  # matmul rows: 4 byte-parts x 16 cols + 3 prev-end bytes


def _kernel(li_ref, pct_hbm, ends_hbm, pt_ref, j_ref, pwin, ewin, sems):
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
        _kernel,
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
