"""Pallas TPU kernel: per-run area|cover grid build from the sorted
pixel-segment stream.

The XLA scatter that used to build the [run_cap, 256] packed grids costs
~12 ns per index on TPU regardless of index order or scatter flags
(tools/scatter_variants_probe.py) — 85 ms at paris scale, the single
largest item in the frame.  This kernel replaces it with the TPU-native
structure: because segments arrive SORTED by run id (consecutive integers
with no gaps), each block of B segments touches a bounded, consecutive row
window of the grid, and the per-block accumulation becomes two small MXU
matmuls

    out[t, c] = sum_j [rid_j == row_t] * [cell_j == c] * val_j
              = (Sel * val) @ OneHot(cell)

— the same job `paint.wgsl` does with workgroup-shared atomics
(`gpu/painter/paint.wgsl:320-362`), recast as systolic-array work.

Output rows are produced in 32-row chunks aligned to the global grid, with
the current partial chunk accumulated in VMEM scratch across grid steps
(TPU Pallas grids run sequentially) and flushed by double-buffered DMA.
Chunk-aligned flushes are disjoint by construction, so DMA completion order
never matters.

Exactness: per-(run, cell) sums satisfy the reference's i16 accumulator
bounds (`painter/mod.rs:232-245`), so the f32 matmul accumulations are
exact integers (< 2^24) and the packed i32 results are bit-identical to the
XLA scatter's.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Segments per grid step and grid rows per output chunk / DMA flush.
# Defaults re-validated in round 5 (tools/pallas_grid_probe.py --time):
# B=2048 was 2% slower pre-runkeys (onehot cost doubles per block while
# block count halves); env overrides exist for A/B probes only.
B = int(_os.environ.get("FORMA_GRID_B", "1024"))
CROWS = int(_os.environ.get("FORMA_GRID_CROWS", "32"))
NCELL = 256  # cells per run (16x16 tile)


def _kernel(
    seg_ref, grid_ref, rowcov_ref, cbuf, kbuf, sendbuf, sendbuf2, state,
    sems, sems2, *, with_keys: bool,
):
    """One grid step: accumulate block `b`'s segments into chunk-aligned
    grid rows.

    seg_ref [1, 4|6, B] i32 — (rid, cell, area, cover[, key_hi, key_lo])
    rows of this block.
    rowcov_ref [gp, TH] i32 — per-run row sums of cover, emitted at flush
    time from the VMEM-resident chunk (saves the callers' full re-read of
    the 300+ MB grid just to reduce it).  With `with_keys`, lanes 16/17
    additionally carry the run's (key_hi, key_lo) — selected from the
    run's FIRST segment by a masked max over sign-biased i32 key bits
    (exactly one segment per run matches globally, so the max is pure
    selection) — replacing the callers' blocked-compaction key extraction
    (a batched sort + an [R, 2] per-index gather, ~3 ms at paris scale).

    Scratch:
      cbuf   [CROWS, NCELL] i32 — the current partial chunk (persistent)
      kbuf   [2, CROWS, 1] i32 — biased first-segment keys (hi, lo) of the
             chunk's runs
      sendbuf [2, CROWS, NCELL] i32 — DMA staging (double buffer)
      sendbuf2 [2, CROWS, 128] i32 — rowcov DMA staging (cols 16+ zero,
               or run keys in 16/17 when `with_keys`)
      state  [3] i32 SMEM — (current chunk id, flush count, prev block's
             last rid — the cross-block seed for the first-segment mask)
      sems/sems2   DMA((2,)) — per-slot flush semaphores
    """
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    _IMIN = jnp.int32(-(2**31))

    @pl.when(b == 0)
    def _init():
        cbuf[:, :] = jnp.zeros((CROWS, NCELL), jnp.int32)
        state[0] = 0
        state[1] = 0
        state[2] = -1
        if with_keys:
            kbuf[:, :, :] = jnp.full((2, CROWS, 1), _IMIN, jnp.int32)

    rid = seg_ref[0, 0, :]

    # Full-sentinel blocks are exact no-ops: the sort puts sentinel keys
    # last, so once a block STARTS with a sentinel whose run already began
    # in an earlier block (prev rid == rid[0], i.e. lane 0 is not a run
    # boundary), every lane is a boundary-free sentinel with zero
    # area/cover — cbuf += 0 and kbuf max(_IMIN) are identities, and the
    # block's chunk == the current chunk (the previous block ended on the
    # same rid), so no flush is due.  Skipping them drops ~16% of block
    # work at paris shapes (the ~18% key-padding fraction).  Only the
    # keyed path can detect sentinels (a clamped rid is ambiguous).
    if with_keys:
        run_live = jnp.logical_or(
            seg_ref[0, 4, 0] != -1, state[2] != seg_ref[0, 0, 0]
        )
    else:
        run_live = True

    def _accumulate_block():
        q_lo = seg_ref[0, 0, 0] // CROWS
        q_hi = seg_ref[0, 0, B - 1] // CROWS

        if with_keys:
            # First-occurrence mask: rid steps up (nondecreasing, gapless),
            # so a run's first segment is where rid differs from its
            # predecessor; the predecessor of lane 0 is the previous
            # block's last rid (SMEM).
            rid2 = rid[None, :]
            lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
            prev = jnp.where(lane_b == 0, state[2], jnp.roll(rid2, 1, axis=1))
            fm = rid2 != prev  # [1, B]
            # Sign-biased key bits: order-preserving for u32 under i32 max,
            # and SENTINEL (0xFFFFFFFF) stays selectable above the _IMIN
            # identity.
            khb = seg_ref[0, 4, :][None, :] ^ _IMIN
            klb = seg_ref[0, 5, :][None, :] ^ _IMIN

        # One single-pass bf16 matmul covers all three accumulations: the
        # selector matrix stacks three 32-row bands (area>>8, area&255,
        # cover), every band's values exactly representable in bf16, with
        # exact f32 accumulation (integer sums < 2^24).
        onehot = (
            seg_ref[0, 1, :][:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (B, NCELL), 1)
        ).astype(jnp.bfloat16)
        area = seg_ref[0, 2, :]
        cover = seg_ref[0, 3, :]
        a_hi = (area >> 8).astype(jnp.float32)
        a_lo = (area & 255).astype(jnp.float32)
        cov_f = cover.astype(jnp.float32)
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (CROWS, B), 0)

        def chunk_body(q, _):
            selb = rid[None, :] == (q * CROWS + rows_iota)
            sel = selb.astype(jnp.float32)
            m = jnp.concatenate(
                [sel * a_hi[None, :], sel * a_lo[None, :], sel * cov_f[None, :]],
                axis=0,
            ).astype(jnp.bfloat16)
            out = jnp.dot(m, onehot, preferred_element_type=jnp.float32)
            asum = out[0:CROWS] * 256.0 + out[CROWS : 2 * CROWS]
            packed = asum.astype(jnp.int32) * 65536 + out[
                2 * CROWS : 3 * CROWS
            ].astype(jnp.int32)
            if with_keys:
                sf = selb & fm
                kh_c = jnp.max(jnp.where(sf, khb, _IMIN), axis=1, keepdims=True)
                kl_c = jnp.max(jnp.where(sf, klb, _IMIN), axis=1, keepdims=True)
            cq = state[0]  # read BEFORE flush mutates it

            @pl.when(q != cq)
            def _advance():
                flush(q)
                cbuf[:, :] = packed
                if with_keys:
                    kbuf[0] = kh_c
                    kbuf[1] = kl_c

            @pl.when(q == cq)
            def _accum():
                cbuf[:, :] = cbuf[:, :] + packed
                if with_keys:
                    kbuf[0] = jnp.maximum(kbuf[0], kh_c)
                    kbuf[1] = jnp.maximum(kbuf[1], kl_c)

            return 0

        jax.lax.fori_loop(q_lo, q_hi + 1, chunk_body, 0)

    def flush(q_new):
        """DMA the finished chunk (and its cover row sums) out."""
        fc = state[1]
        slot = jnp.bitwise_and(fc, 1)

        # The copy issued two flushes ago used this slot; drain it first.
        @pl.when(fc >= 2)
        def _wait_prev():
            pltpu.make_async_copy(
                sendbuf.at[slot], grid_ref.at[pl.ds(0, CROWS), :],
                sems.at[slot],
            ).wait()
            pltpu.make_async_copy(
                sendbuf2.at[slot], rowcov_ref.at[pl.ds(0, CROWS), :],
                sems2.at[slot],
            ).wait()

        sendbuf[slot] = cbuf[:, :]
        # Row sums of the cover half: cells are ly*16+lx, so rowcov is a
        # [NCELL, 16] one-hot contraction.  (Mosaic can't shape-cast
        # [32,256]->[32,16,16] for a reduce.)  Exact: covers are split into
        # bytes (each exact in bf16) and the per-row byte sums stay < 2^12.
        cover16 = (cbuf[:, :] << 16) >> 16
        b0 = (cover16 & 255).astype(jnp.bfloat16)
        b1 = (cover16 >> 8).astype(jnp.bfloat16)  # signed high byte
        # 128-lane staging (DMA slices need 128-aligned minor dims); the
        # one-hot never matches columns >= 16, so they stay exactly zero.
        oh_ly = (
            jax.lax.broadcasted_iota(jnp.int32, (NCELL, 128), 0) // 16
            == jax.lax.broadcasted_iota(jnp.int32, (NCELL, 128), 1)
        ).astype(jnp.bfloat16)
        s0 = jnp.dot(b0, oh_ly, preferred_element_type=jnp.float32)
        s1 = jnp.dot(b1, oh_ly, preferred_element_type=jnp.float32)
        rcv = s1.astype(jnp.int32) * 256 + s0.astype(jnp.int32)
        if with_keys:
            lanes = jax.lax.broadcasted_iota(jnp.int32, (CROWS, 128), 1)
            rcv = jnp.where(
                lanes == 16, kbuf[0] ^ _IMIN,
                jnp.where(lanes == 17, kbuf[1] ^ _IMIN, rcv),
            )
        sendbuf2[slot] = rcv
        cq = state[0]
        pltpu.make_async_copy(
            sendbuf.at[slot],
            grid_ref.at[pl.ds(cq * CROWS, CROWS), :],
            sems.at[slot],
        ).start()
        pltpu.make_async_copy(
            sendbuf2.at[slot],
            rowcov_ref.at[pl.ds(cq * CROWS, CROWS), :],
            sems2.at[slot],
        ).start()
        state[1] = fc + 1
        state[0] = q_new

    pl.when(run_live)(_accumulate_block)
    if with_keys:
        state[2] = seg_ref[0, 0, B - 1]

    @pl.when(b == nb - 1)
    def _final():
        flush(state[0] + 1)
        fc = state[1]

        @pl.when(fc >= 1)
        def _w1():
            slot = jnp.bitwise_and(fc - 1, 1)
            pltpu.make_async_copy(
                sendbuf.at[slot], grid_ref.at[pl.ds(0, CROWS), :],
                sems.at[slot],
            ).wait()
            pltpu.make_async_copy(
                sendbuf2.at[slot], rowcov_ref.at[pl.ds(0, CROWS), :],
                sems2.at[slot],
            ).wait()

        @pl.when(fc >= 2)
        def _w2():
            slot = jnp.bitwise_and(fc - 2, 1)
            pltpu.make_async_copy(
                sendbuf.at[slot], grid_ref.at[pl.ds(0, CROWS), :],
                sems.at[slot],
            ).wait()
            pltpu.make_async_copy(
                sendbuf2.at[slot], rowcov_ref.at[pl.ds(0, CROWS), :],
                sems2.at[slot],
            ).wait()


@partial(jax.jit, static_argnames=("run_cap", "interpret"))
def grid_build_pallas(
    rid, cell, area, cover, run_cap: int, interpret: bool = False,
    key_hi=None, key_lo=None,
):
    """Builds the packed [run_cap_pad, NCELL] i32 grid from run-sorted
    segments.

    rid   i32 [N] nondecreasing, gapless run ids (clamped < run_cap)
    cell  i32 [N] in [0, 256)
    area  i32 [N], cover i32 [N] (padding entries contribute 0)
    key_hi/key_lo  optional u32 [N] per-segment sort keys (constant within
    a run); when given, a third return carries each run's (key_hi, key_lo)

    N must be a multiple of 512.  Returns (grid, rowcov[, runkeys]): the
    packed grid, the per-run [*, 16] row sums of its cover half, and (with
    keys) the per-run [*, 2] u32 keys, all with run_cap padded up to a
    multiple of 32; rows beyond the last run id are UNINITIALIZED —
    callers must mask by run validity (they already do).  (rowcov and
    runkeys share one [*, 128] staging buffer — DMA minor-dim alignment.)
    """
    n = rid.shape[0]
    assert n % B == 0, n
    nb = n // B
    gp = -(-run_cap // CROWS) * CROWS
    with_keys = key_hi is not None

    cols = [
        rid.reshape(nb, B),
        cell.reshape(nb, B),
        area.reshape(nb, B),
        cover.reshape(nb, B),
    ]
    if with_keys:
        cols.append(
            jax.lax.bitcast_convert_type(key_hi, jnp.int32).reshape(nb, B)
        )
        cols.append(
            jax.lax.bitcast_convert_type(key_lo, jnp.int32).reshape(nb, B)
        )
    seg = jnp.stack(cols, axis=1)  # [nb, 4|6, B]
    ncols = len(cols)

    grid, rowcov = pl.pallas_call(
        partial(_kernel, with_keys=with_keys),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, ncols, B), lambda b: (b, 0, 0))],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, NCELL), jnp.int32),
            jax.ShapeDtypeStruct((gp, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((CROWS, NCELL), jnp.int32),
            pltpu.VMEM((2, CROWS, 1), jnp.int32),
            pltpu.VMEM((2, CROWS, NCELL), jnp.int32),
            pltpu.VMEM((2, CROWS, 128), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg)
    if with_keys:
        runkeys = jax.lax.bitcast_convert_type(
            rowcov[:, 16:18], jnp.uint32
        )
        return grid, rowcov[:, :16], runkeys
    return grid, rowcov[:, :16]
