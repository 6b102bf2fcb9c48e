"""Differential tests (interpret mode) of the Pallas kernels against the
XLA gather path in `rasterize_sort`: the default monotonic-expand kernel
and the FORMA_EXPAND=fused variant (a recorded negative for perf, kept
bit-exact).  The bench's on-device golden verify guards the compiled
kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forma_tpu.ops.expand_pallas import (VB, expand_params_pallas,
                                          rasterize_blocks_pallas)
from forma_tpu.ops.line_setup import N_PARAMS, PLEN, PSLOT
from forma_tpu.ops.rasterize import _emit_packed


from functools import partial


@partial(
    jax.jit,
    static_argnames=("v_cap", "k_seg", "rows", "tiles_x", "slot_bits",
                     "tx_bits"),
)
def _xla_reference(params, vline_ends, v_total, v_cap, k_seg, rows,
                   tiles_x, slot_bits, tx_bits):
    """The XLA gather path from rasterize_sort.  Jitted: the comparison is
    compiled-vs-compiled — XLA may fuse the ff64 chain with excess
    precision (e.g. mul+add -> fma), so op-by-op eager evaluation can
    differ by one ULP on rare elements and flip a ceil; the production
    pipeline always runs this code under jit."""
    L = params.shape[0]
    iota_v = jnp.arange(v_cap, dtype=jnp.uint32)
    v_live = iota_v < jnp.uint32(v_total)
    ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
    line_id = jnp.cumsum(
        jnp.zeros(v_cap + 1, jnp.int32).at[ends].add(1, mode="drop")[:-1]
    )
    base = jax.lax.cummax(
        jnp.zeros(v_cap + 1, jnp.uint32)
        .at[ends]
        .max(vline_ends, mode="drop")[:-1]
    )
    li = jnp.minimum(line_id, L - 1)
    j = (iota_v - base).astype(jnp.int32)
    P = params[li]
    return _emit_packed(
        lambda i: P[:, i], j, v_live, k_seg, rows, tiles_x, 0,
        slot_bits, tx_bits,
    )


def _case(rng, L, with_dead_runs, width=512, height=256):
    """Random line-setup-shaped inputs (incl. runs of dead lines)."""
    from forma_tpu.ops.line_setup import line_setup

    n = L + 1
    px = (rng.standard_normal(n) * width * 0.7).astype(np.float32)
    py = (rng.standard_normal(n) * height * 0.7).astype(np.float32)
    line_slot = np.zeros(L, np.int32)
    if with_dead_runs:
        line_slot[100:400] = -1  # long culled stretches
        line_slot[: L // 3] = np.where(
            rng.random(L // 3) < 0.6, -1, line_slot[: L // 3]
        )
    g_slot = np.asarray([3], np.int32)
    g_valid = np.asarray([True])
    g_t = np.asarray([[1, 0, 0, 1, 0, 0]], np.float32)
    g_has_t = np.asarray([False])
    params, slots, lengths, vline_ends = line_setup(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(line_slot),
        jnp.asarray(g_slot), jnp.asarray(g_valid), jnp.asarray(g_t),
        jnp.asarray(g_has_t), width, height, k_seg=8,
    )
    return params, lengths, vline_ends


@pytest.mark.parametrize("with_dead_runs", [False, True])
def test_fused_rasterize_matches_gather(with_dead_runs):
    rng = np.random.default_rng(7 + with_dead_runs)
    L = 3000
    params, lengths, vline_ends = _case(rng, L, with_dead_runs)
    v_total = int(np.asarray(vline_ends)[-1])
    v_cap = -(-(v_total + 7) // VB) * VB + VB  # padding beyond total
    rows, tiles_x, slot_bits, tx_bits = 16, 32, 6, 7
    k_seg = 8

    got_p, got_d = rasterize_blocks_pallas(
        params, lengths > 0, vline_ends, jnp.uint32(v_total), jnp.int32(0),
        v_cap, k_seg, rows, tiles_x, slot_bits, tx_bits, interpret=True,
    )
    ref_p, ref_d = _xla_reference(
        params, vline_ends, v_total, v_cap, k_seg, rows, tiles_x,
        slot_bits, tx_bits,
    )
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


def test_fused_rasterize_row_lo_shard():
    """row_lo offsets tile rows (the shard_map path)."""
    rng = np.random.default_rng(11)
    params, lengths, vline_ends = _case(rng, 200, False)
    v_total = int(np.asarray(vline_ends)[-1])
    v_cap = -(-v_total // VB) * VB + 512  # not a multiple of VB
    assert v_cap % VB != 0
    rows, tiles_x, slot_bits, tx_bits = 8, 32, 6, 7
    got_p, got_d = rasterize_blocks_pallas(
        params, lengths > 0, vline_ends, jnp.uint32(v_total), jnp.int32(4),
        v_cap, 8, rows, tiles_x, slot_bits, tx_bits, interpret=True,
    )
    L = params.shape[0]
    iota_v = jnp.arange(v_cap, dtype=jnp.uint32)
    v_live = iota_v < jnp.uint32(v_total)
    ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
    line_id = jnp.cumsum(
        jnp.zeros(v_cap + 1, jnp.int32).at[ends].add(1, mode="drop")[:-1]
    )
    base = jax.lax.cummax(
        jnp.zeros(v_cap + 1, jnp.uint32)
        .at[ends]
        .max(vline_ends, mode="drop")[:-1]
    )
    li = jnp.minimum(line_id, L - 1)
    j = (iota_v - base).astype(jnp.int32)
    P = params[li]
    ref_p, ref_d = jax.jit(
        lambda P, j, v_live: _emit_packed(
            lambda i: P[:, i], j, v_live, 8, rows, tiles_x, jnp.int32(4),
            slot_bits, tx_bits,
        )
    )(P, j, v_live)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(ref_d))


# -- the default expand-only kernel ------------------------------------------

def _expand_xla_reference(params, live, vline_ends, v_cap):
    """The gather path from rasterize_sort, with zeroed padding rows to
    match the kernel's contract (padding vlines are fully masked
    downstream either way)."""
    L = params.shape[0]
    iota_v = jnp.arange(v_cap, dtype=jnp.uint32)
    ends = jnp.minimum(vline_ends, jnp.uint32(v_cap)).astype(jnp.int32)
    line_id = jnp.cumsum(
        jnp.zeros(v_cap + 1, jnp.int32).at[ends].add(1, mode="drop")[:-1]
    )
    base = jax.lax.cummax(
        jnp.zeros(v_cap + 1, jnp.uint32)
        .at[ends]
        .max(vline_ends, mode="drop")[:-1]
    )
    li = jnp.minimum(line_id, L - 1)
    j = (iota_v - base).astype(jnp.int32)
    P = params[li]
    v_total = int(vline_ends[-1])
    return np.asarray(P.T), np.asarray(j), v_total


def _expand_case(rng, L, with_dead_runs):
    """Random lengths (incl. runs of dead lines) -> params/live/ends."""
    lengths = rng.integers(0, 25, size=L)
    if with_dead_runs:
        # long culled stretches: the case that breaks naive (non-compact)
        # 1024-line windows
        lengths[100:400] = 0
        lengths[: L // 3] = np.where(
            rng.random(L // 3) < 0.7, 0, lengths[: L // 3]
        )
    vcounts = -(-lengths // 8)  # ceil(len / k_seg), 0 for dead lines
    ends = np.cumsum(vcounts).astype(np.uint32)
    params = rng.standard_normal((L, N_PARAMS)).astype(np.float32)
    params[:, 4] = np.where(rng.random(L) < 0.1, np.inf, params[:, 4])
    params[:, 14] = rng.integers(0, 1 << 20, size=L)  # slot-like ints
    params[:, 15] = lengths
    live = lengths > 0
    return params, live, ends


@pytest.mark.parametrize("with_dead_runs", [False, True])
def test_expand_params_matches_gather(with_dead_runs):
    rng = np.random.default_rng(7 + with_dead_runs)
    L = 3000
    params, live, ends = _expand_case(rng, L, with_dead_runs)
    v_cap = VB * 8
    assert int(ends[-1]) < v_cap

    pt, j = expand_params_pallas(
        jnp.asarray(params), jnp.asarray(live), jnp.asarray(ends),
        v_cap, interpret=True,
    )
    ref_pt, ref_j, v_total = _expand_xla_reference(
        jnp.asarray(params), live, jnp.asarray(ends), v_cap
    )

    pt = np.asarray(pt)
    j = np.asarray(j)
    # Live region must match the gather path BIT-exactly (incl. inf params).
    np.testing.assert_array_equal(
        pt[:, :v_total].view(np.uint32), ref_pt[:, :v_total].view(np.uint32)
    )
    np.testing.assert_array_equal(j[:v_total], ref_j[:v_total])
    # Padding rows are zero (dead-line contract: length column == 0).
    assert (pt[:, v_total:] == 0).all()


def test_expand_params_vcap_not_block_multiple():
    rng = np.random.default_rng(11)
    params, live, ends = _expand_case(rng, 300, False)
    v_cap = VB + 512  # not a multiple of VB
    assert int(ends[-1]) < v_cap
    pt, j = expand_params_pallas(
        jnp.asarray(params), jnp.asarray(live), jnp.asarray(ends),
        v_cap, interpret=True,
    )
    ref_pt, ref_j, v_total = _expand_xla_reference(
        jnp.asarray(params), live, jnp.asarray(ends), v_cap
    )
    np.testing.assert_array_equal(
        np.asarray(pt)[:, :v_total].view(np.uint32),
        ref_pt[:, :v_total].view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(j)[:v_total], ref_j[:v_total])
