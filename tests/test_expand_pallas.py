"""Differential test of the Pallas monotonic-expand kernel (interpret mode)
against the XLA gather path it replaces in `rasterize_sort`
(tools/pallas grid/expand probes re-prove on real TPU; the bench's golden
verify guards the compiled kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from forma_tpu.ops.expand_pallas import VB, expand_params_pallas
from forma_tpu.ops.line_setup import N_PARAMS


def _xla_reference(params, live, vline_ends, v_cap):
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


def _case(rng, L, with_dead_runs):
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
def test_expand_matches_gather(with_dead_runs):
    rng = np.random.default_rng(7 + with_dead_runs)
    L = 3000
    params, live, ends = _case(rng, L, with_dead_runs)
    v_cap = VB * 8
    assert int(ends[-1]) < v_cap

    pt, j = expand_params_pallas(
        jnp.asarray(params), jnp.asarray(live), jnp.asarray(ends),
        v_cap, interpret=True,
    )
    ref_pt, ref_j, v_total = _xla_reference(
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


def test_expand_vcap_not_block_multiple():
    rng = np.random.default_rng(11)
    params, live, ends = _case(rng, 300, False)
    v_cap = VB + 512  # not a multiple of VB
    assert int(ends[-1]) < v_cap
    pt, j = expand_params_pallas(
        jnp.asarray(params), jnp.asarray(live), jnp.asarray(ends),
        v_cap, interpret=True,
    )
    ref_pt, ref_j, v_total = _xla_reference(
        jnp.asarray(params), live, jnp.asarray(ends), v_cap
    )
    np.testing.assert_array_equal(
        np.asarray(pt)[:, :v_total].view(np.uint32),
        ref_pt[:, :v_total].view(np.uint32),
    )
    np.testing.assert_array_equal(np.asarray(j)[:v_total], ref_j[:v_total])
