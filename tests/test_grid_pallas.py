"""The Pallas grid-build kernel must be bit-identical to the XLA scatter it
replaces (interpret mode here; tools/pallas_grid_probe.py re-proves it on
real TPU hardware, where the kernel is ~6.5x faster)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _make(N, R, NV, seed):
    rng = np.random.default_rng(seed)
    run_len = rng.geometric(1.0 / 6.0, size=R)
    rid = np.repeat(np.arange(R), run_len)[:NV]
    NV = len(rid)
    n_runs = int(rid[-1]) + 1
    rid = np.concatenate([rid, np.full(N - NV, min(n_runs, R - 1))])
    cell = rng.integers(0, 256, size=N).astype(np.int32)
    area = rng.integers(-1024, 1024, size=N).astype(np.int32)
    cover = rng.integers(-16, 17, size=N).astype(np.int32)
    area[NV:] = 0
    cover[NV:] = 0
    return rid.astype(np.int32), cell, area, cover, n_runs


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_grid_matches_xla_scatter(seed):
    from forma_tpu.ops.grid_pallas import B, grid_build_pallas

    N, R, NV = 2 * B, 192, int(1.5 * B)
    rid, cell, area, cover, n_runs = _make(N, R, NV, seed)

    val = area.astype(np.int64) * 65536 + cover
    ref = np.zeros((R, 256), np.int64)
    np.add.at(ref, (rid, cell), val)
    ref = ref.astype(np.uint64).astype(np.int64) & 0xFFFFFFFF

    got, rowcov = grid_build_pallas(
        jnp.asarray(rid), jnp.asarray(cell),
        jnp.asarray(area), jnp.asarray(cover),
        run_cap=R, interpret=True,
    )
    got = np.asarray(got)[:R]
    rows = min(n_runs + 1, R)  # rows beyond the last run id are undefined
    np.testing.assert_array_equal(
        got[:rows].astype(np.int64) & 0xFFFFFFFF, ref[:rows]
    )
    # rowcov output == row sums of the cover half.
    cov = ((got[:rows].astype(np.int64) & 0xFFFF) ^ 0x8000) - 0x8000
    np.testing.assert_array_equal(
        np.asarray(rowcov)[:rows], cov.reshape(rows, 16, 16).sum(axis=2)
    )


def test_pallas_grid_single_giant_run():
    """One run spanning many blocks exercises the cross-step carry chunk."""
    from forma_tpu.ops.grid_pallas import B, grid_build_pallas

    N = 4 * B
    rng = np.random.default_rng(7)
    rid = np.zeros(N, np.int32)
    rid[-B // 2 :] = 1  # a second run at the tail
    cell = rng.integers(0, 256, size=N).astype(np.int32)
    area = rng.integers(-64, 64, size=N).astype(np.int32)
    cover = rng.integers(-16, 17, size=N).astype(np.int32)

    val = area.astype(np.int64) * 65536 + cover
    ref = np.zeros((64, 256), np.int64)
    np.add.at(ref, (rid, cell), val)

    got = np.asarray(
        grid_build_pallas(
            jnp.asarray(rid), jnp.asarray(cell),
            jnp.asarray(area), jnp.asarray(cover),
            run_cap=64, interpret=True,
        )[0]
    )
    np.testing.assert_array_equal(
        got[:2].astype(np.int64) & 0xFFFFFFFF,
        ref[:2].astype(np.uint64).astype(np.int64) & 0xFFFFFFFF,
    )
