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


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_grid_emits_run_keys(seed):
    """With per-segment keys, the kernel's third output must be each run's
    (key_hi, key_lo) — selected from the run's first segment — matching the
    blocked-compaction extraction it replaces in `runs.run_data`."""
    from forma_tpu.ops.grid_pallas import B, grid_build_pallas

    N, R, NV = 3 * B, 224, int(2.2 * B)
    rid, cell, area, cover, n_runs = _make(N, R, NV, seed)

    rng = np.random.default_rng(100 + seed)
    # One key per run (constant within a run, as after the segment sort);
    # include keys with the high bit set (SENTINEL-like) to exercise the
    # sign-biased max selection.
    kh_of_run = rng.integers(0, 2**32, size=R, dtype=np.uint32)
    kl_of_run = rng.integers(0, 2**32, size=R, dtype=np.uint32)
    kh_of_run[min(n_runs, R - 1)] = 0xFFFFFFFF  # sentinel run
    key_hi = kh_of_run[rid]
    key_lo = kl_of_run[rid]

    grid, rowcov, runkeys = grid_build_pallas(
        jnp.asarray(rid), jnp.asarray(cell),
        jnp.asarray(area), jnp.asarray(cover),
        run_cap=R, interpret=True,
        key_hi=jnp.asarray(key_hi), key_lo=jnp.asarray(key_lo),
    )
    rows = min(n_runs + 1, R)
    runkeys = np.asarray(runkeys)[:rows]
    np.testing.assert_array_equal(runkeys[:, 0], kh_of_run[:rows])
    np.testing.assert_array_equal(runkeys[:, 1], kl_of_run[:rows])
    # The grid itself is unchanged by key emission.
    val = area.astype(np.int64) * 65536 + cover
    ref = np.zeros((R, 256), np.int64)
    np.add.at(ref, (rid, cell), val)
    np.testing.assert_array_equal(
        np.asarray(grid)[:rows].astype(np.int64) & 0xFFFFFFFF,
        ref[:rows].astype(np.uint64).astype(np.int64) & 0xFFFFFFFF,
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_grid_skips_full_sentinel_blocks(seed):
    """A long sentinel tail spanning MULTIPLE full blocks (the padded-key
    fraction of a real frame, ~18% at paris scale) exercises the
    sentinel-block skip: full-sentinel blocks are exact no-ops and the
    kernel bypasses their one-hot/matmul work entirely.  Output must still
    be bit-identical to the scatter, including the sentinel run's key."""
    from forma_tpu.ops.grid_pallas import B, grid_build_pallas

    N, R, NV = 6 * B, 224, int(1.5 * B)  # tail = 4.5 blocks of sentinels
    rid, cell, area, cover, n_runs = _make(N, R, NV, seed)

    rng = np.random.default_rng(200 + seed)
    kh_of_run = rng.integers(0, 2**31, size=R, dtype=np.uint32)
    kl_of_run = rng.integers(0, 2**32, size=R, dtype=np.uint32)
    kh_of_run[min(n_runs, R - 1)] = 0xFFFFFFFF  # SENTINEL key_hi
    key_hi = kh_of_run[rid]
    key_lo = kl_of_run[rid]

    grid, rowcov, runkeys = grid_build_pallas(
        jnp.asarray(rid), jnp.asarray(cell),
        jnp.asarray(area), jnp.asarray(cover),
        run_cap=R, interpret=True,
        key_hi=jnp.asarray(key_hi), key_lo=jnp.asarray(key_lo),
    )
    rows = min(n_runs + 1, R)
    runkeys = np.asarray(runkeys)[:rows]
    np.testing.assert_array_equal(runkeys[:, 0], kh_of_run[:rows])
    np.testing.assert_array_equal(runkeys[:, 1], kl_of_run[:rows])
    val = area.astype(np.int64) * 65536 + cover
    ref = np.zeros((R, 256), np.int64)
    np.add.at(ref, (rid, cell), val)
    np.testing.assert_array_equal(
        np.asarray(grid)[:rows].astype(np.int64) & 0xFFFFFFFF,
        ref[:rows].astype(np.uint64).astype(np.int64) & 0xFFFFFFFF,
    )
    cov = ((np.asarray(grid)[:rows].astype(np.int64) & 0xFFFF) ^ 0x8000) - 0x8000
    np.testing.assert_array_equal(
        np.asarray(rowcov)[:rows], cov.reshape(rows, 16, 16).sum(axis=2)
    )


def test_grid_pallas_full_pipeline_matches_xla(monkeypatch):
    """End-to-end: FORMA_GRID=pallas (interpret on CPU) must render frames
    bit-identical to the XLA scatter path — including the kernel-emitted
    run keys that replace the blocked-compaction extraction."""
    import jax

    from forma_tpu import Color, Composition, Fill, Func, Order, Point, Props, Style
    from forma_tpu.path import PathBuilder
    from forma_tpu.renderer import Renderer

    def _rect(x0, y0, x1, y1):
        return (
            PathBuilder()
            .move_to(Point(x0, y0))
            .line_to(Point(x0, y1))
            .line_to(Point(x1, y1))
            .line_to(Point(x1, y0))
            .build()
        )

    def build(comp):
        rng = np.random.default_rng(3)
        for i in range(24):
            x0, y0 = rng.uniform(-10, 90, 2)
            w, h = rng.uniform(3, 60, 2)
            r, g, b, a = rng.uniform(0, 1, 4)
            comp.get_mut_or_insert_default(Order(i)).insert(
                _rect(x0, y0, x0 + w, y0 + h)
            ).set_props(
                Props(func=Func.Draw(Style(fill=Fill.Solid(Color(r, g, b, a)))))
            )

    frames = {}
    for mode in ("pallas", "xla"):
        monkeypatch.setenv("FORMA_GRID", mode)
        monkeypatch.setenv("FORMA_RUNKEYS", "on")
        jax.clear_caches()
        comp = Composition()
        build(comp)
        frame, _ = Renderer().render_device(
            comp, 96, 80, Color(1.0, 1.0, 1.0, 1.0)
        )
        frames[mode] = np.asarray(frame)
    np.testing.assert_array_equal(frames["pallas"], frames["xla"])
