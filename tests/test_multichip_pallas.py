"""Pallas kernels under shard_map: the TPU defaults (Pallas grid kernel,
kernel-emitted run keys, Pallas expand, Pallas paint fold) must produce the
same sharded == single-chip bit-equality the XLA paths do.

On the virtual CPU mesh the kernels run in interpret mode, which is
bit-identical to the compiled kernels by their own differential tests; what
THIS module validates is the kernels' interaction with shard_map itself
(vma metadata, per-shard grid sizes, the all_to_all interposition) — the
combination the advisor flagged as unvalidated when the defaults went on
(ADVICE.md round 3, medium).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _scene_args(comp, width, height):
    from forma_tpu import Color
    from forma_tpu.ops import pipeline as pipe
    from forma_tpu.ops import styles as styles_mod
    from forma_tpu.renderer import Renderer

    r = Renderer()
    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host = styles_mod.build_style_tables(comp.layers)
    st = pipe.style_tables_device(st_host)
    g_slot, g_valid, g_t, g_has_t = r._geom_tables(comp, uniq, st_host.orders)
    clear = jnp.asarray(Color(1.0, 1.0, 1.0, 1.0).to_array(), jnp.float32)
    single = (px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear)
    pairs = r._prepare_line_pairs(comp, 8)
    sharded = (*pairs[:5], g_slot, g_valid, g_t, g_has_t, st, clear)
    return single, sharded, st_host.features


@pytest.fixture
def _force_pallas(monkeypatch):
    """Force every Pallas default ON (env read at trace time)."""
    monkeypatch.setenv("FORMA_GRID", "pallas")
    monkeypatch.setenv("FORMA_EXPAND", "pallas")
    monkeypatch.setenv("FORMA_FOLD", "pallas")
    monkeypatch.setenv("FORMA_RUNKEYS", "on")
    jax.clear_caches()
    yield
    jax.clear_caches()


def _build_scene():
    from forma_tpu import Composition
    from forma_tpu.demos import scenes

    comp = Composition()
    width = 64
    height = 2 * 16 * 8
    # Solid translucent circles: Over-only solid fills keep the frame
    # inside the Pallas paint fold's eligibility set.
    scenes.circles(comp, 16, width, height)
    return comp, width, height


def test_row_sharded_pallas_matches_single_chip(_force_pallas):
    from forma_tpu.ops import pipeline as pipe

    n = 8
    assert len(jax.devices()) >= n
    mesh = jax.make_mesh((n,), ("rows",))
    comp, width, height = _build_scene()
    rows_per_shard = (-(-height // 16)) // n
    single, _, features = _scene_args(comp, width, height)
    caps = pipe.Caps(vline=2048, run=2048, virt=2048, k=8)

    frame_s, diag_s = pipe.render_frame_sharded(
        *single,
        width=width, height=height,
        rows=rows_per_shard, tiles_x=width // 16,
        caps=caps, features=features, channels=(0, 1, 2, 3), mesh=mesh,
    )
    frame_1, _ = pipe.render_frame(
        *single,
        width=width, height=height,
        rows=rows_per_shard * n, tiles_x=width // 16,
        caps=caps, features=features, channels=(0, 1, 2, 3),
    )
    np.testing.assert_array_equal(np.asarray(frame_s), np.asarray(frame_1))
    assert int(np.asarray(diag_s)[pipe.DIAG_SEGS]) > 0


def test_line_sharded_pallas_matches_single_chip(_force_pallas):
    from forma_tpu.ops import pipeline as pipe

    n = 8
    assert len(jax.devices()) >= n
    mesh = jax.make_mesh((n,), ("rows",))
    comp, width, height = _build_scene()
    rows_per_shard = (-(-height // 16)) // n
    single, sharded, features = _scene_args(comp, width, height)
    caps = pipe.Caps(vline=512, run=512, virt=512, k=8)

    frame_s, diag_s = pipe.render_frame_sharded_lines(
        *sharded,
        width=width, height=height,
        rows=rows_per_shard, tiles_x=width // 16,
        caps=caps, features=features, channels=(0, 1, 2, 3), mesh=mesh,
        xcap=1024,
    )
    frame_1, _ = pipe.render_frame(
        *single,
        width=width, height=height,
        rows=rows_per_shard * n, tiles_x=width // 16,
        caps=pipe.Caps(vline=4096, run=4096, virt=4096, k=8),
        features=features, channels=(0, 1, 2, 3),
    )
    np.testing.assert_array_equal(np.asarray(frame_s), np.asarray(frame_1))
    d = np.asarray(diag_s)
    assert d[pipe.DIAG_XPAIR] <= 1024
    assert int(d[pipe.DIAG_SEGS]) > 0
