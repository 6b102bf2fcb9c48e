"""Line-sharded multi-chip: shard LINES (not just the framebuffer), exchange
pixel segments to their destination row bands with `all_to_all`, and the
result must equal the single-chip frame bit-for-bit (8-device virtual CPU
mesh from conftest).  This is the scaling design where line setup, expansion,
the ff64 emit AND the sort all do ~1/N work per chip."""

import numpy as np

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


def _compare(comp, width, height, caps, xcap=1024):
    from forma_tpu.ops import pipeline as pipe

    n = 8
    assert len(jax.devices()) >= n
    mesh = jax.make_mesh((n,), ("rows",))
    rows_total = -(-height // 16)
    rows_per_shard = -(-rows_total // n)
    single, sharded, features = _scene_args(comp, width, height)

    frame_s, diag_s = pipe.render_frame_sharded_lines(
        *sharded,
        width=width, height=height,
        rows=rows_per_shard, tiles_x=-(-width // 16),
        caps=caps, features=features, channels=(0, 1, 2, 3), mesh=mesh,
        xcap=xcap,
    )
    frame_1, diag_1 = pipe.render_frame(
        *single,
        width=width, height=height,
        rows=rows_per_shard * n, tiles_x=-(-width // 16),
        # Single-chip needs the full-scene buckets (8x the per-shard ones).
        caps=pipe.Caps(
            vline=8 * caps.vline, run=8 * caps.run, virt=8 * caps.virt,
            k=caps.k,
        ),
        features=features, channels=(0, 1, 2, 3),
    )
    a = np.asarray(frame_s)
    b = np.asarray(frame_1)
    assert a.shape == b.shape == (rows_per_shard * n * 16, -(-width // 16) * 16, 4)
    np.testing.assert_array_equal(a, b)
    d = np.asarray(diag_s)
    assert d[pipe.DIAG_XPAIR] <= xcap, "exchange block overflow"
    return d


def test_line_sharded_matches_single_chip_circles():
    from forma_tpu import Composition
    from forma_tpu.demos import scenes
    from forma_tpu.ops import pipeline as pipe

    comp = Composition()
    width = 64
    height = 2 * 16 * 8
    scenes.circles(comp, 16, width, height)
    d = _compare(comp, width, height, pipe.Caps(vline=512, run=512, virt=512, k=8))
    assert d[pipe.DIAG_SEGS] > 0


def test_line_sharded_full_bleed_and_band_crossing():
    """Full-bleed geometry left of the viewport (tile_x = -1 routing) plus
    tall thin shapes whose lines cross every row band — the cover-carry and
    exchange-routing edge cases."""
    from forma_tpu import (
        Color, Composition, Fill, Func, Order, PathBuilder, Point, Props,
        Style,
    )
    from forma_tpu.ops import pipeline as pipe

    width = 64
    height = 2 * 16 * 8  # 16 tile rows: 2 per shard
    comp = Composition()
    bg = (
        PathBuilder()
        .move_to(Point(-40.5, -7.25))
        .line_to(Point(-40.5, height + 3.5))
        .line_to(Point(width - 10.75, height + 3.5))
        .line_to(Point(width - 10.75, -7.25))
        .build()
    )
    comp.get_mut_or_insert_default(Order(0)).insert(bg).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.3, 0.5, 0.9, 1.0)))))
    )
    # A tall skewed triangle crossing all 8 bands.
    tall = (
        PathBuilder()
        .move_to(Point(5.1, -3.0))
        .line_to(Point(60.9, height * 0.5))
        .line_to(Point(8.4, height + 5.0))
        .build()
    )
    comp.get_mut_or_insert_default(Order(3)).insert(tall).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.9, 0.4, 0.1, 0.7)))))
    )
    d = _compare(comp, width, height, pipe.Caps(vline=512, run=512, virt=512, k=8))
    assert d[pipe.DIAG_SEGS] > 0


def test_line_sharded_renderer_facade():
    """`Renderer.render_device_sharded_lines` end to end, including the
    exchange-capacity growth loop (start xcap at the floor to force growth)."""
    from forma_tpu import Color, Composition
    from forma_tpu.demos import scenes
    from forma_tpu.renderer import Renderer

    comp = Composition()
    width, height = 64, 256
    scenes.circles(comp, 24, width, height)

    r = Renderer()
    frame_s, d = r.render_device_sharded_lines(
        comp, width, height, Color(1.0, 1.0, 1.0, 1.0), n_shards=8
    )
    r1 = Renderer()
    frame_1, _ = r1.render_device(comp, width, height, Color(1.0, 1.0, 1.0, 1.0))
    np.testing.assert_array_equal(np.asarray(frame_s), np.asarray(frame_1))
