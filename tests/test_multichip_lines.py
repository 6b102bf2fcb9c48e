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


def test_line_sharded_full_feature_scene():
    """Every style feature gate — linear + radial gradients, a texture fill,
    a clip group, non-Over blend modes, EvenOdd — through the LINE-SHARDED
    path, bit-equal to single-chip.  Guards the sharded pipeline against
    feature regressions (the other tests here are solid-fill only)."""
    from forma_tpu import (
        BlendMode, Color, Composition, Fill, FillRule, Func, GradientBuilder,
        GradientType, Image, Order, PathBuilder, Point, Props, Style, Texture,
    )
    from forma_tpu.math import AffineTransform
    from forma_tpu.renderer import Renderer

    width, height = 64, 256  # 16 tile rows: 2 per shard

    def rect(x0, y0, x1, y1):
        return (
            PathBuilder()
            .move_to(Point(x0, y0)).line_to(Point(x0, y1))
            .line_to(Point(x1, y1)).line_to(Point(x1, y0)).build()
        )

    comp = Composition()
    # 0: full-bleed linear-gradient background (extends left of viewport).
    g = (
        GradientBuilder(Point(0.0, 0.0), Point(0.0, float(height)))
        .color(Color(0.9, 0.2, 0.1, 1.0))
        .color(Color(0.1, 0.3, 0.9, 1.0))
        .build()
    )
    comp.get_mut_or_insert_default(Order(0)).insert(
        rect(-20.5, -8.25, width + 6.0, height + 4.0)
    ).set_props(Props(func=Func.Draw(Style(fill=Fill.Gradient(g)))))
    # 1: radial gradient blob with Multiply.
    rb = GradientBuilder(Point(32.0, 48.0), Point(62.0, 48.0))
    rb.type(GradientType.Radial)
    rb.color(Color(1.0, 1.0, 0.2, 1.0)).color(Color(0.2, 1.0, 0.6, 0.0))
    comp.get_mut_or_insert_default(Order(1)).insert(
        rect(4.0, 20.0, 60.0, 76.0)
    ).set_props(
        Props(
            func=Func.Draw(
                Style(fill=Fill.Gradient(rb.build()), blend_mode=BlendMode.Multiply)
            )
        )
    )
    # 2: texture fill with a fractional-offset transform.
    rng = np.random.default_rng(7)
    texels = rng.integers(0, 255, size=(8, 8, 4), dtype=np.uint8)
    texels[..., 3] = 255
    img = Image.from_srgba(texels, 8, 8)
    comp.get_mut_or_insert_default(Order(2)).insert(
        rect(10.3, 96.6, 54.9, 140.2)
    ).set_props(
        Props(
            func=Func.Draw(
                Style(
                    fill=Fill.Texture(
                        Texture(
                            transform=AffineTransform(1.0, 0.0, 0.0, 1.0, -10.0, -96.0),
                            image=img,
                        )
                    )
                )
            )
        )
    )
    # 3: EvenOdd self-overlapping bowtie with Screen.
    bow = (
        PathBuilder()
        .move_to(Point(8.0, 150.0)).line_to(Point(56.0, 190.0))
        .line_to(Point(8.0, 190.0)).line_to(Point(56.0, 150.0)).build()
    )
    comp.get_mut_or_insert_default(Order(3)).insert(bow).set_props(
        Props(
            fill_rule=FillRule.EvenOdd,
            func=Func.Draw(Style(fill=Fill.Solid(Color(0.2, 0.9, 0.4, 0.8)),
                                 blend_mode=BlendMode.Screen)),
        )
    )
    # 4: a clip spanning two shard bands, clipping 5 and 6.
    comp.get_mut_or_insert_default(Order(4)).insert(
        custom_circle_path(32.0, 216.0, 30.0)
    ).set_props(Props(func=Func.Clip(2)))
    comp.get_mut_or_insert_default(Order(5)).insert(
        rect(0.0, 196.0, 64.0, 236.0)
    ).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.9, 0.9, 0.1, 0.9)),
                                   is_clipped=True)))
    )
    comp.get_mut_or_insert_default(Order(6)).insert(
        rect(16.0, 204.0, 48.0, 252.0)
    ).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.5, 0.1, 0.8, 0.6)),
                                   is_clipped=True)))
    )

    r = Renderer()
    frame_s, _ = r.render_device_sharded_lines(
        comp, width, height, Color(1.0, 1.0, 1.0, 1.0), n_shards=8
    )
    frame_1, _ = Renderer().render_device(
        comp, width, height, Color(1.0, 1.0, 1.0, 1.0)
    )
    np.testing.assert_array_equal(np.asarray(frame_s), np.asarray(frame_1))


def custom_circle_path(x, y, radius):
    import math

    from forma_tpu import PathBuilder, Point

    w = math.sqrt(2) / 2
    return (
        PathBuilder()
        .move_to(Point(x + radius, y))
        .rat_quad_to(Point(x + radius, y + radius), Point(x, y + radius), w)
        .rat_quad_to(Point(x - radius, y + radius), Point(x - radius, y), w)
        .rat_quad_to(Point(x - radius, y - radius), Point(x, y - radius), w)
        .rat_quad_to(Point(x + radius, y - radius), Point(x + radius, y), w)
        .build()
    )


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


def test_slot_bits_wide_key_detection():
    """[row | tx | slot] > 31 bits must report 0 (two-key fallback)."""
    from forma_tpu.ops import pipeline as pipe

    # 1080p-ish grid: 68 rows (7 bits) x 120 tiles (7 bits) leaves 17 slot
    # bits; 2^17 layers fit, 2^17 + 1 do not.
    assert pipe.slot_bits_for(1 << 17, 68, 120) == 17
    assert pipe.slot_bits_for((1 << 17) + 1, 68, 120) == 0
    # Max render target (65536 x 32768 px -> 2048 rows, 4096 tiles) with the
    # full 2^21 - 1 layer space can never pack.
    assert pipe.slot_bits_for(2_097_151, 2048, 4096) == 0


def test_line_sharded_facade_wide_key_fallback(monkeypatch):
    """When the packed u32 key cannot fit, the facade must transparently
    route to the row-sharded path instead of raising (forced via the
    slot-bits pre-check — building 2^17 real layers is not practical in a
    unit test, and the routing decision is what's under test)."""
    from forma_tpu import Color, Composition
    from forma_tpu.demos import scenes
    from forma_tpu.ops import pipeline as pipe
    from forma_tpu.renderer import Renderer

    comp = Composition()
    width, height = 64, 256
    scenes.circles(comp, 12, width, height)

    monkeypatch.setattr(pipe, "slot_bits_for", lambda *_: 0)
    r = Renderer()
    frame_s, d = r.render_device_sharded_lines(
        comp, width, height, Color(1.0, 1.0, 1.0, 1.0), n_shards=8
    )
    frame_1, _ = Renderer().render_device(
        comp, width, height, Color(1.0, 1.0, 1.0, 1.0)
    )
    # The row-sharded result is bit-equal to single-chip.
    np.testing.assert_array_equal(
        np.asarray(frame_s)[:height], np.asarray(frame_1)[:height]
    )
