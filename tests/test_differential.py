"""Differential tests: device pipeline vs the NumPy oracle on random scenes.

The same strategy as the reference's GPU-vs-CPU rasterizer test
(`gpu/rasterizer/mod.rs:357-422`), extended to full frames: random paths,
styles, transforms and clips must render (near-)identically on both backends.
"""

import numpy as np
import pytest

from forma_tpu import (
    AffineTransform,
    BlendMode,
    Color,
    Composition,
    Fill,
    FillRule,
    Func,
    GradientBuilder,
    GradientType,
    Order,
    PathBuilder,
    Point,
    Props,
    Style,
)
from forma_tpu.backend_numpy import render as oracle_render
from forma_tpu.renderer import Renderer


def _random_path(rng, w, h):
    p = PathBuilder()
    n = rng.integers(2, 6)
    pts = rng.uniform(-0.25 * w, 1.25 * w, size=(n + 1, 6)).astype(np.float32)
    p.move_to(Point(float(pts[0, 0]), float(pts[0, 1])))
    for i in range(1, n + 1):
        kind = rng.integers(0, 3)
        if kind == 0:
            p.line_to(Point(float(pts[i, 0]), float(pts[i, 1])))
        elif kind == 1:
            p.quad_to(
                Point(float(pts[i, 0]), float(pts[i, 1])),
                Point(float(pts[i, 2]), float(pts[i, 3])),
            )
        else:
            p.cubic_to(
                Point(float(pts[i, 0]), float(pts[i, 1])),
                Point(float(pts[i, 2]), float(pts[i, 3])),
                Point(float(pts[i, 4]), float(pts[i, 5])),
            )
    return p.build()


def _random_image(rng):
    from forma_tpu import Image

    side = int(rng.integers(2, 6))
    texels = rng.integers(0, 256, size=(side * side, 4)).astype(np.uint8)
    texels[:, 3] = 255
    return Image.from_srgba([list(map(int, t)) for t in texels], side, side)


def _random_style(rng, w, h, textures=True):
    kind = rng.integers(0, 3 if textures else 2)
    color = Color(*[float(v) for v in rng.uniform(0, 1, 4)])
    if kind == 0:
        fill = Fill.Solid(color)
    elif kind == 1:
        b = GradientBuilder(
            Point(float(rng.uniform(0, w)), float(rng.uniform(0, h))),
            Point(float(rng.uniform(0, w)), float(rng.uniform(0, h))),
        )
        if rng.integers(0, 2):
            b.type(GradientType.Radial)
        for _ in range(rng.integers(2, 5)):
            b.color(Color(*[float(v) for v in rng.uniform(0, 1, 4)]))
        fill = Fill.Gradient(b.build())
    else:
        from forma_tpu import Texture

        s = float(rng.uniform(0.02, 0.5))
        fill = Fill.Texture(
            Texture(
                transform=AffineTransform(
                    ux=s, uy=0.0, vx=0.0, vy=s,
                    tx=float(rng.uniform(-4, 4)), ty=float(rng.uniform(-4, 4)),
                ),
                image=_random_image(rng),
            )
        )
    modes = list(BlendMode)
    return Style(
        fill=fill,
        blend_mode=modes[rng.integers(0, len(modes))],
        is_clipped=bool(rng.integers(0, 4) == 0),
    )


@pytest.mark.parametrize("seed", range(10))
def test_random_scene_device_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    w = h = 64
    comp = Composition()
    order = 0
    for _ in range(rng.integers(2, 8)):
        layer = comp.get_mut_or_insert_default(Order(order))
        layer.insert(_random_path(rng, w, h))
        if rng.integers(0, 5) == 0:
            props = Props(
                fill_rule=FillRule(int(rng.integers(0, 2))),
                func=Func.Clip(int(rng.integers(1, 3))),
            )
        else:
            props = Props(
                fill_rule=FillRule(int(rng.integers(0, 2))),
                func=Func.Draw(_random_style(rng, w, h)),
            )
        layer.set_props(props)
        order += int(rng.integers(1, 3))

    clear = Color(*[float(v) for v in rng.uniform(0, 1, 4)])
    expected = oracle_render(comp, w, h, clear_color=clear)
    actual = Renderer().render(comp, w, h, clear_color=clear)
    diff = np.abs(actual.astype(int) - expected.astype(int))
    # Both backends compute identical integer coverage; tiny fill/blend
    # deltas come from fma emulation differences only.
    assert diff.max() <= 2, f"seed {seed}: max diff {diff.max()}"


def test_transformed_layers_match():
    comp = Composition()
    sq = (
        PathBuilder()
        .move_to(Point(10, 10))
        .line_to(Point(10, 30))
        .line_to(Point(30, 30))
        .line_to(Point(30, 10))
        .build()
    )
    import math

    a = math.pi / 5
    layer = comp.get_mut_or_insert_default(Order(0))
    layer.insert(sq).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 0, 1)))))
    )
    layer.set_transform(
        AffineTransform(
            ux=math.cos(a), uy=math.sin(a), vx=-math.sin(a), vy=math.cos(a), tx=5, ty=2
        )
    )
    expected = oracle_render(comp, 64, 64, clear_color=Color(1, 1, 1, 1))
    actual = Renderer().render(comp, 64, 64, clear_color=Color(1, 1, 1, 1))
    assert np.array_equal(actual, expected)


@pytest.mark.parametrize("seed", [101, 202])
def test_many_layer_mixed_frame(seed):
    """The reference hammers 4096 random quads in ONE differential frame
    (`gpu/rasterizer/mod.rs:358-422`); this is the full-frame analog — many
    random layers mixing solids, gradients, textures, blends and clips in a
    single render, compared against the oracle."""
    rng = np.random.default_rng(seed)
    w = h = 128
    comp = Composition()
    order = 0
    for _ in range(48):
        layer = comp.get_mut_or_insert_default(Order(order))
        layer.insert(_random_path(rng, w, h))
        if rng.integers(0, 6) == 0:
            props = Props(
                fill_rule=FillRule(int(rng.integers(0, 2))),
                func=Func.Clip(int(rng.integers(1, 4))),
            )
        else:
            props = Props(
                fill_rule=FillRule(int(rng.integers(0, 2))),
                func=Func.Draw(_random_style(rng, w, h)),
            )
        layer.set_props(props)
        order += int(rng.integers(1, 3))

    clear = Color(*[float(v) for v in rng.uniform(0, 1, 4)])
    expected = oracle_render(comp, w, h, clear_color=clear)
    actual = Renderer().render(comp, w, h, clear_color=clear)
    diff = np.abs(actual.astype(int) - expected.astype(int))
    assert diff.max() <= 2, f"seed {seed}: max diff {diff.max()}"


def test_random_crop_matches_oracle():
    """Random tile-aligned crops over a random scene: pixels inside the
    crop match the oracle's crop render; pixels outside stay zero."""
    rng = np.random.default_rng(7)
    w = h = 96
    comp = Composition()
    order = 0
    for _ in range(6):
        layer = comp.get_mut_or_insert_default(Order(order))
        layer.insert(_random_path(rng, w, h))
        layer.set_props(Props(func=Func.Draw(_random_style(rng, w, h))))
        order += 1
    clear = Color(0.9, 0.9, 0.9, 1.0)
    from forma_tpu import Rect

    y0 = int(rng.integers(0, 3)) * 16
    y1 = y0 + int(rng.integers(1, 4)) * 16
    x0 = int(rng.integers(0, 3)) * 16
    x1 = x0 + int(rng.integers(1, 4)) * 16
    crop = Rect.new(range(x0, x1), range(y0, y1))
    expected = oracle_render(comp, w, h, clear_color=clear, crop=crop)
    actual = Renderer().render(comp, w, h, clear_color=clear, crop=crop)
    inside = np.abs(
        actual[y0:y1, x0:x1].astype(int) - expected[y0:y1, x0:x1].astype(int)
    )
    assert inside.max() <= 2, f"max diff {inside.max()}"
    # Outside the crop the device render leaves the buffer untouched (zero
    # here); the oracle fills the clear color — only inside is comparable.
    mask = np.ones((h, w), bool)
    mask[y0:y1, x0:x1] = False
    assert (actual[mask] == 0).all()


def test_random_cached_rerender_matches_fresh():
    """Random scene rendered through a damage cache, then mutated and
    re-rendered: each cached frame must equal a fresh uncached render of
    the same scene state (bit-exact — same device, same pipeline)."""
    from forma_tpu import Buffer, LinearLayout

    rng = np.random.default_rng(13)
    w = h = 96
    comp = Composition()
    for i in range(8):
        layer = comp.get_mut_or_insert_default(Order(i))
        layer.insert(_random_path(rng, w, h))
        layer.set_props(Props(func=Func.Draw(_random_style(rng, w, h))))
    clear = Color(1.0, 1.0, 1.0, 1.0)

    r = Renderer()
    cache = r.create_buffer_layer_cache()
    buf = np.zeros((h, w * 4), np.uint8)
    buffer = Buffer(buffer=buf, layout=LinearLayout(w, w * 4, h), layer_cache=cache)
    r.render_into(comp, buffer, clear)
    fresh = Renderer().render(comp, w, h, clear)
    np.testing.assert_array_equal(buf.reshape(h, w, 4), fresh)

    # Mutate a couple of layers (translate) and re-render through the cache.
    comp.get_mut_or_insert_default(Order(2)).set_transform(
        [1.0, 0.0, 0.0, 1.0, 9.0, -5.0]
    )
    comp.get_mut_or_insert_default(Order(5)).set_transform(
        [1.0, 0.0, 0.0, 1.0, -3.0, 12.0]
    )
    r.render_into(comp, buffer, clear)
    fresh2 = Renderer().render(comp, w, h, clear)
    np.testing.assert_array_equal(buf.reshape(h, w, 4), fresh2)
