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


def _random_style(rng, w, h):
    kind = rng.integers(0, 2)
    color = Color(*[float(v) for v in rng.uniform(0, 1, 4)])
    if kind == 0:
        fill = Fill.Solid(color)
    else:
        b = GradientBuilder(
            Point(float(rng.uniform(0, w)), float(rng.uniform(0, h))),
            Point(float(rng.uniform(0, w)), float(rng.uniform(0, h))),
        )
        if rng.integers(0, 2):
            b.type(GradientType.Radial)
        for _ in range(rng.integers(2, 5)):
            b.color(Color(*[float(v) for v in rng.uniform(0, 1, 4)]))
        fill = Fill.Gradient(b.build())
    modes = list(BlendMode)
    return Style(
        fill=fill,
        blend_mode=modes[rng.integers(0, len(modes))],
        is_clipped=bool(rng.integers(0, 4) == 0),
    )


@pytest.mark.parametrize("seed", range(6))
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
