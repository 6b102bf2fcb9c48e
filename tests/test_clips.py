"""Clip-pass semantics (`passes/skip_trivial_clips.rs`): clipped layers
outside any clip range are invisible, unused clips have no visual effect,
and the device output stays bit-identical to the numpy oracle."""

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


def _rect(x0, y0, x1, y1):
    return (
        PathBuilder()
        .move_to(Point(x0, y0))
        .line_to(Point(x0, y1))
        .line_to(Point(x1, y1))
        .line_to(Point(x1, y0))
        .build()
    )


def _cmp(comp):
    dev = Renderer().render(comp, 64, 64, CLEAR)
    ora = oracle_render(comp, 64, 64, clear_color=CLEAR)
    np.testing.assert_array_equal(dev, ora)
    return dev


def test_clipped_layer_outside_range_is_invisible():
    comp = Composition()
    # Clip at order 0 covering orders (0, 2].
    comp.get_mut_or_insert_default(Order(0)).insert(_rect(8, 8, 32, 32)).set_props(
        Props(func=Func.Clip(2))
    )
    # Clipped layer INSIDE range: visible only within the clip.
    comp.get_mut_or_insert_default(Order(1)).insert(_rect(0, 0, 64, 64)).set_props(
        Props(func=Func.Draw(Style(is_clipped=True, fill=Fill.Solid(Color(1, 0, 0, 1)))))
    )
    # Clipped layer OUTSIDE range (order 5 > 0 + 2): invisible everywhere.
    comp.get_mut_or_insert_default(Order(5)).insert(_rect(40, 40, 60, 60)).set_props(
        Props(func=Func.Draw(Style(is_clipped=True, fill=Fill.Solid(Color(0, 1, 0, 1)))))
    )
    img = _cmp(comp)
    assert (img[16, 16] == [255, 0, 0, 255]).all()  # inside clip: red
    assert (img[48, 48] == [255, 255, 255, 255]).all()  # orphan layer invisible
    assert (img[48, 16] == [255, 255, 255, 255]).all()  # outside clip


def test_unused_clip_has_no_effect():
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_rect(8, 8, 32, 32)).set_props(
        Props(func=Func.Clip(2))
    )
    # A NON-clipped layer inside the range: unaffected by the clip.
    comp.get_mut_or_insert_default(Order(1)).insert(_rect(0, 40, 64, 60)).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 1, 1)))))
    )
    img = _cmp(comp)
    assert (img[50, 32] == [0, 0, 255, 255]).all()
    assert (img[20, 20] == [255, 255, 255, 255]).all()  # clip itself draws nothing


def test_full_clip_equals_unclipped():
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_rect(-4, -4, 70, 70)).set_props(
        Props(func=Func.Clip(1))
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_rect(8, 8, 24, 24)).set_props(
        Props(func=Func.Draw(Style(is_clipped=True, fill=Fill.Solid(Color(1, 0, 1, 1)))))
    )
    img = _cmp(comp)

    comp2 = Composition()
    comp2.get_mut_or_insert_default(Order(1)).insert(_rect(8, 8, 24, 24)).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(1, 0, 1, 1)))))
    )
    img2 = Renderer().render(comp2, 64, 64, CLEAR)
    np.testing.assert_array_equal(img, img2)


def test_even_odd_clip():
    comp = Composition()
    # Self-overlapping path under EvenOdd: clip has a hole.
    p = (
        PathBuilder()
        .move_to(Point(8, 8))
        .line_to(Point(8, 56))
        .line_to(Point(56, 56))
        .line_to(Point(56, 8))
        .move_to(Point(24, 24))
        .line_to(Point(24, 40))
        .line_to(Point(40, 40))
        .line_to(Point(40, 24))
        .build()
    )
    comp.get_mut_or_insert_default(Order(0)).insert(p).set_props(
        Props(fill_rule=FillRule.EvenOdd, func=Func.Clip(1))
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_rect(0, 0, 64, 64)).set_props(
        Props(func=Func.Draw(Style(is_clipped=True, fill=Fill.Solid(Color(0, 0, 0, 1)))))
    )
    img = _cmp(comp)
    assert (img[16, 16] == [0, 0, 0, 255]).all()  # inside ring
    assert (img[32, 32] == [255, 255, 255, 255]).all()  # hole
    assert (img[4, 4] == [255, 255, 255, 255]).all()  # outside
