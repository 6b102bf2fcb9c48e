"""Crop: work-culled rendering must produce pixels identical to the full
render inside the rect and leave the outside untouched
(`cpu/renderer.rs:38-53`, crop handling `painter/mod.rs:504-516`)."""

import numpy as np

from forma_tpu import (
    Buffer,
    Color,
    Composition,
    Fill,
    Func,
    LinearLayout,
    Order,
    Point,
    Props,
    Rect,
    Style,
)
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer

CLEAR = Color(1.0, 1.0, 1.0, 1.0)


def _scene():
    comp = Composition()
    b = (
        PathBuilder()
        .move_to(Point(5.5, 3.0))
        .line_to(Point(60.0, 10.0))
        .line_to(Point(30.0, 60.0))
        .build()
    )
    comp.get_mut_or_insert_default(Order(0)).insert(b).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.8, 0.2, 0.1, 0.9)))))
    )
    c = (
        PathBuilder()
        .move_to(Point(0.0, 40.0))
        .line_to(Point(64.0, 40.0))
        .line_to(Point(64.0, 64.0))
        .line_to(Point(0.0, 64.0))
        .build()
    )
    comp.get_mut_or_insert_default(Order(1)).insert(c).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.1, 0.3, 0.9, 0.5)))))
    )
    return comp


def test_crop_matches_full_render_inside():
    comp = _scene()
    full = Renderer().render(comp, 64, 64, CLEAR)

    crop = Rect.new(range(16, 48), range(16, 48))  # tiles 1..3 in both axes
    buf = np.full((64, 64 * 4), 7, np.uint8)  # sentinel fill
    Renderer().render_into(
        comp,
        Buffer(buffer=buf, layout=LinearLayout(64, 64 * 4, 64)),
        CLEAR,
        crop=crop,
    )
    img = buf.reshape(64, 64, 4)
    np.testing.assert_array_equal(img[16:48, 16:48], full[16:48, 16:48])
    # Outside the crop the buffer is untouched.
    assert (img[:16] == 7).all() and (img[48:] == 7).all()
    assert (img[16:48, :16] == 7).all() and (img[16:48, 48:] == 7).all()


def test_crop_bottom_rows():
    comp = _scene()
    full = Renderer().render(comp, 64, 64, CLEAR)
    crop = Rect.new(range(0, 64), range(32, 64))
    got = Renderer().render(comp, 64, 64, CLEAR, crop=crop)
    np.testing.assert_array_equal(got[32:64], full[32:64])
    assert (got[:32] == 0).all()
