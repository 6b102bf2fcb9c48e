"""Crop + damage-cache coexistence: the per-tile cache must survive cropped
renders (`cpu/renderer.rs:38-53` keeps the layer cache alive under crop), and
a cropped render must never let out-of-crop tiles go stale."""

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
from forma_tpu.ops import pipeline as pipe
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer

CLEAR = Color(1.0, 1.0, 1.0, 1.0)


def _square(x0, y0, size):
    return (
        PathBuilder()
        .move_to(Point(x0, y0))
        .line_to(Point(x0, y0 + size))
        .line_to(Point(x0 + size, y0 + size))
        .line_to(Point(x0 + size, y0))
        .build()
    )


def _solid(color):
    return Props(func=Func.Draw(Style(fill=Fill.Solid(color))))


def _setup():
    """Layer 0: square in the top-left tile block.  Layers 1-3: a 3-deep
    stack of translucent squares in the bottom-right — their fold depth is
    the tell-tale for whether they repaint."""
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_square(4, 4, 20)).set_props(
        _solid(Color(1, 0, 0, 1))
    )
    for i in range(3):
        comp.get_mut_or_insert_default(Order(1 + i)).insert(
            _square(36 + i, 36 + i, 20)
        ).set_props(_solid(Color(0, 0, 1, 0.5)))
    r = Renderer()
    cache = r.create_buffer_layer_cache()
    buf = np.zeros((64, 64 * 4), np.uint8)
    buffer = Buffer(buffer=buf, layout=LinearLayout(64, 64 * 4, 64), layer_cache=cache)
    return comp, r, buffer, buf


def test_cache_survives_crop():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)

    # Mutate only layer 0 (top-left), then render just its region cropped.
    comp.get_mut_or_insert_default(Order(0)).set_props(
        _solid(Color(0, 0.6, 0, 1))
    )
    crop = Rect.new(range(0, 32), range(0, 32))
    r.render_into(comp, buffer, CLEAR, crop=crop)

    # Full cached render: the bottom-right 3-deep stack is unchanged and must
    # NOT repaint — max fold depth over painted tiles stays at 1 (layer 0's
    # tiles).  Before the fix, the cropped render cleared the whole cache and
    # this repainted everything (depth 3).
    r.render_into(comp, buffer, CLEAR)
    assert r.last_diag is not None
    assert int(r.last_diag[pipe.DIAG_K]) <= 1, r.last_diag

    fresh = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), fresh)


def test_crop_never_leaves_stale_tiles():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)

    # Mutate the bottom-right stack, but crop-render only the top-left: the
    # mutation's tiles are OUT of crop.  The following full render must
    # repaint them (the cropped render must not certify them as current).
    comp.get_mut_or_insert_default(Order(1)).set_props(
        _solid(Color(1, 1, 0, 0.8))
    )
    crop = Rect.new(range(0, 32), range(0, 32))
    r.render_into(comp, buffer, CLEAR, crop=crop)
    r.render_into(comp, buffer, CLEAR)

    fresh = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), fresh)


def test_unchanged_scene_cropped_then_full_repaints_nothing():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)

    crop = Rect.new(range(16, 48), range(16, 48))
    r.render_into(comp, buffer, CLEAR, crop=crop)
    r.render_into(comp, buffer, CLEAR)
    # Everything was unchanged throughout: nothing repainted.
    assert int(r.last_diag[pipe.DIAG_K]) == 0, r.last_diag

    fresh = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), fresh)
