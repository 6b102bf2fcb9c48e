"""Damage-cache behavior: unchanged tiles re-emit cached pixels, mutations
invalidate exactly the touched layers, and cached output equals uncached
output (`cpu/buffer/mod.rs:113-197`, `passes/tile_unchanged.rs`)."""

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
    Style,
)
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


def _setup(w=64, h=64):
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_square(4, 4, 20)).set_props(
        _solid(Color(1, 0, 0, 1))
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_square(36, 36, 20)).set_props(
        _solid(Color(0, 0, 1, 0.5))
    )
    r = Renderer()
    cache = r.create_buffer_layer_cache()
    assert cache is not None and cache.id == 0
    buf = np.zeros((h, w * 4), np.uint8)
    buffer = Buffer(buffer=buf, layout=LinearLayout(w, w * 4, h), layer_cache=cache)
    return comp, r, buffer, buf


def test_cached_render_matches_uncached():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    first = buf.copy()

    r2 = Renderer()
    expected = r2.render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(first.reshape(64, 64, 4), expected)

    # Re-render with no changes: every tile is unchanged; pixels identical.
    r.render_into(comp, buffer, CLEAR)
    np.testing.assert_array_equal(buf, first)
    assert int(r.last_diag[3]) == 0  # DIAG_K: zero fold depth needed


def test_mutation_invalidates_and_rerenders():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)

    # Move the red square; cached render must match a fresh render.
    comp.get_mut_or_insert_default(Order(0)).set_transform(
        [1.0, 0.0, 0.0, 1.0, 8.0, 0.0]
    )
    r.render_into(comp, buffer, CLEAR)
    expected = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), expected)
    assert int(r.last_diag[3]) > 0


def test_clear_color_change_invalidates():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    other = Color(0.0, 0.0, 0.0, 1.0)
    r.render_into(comp, buffer, other)
    expected = Renderer().render(comp, 64, 64, other)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), expected)


def test_props_change_invalidates():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    comp.get_mut_or_insert_default(Order(1)).set_props(_solid(Color(0, 1, 0, 1)))
    r.render_into(comp, buffer, CLEAR)
    expected = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), expected)


def test_layer_removal_invalidates():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    comp.remove(Order(1))
    r.render_into(comp, buffer, CLEAR)
    expected = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), expected)


def test_cache_slots_exhaust():
    r = Renderer()
    caches = [r.create_buffer_layer_cache() for _ in range(32)]
    assert all(c is not None for c in caches)
    assert r.create_buffer_layer_cache() is None
    ids = {c.id for c in caches}
    assert ids == set(range(32))
