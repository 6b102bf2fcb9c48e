"""Damage-aware host write-back: with a layer cache, `render_into` fetches
and writes ONLY the changed tiles — the transfer analog of the reference's
`TileWriteOp::None` (unchanged tiles are never written to the user's buffer,
`layer_workbench/mod.rs:280-342` break path)."""

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
from forma_tpu.ops import pipeline as pipe
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer

CLEAR = Color(1.0, 1.0, 1.0, 1.0)
POISON = 0xAB


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
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_square(4, 4, 20)).set_props(
        _solid(Color(1, 0, 0, 1))
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_square(36, 36, 20)).set_props(
        _solid(Color(0, 0, 1, 1))
    )
    r = Renderer()
    cache = r.create_buffer_layer_cache()
    buf = np.zeros((64, 64 * 4), np.uint8)
    buffer = Buffer(
        buffer=buf, layout=LinearLayout(64, 64 * 4, 64), layer_cache=cache
    )
    return comp, r, buffer, buf


def test_unchanged_tiles_never_rewritten():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    want = buf.copy()

    # Poison the buffer, mutate ONLY layer 0 (top-left region), re-render:
    # layer 1's tiles (bottom-right) must keep the poison — they were not
    # part of the damage set and must not be written.
    buf[:] = POISON
    comp.get_mut_or_insert_default(Order(0)).set_props(
        _solid(Color(0, 0.6, 0, 1))
    )
    r.render_into(comp, buffer, CLEAR)
    n_dmg = int(r.last_diag[pipe.DIAG_DMG])
    assert 0 < n_dmg < 16, r.last_diag  # partial damage, 16 tiles total

    img = buf.reshape(64, 64, 4)
    assert np.all(img[36:56, 36:56] == POISON)  # unchanged tile untouched
    fresh = Renderer().render(comp, 64, 64, CLEAR)
    # Damaged region matches a fresh render of the mutated scene.
    np.testing.assert_array_equal(img[:32, :32], fresh[:32, :32])
    del want


def test_fully_unchanged_scene_touches_nothing():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    buf[:] = POISON
    r.render_into(comp, buffer, CLEAR)  # no mutation at all
    assert int(r.last_diag[pipe.DIAG_DMG]) == 0
    assert np.all(buf == POISON)


def test_first_frame_damage_covers_everything():
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    # An invalid cache marks every tile damaged, so the very first write
    # already covers the full buffer.
    assert int(r.last_diag[pipe.DIAG_DMG]) == 16
    fresh = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), fresh)


def test_adaptive_prefix_grow_shrink_bit_exact():
    """The adaptive damage-readback prefix (renderer.py `_dmg_prefix`)
    grows past a misprediction (damage > prefix → one remainder slice)
    and shrinks when damage shrinks, with every cached frame bit-equal
    to a fresh uncached render."""
    from forma_tpu.math import AffineTransform
    from forma_tpu.renderer import _DMG_PREFIX

    w, h = 1024, 256  # 64x16 = 1024 tiles
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_square(0, 0, w)).set_props(
        _solid(Color(0.9, 0.9, 0.95, 1))
    )
    sq = comp.get_mut_or_insert_default(Order(5))
    sq.insert(_square(10, 10, 32)).set_props(_solid(Color(0.8, 0.1, 0.1, 1)))
    bar = comp.get_mut_or_insert_default(Order(9))
    bar.insert(
        PathBuilder()
        .move_to(Point(500, 0))
        .line_to(Point(500, h))
        .line_to(Point(540, h))
        .line_to(Point(540, 0))
        .build()
    ).set_props(_solid(Color(0.1, 0.2, 0.8, 0.9)))

    r = Renderer()
    cache = r.create_buffer_layer_cache()
    buf = np.zeros((h, w * 4), np.uint8)
    buffer = Buffer(buffer=buf, layout=LinearLayout(w, w * 4, h), layer_cache=cache)

    dmg_counts, prefixes = [], []
    for f in range(8):
        sq.set_transform(AffineTransform(1, 0, 0, 1, 3.0 * f, 2.0 * f))
        if 3 <= f <= 5:  # tall bar moves: damage spikes past the prefix
            bar.set_transform(AffineTransform(1, 0, 0, 1, 30.0 * f, 0))
        r.render_into(comp, buffer, CLEAR)
        dmg_counts.append(int(r.last_diag[pipe.DIAG_DMG]))
        prefixes.append(r._dmg_prefix)
        fresh = Renderer().render(comp, w, h, CLEAR)
        np.testing.assert_array_equal(buf.reshape(h, w, 4), fresh, err_msg=str(f))

    assert max(dmg_counts[3:6]) > _DMG_PREFIX, dmg_counts  # misprediction hit
    assert max(prefixes[3:]) > _DMG_PREFIX, prefixes  # prefix grew
    assert prefixes[-1] == _DMG_PREFIX, prefixes  # and shrank back


def test_write_back_full_fallback():
    # When the compact damage buffers are unavailable (overflow / no diag),
    # _write_back falls back to a full-frame fetch.
    comp, r, buffer, buf = _setup()
    r.render_into(comp, buffer, CLEAR)
    from forma_tpu import RGBA

    frame, d = r._render_device_cached(
        comp, buffer.layer_cache, 64, 64, CLEAR, RGBA
    )
    buf[:] = POISON
    r._last_dmg = None  # simulate damage overflow: compact fetch unusable
    r._write_back(buffer, buffer.layout, frame, None, 64, 64)
    fresh = Renderer().render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(buf.reshape(64, 64, 4), fresh)
