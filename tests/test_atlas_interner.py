"""Unit tests: texture-atlas shelf allocator (style_map.rs:72-137 analog),
props interner (interner.rs:19-60), and the bulk transform API."""

import numpy as np
import pytest

from forma_tpu.atlas import AtlasAllocator, AtlasError
from forma_tpu.interner import Interner


def test_atlas_basic_packing():
    a = AtlasAllocator(size=256)
    a.begin_frame()
    p0 = a.allocate(1, 100, 40)
    p1 = a.allocate(2, 100, 40)
    p2 = a.allocate(3, 100, 40)
    assert p0 == (0, 0) and p1 == (100, 0)
    assert p2[1] == 40  # new shelf
    assert a.used_height == 80


def test_atlas_reuse_across_frames():
    a = AtlasAllocator(size=256)
    a.begin_frame()
    p0 = a.allocate(1, 64, 64)
    a.begin_frame()
    assert a.allocate(1, 64, 64) == p0  # same id -> same spot


def test_atlas_gc_on_pressure():
    a = AtlasAllocator(size=128)
    a.begin_frame()
    for i in range(4):
        a.allocate(i, 120, 32)  # fills all 4 shelves
    with pytest.raises(AtlasError):
        a.allocate(99, 120, 32)
    # Next frame only image 0 is live: dead entries GC, the new one fits.
    a.begin_frame()
    a.allocate(0, 120, 32)
    a.allocate(99, 120, 32)
    assert len(a) == 2


def test_atlas_oversize_rejected():
    a = AtlasAllocator(size=64)
    a.begin_frame()
    with pytest.raises(AtlasError):
        a.allocate(1, 65, 10)


def test_interner_dedup_and_compact():
    it = Interner()
    a1 = it.acquire("style-a")
    a2 = it.acquire("style-a")
    b = it.acquire("style-b")
    assert a1 is a2 and a1.id == a2.id and a1.id != b.id
    assert len(it) == 2
    it.release(a1)
    it.release(a2)
    it.compact()
    assert len(it) == 1  # only style-b survives
    # Re-interning a dropped value gets a fresh cell.
    a3 = it.acquire("style-a")
    assert a3.id != a1.id


def test_style_tables_dedupe_rows():
    from forma_tpu import Color, Composition, Fill, Func, Order, Point, Props, Style
    from forma_tpu.ops.styles import build_style_tables
    from forma_tpu.path import PathBuilder

    comp = Composition()
    red = Props(func=Func.Draw(Style(fill=Fill.Solid(Color(1, 0, 0, 1)))))
    blue = Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 1, 1)))))
    path = (
        PathBuilder().move_to(Point(0, 0)).line_to(Point(4, 4)).line_to(Point(4, 0)).build()
    )
    for i in range(100):
        comp.get_mut_or_insert_default(Order(i)).insert(path).set_props(
            red if i % 2 else blue
        )
    st = build_style_tables(comp.layers)
    assert st.orders.shape[0] == 100
    assert st.color.shape[0] == 2  # deduped to distinct props
    assert st.pidx.shape[0] == 100
    np.testing.assert_array_equal(st.pidx[::2] != st.pidx[1::2], np.ones(50, bool))


def test_bulk_set_transforms_matches_individual():
    from forma_tpu import Color, Composition, Fill, Func, Order, Point, Props, Style
    from forma_tpu.math import GeomPresTransformError
    from forma_tpu.renderer import Renderer
    from forma_tpu.path import PathBuilder

    def scene():
        comp = Composition()
        for i in range(8):
            p = (
                PathBuilder()
                .move_to(Point(4 + i * 7, 4))
                .line_to(Point(4 + i * 7, 30))
                .line_to(Point(9 + i * 7, 30))
                .line_to(Point(9 + i * 7, 4))
                .build()
            )
            comp.get_mut_or_insert_default(Order(i)).insert(p).set_props(
                Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 0, 1)))))
            )
        return comp

    t = [0.9, 0.1, -0.1, 0.9, 3.0, 2.0]
    c1 = scene()
    for i in range(8):
        c1.get_mut_or_insert_default(Order(i)).set_transform(t)
    c2 = scene()
    c2.set_transforms(np.arange(8), np.tile(np.asarray(t, np.float32), (8, 1)))

    img1 = Renderer().render(c1, 64, 64, Color(1, 1, 1, 1))
    img2 = Renderer().render(c2, 64, 64, Color(1, 1, 1, 1))
    np.testing.assert_array_equal(img1, img2)

    # Getter reads through to the registry.
    assert c2.get_mut_or_insert_default(Order(0)).transform() is not None

    with pytest.raises(GeomPresTransformError):
        c2.set_transforms([0], np.asarray([[2.0, 0, 0, 2.0, 0, 0]], np.float32))
    with pytest.raises(KeyError):
        c2.set_transforms([55], np.asarray([t], np.float32))


def test_canon_bits_nan_and_signed_zero():
    """`CanonBits` semantics (forma/src/utils/mod.rs:28-44): NaN-valued
    props intern equal (all NaNs collapse to the canonical pattern) and
    -0.0 hashes/compares identical to +0.0."""
    from forma_tpu import Color, Fill, Func, Props, Style
    from forma_tpu.math import AffineTransform

    nan = float("nan")
    assert Color(nan, 0.0, 0.0, 1.0) == Color(nan, 0.0, 0.0, 1.0)
    assert hash(Color(nan, 0.0, -0.0, 1.0)) == hash(Color(nan, 0.0, 0.0, 1.0))
    assert Color(-0.0, 0, 0, 1) == Color(0.0, 0, 0, 1)
    assert Color(1.0, 0, 0, 1) != Color(0.5, 0, 0, 1)
    assert AffineTransform(tx=nan) == AffineTransform(tx=nan)
    assert AffineTransform(tx=-0.0) == AffineTransform()

    it = Interner()
    a = it.acquire(Props(func=Func.Draw(Style(fill=Fill.Solid(Color(nan, 0, 0, 1))))))
    b = it.acquire(Props(func=Func.Draw(Style(fill=Fill.Solid(Color(nan, 0, -0.0, 1))))))
    assert a is b and len(it) == 1
