"""Pipelined damage readback: `render_into(pipelined=True)` overlaps frame
i's damage fetch with frame i+1's dispatch, writing the buffer one frame
late (`flush_pending` completes the tail).  The pixel stream must be
byte-identical to the synchronous path — including across mid-animation
capacity growth, where the overflow is only discovered one frame late and
both the overflowed frame and its already-dispatched successor re-render
(`Renderer._resolve_cached` / `_redispatch_cached`)."""

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
from forma_tpu.math import AffineTransform
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer

CLEAR = Color(1.0, 1.0, 1.0, 1.0)
W = H = 64
N_FRAMES = 6


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


def _build(grow_at=None):
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_square(2, 2, 14)).set_props(
        _solid(Color(1, 0, 0, 1))
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_square(30, 30, 16)).set_props(
        _solid(Color(0, 0, 1, 0.8))
    )

    def step(i):
        # Per-frame translation of layer 1 (the damage-cache workload).
        comp.get_mut_or_insert_default(Order(1)).set_transform(
            AffineTransform(1.0, 0.0, 0.0, 1.0, float(-2 * i), float(i))
        )
        if grow_at is not None and i == grow_at:
            # Mid-animation scene growth: dozens of new layers force the
            # run/vline buckets past their warmed sizes, so the pipelined
            # path discovers the overflow one frame late and must recover.
            for j in range(40):
                comp.get_mut_or_insert_default(Order(10 + j)).insert(
                    _square(1 + j, 1 + (7 * j) % 40, 10)
                ).set_props(_solid(Color(0.02 * j, 1 - 0.02 * j, 0.3, 0.5)))

    return comp, step


def _run(pipelined, grow_at=None):
    comp, step = _build(grow_at)
    r = Renderer()
    cache = r.create_buffer_layer_cache()
    backing = np.zeros((H, W * 4), np.uint8)
    buffer = Buffer(
        buffer=backing, layout=LinearLayout(W, W * 4, H), layer_cache=cache
    )
    snaps = []
    for i in range(N_FRAMES):
        step(i)
        r.render_into(comp, buffer, CLEAR, pipelined=pipelined)
        snaps.append(backing.copy())
    if pipelined:
        r.flush_pending()
        snaps.append(backing.copy())
    return snaps


def test_pipelined_matches_sync():
    sync = _run(False)
    piped = _run(True)
    # One frame of latency: after pipelined call i the buffer holds frame
    # i-1 (call 0 writes nothing); flush writes the final frame.
    assert not piped[0].any()
    for i in range(1, N_FRAMES):
        np.testing.assert_array_equal(piped[i], sync[i - 1])
    np.testing.assert_array_equal(piped[N_FRAMES], sync[N_FRAMES - 1])


def test_pipelined_capacity_growth_recovery():
    grow_at = 3
    sync = _run(False, grow_at=grow_at)
    piped = _run(True, grow_at=grow_at)
    for i in range(1, N_FRAMES):
        np.testing.assert_array_equal(piped[i], sync[i - 1])
    np.testing.assert_array_equal(piped[N_FRAMES], sync[N_FRAMES - 1])


def test_sync_entry_points_flush():
    comp, step = _build()
    r = Renderer()
    cache = r.create_buffer_layer_cache()
    backing = np.zeros((H, W * 4), np.uint8)
    buffer = Buffer(
        buffer=backing, layout=LinearLayout(W, W * 4, H), layer_cache=cache
    )
    step(0)
    r.render_into(comp, buffer, CLEAR, pipelined=True)
    assert r._pending is not None
    # A synchronous render flushes the in-flight frame first (ordering).
    step(1)
    r.render_into(comp, buffer, CLEAR)
    assert r._pending is None
    comp2, step2 = _build()
    step2(0)
    step2(1)
    want = Renderer().render(comp2, W, H, CLEAR)
    got = backing.reshape(H, W, 4)
    np.testing.assert_array_equal(got, want)
