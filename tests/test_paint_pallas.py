"""Differential tests of the Pallas VMEM-resident paint fold
(`ops/paint_pallas.py`, interpret mode on CPU) against the XLA wave fold.

The kernel covers the solid-fill / Over-only common path; these tests
assert BIT-equality of whole rendered frames across both backends for
scenes exercising: multi-tile alpha blending, cover carries + virtual gap
units, both fill rules, deep per-tile stacks (multi-chunk DMA windows),
and fallback gating for ineligible features.  The bench's on-device
golden verify guards the compiled kernel.
"""

import os

import numpy as np
import pytest

import jax

from forma_tpu import (
    Color, Composition, Fill, Func, Order, PathBuilder, Point, Props, Style,
)
from forma_tpu.renderer import Renderer
from forma_tpu.styling import FillRule, GradientBuilder

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


def _render_both(build, w, h, monkeypatch):
    """Renders the same composition with FORMA_FOLD=pallas (interpret) and
    =xla; returns both frames."""
    frames = {}
    for mode in ("pallas", "xla"):
        monkeypatch.setenv("FORMA_FOLD", mode)
        jax.clear_caches()
        comp = Composition()
        build(comp)
        frame, _ = Renderer().render_device(comp, w, h, CLEAR)
        frames[mode] = np.asarray(frame)
    return frames["pallas"], frames["xla"]


def test_alpha_blend_multi_tile(monkeypatch):
    def build(comp):
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(4, 4, 29, 29)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(Color(1, 0, 0, 1))))))
        comp.get_mut_or_insert_default(Order(1)).insert(
            _rect(20, 10, 45, 35)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 1, 0, 0.5))))))
        comp.get_mut_or_insert_default(Order(2)).insert(
            _rect(9, 18, 60, 44)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 1, 0.8))))))

    a, b = _render_both(build, 64, 48, monkeypatch)
    assert np.array_equal(a, b)


def test_virtual_units_and_fill_rules(monkeypatch):
    """A wide shape spanning many tiles (interior tiles paint from carried
    covers = virtual units) plus an even-odd self-intersecting star."""

    def build(comp):
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(2, 2, 120, 30)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.2, 0.4, 0.9, 1))))))
        star = (
            PathBuilder()
            .move_to(Point(60, 34))
            .line_to(Point(80, 62))
            .line_to(Point(40, 44))
            .line_to(Point(84, 44))
            .line_to(Point(44, 62))
            .build()
        )
        comp.get_mut_or_insert_default(Order(1)).insert(star).set_props(
            Props(
                fill_rule=FillRule.EvenOdd,
                func=Func.Draw(Style(fill=Fill.Solid(Color(0.9, 0.5, 0.1, 0.7)))),
            )
        )

    a, b = _render_both(build, 128, 64, monkeypatch)
    assert np.array_equal(a, b)


def test_deep_stack_multi_chunk_window(monkeypatch):
    """Hundreds of layers stacked in a few tiles: the block's unit span
    exceeds one 256-row DMA chunk, exercising the chunked window loop."""

    def build(comp):
        rng = np.random.default_rng(7)
        for i in range(300):
            x = float(rng.uniform(0, 24))
            y = float(rng.uniform(0, 24))
            c = Color(*(float(v) for v in rng.uniform(0.1, 1.0, 3)), 0.35)
            comp.get_mut_or_insert_default(Order(i)).insert(
                _rect(x, y, x + 8, y + 8)
            ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(c)))))

    a, b = _render_both(build, 32, 32, monkeypatch)
    assert np.array_equal(a, b)


def test_gradient_frames_fall_back(monkeypatch):
    """Frames with gradients are ineligible: both env modes must take the
    wave fold and agree (the gate compiles the kernel away)."""

    def build(comp):
        g = (
            GradientBuilder(Point(0, 0), Point(64, 64))
            .color(Color(1, 0, 0, 1))
            .color(Color(0, 0, 1, 1))
            .build()
        )
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(4, 4, 60, 60)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Gradient(g)))))

    a, b = _render_both(build, 64, 64, monkeypatch)
    assert np.array_equal(a, b)
