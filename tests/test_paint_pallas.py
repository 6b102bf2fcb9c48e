"""Differential tests of the Pallas VMEM-resident paint fold
(`ops/paint_pallas.py`, interpret mode on CPU) against the XLA wave fold.

The kernel covers every non-texture frame (round 4): solid + gradient
fills, all 16 blend modes, clip masks, damage-cached frames.  These tests
assert BIT-equality of whole rendered frames across both backends for
scenes exercising: multi-tile alpha blending, cover carries + virtual gap
units, both fill rules, deep per-tile stacks (multi-chunk DMA windows),
linear + radial gradients, non-Over blend modes (incl. the HSL group),
clip masks with clipped + unclipped draws, cached re-renders, random
feature-mixed scenes, and fallback gating for texture frames.  The
bench's on-device golden verify guards the compiled kernel.
"""

import os

import numpy as np
import pytest

import jax

from forma_tpu import (
    AffineTransform, BlendMode, Buffer, Color, Composition, Fill, Func,
    Image, LinearLayout, Order, PathBuilder, Point, Props, Style, Texture,
)
from forma_tpu.renderer import Renderer
from forma_tpu.styling import FillRule, GradientBuilder, GradientType

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


def test_gradient_fills(monkeypatch):
    """Linear + radial gradients (multi-stop) through the kernel's in-fold
    gradient evaluation, layered over solids."""

    def build(comp):
        lin = (
            GradientBuilder(Point(0, 0), Point(64, 64))
            .color(Color(1, 0, 0, 1))
            .color(Color(0, 1, 0, 0.8))
            .color(Color(0, 0, 1, 1))
            .build()
        )
        rad = (
            GradientBuilder(Point(40, 40), Point(80, 40))
            .type(GradientType.Radial)
            .color(Color(1, 1, 0, 0.9))
            .color(Color(0, 1, 1, 0.3))
            .build()
        )
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(2, 2, 62, 62)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Gradient(lin)))))
        comp.get_mut_or_insert_default(Order(1)).insert(
            _rect(20, 10, 78, 58)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Gradient(rad)))))
        comp.get_mut_or_insert_default(Order(2)).insert(
            _rect(30, 30, 50, 50)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 0, 0.5)))))
        )

    a, b = _render_both(build, 80, 64, monkeypatch)
    assert np.array_equal(a, b)


def test_blend_modes(monkeypatch):
    """Non-Over blend modes, including the HSL group, specialize into the
    kernel's per-step select tree."""
    modes = [
        BlendMode.Multiply, BlendMode.Screen, BlendMode.Difference,
        BlendMode.SoftLight, BlendMode.Hue, BlendMode.Luminosity,
    ]

    def build(comp):
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(0, 0, 96, 48)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.8, 0.3, 0.5, 1)))))
        )
        for i, mode in enumerate(modes):
            comp.get_mut_or_insert_default(Order(i + 1)).insert(
                _rect(4 + 14 * i, 6 + 3 * i, 30 + 14 * i, 42)
            ).set_props(
                Props(
                    func=Func.Draw(
                        Style(
                            fill=Fill.Solid(Color(0.2, 0.9, 0.4, 0.7)),
                            blend_mode=mode,
                        )
                    )
                )
            )

    a, b = _render_both(build, 96, 48, monkeypatch)
    assert np.array_equal(a, b)


def test_clip_masks(monkeypatch):
    """Clip units + clipped draws: a partial-coverage clip governing two
    draws, an unclipped draw in between, and a second clip later in the
    stack (exercises clip expiry and the in-kernel mask state)."""

    def build(comp):
        tri = (
            PathBuilder()
            .move_to(Point(4, 4))
            .line_to(Point(60, 8))
            .line_to(Point(30, 60))
            .build()
        )
        comp.get_mut_or_insert_default(Order(0)).insert(tri).set_props(
            Props(func=Func.Clip(2))
        )
        comp.get_mut_or_insert_default(Order(1)).insert(
            _rect(0, 0, 40, 40)
        ).set_props(
            Props(
                func=Func.Draw(
                    Style(fill=Fill.Solid(Color(1, 0, 0, 0.8)), is_clipped=True)
                )
            )
        )
        comp.get_mut_or_insert_default(Order(2)).insert(
            _rect(20, 20, 64, 64)
        ).set_props(
            Props(
                func=Func.Draw(
                    Style(fill=Fill.Solid(Color(0, 1, 0, 0.6)), is_clipped=True)
                )
            )
        )
        comp.get_mut_or_insert_default(Order(3)).insert(
            _rect(50, 2, 62, 30)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 1, 1)))))
        )
        circle_ish = (
            PathBuilder()
            .move_to(Point(10, 44))
            .quad_to(Point(32, 20), Point(54, 44))
            .quad_to(Point(32, 62), Point(10, 44))
            .build()
        )
        comp.get_mut_or_insert_default(Order(5)).insert(circle_ish).set_props(
            Props(fill_rule=FillRule.EvenOdd, func=Func.Clip(1))
        )
        comp.get_mut_or_insert_default(Order(6)).insert(
            _rect(0, 30, 64, 64)
        ).set_props(
            Props(
                func=Func.Draw(
                    Style(fill=Fill.Solid(Color(0.5, 0, 0.5, 0.9)), is_clipped=True)
                )
            )
        )

    a, b = _render_both(build, 64, 64, monkeypatch)
    assert np.array_equal(a, b)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_random_mixed_scenes(monkeypatch, seed):
    """Random gradient/blend/clip scenes (the differential generator's
    feature mix) must be bit-equal across the two fold backends."""
    from test_differential import _random_path, _random_style

    def build(comp):
        rng = np.random.default_rng(seed)
        order = 0
        for _ in range(rng.integers(4, 10)):
            layer = comp.get_mut_or_insert_default(Order(order))
            layer.insert(_random_path(rng, 96, 64))
            if rng.integers(0, 5) == 0:
                props = Props(
                    fill_rule=FillRule(int(rng.integers(0, 2))),
                    func=Func.Clip(int(rng.integers(1, 3))),
                )
            else:
                props = Props(
                    fill_rule=FillRule(int(rng.integers(0, 2))),
                    func=Func.Draw(_random_style(rng, 96, 64)),
                )
            layer.set_props(props)
            order += int(rng.integers(1, 3))

    a, b = _render_both(build, 96, 64, monkeypatch)
    assert np.array_equal(a, b)


def test_cached_frames(monkeypatch):
    """Damage-cached re-renders now fold through the kernel: skipped tiles
    fold zero units and re-emit cached pixels.  The full two-frame cached
    sequence must be bit-equal across backends."""

    def run(mode):
        monkeypatch.setenv("FORMA_FOLD", mode)
        jax.clear_caches()
        comp = Composition()
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(4, 4, 24, 24)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(1, 0, 0, 1)))))
        )
        comp.get_mut_or_insert_default(Order(1)).insert(
            _rect(36, 36, 56, 56)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 1, 0.5)))))
        )
        r = Renderer()
        cache = r.create_buffer_layer_cache()
        buf = np.zeros((64, 64 * 4), np.uint8)
        buffer = Buffer(
            buffer=buf, layout=LinearLayout(64, 64 * 4, 64), layer_cache=cache
        )
        r.render_into(comp, buffer, CLEAR)
        f1 = buf.copy()
        # Move one square: only its tiles are damaged; the rest re-emit.
        comp.get_mut_or_insert_default(Order(0)).set_transform(
            [1.0, 0.0, 0.0, 1.0, 8.0, 4.0]
        )
        r.render_into(comp, buffer, CLEAR)
        return f1, buf.copy()

    a1, a2 = run("pallas")
    b1, b2 = run("xla")
    assert np.array_equal(a1, b1)
    assert np.array_equal(a2, b2)


def test_texture_frames_fall_back(monkeypatch):
    """Frames with texture fills are ineligible (per-pixel atlas gathers —
    recorded cost-model negative): both env modes must take the wave fold
    and agree."""

    def build(comp):
        image = Image.from_srgba(
            [[255, 0, 0, 255], [0, 255, 0, 255], [0, 0, 255, 255],
             [255, 255, 0, 255]],
            2,
            2,
        )
        comp.get_mut_or_insert_default(Order(0)).insert(
            _rect(2, 2, 30, 30)
        ).set_props(
            Props(
                func=Func.Draw(
                    Style(
                        fill=Fill.Texture(
                            Texture(
                                transform=AffineTransform(
                                    ux=0.1, uy=0.0, vx=0.0, vy=0.1, tx=0.0, ty=0.0
                                ),
                                image=image,
                            )
                        )
                    )
                )
            )
        )
        comp.get_mut_or_insert_default(Order(1)).insert(
            _rect(10, 10, 40, 40)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0, 0, 0, 0.4)))))
        )

    a, b = _render_both(build, 48, 48, monkeypatch)
    assert np.array_equal(a, b)
