"""Mid-animation recompile guard: a zoom/rotate sequence must never
re-enter the capacity growth loop (every regrow is a full pipeline
recompile — minutes through a remote toolchain) after warmup.

Two mechanisms (renderer.py::_estimate_caps):
- transform churn between renders flips `_animating`, widening the vline
  estimate's headroom to ~20% (re-estimated once, at the flip);
- `announce_max_scale` bounds per-line lengths over a declared zoom range
  for animations beyond that headroom.
"""

import numpy as np

from forma_tpu import Color, Composition, Fill, Func, Order, Point, Props, Style
from forma_tpu.path import PathBuilder
from forma_tpu.renderer import Renderer

CLEAR = Color(1.0, 1.0, 1.0, 1.0)


def _scene(n=160, size=256, axis_aligned=False):
    comp = Composition()
    rng = np.random.default_rng(3)
    for i in range(n):
        x = float(rng.uniform(0, size * 0.55)) + size * 0.1
        y = float(rng.uniform(0, size * 0.55)) + size * 0.1
        w = float(rng.uniform(8, 40))
        if axis_aligned:
            # Axis-aligned rectangles maximize the rotation length swing
            # (|dx|+|dy| grows by cos+sin under rotation).
            p = (
                PathBuilder()
                .move_to(Point(x, y))
                .line_to(Point(x + w, y))
                .line_to(Point(x + w, y + w * 0.6))
                .line_to(Point(x, y + w * 0.6))
                .build()
            )
        else:
            p = (
                PathBuilder()
                .move_to(Point(x, y))
                .line_to(Point(x + w, y + w * 0.3))
                .line_to(Point(x + w * 0.5, y + w))
                .build()
            )
        c = Color(*(float(v) for v in rng.uniform(0, 1, 3)), 0.8)
        comp.get_mut_or_insert_default(Order(i)).insert(p).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(c))))
        )
    return comp


def _rotate(comp, n, deg):
    import math

    a = math.radians(deg)
    c, s = math.cos(a), math.sin(a)
    for i in range(n):
        comp.get_mut_or_insert_default(Order(i)).set_transform(
            [c, s, -s, c, 40.0, 40.0]
        )


def test_rotation_within_animation_headroom_never_regrows():
    """A slow rotation (<= 8 deg: Manhattan lengths grow <= cos+sin ~ 1.14x):
    the animating flag's ~20% headroom must absorb it — zero growth-loop
    entries after the warmup frames."""
    comp = _scene(axis_aligned=True)
    r = Renderer()
    r.render(comp, 256, 256, CLEAR)  # warmup (static estimate)
    _rotate(comp, 160, 0.2)
    r.render(comp, 256, 256, CLEAR)  # animating flips; re-estimate once
    warm = r.regrow_count
    for f in range(2, 18):
        _rotate(comp, 160, 8.0 * f / 17.0)
        r.render(comp, 256, 256, CLEAR)
    assert r.regrow_count == warm, (
        f"rotation animation re-entered the growth loop "
        f"({r.regrow_count - warm} regrows after warmup)"
    )


def test_announced_scale_covers_full_rotation():
    """An axis-aligned scene rotating to 45 deg grows Manhattan lengths by
    up to sqrt(2) — beyond the automatic headroom.  announce_max_scale(1.42)
    must bound the estimate so the sequence never regrows after warmup."""
    comp = _scene(axis_aligned=True)
    r = Renderer()
    r.announce_max_scale(1.42)
    r.render(comp, 256, 256, CLEAR)
    _rotate(comp, 160, 0.2)
    r.render(comp, 256, 256, CLEAR)
    warm = r.regrow_count
    for f in range(2, 14):
        _rotate(comp, 160, 45.0 * f / 13.0)
        r.render(comp, 256, 256, CLEAR)
    assert r.regrow_count == warm, (
        f"announced-scale rotation re-entered the growth loop "
        f"({r.regrow_count - warm} regrows after warmup)"
    )
