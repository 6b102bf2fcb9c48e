"""Workbench-pass semantics ported from the reference's per-pass batteries
(`layer_workbench/mod.rs:345-1307`), driven through the device pipeline:

- `skip_everything_below_opaque` (mod.rs:814-859): layers under a full-cover
  opaque layer contribute nothing.
- `blend_top_full_layers` (mod.rs:861-979): a stack of translucent
  full-cover SOLID layers (mixed blend modes) folds to one color — the
  `TileWriteOp::Solid` path — and must produce exactly the same pixels as
  the general fold (here: as the oracle).
"""

import numpy as np

from forma_tpu import (
    BlendMode,
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
from forma_tpu.renderer import Renderer

CLEAR = Color(0.0, 0.0, 0.0, 1.0)


def _rect(x0, y0, x1, y1):
    return (
        PathBuilder()
        .move_to(Point(x0, y0))
        .line_to(Point(x0, y1))
        .line_to(Point(x1, y1))
        .line_to(Point(x1, y0))
        .build()
    )


def _style(color, blend=BlendMode.Over):
    return Props(func=Func.Draw(Style(fill=Fill.Solid(color), blend_mode=blend)))


def test_skip_everything_below_opaque():
    """Partial-cover layers 0-1 under full-cover opaque layer 2 are culled;
    layer 3's segments above it still draw (mod.rs:814-859 expects
    ids == [2, 3])."""
    comp = Composition()
    # Layers 0, 1: big translucent rects (would tint if not culled — any
    # leak changes pixels vs the oracle AND vs the expected exact color).
    comp.get_mut_or_insert_default(Order(0)).insert(_rect(0, 0, 64, 64)).set_props(
        _style(Color(1, 0, 0, 0.5))
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_rect(0, 0, 64, 64)).set_props(
        _style(Color(0, 1, 0, 0.5))
    )
    # Layer 2: opaque full cover.
    comp.get_mut_or_insert_default(Order(2)).insert(_rect(0, 0, 64, 64)).set_props(
        _style(Color(0.0, 0.0, 1.0, 1.0))
    )
    # Layer 3: small opaque square on top.
    comp.get_mut_or_insert_default(Order(3)).insert(_rect(20, 20, 28, 28)).set_props(
        _style(Color(1.0, 1.0, 1.0, 1.0))
    )
    img = Renderer().render(comp, 64, 64, CLEAR)
    orc = oracle_render(comp, 64, 64, clear_color=CLEAR)
    np.testing.assert_array_equal(img, orc)
    assert (img[4, 4] == [0, 0, 255, 255]).all()  # pure layer-2 blue
    assert (img[24, 24] == [255, 255, 255, 255]).all()  # layer 3


def test_blend_top_full_layers_solid_fold():
    """Interior tiles of a stack of translucent solid rects with mixed blend
    modes take the per-tile scalar fold (`TileWriteOp::Solid`); pixels must
    equal the oracle exactly, and interior tiles must be uniform."""
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(_rect(0, 0, 64, 64)).set_props(
        _style(Color(0.5, 0.5, 0.5, 0.5), BlendMode.Over)
    )
    comp.get_mut_or_insert_default(Order(1)).insert(_rect(0, 0, 64, 64)).set_props(
        _style(Color(0.5, 0.5, 0.5, 0.5), BlendMode.Multiply)
    )
    comp.get_mut_or_insert_default(Order(2)).insert(_rect(0, 0, 64, 64)).set_props(
        _style(Color(0.8, 0.2, 0.4, 0.3), BlendMode.Screen)
    )
    img = Renderer().render(comp, 64, 64, CLEAR)
    orc = oracle_render(comp, 64, 64, clear_color=CLEAR)
    np.testing.assert_array_equal(img, orc)
    # Uniform interior (tile (1,1) is fully covered by all three).
    tile = img[16:32, 16:32]
    assert (tile == tile[0, 0]).all()


def test_full_cover_clip_drops():
    """`skip_full_clip` (layer_workbench/mod.rs:656-715): a clip covering
    its whole tile admits everything — it must cost no fold slot, and the
    governed draw renders as if unclipped."""
    from forma_tpu import FillRule
    from forma_tpu.ops import pipeline as pipe

    comp = Composition()
    # The clip rect extends past the canvas so every viewport tile sees it
    # as a VIRTUAL full cover (edge tiles of an in-canvas rect hold real
    # segment runs, which the pass correctly leaves alone).
    comp.get_mut_or_insert_default(Order(0)).insert(
        _rect(-16, -16, 80, 80)
    ).set_props(Props(fill_rule=FillRule.NonZero, func=Func.Clip(1)))
    lay = comp.get_mut_or_insert_default(Order(1))
    lay.insert(_rect(8, 8, 56, 56))
    lay.set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.2, 0.9, 0.4, 1.0)),
                                   is_clipped=True)))
    )
    r = Renderer()
    img = Renderer().render(comp, 64, 64, CLEAR)
    img2 = r.render(comp, 64, 64, CLEAR)
    np.testing.assert_array_equal(img, img2)
    orc = oracle_render(comp, 64, 64, clear_color=CLEAR)
    np.testing.assert_array_equal(img, orc)
    # Interior tiles held (clip, draw); the dropped clip leaves depth 1.
    assert int(r.last_diag[pipe.DIAG_K]) == 1, r.last_diag


def test_solid_fold_mixed_with_painted_edges():
    """Edge tiles (partial coverage) use the pixel fold, interior tiles the
    scalar fold — both must agree with the oracle in one frame."""
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0)).insert(
        _rect(3.5, 3.5, 60.5, 60.5)
    ).set_props(_style(Color(0.9, 0.6, 0.1, 0.7)))
    comp.get_mut_or_insert_default(Order(1)).insert(
        _rect(10.0, 10.0, 54.0, 54.0)
    ).set_props(_style(Color(0.1, 0.4, 0.8, 0.5), BlendMode.Multiply))
    img = Renderer().render(comp, 64, 64, CLEAR)
    orc = oracle_render(comp, 64, 64, clear_color=CLEAR)
    np.testing.assert_array_equal(img, orc)
