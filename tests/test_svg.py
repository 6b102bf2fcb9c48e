"""SVG frontend tests: path-data parsing, arcs, gradients, groups."""

import numpy as np

from forma_tpu import Color, Composition
from forma_tpu.backend_numpy import render
from forma_tpu.demos.svg import Svg, parse_color, parse_transform

SVG = """<svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">
<rect x="4" y="4" width="56" height="56" fill="#e0e0ff"/>
<g fill="red" opacity="0.8">
  <path d="M 10 10 L 30 10 L 30 30 Z"/>
  <path d="M 35 35 q 10 -20 20 0 t -5 15 z" fill="#00aa44"/>
</g>
<linearGradient id="lg" gradientUnits="userSpaceOnUse" x1="0" y1="40" x2="64" y2="40">
  <stop offset="0%" stop-color="blue"/>
  <stop offset="100%" stop-color="yellow"/>
</linearGradient>
<path d="M 8 44 a 10 10 0 1 0 20 0 a 10 10 0 1 0 -20 0" fill="url(#lg)"/>
<path d="M 40 50 C 45 40 55 40 60 50 S 50 62 40 50" fill="purple"
      fill-rule="evenodd" style="mix-blend-mode: multiply"/>
</svg>"""


def test_parse_color():
    assert parse_color("#fff") == (255, 255, 255)
    assert parse_color("#102030") == (16, 32, 48)
    assert parse_color("rgb(1, 2, 3)") == (1, 2, 3)
    assert parse_color("red") == (255, 0, 0)
    assert parse_color("none") is None


def test_parse_transform():
    t = parse_transform("translate(10, 5) scale(2)")
    assert t.to_array() == [2.0, 0.0, 0.0, 2.0, 10.0, 5.0]
    t = parse_transform("matrix(1 2 3 4 5 6)")
    assert t.to_array() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


def test_svg_renders():
    svg = Svg(SVG)
    assert len(svg.paths) == 5
    comp = Composition()
    svg.compose(comp)
    img = render(comp, 64, 64, clear_color=Color(1, 1, 1, 1))
    # Background rect corner.
    np.testing.assert_array_equal(img[6, 6], [224, 224, 255, 255])
    # Triangle interior: red at 0.8 over light blue.
    r, g, b, a = img[12, 25]
    assert r > 200 and g < 120 and b < 140
    # Arc-circle interior (gradient): blueish near its left.
    assert img[44, 12][2] > img[44, 12][0]
    # Something drawn in the cubic region.
    assert (img[50, 48][:3] != [255, 255, 255]).any()


def test_svg_pan_reuses_flattening():
    svg = Svg(SVG)
    comp = Composition()
    svg.compose(comp)
    buf = comp.shared_segment_buffer()
    v0 = buf.version
    svg.compose(comp, pan_x=10.0, pan_y=0.0)
    assert buf.version == v0, "panning must not re-flatten or re-insert geometry"
    img = render(comp, 64, 64, clear_color=Color(1, 1, 1, 1))
    # Background rect shifted left by 10.
    np.testing.assert_array_equal(img[6, 6 - 0], [224, 224, 255, 255])
    assert (img[32, 60] == [255, 255, 255, 255]).all()
