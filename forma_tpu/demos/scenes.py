"""Procedural demo/benchmark scenes.

`circles` mirrors the reference demo (`demo/src/demos/circles.rs`): N random
translucent circles built from rational quads.

`paris30k` synthesizes a paris-30k.svg-like city map — the reference's
headline benchmark asset (`README.md:97-106`) is not distributed, so the
benchmark scene is generated deterministically: ~30k paths of building
footprints, road polylines and park blobs with varied fills.
"""

from __future__ import annotations

import math

import numpy as np

from ..composition import Composition, Order
from ..math import Point
from ..path import Path, PathBuilder
from ..styling import Color, Fill, FillRule, Func, Props, Style

_WEIGHT = math.sqrt(2.0) / 2.0


def circle_path(x: float, y: float, radius: float) -> Path:
    return (
        PathBuilder()
        .move_to(Point(x + radius, y))
        .rat_quad_to(Point(x + radius, y - radius), Point(x, y - radius), _WEIGHT)
        .rat_quad_to(Point(x - radius, y - radius), Point(x - radius, y), _WEIGHT)
        .rat_quad_to(Point(x - radius, y + radius), Point(x, y + radius), _WEIGHT)
        .rat_quad_to(Point(x + radius, y + radius), Point(x + radius, y), _WEIGHT)
        .build()
    )


def circles(composition: Composition, count: int, width: int, height: int, seed=5555):
    """N random translucent circles (demo/src/demos/circles.rs:22-50)."""
    rng = np.random.default_rng(seed)
    for i in range(count):
        x = float(rng.uniform(0, width))
        y = float(rng.uniform(0, height))
        radius = float(rng.uniform(10.0, 50.0))
        color = Color(*[float(v) for v in rng.uniform(0, 1, 3)], 0.5)
        composition.get_mut_or_insert_default(Order(i)).insert(
            circle_path(x, y, radius)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Solid(color)))))


def paris30k_styled(
    composition: Composition,
    width: int = 1920,
    height: int = 1080,
    paths: int = 30000,
    seed: int = 30,
):
    """The gradient + blend-mode variant of `paris30k` (BASELINE.md's
    "multi-layer gradient + blend-mode scene" at paris scale).

    Same geometry mix and seed as `paris30k`, but: buildings fill with
    per-building linear gradients (facade shading), parks with radial
    gradients, and roads draw translucent white with BlendMode.Screen —
    a frame shape the solid/Over fast paths can never take, so it
    benchmarks the general painter at full scale.
    """
    from ..styling import BlendMode, Gradient, GradientType

    rng = np.random.default_rng(seed)

    composition.get_mut_or_insert_default(Order(0)).insert(
        _polygon([0, 0, width, width], [0, height, height, 0])
    ).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.93, 0.91, 0.88, 1.0)))))
    )

    order = 1
    n_buildings = int(paths * 0.7)
    n_roads = int(paths * 0.2)
    n_parks = paths - n_buildings - n_roads - 1

    # Buildings: rotated rectangles, linear-gradient facades.
    cx = rng.uniform(0, width, n_buildings)
    cy = rng.uniform(0, height, n_buildings)
    w = rng.uniform(3, 14, n_buildings)
    h = rng.uniform(3, 14, n_buildings)
    ang = rng.uniform(0, math.pi, n_buildings)
    ca, sa = np.cos(ang), np.sin(ang)
    shade = rng.uniform(0.55, 0.8, n_buildings)
    for i in range(n_buildings):
        dx = [-w[i], -w[i], w[i], w[i]]
        dy = [-h[i], h[i], h[i], -h[i]]
        xs = [cx[i] + ca[i] * a - sa[i] * b for a, b in zip(dx, dy)]
        ys = [cy[i] + sa[i] * a + ca[i] * b for a, b in zip(dx, dy)]
        s = float(shade[i])
        g = Gradient(
            GradientType.Linear,
            Point(float(min(xs)), float(min(ys))),
            Point(float(max(xs)), float(max(ys))),
            (
                (Color(s, s * 0.95, s * 0.9, 1.0), 0.0),
                (Color(s * 0.75, s * 0.72, s * 0.7, 1.0), 1.0),
            ),
        )
        composition.get_mut_or_insert_default(Order(order)).insert(
            _polygon(xs, ys)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Gradient(g)))))
        order += 1

    # Roads: long thin quads, Screen-blended.
    x0 = rng.uniform(-100, width + 100, n_roads)
    y0 = rng.uniform(-100, height + 100, n_roads)
    ang = rng.uniform(0, math.pi, n_roads)
    ln = rng.uniform(100, 600, n_roads)
    wd = rng.uniform(1.0, 4.0, n_roads)
    for i in range(n_roads):
        dx, dy = math.cos(ang[i]), math.sin(ang[i])
        nx, ny = -dy * wd[i], dx * wd[i]
        xs = [x0[i] + nx, x0[i] - nx, x0[i] + dx * ln[i] - nx, x0[i] + dx * ln[i] + nx]
        ys = [y0[i] + ny, y0[i] - ny, y0[i] + dy * ln[i] - ny, y0[i] + dy * ln[i] + ny]
        composition.get_mut_or_insert_default(Order(order)).insert(
            _polygon(xs, ys)
        ).set_props(
            Props(
                func=Func.Draw(
                    Style(
                        fill=Fill.Solid(Color(0.9, 0.9, 0.85, 0.9)),
                        blend_mode=BlendMode.Screen,
                    )
                )
            )
        )
        order += 1

    # Parks: rounded blobs, radial gradients.
    cx = rng.uniform(0, width, n_parks)
    cy = rng.uniform(0, height, n_parks)
    r = rng.uniform(8, 40, n_parks)
    for i in range(n_parks):
        b = PathBuilder().move_to(Point(float(cx[i] + r[i]), float(cy[i])))
        sides = 5
        for s in range(1, sides + 1):
            a0 = 2 * math.pi * (s - 0.5) / sides
            a1 = 2 * math.pi * s / sides
            b.quad_to(
                Point(
                    float(cx[i] + 1.4 * r[i] * math.cos(a0)),
                    float(cy[i] + 1.4 * r[i] * math.sin(a0)),
                ),
                Point(
                    float(cx[i] + r[i] * math.cos(a1)),
                    float(cy[i] + r[i] * math.sin(a1)),
                ),
            )
        g = Gradient(
            GradientType.Radial,
            Point(float(cx[i]), float(cy[i])),
            Point(float(cx[i] + r[i]), float(cy[i])),
            (
                (Color(0.65, 0.82, 0.58, 0.9), 0.0),
                (Color(0.45, 0.68, 0.42, 0.85), 1.0),
            ),
        )
        composition.get_mut_or_insert_default(Order(order)).insert(b.build()).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Gradient(g))))
        )
        order += 1


def _polygon(xs, ys) -> Path:
    b = PathBuilder().move_to(Point(float(xs[0]), float(ys[0])))
    for x, y in zip(xs[1:], ys[1:]):
        b.line_to(Point(float(x), float(y)))
    return b.build()


def paris30k_textured(
    composition: Composition,
    width: int = 1920,
    height: int = 1080,
    paths: int = 30000,
    seed: int = 30,
):
    """Texture-heavy variant of `paris30k`: every building fills from a
    shared texture atlas (8 distinct 32x32 facade images, affine-mapped per
    building), roads/parks stay solid.  This is the frame shape the
    reference paints inside its one GPU kernel via atlas sampling
    (`gpu/painter/paint.wgsl:702-712`); here it exercises whichever painter
    handles texture fills at full paris scale — the config the round-4
    verdict flagged as having no number of record.
    """
    from ..math import AffineTransform
    from ..styling import Image, Texture

    rng = np.random.default_rng(seed)

    composition.get_mut_or_insert_default(Order(0)).insert(
        _polygon([0, 0, width, width], [0, height, height, 0])
    ).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.93, 0.91, 0.88, 1.0)))))
    )

    # 8 shared facade textures (brick/plaster noise), interned once each.
    images = []
    for t in range(8):
        base = 0.45 + 0.05 * t
        px = rng.uniform(base * 200, base * 255, (32, 32, 3)).astype(np.uint8)
        rgba = np.concatenate(
            [px, np.full((32, 32, 1), 255, np.uint8)], axis=-1
        )
        images.append(Image.from_srgba(rgba.reshape(-1, 4), 32, 32))

    order = 1
    n_buildings = int(paths * 0.7)
    n_roads = int(paths * 0.2)
    n_parks = paths - n_buildings - n_roads - 1

    cx = rng.uniform(0, width, n_buildings)
    cy = rng.uniform(0, height, n_buildings)
    w = rng.uniform(3, 14, n_buildings)
    h = rng.uniform(3, 14, n_buildings)
    ang = rng.uniform(0, math.pi, n_buildings)
    ca, sa = np.cos(ang), np.sin(ang)
    for i in range(n_buildings):
        dx = [-w[i], -w[i], w[i], w[i]]
        dy = [-h[i], h[i], h[i], -h[i]]
        xs = [cx[i] + ca[i] * a - sa[i] * b for a, b in zip(dx, dy)]
        ys = [cy[i] + sa[i] * a + ca[i] * b for a, b in zip(dx, dy)]
        scale = 32.0 / max(2.0 * w[i], 2.0 * h[i])
        tex = Texture(
            transform=AffineTransform(
                ux=scale, vy=scale,
                tx=-float(min(xs)) * scale, ty=-float(min(ys)) * scale,
            ),
            image=images[i % len(images)],
        )
        composition.get_mut_or_insert_default(Order(order)).insert(
            _polygon(xs, ys)
        ).set_props(Props(func=Func.Draw(Style(fill=Fill.Texture(tex)))))
        order += 1

    x0 = rng.uniform(-100, width + 100, n_roads)
    y0 = rng.uniform(-100, height + 100, n_roads)
    ang = rng.uniform(0, math.pi, n_roads)
    ln = rng.uniform(100, 600, n_roads)
    wd = rng.uniform(1.0, 4.0, n_roads)
    for i in range(n_roads):
        dx, dy = math.cos(ang[i]), math.sin(ang[i])
        nx, ny = -dy * wd[i], dx * wd[i]
        xs = [x0[i] + nx, x0[i] - nx, x0[i] + dx * ln[i] - nx, x0[i] + dx * ln[i] + nx]
        ys = [y0[i] + ny, y0[i] - ny, y0[i] + dy * ln[i] - ny, y0[i] + dy * ln[i] + ny]
        composition.get_mut_or_insert_default(Order(order)).insert(
            _polygon(xs, ys)
        ).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(1.0, 1.0, 1.0, 0.9)))))
        )
        order += 1

    cx = rng.uniform(0, width, n_parks)
    cy = rng.uniform(0, height, n_parks)
    r = rng.uniform(8, 40, n_parks)
    for i in range(n_parks):
        b = PathBuilder().move_to(Point(float(cx[i] + r[i]), float(cy[i])))
        sides = 5
        for s in range(1, sides + 1):
            a0 = 2 * math.pi * (s - 0.5) / sides
            a1 = 2 * math.pi * s / sides
            b.quad_to(
                Point(
                    float(cx[i] + 1.4 * r[i] * math.cos(a0)),
                    float(cy[i] + 1.4 * r[i] * math.sin(a0)),
                ),
                Point(
                    float(cx[i] + r[i] * math.cos(a1)),
                    float(cy[i] + r[i] * math.sin(a1)),
                ),
            )
        composition.get_mut_or_insert_default(Order(order)).insert(b.build()).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(Color(0.55, 0.75, 0.5, 0.85)))))
        )
        order += 1


def _paris30k_items(width, height, paths=30000, seed=30):
    """Geometry/color item stream shared by `paris30k` (direct composition)
    and `paris30k_svg_text` (SVG markup), so the two forms are the SAME
    scene and a parsed-SVG render can be differenced against the direct one.

    Yields ("poly", xs, ys, Color) and ("blob", (sx, sy), [(cp, end), ...],
    Color) in draw order.
    """
    rng = np.random.default_rng(seed)
    yield ("poly", [0, 0, width, width], [0, height, height, 0],
           Color(0.93, 0.91, 0.88, 1.0))

    n_buildings = int(paths * 0.7)
    n_roads = int(paths * 0.2)
    n_parks = paths - n_buildings - n_roads - 1

    # Buildings: rotated rectangles.
    cx = rng.uniform(0, width, n_buildings)
    cy = rng.uniform(0, height, n_buildings)
    w = rng.uniform(3, 14, n_buildings)
    h = rng.uniform(3, 14, n_buildings)
    ang = rng.uniform(0, math.pi, n_buildings)
    ca, sa = np.cos(ang), np.sin(ang)
    shade = rng.uniform(0.55, 0.8, n_buildings)
    for i in range(n_buildings):
        dx = [-w[i], -w[i], w[i], w[i]]
        dy = [-h[i], h[i], h[i], -h[i]]
        xs = [cx[i] + ca[i] * a - sa[i] * b for a, b in zip(dx, dy)]
        ys = [cy[i] + sa[i] * a + ca[i] * b for a, b in zip(dx, dy)]
        yield ("poly", xs, ys,
               Color(shade[i], shade[i] * 0.95, shade[i] * 0.9, 1.0))

    # Roads: long thin quads.
    x0 = rng.uniform(-100, width + 100, n_roads)
    y0 = rng.uniform(-100, height + 100, n_roads)
    ang = rng.uniform(0, math.pi, n_roads)
    ln = rng.uniform(100, 600, n_roads)
    wd = rng.uniform(1.0, 4.0, n_roads)
    for i in range(n_roads):
        dx, dy = math.cos(ang[i]), math.sin(ang[i])
        nx, ny = -dy * wd[i], dx * wd[i]
        xs = [x0[i] + nx, x0[i] - nx, x0[i] + dx * ln[i] - nx, x0[i] + dx * ln[i] + nx]
        ys = [y0[i] + ny, y0[i] - ny, y0[i] + dy * ln[i] - ny, y0[i] + dy * ln[i] + ny]
        yield ("poly", xs, ys, Color(1.0, 1.0, 1.0, 0.9))

    # Parks: rounded blobs from quads.
    cx = rng.uniform(0, width, n_parks)
    cy = rng.uniform(0, height, n_parks)
    r = rng.uniform(8, 40, n_parks)
    sides = 5
    for i in range(n_parks):
        segs = []
        for s in range(1, sides + 1):
            a0 = 2 * math.pi * (s - 0.5) / sides
            a1 = 2 * math.pi * s / sides
            segs.append(
                (
                    (cx[i] + 1.4 * r[i] * math.cos(a0),
                     cy[i] + 1.4 * r[i] * math.sin(a0)),
                    (cx[i] + r[i] * math.cos(a1),
                     cy[i] + r[i] * math.sin(a1)),
                )
            )
        yield ("blob", (cx[i] + r[i], cy[i]), segs, Color(0.55, 0.75, 0.5, 0.85))


def paris30k(
    composition: Composition,
    width: int = 1920,
    height: int = 1080,
    paths: int = 30000,
    seed: int = 30,
):
    """Synthesized city-map stress scene with ~`paths` paths.

    Mix: 70% building footprints (quads, small), 20% road segments (long
    thin quads), 10% park blobs (quadratic-Bezier rounded polygons).
    """
    for order, it in enumerate(_paris30k_items(width, height, paths, seed)):
        color = it[3]
        if it[0] == "poly":
            path = _polygon(it[1], it[2])
        else:
            sx, sy = it[1]
            b = PathBuilder().move_to(Point(float(sx), float(sy)))
            for (cpx, cpy), (ex, ey) in it[2]:
                b.quad_to(Point(float(cpx), float(cpy)), Point(float(ex), float(ey)))
            path = b.build()
        composition.get_mut_or_insert_default(Order(order)).insert(path).set_props(
            Props(func=Func.Draw(Style(fill=Fill.Solid(color))))
        )


def _srgb8(v: float) -> int:
    """Linear [0,1] -> sRGB byte (inverse of svg.srgb_to_linear_color)."""
    v = min(max(float(v), 0.0), 1.0)
    s = 12.92 * v if v <= 0.0031308 else 1.055 * v ** (1.0 / 2.4) - 0.055
    return int(round(s * 255.0))


def paris30k_svg_text(
    width: int = 1920, height: int = 1080, paths: int = 30000, seed: int = 30
) -> str:
    """The paris30k scene as an SVG document string.

    Parsed back through `demos.svg.Svg`, this exercises the full SVG
    parser at benchmark scale end to end (reference analog: the svg demo
    loading paris-30k.svg, `demo/src/demos/svg.rs:870-878`; the asset
    itself is not distributed — see BASELINE.md).  Colors round-trip
    linear -> sRGB hex -> linear, so a parsed render differs from the
    direct scene only by 8-bit color quantization (~1/255)."""
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{width}" height="{height}">'
    ]
    for it in _paris30k_items(width, height, paths, seed):
        c = it[3]
        fill = f"#{_srgb8(c.r):02x}{_srgb8(c.g):02x}{_srgb8(c.b):02x}"
        if it[0] == "poly":
            xs, ys = it[1], it[2]
            d = f"M{xs[0]:.6f},{ys[0]:.6f}" + "".join(
                f"L{x:.6f},{y:.6f}" for x, y in zip(xs[1:], ys[1:])
            )
        else:
            sx, sy = it[1]
            d = f"M{sx:.6f},{sy:.6f}" + "".join(
                f"Q{cpx:.6f},{cpy:.6f} {ex:.6f},{ey:.6f}"
                for (cpx, cpy), (ex, ey) in it[2]
            )
        op = f' fill-opacity="{c.a:.6f}"' if c.a != 1.0 else ""
        out.append(f'<path d="{d}" fill="{fill}"{op}/>')
    out.append("</svg>")
    return "\n".join(out)
