"""The e2e test scenes, mirroring the reference's golden-image tests
(`e2e-tests/tests/tests.rs`).  Each scene function mutates a Composition;
goldens are 64x64 RGBA PNGs with clear color white and tolerance 8/255.
"""

from __future__ import annotations

import math

from forma_tpu import (
    AffineTransform,
    BlendMode,
    Color,
    Composition,
    Fill,
    FillRule,
    Func,
    GradientBuilder,
    GradientType,
    Image,
    Order,
    PathBuilder,
    Point,
    Props,
    Style,
    Texture,
)

WIDTH = 64.0
HEIGHT = 64.0
PADDING = 8.0


def triangle():
    return (
        PathBuilder()
        .move_to(Point(PADDING, PADDING))
        .line_to(Point(WIDTH - PADDING, PADDING))
        .line_to(Point(WIDTH - PADDING, HEIGHT - PADDING))
        .build()
    )


def custom_square(xmin, ymin, xmax, ymax):
    return (
        PathBuilder()
        .move_to(Point(xmin, ymin))
        .line_to(Point(xmin, ymax))
        .line_to(Point(xmax, ymax))
        .line_to(Point(xmax, ymin))
        .build()
    )


def square():
    return custom_square(PADDING, PADDING, WIDTH - PADDING, HEIGHT - PADDING)


def inner_square():
    return custom_square(
        PADDING * 2.0, PADDING * 2.0, WIDTH - PADDING * 2.0, HEIGHT - PADDING * 2.0
    )


def custom_circle(x, y, radius):
    weight = math.sqrt(2.0) / 2.0
    return (
        PathBuilder()
        .move_to(Point(x + radius, y))
        .rat_quad_to(Point(x + radius, y - radius), Point(x, y - radius), weight)
        .rat_quad_to(Point(x - radius, y - radius), Point(x - radius, y), weight)
        .rat_quad_to(Point(x - radius, y + radius), Point(x, y + radius), weight)
        .rat_quad_to(Point(x + radius, y + radius), Point(x + radius, y), weight)
        .build()
    )


def circle():
    return custom_circle(WIDTH * 0.5, HEIGHT * 0.5, WIDTH * 0.5 - PADDING)


def inner_circle():
    return custom_circle(WIDTH * 0.5, HEIGHT * 0.5, WIDTH * 0.5 - PADDING * 2.0)


_RAINBOW = [
    (1.00, 0.00, 0.00),
    (1.00, 0.32, 0.00),
    (0.63, 0.73, 0.02),
    (0.08, 0.72, 0.07),
    (0.05, 0.70, 0.69),
    (0.03, 0.58, 0.76),
    (0.01, 0.21, 0.85),
    (0.11, 0.01, 0.89),
    (0.49, 0.00, 0.94),
    (0.96, 0.00, 0.69),
    (1.00, 0.00, 0.00),
]


def _rainbow_colors(builder: GradientBuilder):
    for r, g, b in _RAINBOW:
        builder.color(Color(r, g, b, 1.0))


def vertical_rainbow():
    b = GradientBuilder(Point(PADDING, 0.0), Point(WIDTH - PADDING, 0.0))
    _rainbow_colors(b)
    return b.build()


def horizontal_rainbow():
    b = GradientBuilder(Point(0.0, PADDING), Point(0.0, WIDTH - PADDING))
    _rainbow_colors(b)
    return b.build()


def solid_color_props(color: Color) -> Props:
    return Props(func=Func.Draw(Style(fill=Fill.Solid(color))))


SOLID_COLORS = {
    "blue": Color(0.0, 0.0, 1.0, 1.0),
    "dark_blue": Color(0.0, 0.0, 0.5, 1.0),
    "red": Color(1.0, 0.0, 0.0, 1.0),
    "dark_red": Color(0.5, 0.0, 0.0, 1.0),
    "green": Color(0.0, 1.0, 0.0, 1.0),
    "dark_green": Color(0.0, 0.5, 0.0, 1.0),
    "transparent_black": Color(0.0, 0.0, 0.0, 0.5),
}


def scene_solid_color(composition: Composition, name: str):
    composition.get_mut_or_insert_default(Order(1)).insert(square()).set_props(
        solid_color_props(SOLID_COLORS[name])
    )


def scene_linear_gradient(composition: Composition):
    b = GradientBuilder(Point(PADDING, 0.0), Point(WIDTH - PADDING, 0.0))
    b.color(Color(0.0, 0.0, 1.0, 1.0))
    b.color(Color(1.0, 1.0, 1.0, 1.0))
    b.color(Color(1.0, 0.0, 0.0, 1.0))
    props = Props(func=Func.Draw(Style(fill=Fill.Gradient(b.build()))))
    composition.get_mut_or_insert_default(Order(1)).insert(triangle()).set_props(props)


def scene_radial_gradient(composition: Composition):
    b = GradientBuilder(
        Point(WIDTH * 0.5, HEIGHT * 0.5), Point(WIDTH - PADDING * 2.0, HEIGHT * 0.5)
    )
    b.type(GradientType.Radial)
    b.color(Color(0.0, 0.0, 1.0, 1.0))
    b.color(Color(1.0, 1.0, 1.0, 1.0))
    b.color(Color(1.0, 0.0, 0.0, 1.0))
    props = Props(func=Func.Draw(Style(fill=Fill.Gradient(b.build()))))
    composition.get_mut_or_insert_default(Order(1)).insert(circle()).set_props(props)


def scene_pixel(composition: Composition):
    composition.get_mut_or_insert_default(Order(1)).insert(
        custom_square(PADDING, PADDING, PADDING + 1.0, PADDING + 1.0)
    ).set_props(solid_color_props(Color(0.0, 0.0, 0.0, 1.0)))


def scene_covers(composition: Composition):
    layer = composition.get_mut_or_insert_default(Order(0)).set_props(
        solid_color_props(Color(0.0, 0.0, 0.0, 1.0))
    )
    for xi in range(32):
        for yi in range(32):
            x0 = xi * (2.0 + 1.0 / 32.0)
            y0 = yi * (2.0 + 1.0 / 32.0)
            layer.insert(custom_square(x0, y0, x0 + 1.0, y0 + 1.0))


def scene_texture(composition: Composition):
    image = Image.from_srgba(
        [
            [0, 0, 0, 255],
            [255, 0, 0, 255],
            [0, 255, 0, 255],
            [255, 255, 0, 255],
            [0, 0, 255, 255],
            [255, 0, 255, 255],
            [0, 255, 255, 255],
            [255, 255, 255, 255],
            [0, 0, 0, 255],
        ],
        3,
        3,
    )
    order = 0
    for xi in range(8):
        for yi in range(8):
            x0 = xi * 8.0
            y0 = yi * 8.0
            tx = -x0 - 2.0 + xi * 0.25
            ty = -y0 - 2.0 + yi * 0.25
            composition.get_mut_or_insert_default(Order(order)).insert(
                custom_square(x0, y0, x0 + 7.0, y0 + 7.0)
            ).set_props(
                Props(
                    fill_rule=FillRule.EvenOdd,
                    func=Func.Draw(
                        Style(
                            is_clipped=False,
                            fill=Fill.Texture(
                                Texture(
                                    transform=AffineTransform(
                                        ux=1.0, uy=0.0, vx=0.0, vy=1.0, tx=tx, ty=ty
                                    ),
                                    image=image,
                                )
                            ),
                            blend_mode=BlendMode.Over,
                        )
                    ),
                )
            )
            order += 1


def scene_blend_mode(composition: Composition, blend_mode: BlendMode):
    composition.get_mut_or_insert_default(Order(0)).insert(square()).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Gradient(horizontal_rainbow()))))
    )
    composition.get_mut_or_insert_default(Order(1)).insert(triangle()).set_props(
        Props(
            func=Func.Draw(
                Style(fill=Fill.Gradient(vertical_rainbow()), blend_mode=blend_mode)
            )
        )
    )


def scene_fill_rule(composition: Composition, fill_rule: FillRule):
    path = (
        PathBuilder()
        .move_to(Point(PADDING, PADDING))
        .line_to(Point(WIDTH / 2.0 + PADDING, HEIGHT / 2.0 + PADDING))
        .line_to(Point(WIDTH / 2.0 - PADDING, HEIGHT / 2.0 + PADDING))
        .line_to(Point(WIDTH - PADDING, PADDING))
        .line_to(Point(WIDTH - PADDING, HEIGHT - PADDING))
        .line_to(Point(PADDING, HEIGHT - PADDING))
        .build()
    )
    composition.get_mut_or_insert_default(Order(0)).insert(path).set_props(
        Props(
            fill_rule=fill_rule,
            func=Func.Draw(Style(fill=Fill.Solid(Color(0.0, 0.0, 0.0, 0.8)))),
        )
    )


def scene_clipping(composition: Composition):
    composition.get_mut_or_insert_default(Order(0)).insert(square()).set_props(
        solid_color_props(Color(0.0, 0.0, 0.0, 0.7))
    )
    composition.get_mut_or_insert_default(Order(1)).insert(triangle()).set_props(
        Props(func=Func.Clip(4))
    )
    composition.get_mut_or_insert_default(Order(2)).insert(square()).set_props(
        Props(
            func=Func.Draw(
                Style(fill=Fill.Solid(Color(0.5, 0.5, 1.0, 0.7)), is_clipped=True)
            )
        )
    )
    # Order 3 intentionally left empty.
    composition.get_mut_or_insert_default(Order(4)).insert(circle()).set_props(
        Props(func=Func.Draw(Style(fill=Fill.Solid(Color(1.0, 0.5, 0.5, 0.7)))))
    )
    composition.get_mut_or_insert_default(Order(5)).insert(inner_square()).set_props(
        Props(
            func=Func.Draw(
                Style(fill=Fill.Solid(Color(0.5, 0.5, 1.0, 0.6)), is_clipped=True)
            )
        )
    )
    # Not drawn: is_clipped with no active clip at order 6.
    composition.get_mut_or_insert_default(Order(6)).insert(inner_circle()).set_props(
        Props(
            func=Func.Draw(
                Style(fill=Fill.Solid(Color(0.5, 1.0, 0.5, 0.6)), is_clipped=True)
            )
        )
    )


def scene_clipping2(composition: Composition):
    composition.get_mut_or_insert_default(Order(0)).insert(square()).set_props(
        solid_color_props(Color(0.0, 0.0, 0.0, 0.7))
    )
    composition.get_mut_or_insert_default(Order(1)).insert(inner_circle()).set_props(
        Props(func=Func.Clip(1))
    )
    composition.get_mut_or_insert_default(Order(2)).insert(triangle()).set_props(
        Props(
            func=Func.Draw(
                Style(fill=Fill.Solid(Color(0.5, 0.5, 1.0, 0.7)), is_clipped=True)
            )
        )
    )


def all_scenes():
    """Yields (golden_name, scene_fn) pairs for every golden image."""
    for name in SOLID_COLORS:
        yield f"tests__solid_color__{name}__cpu", (
            lambda c, n=name: scene_solid_color(c, n)
        )
    yield "tests__linear_gradient__cpu", scene_linear_gradient
    yield "tests__radial_gradient__cpu", scene_radial_gradient
    yield "tests__pixel__cpu", scene_pixel
    yield "tests__covers__cpu", scene_covers
    yield "tests__texture__cpu", scene_texture
    for mode in BlendMode:
        yield f"tests__blend_modes__{mode.name}__cpu", (
            lambda c, m=mode: scene_blend_mode(c, m)
        )
    for rule in (FillRule.EvenOdd, FillRule.NonZero):
        yield f"tests__fill_rules__{rule.name}__cpu", (
            lambda c, r=rule: scene_fill_rule(c, r)
        )
    yield "tests__clipping__cpu", scene_clipping
    yield "tests__clipping2__cpu", scene_clipping2
