"""Demo CLI smoke tests (the reference's `demo/src/main.rs` surface) and
atlas behavior under texture churn."""

import os

import numpy as np
import pytest

from forma_tpu.demos import main as demo_main


@pytest.mark.parametrize(
    "argv",
    [
        ["oracle", "circles", "16", "--width", "64", "--height", "64", "--no-save"],
        ["tpu", "circles", "16", "--width", "64", "--height", "64", "--no-save"],
        ["tpu", "spaceship", "--width", "64", "--height", "64", "--frames", "2",
         "--no-save"],
        ["oracle", "texture", "--width", "64", "--height", "64", "--no-save"],
        ["tpu", "paris", "--paths", "50", "--width", "64", "--height", "64",
         "--no-save"],
    ],
)
def test_demo_cli_smoke(argv):
    demo_main.main(argv)


def test_demo_svg_cli(tmp_path):
    svg = tmp_path / "t.svg"
    svg.write_text(
        '<svg xmlns="http://www.w3.org/2000/svg" width="64" height="64">'
        '<path d="M8 8 L56 8 L32 56 Z" fill="#3366cc"/></svg>'
    )
    out = tmp_path / "frame"
    demo_main.main(["tpu", "svg", str(svg), "--width", "64", "--height", "64",
                    "--out", str(out)])
    assert os.path.exists(f"{out}.png")


def test_texture_churn_keeps_atlas_bounded():
    """Image churn across frames: dead images GC out of the atlas instead of
    growing it without bound (`style_map.rs:72-137` behavior)."""
    from forma_tpu import (
        AffineTransform, Color, Composition, Fill, Func, Image, Order,
        Props, Style, Texture,
    )
    from forma_tpu.path import PathBuilder
    from forma_tpu.math import Point
    from forma_tpu.renderer import Renderer

    comp = Composition()
    sq = (
        PathBuilder()
        .move_to(Point(4, 4)).line_to(Point(4, 44))
        .line_to(Point(44, 44)).line_to(Point(44, 4)).build()
    )
    layer = comp.get_mut_or_insert_default(Order(0))
    layer.insert(sq)
    r = Renderer()
    rng = np.random.default_rng(0)
    for i in range(12):
        texels = rng.integers(0, 255, (3000, 64, 4), np.uint8)
        img = Image.from_srgba(texels.reshape(-1, 4), 64, 3000)  # tall image
        layer.set_props(
            Props(func=Func.Draw(Style(fill=Fill.Texture(
                Texture(transform=AffineTransform(), image=img)
            ))))
        )
        out = r.render(comp, 48, 48, Color(1, 1, 1, 1))
        assert out.shape == (48, 48, 4)
    # 12 x 3000 rows would overflow a 4096-row atlas without GC.
    assert len(r._style_map.allocator) <= 2
