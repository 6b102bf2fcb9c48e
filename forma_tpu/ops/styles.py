"""Host-side style-table builder.

The device-side analog of `gpu/style_map.rs`: serialises every layer's Props
into flat arrays indexed by a sorted layer-id table, packs texture images
into one atlas, and reports which features the frame uses so the paint fold
can specialise.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

from ..styling import Fill, Func, GradientType
from .paint import Features


@dataclass
class StyleTables:
    orders: np.ndarray  # u32 [SL] sorted
    fill_rule: np.ndarray  # i32
    func: np.ndarray  # i32 (0 draw, 1 clip)
    clip_n: np.ndarray  # i32
    is_clipped: np.ndarray  # bool
    blend: np.ndarray  # i32
    fill_type: np.ndarray  # i32
    color: np.ndarray  # f32 [SL, 4]
    grad: np.ndarray  # f32 [SL, 6]
    stops: np.ndarray  # f32 [SL, MS, 5]
    tex: np.ndarray  # f32 [SL, 10]
    atlas: np.ndarray  # f32 [AH, AW, 4]
    features: Features
    max_stops: int


def _pack_atlas(images: Dict[int, "np.ndarray"]) -> Tuple[np.ndarray, Dict[int, Tuple[int, int]]]:
    """Stacks images into one atlas; returns (atlas, id -> (ax, ay)).

    Vertical shelf packing; adequate until scenes carry many large textures
    (the reference uses a 4096^2 etagere atlas, `style_map.rs:29,72-137`).
    """
    if not images:
        return np.zeros((1, 1, 4), np.float32), {}
    width = max(im.shape[1] for im in images.values())
    height = sum(im.shape[0] for im in images.values())
    atlas = np.zeros((height, width, 4), np.float32)
    offsets = {}
    y = 0
    for iid, im in images.items():
        atlas[y : y + im.shape[0], : im.shape[1]] = im
        offsets[iid] = (0, y)
        y += im.shape[0]
    return atlas, offsets


def build_style_tables(layers, min_stops: int = 4) -> StyleTables:
    """layers: dict[Order, Layer] of the composition."""
    entries = sorted(
        (order.as_u32(), layer.props) for order, layer in layers.items()
    )
    n = max(len(entries), 1)

    # Stop capacity: longest gradient + 1 pad slot, bucketed.
    max_real = 1
    images = {}
    for _, props in entries:
        if props.func.kind == Func.DRAW:
            fill = props.func.style.fill
            if fill.kind == Fill.GRADIENT:
                max_real = max(max_real, len(fill.gradient.stops))
            elif fill.kind == Fill.TEXTURE:
                img = fill.texture.image
                images[img.id] = img.data
    ms = max(min_stops, 1 << (max_real).bit_length())

    atlas, offsets = _pack_atlas(images)

    orders = np.full(n, 0xFFFFFFFF, np.uint32)
    fill_rule = np.zeros(n, np.int32)
    func = np.zeros(n, np.int32)
    clip_n = np.zeros(n, np.int32)
    is_clipped = np.zeros(n, bool)
    blend = np.zeros(n, np.int32)
    fill_type = np.zeros(n, np.int32)
    color = np.zeros((n, 4), np.float32)
    grad = np.zeros((n, 6), np.float32)
    stops = np.zeros((n, ms, 5), np.float32)
    stops[:, :, 4] = np.inf
    tex = np.zeros((n, 10), np.float32)

    blend_modes = {0}
    has_gradient = has_texture = has_clip = False

    for i, (order, props) in enumerate(entries):
        orders[i] = order
        fill_rule[i] = props.fill_rule.value
        if props.func.kind == Func.CLIP:
            func[i] = 1
            clip_n[i] = props.func.clip
            has_clip = True
            continue
        style = props.func.style
        is_clipped[i] = style.is_clipped
        has_clip |= style.is_clipped
        blend[i] = style.blend_mode.value
        blend_modes.add(style.blend_mode.value)
        fill = style.fill
        fill_type[i] = fill.kind
        if fill.kind == Fill.SOLID:
            color[i] = np.asarray(fill.color.to_array(), np.float32)
        elif fill.kind == Fill.GRADIENT:
            has_gradient = True
            g = fill.gradient
            sx = np.float32(g.start.x)
            sy = np.float32(g.start.y)
            dx = np.float32(g.end.x) - sx
            dy = np.float32(g.end.y) - sy
            dot = np.float32(dx * dx + dy * dy)
            grad[i] = [
                np.float32(1.0 if g.type == GradientType.Radial else 0.0),
                sx,
                sy,
                dx,
                dy,
                np.float32(1.0) / dot,
            ]
            for j, (c, s) in enumerate(g.stops):
                stops[i, j, :4] = np.asarray(c.to_array(), np.float32)
                stops[i, j, 4] = np.float32(s)
            # Pad with (last color, +inf) so the device select chain ends on
            # the last color without per-style stop counts.
            last = np.asarray(g.stops[-1][0].to_array(), np.float32)
            for j in range(len(g.stops), ms):
                stops[i, j, :4] = last
                stops[i, j, 4] = np.inf
        else:
            has_texture = True
            t = fill.texture
            ax, ay = offsets[t.image.id]
            tex[i] = np.asarray(
                t.transform.to_array()
                + [t.image.max_x, t.image.max_y, ax, ay],
                np.float32,
            )

    return StyleTables(
        orders=orders,
        fill_rule=fill_rule,
        func=func,
        clip_n=clip_n,
        is_clipped=is_clipped,
        blend=blend,
        fill_type=fill_type,
        color=color,
        grad=grad,
        stops=stops,
        tex=tex,
        atlas=atlas,
        features=Features(
            blend_modes=tuple(sorted(blend_modes)),
            has_gradient=has_gradient,
            has_texture=has_texture,
            has_clip=has_clip,
        ),
        max_stops=ms,
    )
