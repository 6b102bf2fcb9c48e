"""Spaceship demo through the damage-cached path: every frame only mutates
transforms/orders; the cached render must stay pixel-identical to a fresh
uncached render (the reference's incremental-update showcase,
`demo/src/demos/spaceship.rs`)."""

import numpy as np

from forma_tpu import Buffer, Color, LinearLayout
from forma_tpu.composition import Composition
from forma_tpu.demos.spaceship import Spaceship
from forma_tpu.renderer import Renderer

W = H = 128
CLEAR = Color(0.02, 0.02, 0.08, 1.0)


def test_spaceship_cached_frames_match_fresh():
    comp = Composition()
    ship = Spaceship(width=W, height=H)
    ship.build(comp)

    r = Renderer()
    cache = r.create_buffer_layer_cache()
    backing = np.zeros((H, W * 4), np.uint8)
    buf = Buffer(
        buffer=backing, layout=LinearLayout(W, W * 4, H), layer_cache=cache
    )

    depths = []
    for i in range(4):
        if i:
            ship.step()
        r.render_into(comp, buf, CLEAR)
        depths.append(int(r.last_diag[3]))
        fresh = Renderer().render(comp, W, H, CLEAR)
        np.testing.assert_array_equal(
            backing[:, : W * 4].reshape(H, W, 4), fresh, err_msg=f"frame {i}"
        )
    # Incremental frames paint only damaged tiles; at least one later frame
    # must need strictly less fold depth than a full repaint would.
    assert min(depths[1:]) <= depths[0]
