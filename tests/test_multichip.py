"""Multi-chip sharding: the row-sharded frame must equal the single-chip
frame bit-for-bit (conftest forces an 8-device virtual CPU mesh, the same
trick the reference uses with software Vulkan in CI)."""

import numpy as np

import jax
import jax.numpy as jnp


def _prep_scene(width, height, n_circles=16):
    from forma_tpu import Color, Composition
    from forma_tpu.demos import scenes
    from forma_tpu.ops import pipeline as pipe
    from forma_tpu.ops import styles as styles_mod
    from forma_tpu.renderer import Renderer

    comp = Composition()
    scenes.circles(comp, n_circles, width, height)

    r = Renderer()
    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host = styles_mod.build_style_tables(comp.layers)
    st = pipe.style_tables_device(st_host)
    g_slot, g_valid, g_t, g_has_t = r._geom_tables(comp, uniq, st_host.orders)
    clear = jnp.asarray(Color(1.0, 1.0, 1.0, 1.0).to_array(), jnp.float32)
    args = (px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear)
    return args, st_host.features


def test_sharded_frame_matches_single_chip():
    from forma_tpu.ops import pipeline as pipe

    n = 8
    assert len(jax.devices()) >= n
    mesh = jax.make_mesh((n,), ("rows",))

    width = 64
    rows_per_shard = 2
    height = rows_per_shard * 16 * n
    args, features = _prep_scene(width, height)
    caps = pipe.Caps(vline=2048, run=2048, virt=2048, k=8)

    frame_s, diag_s = pipe.render_frame_sharded(
        *args,
        width=width, height=height,
        rows=rows_per_shard, tiles_x=width // 16,
        caps=caps, features=features, channels=(0, 1, 2, 3), mesh=mesh,
    )
    frame_1, diag_1 = pipe.render_frame(
        *args,
        width=width, height=height,
        rows=rows_per_shard * n, tiles_x=width // 16,
        caps=caps, features=features, channels=(0, 1, 2, 3),
    )
    a = np.asarray(frame_s)
    b = np.asarray(frame_1)
    assert a.shape == b.shape == (height, width, 4)
    np.testing.assert_array_equal(a, b)
    assert int(np.asarray(diag_s)[0]) > 0


def test_dryrun_multichip_entry():
    """The driver-facing entry must pass in this (CPU-forced) environment."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
