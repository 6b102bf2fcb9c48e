"""The device (JAX/XLA) renderer facade.

Drives the staged device pipeline:

    line_setup -> rasterize+sort -> runs/carries -> units -> paint -> sRGB

Dynamic sizes (total pixel segments, runs, virtual units, max layers per
tile) are read back between stages and quantised to sticky power-of-two
capacity buckets, so steady-state rendering reuses compiled executables.
Geometry arrays are cached on the segment buffer's version and only re-upload
when paths change; per-frame host work is O(#geometries + #layers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import consts
from .buffer import RGBA
from .composition import Composition
from .ops import line_setup as _ls
from .ops import paint as _paint
from .ops import rasterize as _raster
from .ops import runs as _runs
from .ops import srgb as _srgb
from .ops import styles as _styles
from .styling import Color


def _bucket(n: int, lo: int = 256) -> int:
    c = lo
    while c < n:
        c <<= 1
    return c


class Renderer:
    """Renders compositions on the default JAX device (TPU when available)."""

    def __init__(self):
        self._geom_cache_key = None
        self._geom_cache = None
        self._seg_cap = 256
        self._run_cap = 256
        self._v_cap = 256
        self._k_cap = 4

    # -- geometry upload ----------------------------------------------------

    def _prepare_geometry(self, composition: Composition):
        import jax.numpy as jnp

        buf = composition.shared_segment_buffer()
        x, y, ids = buf.flat()
        key = (buf.serial, buf.version)
        if self._geom_cache_key != key:
            if len(x) == 0:
                px = np.zeros(1, np.float32)
                py = np.zeros(1, np.float32)
                line_slot = np.full(1, -1, np.int32)
                uniq = np.zeros(0, np.int64)
            else:
                px, py = x, y
                uniq = np.unique(ids[:-1]) if len(ids) > 1 else np.zeros(0, np.int64)
                uniq = uniq[uniq != 0]
                line_ids = ids[:-1]
                slot = np.searchsorted(uniq, line_ids)
                slot = np.where(
                    (line_ids != 0)
                    & (slot < len(uniq))
                    & (uniq[np.minimum(slot, max(len(uniq) - 1, 0))] == line_ids),
                    slot,
                    -1,
                ).astype(np.int32)
                line_slot = slot
            self._geom_cache_key = key
            self._geom_cache = (
                jnp.asarray(px),
                jnp.asarray(py),
                jnp.asarray(line_slot),
                uniq,
            )
        return self._geom_cache

    def _geom_tables(self, composition: Composition, uniq: np.ndarray):
        g = max(len(uniq), 1)
        g_order = np.zeros(g, np.uint32)
        g_valid = np.zeros(g, bool)
        g_t = np.tile(np.asarray([1, 0, 0, 1, 0, 0], np.float32), (g, 1))
        g_has_t = np.zeros(g, bool)
        g2o = composition.geom_id_to_order()
        layers = composition.layers
        for k, gid in enumerate(uniq):
            order = g2o.get(int(gid))
            if order is None:
                continue
            layer = layers.get(order)
            if layer is None or not layer.is_enabled_value or layer.order is None:
                continue
            g_order[k] = layer.order.as_u32()
            g_valid[k] = True
            t = layer.affine_transform_value
            if t is not None:
                g_t[k] = np.asarray(t.as_slice(), np.float32)
                g_has_t[k] = True
        return g_order, g_valid, g_t, g_has_t

    # -- rendering ----------------------------------------------------------

    def render(
        self,
        composition: Composition,
        width: int,
        height: int,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
        crop=None,
    ) -> np.ndarray:
        """Renders and returns u8 [height, width, 4] in channel order."""
        import jax.numpy as jnp

        composition.compact_geom()

        rows = -(-height // consts.TILE_HEIGHT)
        tiles_x = -(-width // consts.TILE_WIDTH)

        px, py, line_slot, uniq = self._prepare_geometry(composition)
        g_order, g_valid, g_t, g_has_t = self._geom_tables(composition, uniq)

        (orders, x0, y0, dx, dy, a, b, c, d, sum_lengths) = _ls.line_setup(
            px,
            py,
            line_slot,
            jnp.asarray(g_order),
            jnp.asarray(g_valid),
            jnp.asarray(g_t),
            jnp.asarray(g_has_t),
            width,
            height,
        )
        total = int(sum_lengths[-1]) if sum_lengths.shape[0] else 0

        st = _styles.build_style_tables(composition.layers)
        clear = jnp.asarray(clear_color.to_array(), jnp.float32)

        if total == 0 or not composition.layers:
            frame = jnp.broadcast_to(
                clear, (rows * consts.TILE_HEIGHT, tiles_x * consts.TILE_WIDTH, 4)
            )
            packed = _srgb.pack_srgb(frame, tuple(ch.value for ch in channels))
            return np.asarray(packed)[:height, :width]

        self._seg_cap = max(self._seg_cap, _bucket(total + 1))
        key_hi, key_lo, pos, ac = _raster.rasterize_sort(
            orders, x0, y0, dx, dy, a, b, c, d, sum_lengths,
            jnp.uint32(total), self._seg_cap, rows, tiles_x,
        )

        run_id, num_runs = _runs.extract_runs(key_hi, key_lo)
        n_runs = int(num_runs)
        self._run_cap = max(self._run_cap, _bucket(n_runs))

        st_orders = jnp.asarray(st.orders)
        st_fill_rule = jnp.asarray(st.fill_rule)
        rd = _runs.run_data(
            key_hi, key_lo, pos, ac, run_id, num_runs,
            st_orders, st_fill_rule, self._run_cap, tiles_x,
        )

        v_total = int(rd["v_total"])
        self._v_cap = max(self._v_cap, _bucket(v_total + 1))
        key_u, layer_u, src_u, virt_u, k_u, u_valid, k_needed = _runs.build_units(
            rd["run_hi"], rd["run_layer"], rd["r_valid"],
            rd["key2_s"], rd["tx_s"], rd["span"], rd["cumspan"], rd["v_total"],
            self._v_cap,
        )
        kn = int(k_needed)
        self._k_cap = max(self._k_cap, _bucket(max(kn, 1), lo=4))

        frame = _paint.paint(
            key_u, layer_u, src_u, virt_u, k_u, u_valid,
            rd["area_grid"], rd["cover_grid"], rd["carry_in"], rd["carry_after_s"],
            st_orders, st_fill_rule,
            jnp.asarray(st.func), jnp.asarray(st.clip_n),
            jnp.asarray(st.is_clipped), jnp.asarray(st.blend),
            jnp.asarray(st.fill_type), jnp.asarray(st.color),
            jnp.asarray(st.grad), jnp.asarray(st.stops), jnp.asarray(st.tex),
            jnp.asarray(st.atlas), clear,
            rows, tiles_x, self._k_cap, st.features,
        )
        packed = _srgb.pack_srgb(frame, tuple(ch.value for ch in channels))
        return np.asarray(packed)[:height, :width]
