"""The device (JAX/XLA) renderer facade.

Each frame dispatches ONE fused device program (`ops/pipeline.render_frame`)
with optimistic capacity buckets: the packed frame and a diagnostics vector
come back in a single device sync; if any actual total exceeded its bucket,
the buckets grow (sticky, power-of-two) and the frame re-renders — which
happens only on scene growth, never in steady state.

Geometry arrays are cached on the segment buffer's version and only
re-upload when paths change; per-frame host work is O(#geometries + #layers).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import consts
from .buffer import RGBA
from .composition import Composition
from .ops import pipeline as _pipe
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
        self._tables_cache_key = None
        self._tables_cache = None
        self._styles_cache_key = None
        self._styles_cache = None
        self._caps = _pipe.Caps()
        self.last_diag: Optional[np.ndarray] = None

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
        key = (
            composition.shared_segment_buffer().serial,
            composition.shared_segment_buffer().version,
            composition._shared.state_version,
        )
        if self._tables_cache_key == key:
            return self._tables_cache
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
        import jax.numpy as jnp

        self._tables_cache_key = key
        self._tables_cache = (
            jnp.asarray(g_order),
            jnp.asarray(g_valid),
            jnp.asarray(g_t),
            jnp.asarray(g_has_t),
        )
        return self._tables_cache

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
        frame, _ = self.render_device(composition, width, height, clear_color, channels)
        return np.asarray(frame)[:height, :width]

    def render_into(
        self,
        composition: Composition,
        buffer,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
        crop=None,
    ):
        """Renders into a `Buffer` (numpy u8 [H, width_stride]); pixels
        outside `crop` (a tile-aligned `Rect`) are left untouched, matching
        `cpu::Renderer::render` (`forma/src/cpu/renderer.rs:75`)."""
        from . import consts as _c

        layout = buffer.layout
        w, h = layout.width(), layout.height()
        frame, _ = self.render_device(composition, w, h, clear_color, channels)
        img = np.asarray(frame)[:h, :w]
        target = buffer.buffer.reshape(h, -1)[:, : w * 4].reshape(h, w, 4)
        if crop is None:
            target[:] = img
        else:
            x0 = crop.hor.start * _c.TILE_WIDTH
            x1 = min(crop.hor.stop * _c.TILE_WIDTH, w)
            y0 = crop.vert.start * _c.TILE_HEIGHT
            y1 = min(crop.vert.stop * _c.TILE_HEIGHT, h)
            target[y0:y1, x0:x1] = img[y0:y1, x0:x1]
        if buffer.layer_cache is not None:
            cache = buffer.layer_cache
            cache.clear_color = clear_color
            cache.width, cache.height = w, h
            for layer in composition.layers.values():
                layer.set_is_unchanged(cache.id, layer.is_enabled_value)

    def render_device(
        self,
        composition: Composition,
        width: int,
        height: int,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
    ):
        """Renders; returns (device u8 frame [rows*16, tiles_x*16, 4], diag).

        The frame stays on device; only the diagnostics vector syncs.
        """
        import jax.numpy as jnp

        composition.compact_geom()

        rows = -(-height // consts.TILE_HEIGHT)
        tiles_x = -(-width // consts.TILE_WIDTH)

        px, py, line_slot, uniq = self._prepare_geometry(composition)
        g_order, g_valid, g_t, g_has_t = self._geom_tables(composition, uniq)

        skey = (
            composition.shared_segment_buffer().serial,
            composition._shared.state_version,
        )
        if self._styles_cache_key == skey:
            st_host, st = self._styles_cache
        else:
            st_host = _styles.build_style_tables(composition.layers)
            st = _pipe.style_tables_device(st_host)
            self._styles_cache_key = skey
            self._styles_cache = (st_host, st)
        clear = jnp.asarray(clear_color.to_array(), jnp.float32)
        chans = tuple(ch.value for ch in channels)

        for _ in range(8):  # bounded growth retries
            frame, diag = _pipe.render_frame(
                px, py, line_slot, g_order, g_valid, g_t, g_has_t, st, clear,
                width, height, rows, tiles_x,
                self._caps, st_host.features, chans,
            )
            d = np.asarray(diag)
            caps = self._caps
            if (
                d[_pipe.DIAG_TOTAL] <= caps.seg
                and d[_pipe.DIAG_RUNS] <= caps.run
                and d[_pipe.DIAG_VIRT] <= caps.virt
                and d[_pipe.DIAG_K] <= caps.k
            ):
                self.last_diag = d
                return frame, d
            self._caps = _pipe.Caps(
                seg=max(caps.seg, _bucket(int(d[_pipe.DIAG_TOTAL]) + 1)),
                run=max(caps.run, _bucket(int(d[_pipe.DIAG_RUNS]))),
                virt=max(caps.virt, _bucket(int(d[_pipe.DIAG_VIRT]) + 1)),
                k=max(caps.k, _bucket(max(int(d[_pipe.DIAG_K]), 1), lo=4)),
            )
        raise RuntimeError(f"capacity growth did not converge: {d}")
