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
from .buffer import normalize_channels as _normalize_channels
from .composition import Composition
from .ops import pipeline as _pipe
from .ops import styles as _styles
from .styling import Color


def _bucket(n: int, lo: int = 256) -> int:
    c = lo
    while c < n:
        c <<= 1
    return c


# Minimum damaged-tile pixel prefix fetched alongside the diagnostics in
# round trip 1; the renderer ADAPTS the prefix to the previous frame's
# damage (damage is frame-coherent in animations), so steady-state
# incremental updates take ONE host round trip with bytes ~ actual
# damage.  A mispredicted (larger) frame fetches one 64-aligned remainder
# slice and the prefix regrows.
_DMG_PREFIX = 64


def _bucket_fine(n: int, lo: int = 256) -> int:
    """Sixteenth-power-of-two buckets: the big capacity buckets (virtual
    lines, runs) drive sort and scatter sizes, so coarse growth steps waste
    real frame time — measured: +25% slots cost ~90 ms/frame at paris scale.
    {16..32}/16 x 2^k keeps padding under 6.25%."""
    if n <= lo:
        return lo
    p = 1 << (int(n - 1).bit_length() - 1)  # largest pow2 <= n-1
    for m in range(16, 33):
        c = p * m // 16
        if c >= n:
            return c
    return p * 2


class Renderer:
    """Renders compositions on the default JAX device (TPU when available)."""

    def __init__(self):
        self._geom_cache_key = None
        self._geom_cache = None
        self._slots_cache_key = None
        self._slots_cache = None
        self._tables_cache_key = None
        self._tables_cache = None
        self._styles_cache_key = None
        self._styles_cache = None
        self._style_map = _styles.StyleMap()
        self._caps = _pipe.Caps()
        self._cache_slots = 0  # 32-bit set (`SmallBitSet`, renderer.rs:67-73)
        self.last_diag: Optional[np.ndarray] = None
        self.last_timings = None  # set by forma_tpu.profiling.profile_frame
        self._last_dmg = None  # compact damaged-tile readback (idx, tiles)
        # Mid-animation recompile guard (every regrow is a full recompile):
        # transform changes between renders flip `_animating`, which widens
        # the vline estimate's headroom; `announce_max_scale` bounds it for
        # zooms beyond that.  `regrow_count` counts growth-loop recompiles
        # (tests assert a warmed animation never re-enters the loop).
        self.regrow_count = 0
        self._animating = False
        self._last_tver = None
        self._announced_scale = 1.0
        self._dmg_prefix = _DMG_PREFIX  # adaptive damage-readback prefix
        self._pending = None  # in-flight pipelined frame (ticket, buffer, ...)
        # Line-sharded multi-chip path state: round-robin endpoint-pair
        # arrays (cached per geometry version + shard count) and its own
        # capacity buckets (per-shard sized — ~1/N of the single-chip ones).
        self._pairs_cache_key = None
        self._pairs_cache = None
        self._caps_lines = None
        self._xcap = 1024

    def profile_frame(self, composition, width, height, clear_color, channels=None):
        """Per-stage `Timings` (the `gpu::Timings` analog) via a profiling
        re-run with fenced per-stage dispatches; see forma_tpu/profiling.py."""
        from .profiling import profile_frame

        return profile_frame(self, composition, width, height, clear_color, channels)

    # -- layer caches ---------------------------------------------------------

    def create_buffer_layer_cache(self):
        """Hands out one of <= 32 damage-cache slots
        (`cpu/renderer.rs:67-73`); returns None when exhausted."""
        from .buffer import BufferLayerCache

        for i in range(32):
            if not self._cache_slots & (1 << i):
                self._cache_slots |= 1 << i
                return BufferLayerCache(i, self)
        return None

    def _release_cache_slot(self, cache_id: int):
        self._cache_slots &= ~(1 << cache_id)

    def _cap_headroom(self) -> float:
        """Capacity slack factor while transforms are churning: run/virtual
        counts scale roughly with segment counts, so animated sequences get
        ~20% slack (or the announced zoom bound) on EVERY bucket — applied
        at the animating flip and to any diag-driven regrow, so one warmup
        recompile covers the whole sequence."""
        h = 1.20 if self._animating else 1.0
        if self._announced_scale > 1.0:
            h = max(h, self._announced_scale * 1.0626)
        return h

    def announce_max_scale(self, scale: float):
        """Declares the maximum zoom factor an upcoming animation will apply
        RELATIVE to the composition's current transforms, so the capacity
        estimate can bound per-line lengths over the whole sequence and a
        sustained zoom-in never regrows (= recompiles) mid-animation.
        Scales below an already-announced bound are ignored."""
        if scale > self._announced_scale:
            self._announced_scale = float(scale)
            self._estimate_key = None  # force re-estimate at the new bound

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

    def _geom_slots(self, composition: Composition, uniq: np.ndarray):
        """uniq geom id -> layer registry slot (-1 if unregistered); cached on
        membership (scene) changes, not on per-frame transform changes."""
        shared = composition._shared
        key = (
            shared.segment_buffer.serial,
            shared.segment_buffer.version,
            shared.scene_version,
        )
        if self._slots_cache_key != key:
            g2s = shared.geom_id_to_slot
            self._slots_cache = np.fromiter(
                (g2s.get(int(gid), -1) for gid in uniq),
                np.int32,
                count=len(uniq),
            )
            self._slots_cache_key = key
        return self._slots_cache

    def _geom_tables(self, composition: Composition, uniq: np.ndarray, st_orders):
        """Per-geometry style-slot/validity/transform tables as registry
        gathers — O(#geoms) numpy per transform change, no Python loop.

        `st_orders` is the style tables' sorted per-layer order array; the
        geometry's layer resolves to its style slot HERE, on the host, so the
        device never runs a searchsorted over pixel segments."""
        shared = composition._shared
        key = (
            shared.segment_buffer.serial,
            shared.segment_buffer.version,
            shared.scene_version,
            shared.style_version,
            shared.tform_version,
        )
        if self._tables_cache_key == key:
            return self._tables_cache
        slots = self._geom_slots(composition, uniq)
        reg = shared.registry
        g = max(len(uniq), 1)
        if len(uniq):
            sl = np.maximum(slots, 0)
            ok = slots >= 0
            g_order = np.where(ok, reg.order[sl], 0).astype(np.uint32)
            g_valid = ok & reg.valid[sl]
            g_t = reg.tform[sl].astype(np.float32)
            g_has_t = ok & reg.has_t[sl]
            pos = np.searchsorted(st_orders, g_order)
            pos = np.minimum(pos, max(len(st_orders) - 1, 0))
            found = g_valid & (st_orders[pos] == g_order)
            g_slot = np.where(found, pos, -1).astype(np.int32)
            g_valid = found
        else:
            g_slot = np.full(g, -1, np.int32)
            g_valid = np.zeros(g, bool)
            g_t = np.tile(np.asarray([1, 0, 0, 1, 0, 0], np.float32), (g, 1))
            g_has_t = np.zeros(g, bool)
        import jax.numpy as jnp

        self._tables_cache_key = key
        self._tables_cache = (
            jnp.asarray(g_slot),
            jnp.asarray(g_valid),
            jnp.asarray(g_t),
            jnp.asarray(g_has_t),
        )
        return self._tables_cache

    def _estimate_caps(self, composition: Composition, width: int, height: int):
        """Pre-sizes the capacity buckets from a host-side numpy replay of
        line setup (transform, cull, Manhattan lengths) so the first device
        render rarely regrows — every regrowth is a full recompile of the
        fused pipeline (~minutes through the remote-compile tunnel)."""
        buf = composition.shared_segment_buffer()
        shared = composition._shared
        # Keyed on membership/geometry, NOT transforms: per-frame animation
        # shifts lengths only slightly and the diag-driven growth catches any
        # overflow; re-running the numpy replay per frame would be host-bound.
        # Transform churn between renders flips `_animating` (part of the
        # key, so the estimate recomputes ONCE with animation headroom).
        if self._last_tver is not None and shared.tform_version != self._last_tver:
            self._animating = True
        self._last_tver = shared.tform_version
        ekey = (
            buf.serial, buf.version, shared.scene_version, width, height,
            self._animating, self._announced_scale,
        )
        if getattr(self, "_estimate_key", None) == ekey:
            return
        self._estimate_key = ekey
        x, y, ids = buf.flat()
        if len(x) < 2:
            return
        uniq = self._geom_cache[3] if self._geom_cache else None
        if uniq is None or not len(uniq):
            return
        slots = self._geom_slots(composition, uniq)
        line_slot = self._geom_cache[2]
        ls = np.asarray(line_slot)
        gi = np.maximum(ls, 0)
        reg = composition._shared.registry
        rslots = np.maximum(slots, 0)
        valid = (ls >= 0) & (slots[gi] >= 0) & reg.valid[rslots[gi]]
        t = reg.tform[rslots[gi]]
        has_t = reg.has_t[rslots[gi]]
        p0x, p0y = x[:-1], y[:-1]
        p1x, p1y = x[1:], y[1:]
        with np.errstate(invalid="ignore"):
            q0x = np.where(has_t, t[:, 0] * p0x + t[:, 2] * p0y + t[:, 4], p0x)
            q0y = np.where(has_t, t[:, 1] * p0x + t[:, 3] * p0y + t[:, 5], p0y)
            q1x = np.where(has_t, t[:, 0] * p1x + t[:, 2] * p1y + t[:, 4], p1x)
            q1y = np.where(has_t, t[:, 1] * p1x + t[:, 3] * p1y + t[:, 5], p1y)
            skip = (
                (q0y == q1y)
                | ((q0y >= height) & (q1y >= height))
                | ((q0x >= width) & (q1x >= width))
                | ((q0y <= 0) & (q1y <= 0))
            )
            valid &= ~skip

            def ib(u, v):
                mn = np.minimum(u, v)
                mx = np.maximum(u, v)
                return np.maximum((np.ceil(mx) - np.floor(mn) - 1), 0)

            lengths = np.where(valid, ib(q0x, q1x) + ib(q0y, q1y) + 1, 0)
            if self._announced_scale > 1.0:
                # Worst-case bound over the announced zoom range: Manhattan
                # lengths scale ~linearly with the transform scale, plus
                # per-line ceil/floor rounding slack.
                s = self._announced_scale
                lengths = np.where(valid, lengths * s + (s + 1.0), 0.0)
            vlines = int(np.ceil(lengths / _pipe.K_SEG).sum())
        # vline is exact for the CURRENT transforms; animation (zoom/rotate)
        # shifts per-line lengths a few percent per frame, and a mid-sequence
        # regrow is a full recompile through the remote toolchain — so pad
        # by one fine bucket (~6.25%) of headroom, or three (~20%) once
        # transform churn marks the scene as animating (zooms beyond that
        # need `announce_max_scale`).  k is free at runtime
        # (the wave fold is bounded by actual depth, the static cap only
        # sizes the slot table).  run/virt have no tight host bound — their
        # diag-driven growth lands on the right bucket in one step.
        headroom = 1.20 if self._animating else 1.0626
        caps = self._caps
        h = self._cap_headroom()
        self._caps = _pipe.Caps(
            vline=max(caps.vline, _bucket_fine(int(vlines * headroom) + 512)),
            # run/virt/k have no host bound; at the animating flip (or an
            # announced zoom), inflate their CURRENT caps — which reflect
            # the warmed frames' actuals — by the same slack, so the one
            # recompile this estimate triggers covers the whole sequence.
            run=max(caps.run, _bucket_fine(int(caps.run * h))) if h > 1.0 else caps.run,
            virt=max(caps.virt, _bucket_fine(int(caps.virt * h))) if h > 1.0 else caps.virt,
            k=max(
                caps.k,
                256 if vlines > 100_000 else caps.k,
                _bucket(int(caps.k * h), lo=4) if h > 1.0 else caps.k,
            ),
        )

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
        """Renders and returns u8 [height, width, 4] in channel order.
        With `crop`, pixels outside the (tile-aligned) rect stay zero."""
        if crop is not None:
            from .buffer import Buffer, LinearLayout

            out = np.zeros((height, width * 4), np.uint8)
            self.render_into(
                composition,
                Buffer(buffer=out, layout=LinearLayout(width, width * 4, height)),
                clear_color, channels, crop,
            )
            return out.reshape(height, width, 4)
        frame, _ = self.render_device(composition, width, height, clear_color, channels)
        return np.asarray(frame)[:height, :width]

    def render_into(
        self,
        composition: Composition,
        buffer,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
        crop=None,
        pipelined: bool = False,
    ):
        """Renders into a `Buffer` (numpy u8 [H, width_stride]); pixels
        outside `crop` (a tile-aligned `Rect`) are left untouched, matching
        `cpu::Renderer::render` (`forma/src/cpu/renderer.rs:75`).

        With `buffer.layer_cache` set, unchanged tiles (same layer set, all
        layers' is_unchanged bits, same clear color) re-emit the previous
        frame's pixels and skip painting entirely — the reference's
        damage-cache fast path (`tile_unchanged.rs` + `CachedTile`).

        `pipelined=True` (cached, un-cropped renders only) overlaps the
        damage readback with the NEXT frame's device dispatch: the call
        returns after writing the PREVIOUS frame's pixels into `buffer`
        (one frame of latency, the standard swap-chain trade), and
        `flush_pending()` completes the final frame.  Pixel output over the
        whole animation is byte-identical to the synchronous path — the
        host round trip (~28 ms on the bench tunnel) hides under the next
        frame's compute instead of serializing with it."""
        from . import consts as _c

        layout = buffer.layout
        w, h = layout.width(), layout.height()
        cache = buffer.layer_cache
        if pipelined and cache is not None and crop is None:
            t = self._dispatch_cached(
                composition, cache, w, h, clear_color, channels
            )
            prev = self._pending
            self._pending = (t, buffer, layout, h, w)
            if prev is not None:
                self._complete_pending(prev, next_ticket=t)
            return
        self.flush_pending()
        if crop is not None:
            # Work-culling crop: only tiles inside the rect paint
            # (`cpu/renderer.rs:38-53`).  The damage cache SURVIVES cropped
            # renders: per-tile state keeps updating for in-crop tiles and
            # out-of-crop tiles retain their entries (the reference keeps
            # the layer cache alive across crops too; unlike it, cropped
            # renders here leave the layers' is_unchanged bits untouched so
            # out-of-crop tiles of a changed layer can never go stale).
            rows_total = -(-h // _c.TILE_HEIGHT)
            y0t = max(crop.vert.start, 0)
            y1t = min(crop.vert.stop, rows_total)
            if y0t >= y1t:
                return
            x0 = max(crop.hor.start, 0) * _c.TILE_WIDTH
            x1 = min(crop.hor.stop * _c.TILE_WIDTH, w)
            y0 = y0t * _c.TILE_HEIGHT
            y1 = min(y1t * _c.TILE_HEIGHT, h)
            if cache is not None:
                frame, d = self._render_device_cached(
                    composition, cache, w, h, clear_color, channels,
                    crop=(y0t, y1t, crop.hor.start, crop.hor.stop),
                )
                # Out-of-crop tiles re-emit cached pixels so they are never
                # in the damage set; only painted in-crop tiles write back.
                self._write_back(
                    buffer, layout, frame, d, h, w, rect=(y0, y1, x0, x1)
                )
                return
            frame, _ = self.render_device(
                composition, w, h, clear_color, channels,
                row_span=(y0t, y1t), crop_x=(crop.hor.start, crop.hor.stop),
            )
            img = np.asarray(frame)
            layout.write(buffer.buffer, img[: y1 - y0, x0:x1], rect=(y0, y1, x0, x1))
            return
        if cache is None:
            frame, _ = self.render_device(composition, w, h, clear_color, channels)
            layout.write(buffer.buffer, np.asarray(frame)[:h, :w])
            return
        frame, d = self._render_device_cached(
            composition, cache, w, h, clear_color, channels
        )
        self._write_back(buffer, layout, frame, d, h, w)

    def flush_pending(self):
        """Completes the in-flight `render_into(pipelined=True)` frame, if
        any: blocks on its damage readback and writes its pixels into its
        buffer.  Call once after the last pipelined frame; synchronous
        render entry points flush automatically."""
        prev = self._pending
        if prev is None:
            return
        self._pending = None
        self._complete_pending(prev, next_ticket=None)

    def _complete_pending(self, pend, next_ticket=None):
        """Resolves a pipelined frame and writes it back.  If resolving
        forced a capacity re-render (scene growth), the successor ticket —
        dispatched against the now-corrected cache arrays — is re-issued."""
        t, buffer, layout, h, w = pend
        frame, d = self._resolve_cached(t)
        if t.get("recovered") and next_ticket is not None:
            self._redispatch_cached(next_ticket)
        self._write_back(buffer, layout, frame, d, h, w)

    def _write_back(self, buffer, layout, frame, d, h, w, rect=None):
        """Damage-aware host write: only changed tiles' pixels were fetched
        from the device and only they are written — the write/transfer side
        of the reference's `TileWriteOp::None` contract (a layer cache
        assumes the same buffer is presented every frame,
        `layer_workbench/mod.rs:280-342` break path).  Falls back to a full
        frame (or crop-rect) fetch when damage exceeds `DMG_CAP` tiles."""
        n_dmg = int(d[_pipe.DIAG_DMG]) if d is not None else _pipe.DMG_CAP + 1
        if n_dmg == 0:
            return  # fully unchanged: the buffer is not touched at all
        dmg = self._last_dmg
        if dmg is not None and n_dmg <= _pipe.DMG_CAP:
            idx, tiles = dmg
            layout.write_tiles(buffer.buffer, idx[:n_dmg], tiles[:n_dmg])
            return
        if rect is None:
            layout.write(buffer.buffer, np.asarray(frame)[:h, :w])
        else:
            y0, y1, x0, x1 = rect
            img = np.asarray(frame)
            layout.write(buffer.buffer, img[y0:y1, x0:x1], rect=rect)

    def _render_device_cached(
        self, composition, cache, width, height, clear_color, channels,
        crop=None,  # (tile_row_lo, tile_row_hi, tile_x_lo, tile_x_hi)
    ):
        """Damage-aware render; updates `cache` device state and the layers'
        is_unchanged bits (`cpu/renderer.rs:217-223`).

        With `crop`, out-of-crop tiles skip painting and re-emit their cached
        pixels; the is_unchanged bits are NOT updated (a cropped render must
        not certify out-of-crop tiles as current), and the whole-frame
        no-dispatch key resets so the next full render re-validates.

        Split into dispatch (enqueue the device program, start async host
        copies, chain the device cache state) and resolve (block on the
        damage fetch, handle capacity growth) so `render_into(pipelined=
        True)` can overlap frame i's readback with frame i+1's dispatch."""
        self.flush_pending()
        t = self._dispatch_cached(
            composition, cache, width, height, clear_color, channels, crop
        )
        return self._resolve_cached(t)

    def _dispatch_cached(
        self, composition, cache, width, height, clear_color, channels,
        crop=None,
    ):
        """Enqueues one cached-path render and starts the async damage
        readback; returns a ticket for `_resolve_cached`.  The ticket stashes
        every dispatch input so a capacity overflow discovered at resolve
        time (rare: scene growth) can re-render THIS frame with grown
        buckets — and so an already-dispatched successor can be re-issued
        against the corrected cache state (`_redispatch_cached`)."""
        import jax.numpy as jnp

        composition.compact_geom()
        composition._shared.props_interner.compact()

        rows = -(-height // consts.TILE_HEIGHT)
        tiles_x = -(-width // consts.TILE_WIDTH)
        n_tiles = rows * tiles_x
        chans = tuple(
            ch.value for ch in _normalize_channels(channels, clear_color)
        )

        # Completely unchanged scene: re-emit the cached frame with no device
        # dispatch at all (the whole-frame analog of TileWriteOp::None).
        shared = composition._shared
        vkey = (
            shared.segment_buffer.serial, shared.segment_buffer.version,
            shared.scene_version, shared.style_version, shared.tform_version,
            width, height, chans, clear_color,
        )
        if cache.prev_frame is not None and getattr(cache, "_vkey", None) == vkey:
            # Completely unchanged scene: no device dispatch at all.
            return {"noop": True, "cache": cache}

        px, py, line_slot, uniq = self._prepare_geometry(composition)
        self._estimate_caps(composition, width, height)
        skey = (
            composition.shared_segment_buffer().serial,
            composition._shared.scene_version,
            composition._shared.style_version,
        )
        if self._styles_cache_key == skey:
            st_host, st = self._styles_cache
        else:
            st_host = self._style_map.build(composition.layers)
            st = _pipe.style_tables_device(st_host)
            self._styles_cache_key = skey
            self._styles_cache = (st_host, st)
        g_slot, g_valid, g_t, g_has_t = self._geom_tables(
            composition, uniq, st_host.orders
        )
        clear = jnp.asarray(clear_color.to_array(), jnp.float32)

        reg = composition._shared.registry
        bit = np.uint32(1 << cache.id)
        has_layers = len(composition.layers) > 0
        if has_layers:
            st_unchanged = (reg.unchanged[st_host.lslot] & bit) != 0
        else:
            st_unchanged = np.zeros(st_host.lslot.shape[0], bool)

        cache_ok = (
            cache.prev_frame is not None
            and cache.width == width
            and cache.height == height
            and cache.channels == chans
            and cache.clear_color == clear_color
        )
        if cache_ok:
            prev_frame, prev_counts = cache.prev_frame, cache.prev_counts
        else:
            prev_frame = jnp.zeros(
                (rows * consts.TILE_HEIGHT, tiles_x * consts.TILE_WIDTH, len(chans)),
                jnp.uint8,
            )
            prev_counts = jnp.full((n_tiles,), -1, jnp.int32)

        crop_x_t = crop_y_t = None
        if crop is not None:
            crop_y_t = (jnp.int32(crop[0]), jnp.int32(crop[1]))
            crop_x_t = (jnp.int32(crop[2]), jnp.int32(crop[3]))

        t = {
            "noop": False,
            "cache": cache,
            "inputs": (px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st,
                       clear),
            "prev": (prev_frame, prev_counts, jnp.asarray(st_unchanged),
                     jnp.asarray(cache_ok)),
            "dims": (width, height, rows, tiles_x),
            "chans": chans,
            "features": st_host.features,
            "crop": (crop_x_t, crop_y_t),
            "recovered": False,
        }
        self._issue_cached(t)

        # Device-side cache chaining: the NEXT dispatch may consume these
        # before this frame's diagnostics are even fetched (pipelined mode);
        # `_resolve_cached` corrects them if a capacity overflow forces a
        # re-render.
        cache.prev_frame = t["frame"]
        cache.prev_counts = t["counts"]
        cache.width, cache.height = width, height
        cache.channels = chans
        cache.clear_color = clear_color
        if crop is None:
            cache._vkey = vkey
            # Mark every enabled rendered layer unchanged for this cache slot.
            if has_layers:
                reg.unchanged[st_host.lslot] = np.where(
                    reg.valid[st_host.lslot],
                    reg.unchanged[st_host.lslot] | bit,
                    reg.unchanged[st_host.lslot] & ~bit,
                )
        else:
            cache._vkey = None
        return t

    def _issue_cached(self, t):
        """Enqueues the device program for a ticket with the CURRENT caps +
        its stashed prev state, and starts the async damage readback."""
        width, height, rows, tiles_x = t["dims"]
        prev_frame, prev_counts, st_unchanged, cache_ok = t["prev"]
        crop_x_t, crop_y_t = t["crop"]
        frame, diag, counts, dmg = _pipe.render_frame_cached(
            *t["inputs"],
            prev_frame, prev_counts, st_unchanged, cache_ok,
            width, height, rows, tiles_x,
            self._caps, t["features"], t["chans"],
            crop_x=crop_x_t, crop_y=crop_y_t,
        )
        # Adaptive damage readback: the fixed DMG_CAP-sized fetch shipped
        # ~1 MB per frame — measured as the ENTIRE spaceship frame budget
        # through the bench tunnel (~30-43 ms per host round trip,
        # ~28 MB/s).  Round trip 1 ships diag + dmg indices + a pixel
        # prefix sized from the PREVIOUS frame's damage (damage is
        # frame-coherent in animations), so steady-state incremental frames
        # cost ONE host round trip with bytes ~ actual damage; a
        # mispredicted frame fetches one 64-aligned remainder slice and the
        # prefix adapts.  The copies start now so they overlap any host
        # work — and, in pipelined mode, the next frame's dispatch.
        pfx = self._dmg_prefix
        head = dmg[1][:pfx]
        for a in (diag, dmg[0], head):
            try:
                a.copy_to_host_async()
            except Exception:
                pass  # backends without async D2H fall back to the blocking get
        t.update(frame=frame, diag=diag, counts=counts, dmg=dmg, head=head,
                 pfx=pfx, caps=self._caps)

    def _redispatch_cached(self, t):
        """Re-issues an in-flight ticket after an earlier frame's capacity
        recovery invalidated its prev-state inputs: takes the corrected
        cache arrays + the grown caps and re-enqueues.  No-op for tickets
        that never dispatched (unchanged-scene fast path)."""
        if t["noop"]:
            return
        cache = t["cache"]
        _, _, st_unchanged, cache_ok = t["prev"]
        t["prev"] = (cache.prev_frame, cache.prev_counts, st_unchanged,
                     cache_ok)
        self._issue_cached(t)
        cache.prev_frame = t["frame"]
        cache.prev_counts = t["counts"]

    def _resolve_cached(self, t):
        """Blocks on a ticket's damage readback, growing capacity buckets
        and re-rendering on overflow; returns (frame, diagnostics) and
        leaves `self._last_dmg` holding the compact damaged-tile data."""
        import jax

        if t["noop"]:
            cache = t["cache"]
            if self.last_diag is not None:
                self.last_diag = self.last_diag.copy()
                self.last_diag[_pipe.DIAG_K] = 0  # nothing painted
                self.last_diag[_pipe.DIAG_DMG] = 0  # nothing to write back
            self._last_dmg = None
            return cache.prev_frame, self.last_diag

        for attempt in range(8):
            frame, diag, counts, dmg = t["frame"], t["diag"], t["counts"], t["dmg"]
            pfx = t["pfx"]
            d, idx_h, head = jax.device_get((diag, dmg[0], t["head"]))
            n_dmg = int(d[_pipe.DIAG_DMG])
            if n_dmg <= pfx or n_dmg > _pipe.DMG_CAP:
                self._last_dmg = (idx_h, head)
            else:
                m = min(-(-(n_dmg) // 64) * 64, _pipe.DMG_CAP)
                rest = jax.device_get(dmg[1][pfx:m])
                self._last_dmg = (
                    idx_h, np.concatenate([head, rest], axis=0)
                )
            if n_dmg <= _pipe.DMG_CAP:
                # 25% headroom, 64-aligned, floor at the minimum prefix:
                # shrinks when damage shrinks, grows past mispredictions.
                self._dmg_prefix = int(
                    min(
                        max(_DMG_PREFIX, -(-(n_dmg * 5 // 4) // 64) * 64),
                        _pipe.DMG_CAP,
                    )
                )
            caps = t["caps"]
            if (
                d[_pipe.DIAG_VLINES] <= caps.vline
                and d[_pipe.DIAG_RUNS] <= caps.run
                and d[_pipe.DIAG_VIRT] <= caps.virt
                and d[_pipe.DIAG_K] <= caps.k
            ):
                break
            self.regrow_count += 1
            h = self._cap_headroom()
            caps = self._caps
            self._caps = _pipe.Caps(
                vline=max(caps.vline, _bucket_fine(int(d[_pipe.DIAG_VLINES] * h) + 1)),
                run=max(caps.run, _bucket_fine(int(d[_pipe.DIAG_RUNS] * h))),
                virt=max(caps.virt, _bucket_fine(int(d[_pipe.DIAG_VIRT] * h) + 1)),
                k=max(caps.k, _bucket(max(int(d[_pipe.DIAG_K] * h), 1), lo=4)),
            )
            # Re-render THIS frame against its stashed prev state with the
            # grown buckets, and correct the chained cache arrays.
            t["recovered"] = True
            self._issue_cached(t)
            cache = t["cache"]
            cache.prev_frame = t["frame"]
            cache.prev_counts = t["counts"]
        else:
            raise RuntimeError(f"capacity growth did not converge: {d}")

        self.last_diag = d
        return frame, d

    def render_device_sharded(
        self,
        composition: Composition,
        width: int,
        height: int,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
        n_shards: int = 0,
        check_caps: bool = True,
    ):
        """Renders with the framebuffer sharded by tile rows over an
        `n_shards`-device 1D mesh (`ops/pipeline.render_frame_sharded`).

        Geometry/styles replicate over ICI; each chip rasterizes, sorts and
        paints only its row slice; the returned frame is natively sharded
        along rows (its first `height` rows are the image — the row count
        pads up to a multiple of n_shards).  Diagnostics come back as the
        elementwise max over shards, so the same capacity-growth loop
        applies per shard."""
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        n = n_shards or len(devs)
        if len(devs) < n:
            raise ValueError(f"need {n} devices, have {len(devs)}")
        mesh = getattr(self, "_mesh_cache", None)
        if mesh is None or mesh.devices.size != n:
            mesh = jax.make_mesh((n,), ("rows",), devices=devs[:n])
            self._mesh_cache = mesh

        composition.compact_geom()
        composition._shared.props_interner.compact()

        rows_total = -(-height // consts.TILE_HEIGHT)
        rows_per_shard = -(-rows_total // n)
        tiles_x = -(-width // consts.TILE_WIDTH)

        px, py, line_slot, uniq = self._prepare_geometry(composition)
        self._estimate_caps(composition, width, height)
        skey = (
            composition.shared_segment_buffer().serial,
            composition._shared.scene_version,
            composition._shared.style_version,
        )
        if self._styles_cache_key == skey:
            st_host, st = self._styles_cache
        else:
            st_host = self._style_map.build(composition.layers)
            st = _pipe.style_tables_device(st_host)
            self._styles_cache_key = skey
            self._styles_cache = (st_host, st)
        g_slot, g_valid, g_t, g_has_t = self._geom_tables(
            composition, uniq, st_host.orders
        )
        clear = jnp.asarray(clear_color.to_array(), jnp.float32)
        chans = tuple(
            ch.value for ch in _normalize_channels(channels, clear_color)
        )

        for _ in range(8):
            frame, diag = _pipe.render_frame_sharded(
                px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear,
                width, height, rows_per_shard, tiles_x,
                self._caps, st_host.features, chans, mesh,
            )
            if not check_caps:
                return frame, diag
            d = np.asarray(diag)
            caps = self._caps
            if (
                d[_pipe.DIAG_VLINES] <= caps.vline
                and d[_pipe.DIAG_RUNS] <= caps.run
                and d[_pipe.DIAG_VIRT] <= caps.virt
                and d[_pipe.DIAG_K] <= caps.k
            ):
                self.last_diag = d
                return frame, d
            self.regrow_count += 1
            h = self._cap_headroom()
            self._caps = _pipe.Caps(
                vline=max(caps.vline, _bucket_fine(int(d[_pipe.DIAG_VLINES] * h) + 1)),
                run=max(caps.run, _bucket_fine(int(d[_pipe.DIAG_RUNS] * h))),
                virt=max(caps.virt, _bucket_fine(int(d[_pipe.DIAG_VIRT] * h) + 1)),
                k=max(caps.k, _bucket(max(int(d[_pipe.DIAG_K] * h), 1), lo=4)),
            )
        raise RuntimeError(f"capacity growth did not converge: {d}")

    def _prepare_line_pairs(self, composition: Composition, n: int):
        """Line-endpoint-pair arrays, round-robin permuted so shard i owns
        lines {i, i+n, ...} — a spatially uniform sample of the scene (path
        order is spatially coherent, so contiguous blocks would skew both
        virtual-line load and exchange destinations).  Padded to n | L."""
        import jax.numpy as jnp

        buf = composition.shared_segment_buffer()
        key = (buf.serial, buf.version, n)
        if self._pairs_cache_key == key:
            return self._pairs_cache
        px, py, line_slot, uniq = self._prepare_geometry(composition)
        x = np.asarray(px)
        y = np.asarray(py)
        ls = np.asarray(line_slot)
        L = ls.shape[0]
        Lp = -(-max(L, 1) // n) * n
        p0x = np.zeros(Lp, np.float32)
        p0y = np.zeros(Lp, np.float32)
        p1x = np.zeros(Lp, np.float32)
        p1y = np.zeros(Lp, np.float32)
        lsp = np.full(Lp, -1, np.int32)
        p0x[:L] = x[:-1] if len(x) > 1 else 0
        p0y[:L] = y[:-1] if len(y) > 1 else 0
        p1x[:L] = x[1:] if len(x) > 1 else 0
        p1y[:L] = y[1:] if len(y) > 1 else 0
        lsp[:L] = ls
        perm = np.argsort(np.arange(Lp) % n, kind="stable")
        self._pairs_cache_key = key
        self._pairs_cache = (
            jnp.asarray(p0x[perm]), jnp.asarray(p0y[perm]),
            jnp.asarray(p1x[perm]), jnp.asarray(p1y[perm]),
            jnp.asarray(lsp[perm]), uniq,
        )
        return self._pairs_cache

    def render_device_sharded_lines(
        self,
        composition: Composition,
        width: int,
        height: int,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
        n_shards: int = 0,
        check_caps: bool = True,
    ):
        """Renders with LINES and the framebuffer both sharded over an
        `n_shards`-device 1D mesh (`ops/pipeline.render_frame_sharded_lines`):
        each chip rasterizes and sorts only its own ~1/N of the lines, an
        `all_to_all` exchanges pixel segments to their destination row bands
        over ICI, and each chip sorts + paints the ~1/N segments it owns —
        the whole pipeline scales, not just the back half.

        Scenes whose [row | slot | tx] key exceeds 31 bits cannot use the
        packed single-u32 sort key this path requires; they transparently
        fall back to the row-sharded `render_device_sharded`."""
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        n = n_shards or len(devs)
        if len(devs) < n:
            raise ValueError(f"need {n} devices, have {len(devs)}")
        # Packed-key pre-check (the pipeline would raise ValueError): wide
        # scenes route to the row-sharded path instead of failing.
        rows_total_pc = -(-height // consts.TILE_HEIGHT)
        tiles_x_pc = -(-width // consts.TILE_WIDTH)
        n_slots = max(len(composition.layers), 1)
        if _pipe.slot_bits_for(n_slots, rows_total_pc, tiles_x_pc) == 0:
            return self.render_device_sharded(
                composition, width, height, clear_color, channels,
                n_shards=n_shards, check_caps=check_caps,
            )
        mesh = getattr(self, "_mesh_cache", None)
        if mesh is None or mesh.devices.size != n:
            mesh = jax.make_mesh((n,), ("rows",), devices=devs[:n])
            self._mesh_cache = mesh

        composition.compact_geom()
        composition._shared.props_interner.compact()

        rows_total = -(-height // consts.TILE_HEIGHT)
        rows_per_shard = -(-rows_total // n)
        tiles_x = -(-width // consts.TILE_WIDTH)

        p0x, p0y, p1x, p1y, line_slot, uniq = self._prepare_line_pairs(
            composition, n
        )
        self._estimate_caps(composition, width, height)
        if self._caps_lines is None:
            # Per-shard buckets: ~1/N of the single-chip estimate (the
            # round-robin split balances virtual-line load to a few %).
            c = self._caps
            self._caps_lines = _pipe.Caps(
                vline=_bucket_fine(-(-c.vline // n)),
                run=_bucket_fine(-(-c.run // n)),
                virt=_bucket_fine(-(-c.virt // n)),
                k=c.k,
            )
            # Exchange blocks start at ~(per-shard segments / N) with 2x
            # skew slack; the growth loop converges the rest.
            est = self._caps_lines.vline * _pipe.K_SEG // max(n, 1) * 2
            self._xcap = max(128 * (-(-est // 128)), 1024)
        skey = (
            composition.shared_segment_buffer().serial,
            composition._shared.scene_version,
            composition._shared.style_version,
        )
        if self._styles_cache_key == skey:
            st_host, st = self._styles_cache
        else:
            st_host = self._style_map.build(composition.layers)
            st = _pipe.style_tables_device(st_host)
            self._styles_cache_key = skey
            self._styles_cache = (st_host, st)
        g_slot, g_valid, g_t, g_has_t = self._geom_tables(
            composition, uniq, st_host.orders
        )
        clear = jnp.asarray(clear_color.to_array(), jnp.float32)
        chans = tuple(
            ch.value for ch in _normalize_channels(channels, clear_color)
        )

        for _ in range(8):
            frame, diag = _pipe.render_frame_sharded_lines(
                p0x, p0y, p1x, p1y, line_slot,
                g_slot, g_valid, g_t, g_has_t, st, clear,
                width, height, rows_per_shard, tiles_x,
                self._caps_lines, st_host.features, chans, mesh, self._xcap,
            )
            if not check_caps:
                return frame, diag
            d = np.asarray(diag)
            caps = self._caps_lines
            if (
                d[_pipe.DIAG_VLINES] <= caps.vline
                and d[_pipe.DIAG_RUNS] <= caps.run
                and d[_pipe.DIAG_VIRT] <= caps.virt
                and d[_pipe.DIAG_K] <= caps.k
                and d[_pipe.DIAG_XPAIR] <= self._xcap
            ):
                self.last_diag = d
                return frame, d
            self.regrow_count += 1
            h = self._cap_headroom()
            self._caps_lines = _pipe.Caps(
                vline=max(caps.vline, _bucket_fine(int(d[_pipe.DIAG_VLINES] * h) + 1)),
                run=max(caps.run, _bucket_fine(int(d[_pipe.DIAG_RUNS] * h))),
                virt=max(caps.virt, _bucket_fine(int(d[_pipe.DIAG_VIRT] * h) + 1)),
                k=max(caps.k, _bucket(max(int(d[_pipe.DIAG_K] * h), 1), lo=4)),
            )
            self._xcap = max(
                self._xcap,
                128 * (-(-(int(d[_pipe.DIAG_XPAIR]) + 1) // 128)),
            )
        raise RuntimeError(f"capacity growth did not converge: {d}")

    def render_device(
        self,
        composition: Composition,
        width: int,
        height: int,
        clear_color: Color = Color(0.0, 0.0, 0.0, 1.0),
        channels=RGBA,
        check_caps: bool = True,
        row_span=None,  # (tile_row_lo, tile_row_hi): render only these rows
        crop_x=None,  # (tile_x_lo, tile_x_hi): paint only these tile columns
    ):
        """Renders; returns (device u8 frame [rows*16, tiles_x*16, 4], diag).

        With `check_caps` (default) the diagnostics vector syncs to the host
        and capacity buckets grow + re-render on overflow.  With
        `check_caps=False` nothing syncs — frames pipeline back-to-back with
        no host round-trip (a ~28 ms fence on this stack); the caller is
        responsible for validating the returned device diag afterwards.
        """
        import jax.numpy as jnp

        self.flush_pending()
        composition.compact_geom()
        composition._shared.props_interner.compact()

        rows = -(-height // consts.TILE_HEIGHT)
        tiles_x = -(-width // consts.TILE_WIDTH)
        row_lo = None
        if row_span is not None:
            row_lo = jnp.int32(row_span[0])
            rows = row_span[1] - row_span[0]
        crop_x_t = None
        if crop_x is not None:
            crop_x_t = (jnp.int32(crop_x[0]), jnp.int32(crop_x[1]))

        px, py, line_slot, uniq = self._prepare_geometry(composition)
        self._estimate_caps(composition, width, height)

        # Style tables depend on membership + props, NOT transforms: per-frame
        # animation re-uploads only the small transform tables below.
        skey = (
            composition.shared_segment_buffer().serial,
            composition._shared.scene_version,
            composition._shared.style_version,
        )
        if self._styles_cache_key == skey:
            st_host, st = self._styles_cache
        else:
            st_host = self._style_map.build(composition.layers)
            st = _pipe.style_tables_device(st_host)
            self._styles_cache_key = skey
            self._styles_cache = (st_host, st)

        g_slot, g_valid, g_t, g_has_t = self._geom_tables(
            composition, uniq, st_host.orders
        )
        clear = jnp.asarray(clear_color.to_array(), jnp.float32)
        chans = tuple(
            ch.value for ch in _normalize_channels(channels, clear_color)
        )

        for _ in range(8):  # bounded growth retries
            frame, diag = _pipe.render_frame(
                px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear,
                width, height, rows, tiles_x,
                self._caps, st_host.features, chans,
                row_lo=row_lo, crop_x=crop_x_t,
            )
            if not check_caps:
                return frame, diag
            d = np.asarray(diag)
            caps = self._caps
            if (
                d[_pipe.DIAG_VLINES] <= caps.vline
                and d[_pipe.DIAG_RUNS] <= caps.run
                and d[_pipe.DIAG_VIRT] <= caps.virt
                and d[_pipe.DIAG_K] <= caps.k
            ):
                self.last_diag = d
                return frame, d
            self.regrow_count += 1
            h = self._cap_headroom()
            self._caps = _pipe.Caps(
                vline=max(caps.vline, _bucket_fine(int(d[_pipe.DIAG_VLINES] * h) + 1)),
                run=max(caps.run, _bucket_fine(int(d[_pipe.DIAG_RUNS] * h))),
                virt=max(caps.virt, _bucket_fine(int(d[_pipe.DIAG_VIRT] * h) + 1)),
                k=max(caps.k, _bucket(max(int(d[_pipe.DIAG_K] * h), 1), lo=4)),
            )
        raise RuntimeError(f"capacity growth did not converge: {d}")
