"""Single-dispatch device pipeline and its multi-chip sharding.

`render_frame` fuses every stage — line setup, rasterize, sort, runs,
carries, units, paint, sRGB — into ONE jittable program with static capacity
buckets and no host round-trips.  It returns the packed frame plus a small
diagnostics vector (actual totals vs capacities); the renderer fetches both
in a single device sync and re-renders with bigger buckets only on overflow
(optimistic capacities).

`render_frame_sharded` wraps the same program in `jax.shard_map` over a 1D
device mesh, splitting the framebuffer by tile rows: geometry and styles are
replicated (broadcast once over ICI), each chip rasterizes and paints only
its row slice, and the output is natively sharded — no collectives needed in
steady state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import consts
from . import line_setup as _ls
from . import paint as _paint
from . import rasterize as _raster
from . import runs as _runs
from . import srgb as _srgb
from .paint import Features


class Caps(NamedTuple):
    """Static capacity buckets for one compiled pipeline configuration."""

    seg: int = 1024
    run: int = 512
    virt: int = 512
    k: int = 4


# Indices into the diagnostics vector.
DIAG_TOTAL, DIAG_RUNS, DIAG_VIRT, DIAG_K = range(4)


def _core(
    px, py, line_slot,
    g_order, g_valid, g_t, g_has_t,
    st, clear, row_lo,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels,
):
    (orders, x0, y0, dx, dy, a, b, c, d, sum_lengths) = _ls.line_setup(
        px, py, line_slot, g_order, g_valid, g_t, g_has_t, width, height
    )
    total = sum_lengths[-1]

    # Pack the sort key into one u32 when [row | tx | slot] fits.
    sl = st["orders"].shape[0]
    slot_bits = max((sl - 1).bit_length(), 1)
    row_bits = (rows + 1).bit_length()
    tx_bits = max((tiles_x + 1).bit_length(), 1)
    if row_bits + tx_bits + slot_bits > 32:
        slot_bits = 0  # fall back to the two-key sort
    key_hi, key_lo, payload = _raster.rasterize_sort(
        orders, x0, y0, dx, dy, a, b, c, d, sum_lengths,
        jnp.minimum(total, jnp.uint32(caps.seg)),
        caps.seg, rows, tiles_x, row_lo,
        st_orders=st["orders"], slot_bits=slot_bits,
    )

    run_id, num_runs = _runs.extract_runs(key_hi, key_lo)
    rd = _runs.run_data(
        key_hi, key_lo, payload, run_id, jnp.minimum(num_runs, caps.run),
        st["orders"], st["fill_rule"], caps.run, tiles_x,
    )

    key_u, layer_u, src_u, virt_u, k_u, u_valid, k_needed = _runs.build_units(
        rd["run_hi"], rd["run_layer"], rd["r_valid"],
        rd["key2_s"], rd["tx_s"], rd["span"], rd["cumspan"],
        jnp.minimum(rd["v_total"], caps.virt),
        caps.virt,
    )

    frame = _paint.paint(
        key_u, layer_u, src_u, virt_u, k_u, u_valid,
        rd["area_grid"], rd["cover_grid"], rd["carry_in"], rd["carry_after_s"],
        st["orders"], st["fill_rule"], st["func"], st["clip_n"],
        st["is_clipped"], st["blend"], st["fill_type"], st["color"],
        st["grad"], st["stops"], st["tex"], st["atlas"], clear,
        rows, tiles_x, caps.k, features, row_lo,
        k_active=jnp.minimum(k_needed, caps.k),
    )
    packed = _srgb.pack_srgb(frame, channels)

    diag = jnp.stack(
        [
            total.astype(jnp.int32),
            num_runs.astype(jnp.int32),
            rd["v_total"].astype(jnp.int32),
            k_needed.astype(jnp.int32),
        ]
    )
    return packed, diag


@partial(
    jax.jit,
    static_argnames=("width", "height", "rows", "tiles_x", "caps", "features", "channels"),
)
def render_frame(
    px, py, line_slot,
    g_order, g_valid, g_t, g_has_t,
    st, clear,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels,
):
    """Single-chip whole-frame render; returns (u8 frame, i32[4] diagnostics)."""
    return _core(
        px, py, line_slot, g_order, g_valid, g_t, g_has_t, st, clear,
        jnp.int32(0), width, height, rows, tiles_x, caps, features, channels,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "rows", "tiles_x", "caps", "features", "channels", "mesh",
    ),
)
def render_frame_sharded(
    px, py, line_slot,
    g_order, g_valid, g_t, g_has_t,
    st, clear,
    width: int, height: int, rows: int, tiles_x: int,
    caps: Caps, features: Features, channels, mesh,
):
    """Framebuffer-sharded render over a 1D mesh axis "rows".

    `rows` must be the padded per-shard row count (total rows / mesh size).
    Inputs are replicated; the returned frame is sharded along its first
    axis, diagnostics are the elementwise maximum over shards.
    """
    from jax.sharding import PartitionSpec as P

    n_shards = mesh.shape["rows"]

    def shard_fn(px, py, line_slot, g_order, g_valid, g_t, g_has_t, st, clear):
        row_lo = jax.lax.axis_index("rows").astype(jnp.int32) * rows
        frame, diag = _core(
            px, py, line_slot, g_order, g_valid, g_t, g_has_t, st, clear,
            row_lo, width, height, rows, tiles_x, caps, features, channels,
        )
        return frame, jax.lax.pmax(diag, "rows")

    return jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P("rows"), P()),
    )(px, py, line_slot, g_order, g_valid, g_t, g_has_t, st, clear)


def style_tables_device(st) -> dict:
    """Uploads host StyleTables to device arrays (a dict pytree)."""
    import jax.numpy as jnp

    return dict(
        orders=jnp.asarray(st.orders),
        fill_rule=jnp.asarray(st.fill_rule),
        func=jnp.asarray(st.func),
        clip_n=jnp.asarray(st.clip_n),
        is_clipped=jnp.asarray(st.is_clipped),
        blend=jnp.asarray(st.blend),
        fill_type=jnp.asarray(st.fill_type),
        color=jnp.asarray(st.color),
        grad=jnp.asarray(st.grad),
        stops=jnp.asarray(st.stops),
        tex=jnp.asarray(st.tex),
        atlas=jnp.asarray(st.atlas),
    )
