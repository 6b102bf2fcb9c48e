"""Multi-chip scaling shape on the virtual CPU mesh: per-shard work counts.

The framebuffer shards by tile rows (`pipeline.render_frame_sharded`);
out-of-shard pixel segments drop at the rasterizer, so per-shard work for
EVERY downstream stage (sort, runs, units, paint) scales with the shard's
segment share.  This probe renders the paris scene on a 1/2/4/8-device
virtual CPU mesh and reports each shard's diagnostics WITHOUT the pmax
fold, giving the work-balance table that predicts real-chip scaling
(wall-clock on the 1-core CPU host is meaningless; the single real chip
provides absolute numbers).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PALLAS_AXON_POOL_IPS= python tools/shard_scaling_probe.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# The axon site hook may have registered the TPU platform before the env
# vars above took effect; force CPU (same dance as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import forma_tpu
from forma_tpu import Color, Composition
from forma_tpu import consts
from forma_tpu.demos import scenes
from forma_tpu.ops import pipeline as pipe
from forma_tpu.renderer import Renderer

forma_tpu.enable_compilation_cache()

W, H, PATHS = 1920, 1080, 3000
DIAG_NAMES = {
    pipe.DIAG_VLINES: "vlines",
    pipe.DIAG_SEGS: "segments",
    pipe.DIAG_RUNS: "runs",
    pipe.DIAG_VIRT: "virtual",
    pipe.DIAG_K: "k",
}


def main():
    comp = Composition()
    scenes.paris30k(comp, W, H, paths=PATHS)
    r = Renderer()
    clear = Color(1.0, 1.0, 1.0, 1.0)
    # Warm caps + geometry through the normal path.
    frame, diag = r.render_device(comp, W, H, clear)
    caps = r._caps
    rows_total = -(-H // consts.TILE_HEIGHT)
    tiles_x = -(-W // consts.TILE_WIDTH)

    px, py, line_slot, uniq = r._prepare_geometry(comp)
    st_host, st = r._styles_cache
    g = r._geom_tables(comp, uniq, st_host.orders)
    clear_a = jnp.asarray(clear.to_array(), jnp.float32)
    from forma_tpu.buffer import RGBA
    chans = tuple(c.value for c in RGBA)

    base = None
    for n in (1, 2, 4, 8):
        rows = -(-rows_total // n)
        mesh = Mesh(np.array(jax.devices()[:n]), ("rows",))

        def shard_fn(px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear):
            row_lo = jax.lax.axis_index("rows").astype(jnp.int32) * rows
            frame, diag = pipe._core(
                px, py, line_slot, g_slot, g_valid, g_t, g_has_t, st, clear,
                row_lo, W, H, rows, tiles_x, caps, st_host.features, chans,
                True,
            )
            return frame, diag[None, :]  # per-shard diag, no pmax

        frame, diags = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(),) * 9,
            out_specs=(P("rows"), P("rows")),
            check_vma=False,
        )(px, py, line_slot, *g, st, clear_a)
        diags = np.asarray(diags)  # [n, NDIAG]
        if base is None:
            base = diags[0]
        segs = diags[:, pipe.DIAG_SEGS]
        print(f"shards={n}: per-shard segments {segs.tolist()}")
        print(
            "  max/mean balance "
            f"{segs.max() / max(segs.mean(), 1):.3f}; "
            "work vs 1-shard "
            f"{segs.max() / max(base[pipe.DIAG_SEGS], 1):.3f} "
            f"(ideal {1 / n:.3f})"
        )
        for idx, name in DIAG_NAMES.items():
            print(f"  {name:9s} {diags[:, idx].tolist()}")

    # ---- the LINE-sharded path: the whole pipeline (incl. the sort)
    # scales ~1/N.  Work maxima come from the pmax'd diagnostics; the
    # static per-shard sort sizes come from the capacity buckets the
    # renderer sizes for each mesh (front sort = own-line segments, back
    # sort = received exchange blocks).
    print("\nline-sharded path (render_device_sharded_lines):")
    base_recv = None
    for n in (1, 2, 4, 8):
        rl = Renderer()
        frame, d = rl.render_device_sharded_lines(
            comp, W, H, clear, n_shards=n
        )
        caps_l = rl._caps_lines
        front = caps_l.vline * pipe.K_SEG
        back = n * rl._xcap
        recv = int(d[pipe.DIAG_XRECV])
        if base_recv is None:
            base_recv = recv
        print(
            f"shards={n}: max recv segs {recv} "
            f"(vs 1-shard {recv / max(base_recv, 1):.3f}, ideal {1 / n:.3f}); "
            f"sort sizes front {front} back {back}; "
            f"runs {int(d[pipe.DIAG_RUNS])} virt {int(d[pipe.DIAG_VIRT])} "
            f"k {int(d[pipe.DIAG_K])} xpair {int(d[pipe.DIAG_XPAIR])}"
        )


if __name__ == "__main__":
    main()
