"""Affine warp vs a scalar per-pixel whole-raster oracle: identity warp
must be bit-exact, nearest must be value-exact under rotation, bilinear
must match up to float-summation order at source-tile seams (nodata
masks exactly equal everywhere)."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.warp import Affine, warp_to_grid
from balrog_ray.tiles.synth import SynthConfig

from test_hydrology import _bumpy_dem, _mosaic, _tiles_from_array

ND = -99.0


def _warp_scalar(src: np.ndarray, src_y_north: float, ps_s: float,
                 tspec: GridSpec, affine: Affine,
                 resampling: str) -> np.ndarray:
    """Per-pixel loop oracle sharing nothing with the stage internals."""
    sh, sw = src.shape
    T, ps_t = tspec.tile_px, tspec.pixel_size
    H, W = tspec.tiles_y * T, tspec.tiles_x * T
    out = np.full((H, W), np.float32(ND), np.float32)
    for r in range(H):
        for c in range(W):
            x_t = (c + 0.5) * ps_t
            y_t = tspec.y_north - (r + 0.5) * ps_t
            sx, sy = affine.apply(np.array([x_t]), np.array([y_t]))
            cf = float(sx[0]) / ps_s - 0.5
            rf = (src_y_north - float(sy[0])) / ps_s - 0.5
            c0, r0 = int(np.floor(cf)), int(np.floor(rf))
            fc, fr = cf - c0, rf - r0
            if resampling == "nearest":
                rn = r0 + 1 if fr >= 0.5 else r0
                cn = c0 + 1 if fc >= 0.5 else c0
                if (0 <= rn < sh and 0 <= cn < sw
                        and src[rn, cn] != np.float32(ND)):
                    out[r, c] = src[rn, cn]
                continue
            wv = ws = 0.0
            if resampling == "cubic":
                def k(s, a=-0.5):
                    t = abs(s)
                    if t <= 1.0:
                        return (a + 2) * t**3 - (a + 3) * t**2 + 1
                    if t < 2.0:
                        return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
                    return 0.0
                for dr in (-1, 0, 1, 2):
                    for dc in (-1, 0, 1, 2):
                        rr, cc = r0 + dr, c0 + dc
                        if not (0 <= rr < sh and 0 <= cc < sw):
                            continue
                        if src[rr, cc] == np.float32(ND):
                            continue
                        w = k(fr - dr) * k(fc - dc)
                        wv += w * float(src[rr, cc])
                        ws += w
                if ws > 0:
                    out[r, c] = np.float32(wv / ws)
                continue
            for dr, dc in ((0, 0), (0, 1), (1, 0), (1, 1)):
                rr, cc = r0 + dr, c0 + dc
                if not (0 <= rr < sh and 0 <= cc < sw):
                    continue
                if src[rr, cc] == np.float32(ND):
                    continue
                w = (fr if dr else 1 - fr) * (fc if dc else 1 - fc)
                wv += w * float(src[rr, cc])
                ws += w
            if ws > 0:
                out[r, c] = np.float32(wv / ws)
    return out


def _run(arr, cfg, tspec, affine, resampling):
    import ray
    import ray.data

    out = warp_to_grid(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        tspec, affine, resampling=resampling).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]

    class _C:
        tile_px = tspec.tile_px
        tiles_x = tspec.tiles_x
        tiles_y = tspec.tiles_y

    return _mosaic(pa.concat_tables(tabs), "warp", _C)


def test_identity_warp_is_exact(ray_session):
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((32, 48), 11)
    tspec = GridSpec.from_synth(cfg)
    got = _run(arr, cfg, tspec, Affine.identity(), "bilinear")
    assert np.array_equal(got, arr)


@pytest.mark.parametrize("resampling", ["nearest", "bilinear", "cubic"])
def test_rotated_warp_matches_scalar_oracle(ray_session, resampling):
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((32, 48), 12)
    # target grid: same pixel size, 2x2 tiles of 20 px, own origin;
    # transform = rotate 30 deg about the source center + mild zoom-out
    src_cx = 48 * cfg.pixel_size / 2
    src_cy = 32 * cfg.pixel_size / 2
    tspec = GridSpec(2, 2, 20, cfg.pixel_size, y_north=40 * cfg.pixel_size)
    affine = Affine.rotation(30.0, cx=src_cx, cy=src_cy, scale=1.3,
                             dx=-60.0, dy=45.0)
    got = _run(arr, cfg, tspec, affine, resampling)
    want = _warp_scalar(arr, cfg.y_north, cfg.pixel_size, tspec, affine,
                        resampling)
    got_nd = got == np.float32(ND)
    want_nd = want == np.float32(ND)
    assert np.array_equal(got_nd, want_nd), (
        f"nodata masks differ on {int((got_nd != want_nd).sum())} px")
    if resampling == "nearest":
        assert np.array_equal(got, want)
    else:
        assert np.allclose(got[~got_nd], want[~want_nd],
                           rtol=1e-6, atol=1e-4)
    # the transform actually produced a real mix of data and nodata
    assert 0.1 < got_nd.mean() < 0.9


def test_affine_inverse_roundtrip():
    a = Affine.rotation(47.0, cx=100.0, cy=-30.0, scale=0.7, dx=5, dy=-3)
    inv = a.inverse()
    x = np.array([0.0, 10.0, -200.0])
    y = np.array([3.0, -40.0, 7.0])
    fx, fy = a.apply(x, y)
    bx, by = inv.apply(fx, fy)
    assert np.allclose(bx, x) and np.allclose(by, y)
    with pytest.raises(ValueError):
        Affine(1, 1, 0, 2, 2, 0).inverse()


def test_warp_validation():
    with pytest.raises(ValueError, match="resampling"):
        warp_to_grid(None, GridSpec(2, 2, 16, 25.0, 800.0),
                     Affine.identity(), resampling="lanczos")


# ---------------------------------------------------------------------------
# true CRS reprojection (plate-carree bridge) vs the same scalar oracle

def test_crs_bridge_roundtrip():
    from balrog_ray.stages.warp import GeoToProj, ProjToGeo

    tr = ProjToGeo(lon0=115.2, lat0=-33.9, lat_ts=-35.0)
    x = np.array([0.0, 1234.5, -987.0])
    y = np.array([42.0, -5000.0, 31337.0])
    lon, lat = tr.apply(x, y)
    bx, by = tr.inverse().apply(lon, lat)
    assert np.allclose(bx, x) and np.allclose(by, y)
    assert isinstance(tr.inverse(), GeoToProj)
    # the standard parallel actually shrinks the lon axis
    lon2, _ = ProjToGeo(lat_ts=0.0).apply(x, y)
    lon3, _ = ProjToGeo(lat_ts=-60.0).apply(x, y)
    assert np.all(np.abs(lon3[1:]) > np.abs(lon2[1:]))


@pytest.mark.parametrize("resampling", ["nearest", "bilinear", "cubic"])
def test_geo_tiles_onto_metre_grid(ray_session, resampling):
    """Degree-CRS source tiles regridded onto a projected-metre target
    grid (ingesting the reference's EPSG:4283 COGs), vs the scalar
    per-pixel reproject oracle."""
    from balrog_ray.stages.warp import ProjToGeo

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16,
                      pixel_size=0.001)           # degrees
    arr = _bumpy_dem((32, 48), 13)
    # metre target grid positioned over the transformed source extent:
    # lon in [0, 0.048], lat in [0, 0.032] -> x in [0, ~4373], y in
    # [0, ~3559] at lat_ts=-35
    tspec = GridSpec(2, 2, 20, 100.0, y_north=3600.0)
    tr = ProjToGeo(lon0=0.0, lat0=0.0, lat_ts=-35.0)
    got = _run(arr, cfg, tspec, tr, resampling)
    want = _warp_scalar(arr, cfg.y_north, cfg.pixel_size, tspec, tr,
                        resampling)
    got_nd = got == np.float32(ND)
    want_nd = want == np.float32(ND)
    assert np.array_equal(got_nd, want_nd)
    if resampling == "nearest":
        assert np.array_equal(got, want)
    else:
        assert np.allclose(got[~got_nd], want[~want_nd],
                           rtol=1e-6, atol=1e-4)
    assert 0.05 < got_nd.mean() < 0.95    # real mix of data and nodata


def test_metre_tiles_onto_geo_grid(ray_session):
    """Projected-metre source tiles onto a geographic (degree) output
    grid -- the reference's ``gdal.Warp -t_srs EPSG:4283`` direction."""
    from balrog_ray.stages.warp import GeoToProj

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16,
                      pixel_size=25.0)            # metres
    arr = _bumpy_dem((32, 48), 14)
    # source x in [0, 1200], y in [0, 800]; degree target grid covering
    # lon in [0, 0.016], lat in [0, 0.008] at lat_ts=-35
    tspec = GridSpec(2, 2, 20, 0.0004, y_north=0.008)
    tr = GeoToProj(lon0=0.0, lat0=0.0, lat_ts=-35.0)
    got = _run(arr, cfg, tspec, tr, "bilinear")
    want = _warp_scalar(arr, cfg.y_north, cfg.pixel_size, tspec, tr,
                        "bilinear")
    got_nd = got == np.float32(ND)
    want_nd = want == np.float32(ND)
    assert np.array_equal(got_nd, want_nd)
    assert np.allclose(got[~got_nd], want[~want_nd],
                       rtol=1e-6, atol=1e-4)


def test_cubic_seam_negative_lobes(ray_session):
    """Regression: a sub-pixel translation puts the Keys kernel's
    NEGATIVE outer taps across source-tile seams; patches whose every
    pixel is net-negative must still ship (dropping them once skewed
    seam columns by ~2.9 units)."""
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((32, 48), 14)
    tspec = GridSpec.from_synth(cfg)
    affine = Affine(1.0, 0.0, 0.3 * cfg.pixel_size,
                    0.0, 1.0, 0.0)            # shift 0.3 src px in x
    got = _run(arr, cfg, tspec, affine, "cubic")
    want = _warp_scalar(arr, cfg.y_north, cfg.pixel_size, tspec, affine,
                        "cubic")
    got_nd = got == np.float32(ND)
    want_nd = want == np.float32(ND)
    assert np.array_equal(got_nd, want_nd)
    assert np.allclose(got[~got_nd], want[~want_nd],
                       rtol=1e-6, atol=1e-4)


# ---------------------------------------------------------------------------
# area-weighted average regrid (gdalwarp -r average) vs a global
# overlap-matrix oracle

def _avg_run(arr, cfg, tspec):
    import ray
    import ray.data

    from balrog_ray.stages.warp import area_average_to_grid

    out = area_average_to_grid(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        tspec).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]

    class _C:
        tile_px = tspec.tile_px
        tiles_x = tspec.tiles_x
        tiles_y = tspec.tiles_y

    return _mosaic(pa.concat_tables(tabs), "avg", _C)


def _avg_oracle(arr, ps_s, tspec):
    from balrog_ray.stages.warp import overlap_matrix

    sh, sw = arr.shape
    T, ps_t = tspec.tile_px, tspec.pixel_size
    H, W = tspec.tiles_y * T, tspec.tiles_x * T
    mx = overlap_matrix(0.0, ps_t, W, 0.0, ps_s, sw)
    my = overlap_matrix(0.0, ps_t, H, 0.0, ps_s, sh)
    valid = arr != np.float32(ND)
    wv = my @ np.where(valid, arr.astype(np.float64), 0.0) @ mx.T
    ws = my @ valid.astype(np.float64) @ mx.T
    return np.where(ws > 0, wv / np.where(ws > 0, ws, 1.0),
                    np.float32(ND)).astype(np.float32)


def test_area_average_noninteger_ratio(ray_session):
    # source 48x24 px at 25 m; target 32x16 px at 37.5 m (ratio 1.5)
    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=24)
    arr = _bumpy_dem((24, 48), 31)
    tspec = GridSpec(2, 1, 16, 37.5, y_north=24 * cfg.pixel_size)
    got = _avg_run(arr, cfg, tspec)
    want = _avg_oracle(arr, cfg.pixel_size, tspec)
    got_nd = got == np.float32(ND)
    assert np.array_equal(got_nd, want == np.float32(ND))
    assert np.allclose(got[~got_nd], want[~got_nd], rtol=1e-6, atol=1e-4)
    assert (arr == np.float32(ND)).any()          # nodata path exercised


def test_area_average_conserves_mass(ray_session):
    # clean array, full coverage, 2x ratio: total value*area conserved
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((32, 48), 32, nodata_frac=0.0)
    tspec = GridSpec(3, 2, 8, 2 * cfg.pixel_size,
                     y_north=32 * cfg.pixel_size)
    got = _avg_run(arr, cfg, tspec)
    assert not (got == np.float32(ND)).any()
    mass_t = float(got.astype(np.float64).sum()) * tspec.pixel_size ** 2
    mass_s = float(arr.astype(np.float64).sum()) * cfg.pixel_size ** 2
    # float32 output tiles bound the achievable precision
    assert mass_t == pytest.approx(mass_s, rel=1e-6)


def test_area_average_partial_coverage(ray_session):
    # target grid twice as tall as the source world: the uncovered
    # bottom half is nodata, the covered top half matches the oracle
    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=16)
    arr = _bumpy_dem((16, 32), 33)
    tspec = GridSpec(1, 1, 16, 2 * cfg.pixel_size,
                     y_north=16 * cfg.pixel_size)
    got = np.full((16, 16), np.float32(ND), np.float32)
    import ray
    import ray.data

    from balrog_ray.stages.warp import area_average_to_grid

    out = area_average_to_grid(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)), tspec
        ).materialize()
    rows = out.take_all()
    assert len(rows) == 1                # only the covered cell ships
    from balrog_ray.tiles.codec import Caption as _Cap
    from balrog_ray.tiles.codec import decode_tile as _dec
    cap = _Cap.from_json(rows[0]["caption"])
    got = _dec(rows[0]["bytes"], rows[0]["fmt"], cap)
    want = _avg_oracle(arr, cfg.pixel_size, tspec)[:16, :16]
    assert np.array_equal(got == np.float32(ND), want == np.float32(ND))
    nd = got == np.float32(ND)
    assert np.allclose(got[~nd], want[~nd], rtol=1e-6, atol=1e-4)
    assert nd[8:].all() and not nd[:8].any()


# ---------------------------------------------------------------------------
# majority (mode) regrid (gdalwarp -r mode) vs a global per-class
# overlap-matrix oracle

def _classy(shape, seed, n_classes=5, nodata_frac=0.05):
    """Random categorical raster: blocky class regions + nodata holes."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, n_classes + 1,
                     (shape[0] // 4 + 1, shape[1] // 4 + 1))
    a = np.kron(a, np.ones((4, 4), np.int64))[:shape[0], :shape[1]]
    a = a.astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _mode_run(arr, cfg, tspec):
    import ray
    import ray.data

    from balrog_ray.stages.warp import mode_resample_to_grid

    out = mode_resample_to_grid(
        ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="veg")),
        tspec).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]

    class _C:
        tile_px = tspec.tile_px
        tiles_x = tspec.tiles_x
        tiles_y = tspec.tiles_y

    return _mosaic(pa.concat_tables(tabs), "mode", _C)


def _mode_oracle(arr, ps_s, tspec):
    from balrog_ray.stages.warp import MODE_QUANTUM, overlap_matrix

    sh, sw = arr.shape
    T, ps_t = tspec.tile_px, tspec.pixel_size
    H, W = tspec.tiles_y * T, tspec.tiles_x * T
    mx = overlap_matrix(0.0, ps_t, W, 0.0, ps_s, sw)
    my = overlap_matrix(0.0, ps_t, H, 0.0, ps_s, sh)
    valid = arr != np.float32(ND)
    clss = sorted(float(c) for c in np.unique(arr[valid]))
    q = np.stack([
        np.rint((my @ (arr == np.float32(c)).astype(np.float64) @ mx.T)
                / (ps_t * ps_t) * MODE_QUANTUM).astype(np.int64)
        for c in clss])
    cl = np.array(clss)
    return np.where(q.sum(0) > 0, cl[q.argmax(0)].astype(np.float32),
                    np.float32(ND)).astype(np.float32)


def test_mode_resample_integer_ratio_ties(ray_session):
    # 2x coarsen of a 1-px checkerboard: every target pixel is an exact
    # 2-2 area tie between the two classes -> smallest class must win
    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=16)
    arr = np.where((np.indices((16, 32)).sum(0) % 2) == 0, 3.0, 7.0
                   ).astype(np.float32)
    tspec = GridSpec(2, 1, 8, 2 * cfg.pixel_size,
                     y_north=16 * cfg.pixel_size)
    got = _mode_run(arr, cfg, tspec)
    assert got.shape == (8, 16)
    assert (got == np.float32(3.0)).all()


def test_mode_resample_noninteger_ratio(ray_session):
    # source 48x24 at 25 m -> target 32x16 at 37.5 m (1.5x), nodata holes
    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=24)
    arr = _classy((24, 48), 41)
    tspec = GridSpec(2, 1, 16, 37.5, y_north=24 * cfg.pixel_size)
    got = _mode_run(arr, cfg, tspec)
    want = _mode_oracle(arr, cfg.pixel_size, tspec)
    assert np.array_equal(got, want)
    assert (arr == np.float32(ND)).any()


def test_mode_resample_class_purity(ray_session):
    # output contains ONLY input class values (the reason -r average is
    # wrong for categorical rasters): coarsen 4x across tile seams
    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _classy((32, 48), 42, n_classes=7)
    tspec = GridSpec(3, 2, 4, 4 * cfg.pixel_size,
                     y_north=32 * cfg.pixel_size)
    got = _mode_run(arr, cfg, tspec)
    want = _mode_oracle(arr, cfg.pixel_size, tspec)
    assert np.array_equal(got, want)
    assert set(np.unique(got)) <= set(np.unique(arr))
