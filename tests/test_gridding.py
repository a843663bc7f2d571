"""IDW gridding vs a brute-force all-points-x-all-pixels oracle: the
tiled stage replicates points to dilated tiles and interpolates per
cell; the oracle computes every pixel against every point directly."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.gridding import EPS, idw_grid
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.synth import SynthConfig

from test_hydrology import _mosaic

ND = -99.0


def _idw_oracle(pts, vals, spec: GridSpec, radius, power):
    T, ps = spec.tile_px, spec.pixel_size
    H, W = spec.tiles_y * T, spec.tiles_x * T
    out = np.full((H, W), np.float32(ND), np.float32)
    for r in range(H):
        for c in range(W):
            x = (c + 0.5) * ps
            y = spec.y_north - (r + 0.5) * ps
            d = np.hypot(pts[:, 0] - x, pts[:, 1] - y)
            m = d <= radius
            if not m.any():
                continue
            w = 1.0 / np.maximum(d[m], EPS) ** power
            out[r, c] = np.float32((w * vals[m]).sum() / w.sum())
    return out


@pytest.mark.parametrize("seed,radius", [(1, 180.0), (2, 450.0)])
def test_idw_matches_bruteforce(ray_session, seed, radius):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    rng = np.random.default_rng(seed)
    n = 40
    W = cfg.tiles_x * cfg.tile_px * cfg.pixel_size
    H = cfg.tiles_y * cfg.tile_px * cfg.pixel_size
    pts = np.stack([rng.uniform(-0.1 * W, 1.1 * W, n),
                    rng.uniform(-0.1 * H, 1.1 * H, n)], axis=1)
    vals = rng.uniform(-50, 50, n)
    tab = pa.table({"x": pa.array(pts[:, 0]), "y": pa.array(pts[:, 1]),
                    "v": pa.array(vals)})
    out = idw_grid(ray.data.from_arrow(tab), spec,
                   radius=radius).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]

    class _C:
        tile_px = spec.tile_px
        tiles_x = spec.tiles_x
        tiles_y = spec.tiles_y

    got = _mosaic(pa.concat_tables(tabs), "idw", _C)
    want = _idw_oracle(pts, vals, spec, radius, 2.0)
    g_nd = got == np.float32(ND)
    w_nd = want == np.float32(ND)
    assert np.array_equal(g_nd, w_nd)
    assert np.allclose(got[~g_nd], want[~w_nd], rtol=1e-6, atol=1e-4)
    # exercise both covered and uncovered pixels
    assert 0.0 < g_nd.mean() < 1.0 or radius > 300


def test_point_on_pixel_center_dominates(ray_session):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=8)
    spec = GridSpec.from_synth(cfg)
    ps = cfg.pixel_size
    # a point exactly on pixel center (row 3, col 5) plus a far one
    tab = pa.table({"x": pa.array([(5 + 0.5) * ps, (12 + 0.5) * ps]),
                    "y": pa.array([spec.y_north - (3 + 0.5) * ps,
                                   spec.y_north - (12 + 0.5) * ps]),
                    "v": pa.array([42.0, -7.0])})
    out = idw_grid(ray.data.from_arrow(tab), spec,
                   radius=3 * ps).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]

    class _C:
        tile_px = spec.tile_px
        tiles_x = spec.tiles_x
        tiles_y = spec.tiles_y

    got = _mosaic(pa.concat_tables(tabs), "idw", _C)
    assert got[3, 5] == np.float32(42.0)
    assert got[12, 12] == np.float32(-7.0)


def test_idw_validation():
    spec = GridSpec(2, 2, 16, 25.0, 800.0)
    with pytest.raises(ValueError, match="radius"):
        idw_grid(None, spec, radius=0.0)
    with pytest.raises(ValueError, match="re-tile"):
        idw_grid(None, spec, radius=1e7)


def test_kernel_density_matches_bruteforce(ray_session):
    """Distributed quartic KDE numerators == a scalar all-cells x
    all-points loop, including negative cell indices (points near the
    origin) and the zero-weight boundary ring d2 == R^2."""
    import ray.data

    from balrog_ray.stages.gridding import kernel_density_cells

    rng = np.random.default_rng(3)
    cs, R = 8, 20                      # K = 6 candidate cells per axis
    px = rng.integers(-15, 120, 300).astype(np.int64)
    py = rng.integers(-15, 120, 300).astype(np.int64)
    # force an exact boundary hit: center (4, 4), point at d = R
    px[0], py[0] = 4 + R, 4

    pts = ray.data.from_arrow(pa.table({
        "x": pa.array(px, pa.int64()), "y": pa.array(py, pa.int64())}))
    got = {(r["cx"], r["cy"]): (r["n_points"], r["density_num"])
           for r in kernel_density_cells(
               pts, cell_size=cs, radius=R).take_all()}

    want = {}
    h, r2 = cs // 2, R * R
    for i in range(-10, 20):
        for j in range(-10, 20):
            n = num = 0
            for x, y in zip(px, py):
                d2 = (i * cs + h - x) ** 2 + (j * cs + h - y) ** 2
                if d2 <= r2:
                    n += 1
                    num += (r2 - d2) ** 2
            if n:
                want[(i, j)] = (n, num)
    assert got == want
    # the forced point at exactly d == R from cell (0,0)'s center (4,4)
    # is counted there (the <= mask) even though its weight is zero
    assert (0, 0) in want


def test_kernel_density_validation():
    from balrog_ray.stages.gridding import kernel_density_cells

    with pytest.raises(ValueError, match="even"):
        kernel_density_cells(None, cell_size=5, radius=10)
    with pytest.raises(ValueError, match="radius"):
        kernel_density_cells(None, cell_size=4, radius=0)
    with pytest.raises(ValueError, match="fan-out"):
        kernel_density_cells(None, cell_size=2, radius=100)
