"""Tiled hillshade parity with a whole-raster run, including nodata
propagation and the illumination formula's range."""

import numpy as np

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.terrain import hillshade, hillshade_kernel
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def test_hillshade_kernel_range_and_flat():
    flat = np.full((12, 12), 100.0, np.float32)
    out = hillshade_kernel(flat, 25.0, 315.0, 45.0, ND)
    # flat terrain: slope 0 -> hs = 255 cos(zenith) everywhere
    assert np.allclose(out, 255.0 * np.cos(np.deg2rad(45.0)), atol=1e-3)
    rng = np.random.default_rng(4)
    rough = rng.uniform(0, 400, (20, 20)).astype(np.float32)
    rough[3:5, 3:7] = ND
    out = hillshade_kernel(rough, 25.0, 315.0, 45.0, ND)
    nd = out == np.float32(ND)
    assert (nd == (rough == np.float32(ND))).all()
    assert (out[~nd] >= 0).all() and (out[~nd] <= 255).all()


def test_hillshade_pipeline_matches_whole_raster(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    T = cfg.tile_px
    dem = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != "dem":
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        dem[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr

    exp = hillshade_kernel(dem, cfg.pixel_size, 315.0, 45.0, ND)
    out = hillshade(ray.data.from_arrow(tab), spec).take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    for row in out:
        cap = Caption.from_json(row["caption"])
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        want = exp[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T]
        nd = arr == np.float32(ND)
        assert (nd == (want == np.float32(ND))).all()
        assert np.allclose(arr[~nd], want[~nd], atol=1e-3), (cap.tx, cap.ty)


def _metric_oracle(dem, metric):
    H, W = dem.shape
    out = np.full((H, W), ND, np.float32)
    for i in range(H):
        for j in range(W):
            if dem[i, j] == np.float32(ND):
                continue
            nbrs = []
            win = []
            for di in (-1, 0, 1):
                for dj in (-1, 0, 1):
                    ii, jj = i + di, j + dj
                    if not (0 <= ii < H and 0 <= jj < W):
                        continue
                    v = dem[ii, jj]
                    if v == np.float32(ND):
                        continue
                    win.append(float(v))
                    if (di, dj) != (0, 0):
                        nbrs.append(float(v))
            if metric == "roughness":
                out[i, j] = np.float32(max(win) - min(win))
            elif nbrs:
                c = float(dem[i, j])
                if metric == "tpi":
                    out[i, j] = np.float32(c - np.mean(nbrs))
                else:
                    out[i, j] = np.float32(
                        np.mean([abs(c - n) for n in nbrs]))
    return out


def test_dem_metric_kernel_matches_loop_oracle():
    from balrog_ray.stages.terrain import dem_metric_kernel

    rng = np.random.default_rng(6)
    dem = rng.uniform(0, 300, (24, 19)).astype(np.float32)
    dem[rng.random((24, 19)) < 0.12] = ND
    for metric in ("tpi", "tri", "roughness"):
        got = dem_metric_kernel(dem, metric, ND)
        exp = _metric_oracle(dem, metric)
        nd_g = got == np.float32(ND)
        assert (nd_g == (exp == np.float32(ND))).all(), metric
        assert np.allclose(got[~nd_g], exp[~nd_g], atol=1e-4), metric


def test_dem_metrics_pipeline_matches_whole_raster(ray_session):
    import ray.data

    from balrog_ray.stages.terrain import dem_metric_kernel, dem_metrics

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    T = cfg.tile_px
    dem = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != "dem":
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        dem[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr

    for metric in ("tpi", "roughness"):
        exp = dem_metric_kernel(dem, metric, ND)
        out = dem_metrics(ray.data.from_arrow(tab), spec,
                          metric=metric).take_all()
        for row in out:
            cap = Caption.from_json(row["caption"])
            assert cap.layer == metric
            arr = decode_tile(row["bytes"], row["fmt"], cap)
            want = exp[cap.ty * T:(cap.ty + 1) * T,
                       cap.tx * T:(cap.tx + 1) * T]
            nd = arr == np.float32(ND)
            assert (nd == (want == np.float32(ND))).all()
            assert np.allclose(arr[~nd], want[~nd], atol=1e-4), metric


def _curv_oracle(dem, L, kind):
    """Scalar Zevenbergen-Thorne loop with ESRI center substitution."""
    H, W = dem.shape
    out = np.full((H, W), ND, np.float32)
    for i in range(H):
        for j in range(W):
            if dem[i, j] == np.float32(ND):
                continue
            z5 = float(dem[i, j])

            def z(di, dj):
                r, c = i + di, j + dj
                if not (0 <= r < H and 0 <= c < W) \
                        or dem[r, c] == np.float32(ND):
                    return z5
                return float(dem[r, c])

            z1, z2, z3 = z(-1, -1), z(-1, 0), z(-1, 1)
            z4, z6 = z(0, -1), z(0, 1)
            z7, z8, z9 = z(1, -1), z(1, 0), z(1, 1)
            D = ((z4 + z6) / 2 - z5) / L ** 2
            E = ((z2 + z8) / 2 - z5) / L ** 2
            F = (-z1 + z3 + z7 - z9) / (4 * L ** 2)
            G = (-z4 + z6) / (2 * L)
            H_ = (z2 - z8) / (2 * L)
            g2 = G * G + H_ * H_
            if kind == "total":
                v = -2 * (D + E) * 100
            elif g2 == 0:
                v = 0.0
            elif kind == "profile":
                v = 2 * (D * G * G + E * H_ * H_ + F * G * H_) / g2 * 100
            else:
                v = -2 * (D * H_ * H_ + E * G * G - F * G * H_) / g2 * 100
            out[i, j] = np.float32(v)
    return out


def test_curvature_kernel_matches_loop_oracle():
    from balrog_ray.stages.terrain import curvature_kernel

    rng = np.random.default_rng(5)
    dem = (rng.random((12, 14)) * 50).astype(np.float32)
    dem[rng.random((12, 14)) < 0.07] = ND
    for kind in ("total", "profile", "plan"):
        got = curvature_kernel(dem, 25.0, kind, ND)
        want = _curv_oracle(dem, 25.0, kind)
        nd = want == np.float32(ND)
        assert (nd == (got == np.float32(ND))).all(), kind
        assert np.allclose(got[~nd], want[~nd], atol=1e-5), kind
    # a pure inclined plane has zero curvature on the interior (the
    # border substitutes out-of-raster neighbours with the center value,
    # which legitimately bends the fitted surface there)
    plane = np.fromfunction(lambda i, j: 2.0 * i + 3.0 * j, (8, 8),
                            dtype=float).astype(np.float32)
    for kind in ("total", "profile", "plan"):
        assert np.allclose(
            curvature_kernel(plane, 10.0, kind, ND)[1:-1, 1:-1], 0.0)


def test_curvature_pipeline_matches_whole_raster(ray_session):
    import ray.data

    from balrog_ray.stages.terrain import curvature, curvature_kernel

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)
    T = cfg.tile_px
    dem = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != "dem":
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        dem[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    exp = curvature_kernel(dem, cfg.pixel_size, "profile", ND)
    out = curvature(ray.data.from_arrow(tab), spec,
                    kind="profile").take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    for row in out:
        cap = Caption.from_json(row["caption"])
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        want = exp[cap.ty * T:(cap.ty + 1) * T,
                   cap.tx * T:(cap.tx + 1) * T]
        assert np.array_equal(arr, want), (cap.tx, cap.ty)
