"""terrain_profile / line_of_sight vs a whole-raster scalar oracle that
replays the same station formula and tangent rule on the driver-side
mosaic."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.profile import (OUT_OF_AREA, line_of_sight,
                                       profile_stations, terrain_profile)
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _mosaic(tab, layer, cfg):
    T = cfg.tile_px
    out = np.full((cfg.tiles_y * T, cfg.tiles_x * T), ND, np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != layer:
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = arr
    return out


def _oracle_profile(mosaic, x0, y0, x1, y1, step, cfg):
    ps = cfg.pixel_size
    H, W = mosaic.shape
    L, n, t = profile_stations(x0, y0, x1, y1, step)
    rows = []
    for i in range(n):
        x = x0 + t[i] * (x1 - x0)
        y = y0 + t[i] * (y1 - y0)
        c = int(np.floor(x / ps))
        r = int(np.floor((cfg.y_north - y) / ps))
        z = OUT_OF_AREA
        if 0 <= r < H and 0 <= c < W and mosaic[r, c] != np.float32(ND):
            z = float(mosaic[r, c])
        rows.append((i, n, t[i] * L, x, y, z))
    return rows


def _oracle_los(prof_rows, obs_h, tgt_h):
    z = np.array([r[5] for r in prof_rows])
    d = np.array([r[2] for r in prof_rows])
    n = len(z)
    valid = z != OUT_OF_AREA
    if not (valid[0] and valid[-1]):
        return False, -1
    if n == 2 or d[-1] == 0.0:
        return True, -1
    z_obs = z[0] + obs_h
    t_ang = (z[-1] + tgt_h - z_obs) / d[-1]
    first = -1
    for i in range(1, n - 1):
        if valid[i] and (z[i] - z_obs) / d[i] > t_ang:
            first = i
            break
    return first == -1, first


def _lines(cfg):
    ps = cfg.pixel_size
    W = cfg.tiles_x * cfg.tile_px * ps
    H = cfg.tiles_y * cfg.tile_px * ps
    rng = np.random.default_rng(7)
    pts = rng.uniform(0.05, 0.95, (10, 4))
    rows = [(f"l{i:02d}", x0 * W, y0 * H, x1 * W, y1 * H)
            for i, (x0, y0, x1, y1) in enumerate(pts)]
    # cross-raster diagonal, zero-length line, line leaving the grid,
    # and a line through the nodata hole in tile (1,1)
    rows += [("diag", 0.5 * ps, 0.5 * ps, W - 0.5 * ps, H - 0.5 * ps),
             ("zero", 0.3 * W, 0.4 * H, 0.3 * W, 0.4 * H),
             ("exit", 0.8 * W, 0.5 * H, 1.3 * W, 0.5 * H),
             ("hole", 1.1 * cfg.tile_px * ps, cfg.y_north
              - 1.1 * cfg.tile_px * ps, 1.9 * cfg.tile_px * ps,
              cfg.y_north - 1.9 * cfg.tile_px * ps)]
    return pa.table({
        "line_id": pa.array([r[0] for r in rows], pa.string()),
        "x0": pa.array([r[1] for r in rows], pa.float64()),
        "y0": pa.array([r[2] for r in rows], pa.float64()),
        "x1": pa.array([r[3] for r in rows], pa.float64()),
        "y1": pa.array([r[4] for r in rows], pa.float64())})


def test_profile_matches_oracle(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=32)
    spec = GridSpec.from_synth(cfg)
    tab = tiles_table(cfg)
    dem = _mosaic(tab, "dem", cfg)
    lines = _lines(cfg)

    got = (terrain_profile(ray.data.from_arrow(lines),
                           ray.data.from_arrow(tab), spec)
           .take_all())
    by_line: dict[str, dict[int, tuple]] = {}
    for r in got:
        by_line.setdefault(r["line_id"], {})[r["step"]] = r

    assert set(by_line) == set(lines.column("line_id").to_pylist())
    for i in range(lines.num_rows):
        lid = lines.column("line_id")[i].as_py()
        want = _oracle_profile(
            dem, lines.column("x0")[i].as_py(),
            lines.column("y0")[i].as_py(),
            lines.column("x1")[i].as_py(),
            lines.column("y1")[i].as_py(), cfg.pixel_size, cfg)
        steps = by_line[lid]
        assert len(steps) == len(want), lid       # row count conserved
        for (s, n, dist, x, y, z) in want:
            r = steps[s]
            assert r["n_steps"] == n
            assert r["dist_m"] == dist            # same formula: bit-exact
            assert r["x"] == x and r["y"] == y
            assert r["z"] == z, (lid, s, r["z"], z)
    # the hole transect actually crosses nodata, the exit one leaves
    assert any(r["z"] == OUT_OF_AREA for r in by_line["hole"].values())
    assert any(r["z"] == OUT_OF_AREA for r in by_line["exit"].values())


def test_los_matches_oracle(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=32)
    spec = GridSpec.from_synth(cfg)
    tab = tiles_table(cfg)
    dem = _mosaic(tab, "dem", cfg)
    lines = _lines(cfg)

    got = {r["line_id"]: r for r in
           line_of_sight(ray.data.from_arrow(lines),
                         ray.data.from_arrow(tab), spec,
                         observer_height=1.8).take_all()}
    assert len(got) == lines.num_rows
    verdicts = []
    for i in range(lines.num_rows):
        lid = lines.column("line_id")[i].as_py()
        prof = _oracle_profile(
            dem, lines.column("x0")[i].as_py(),
            lines.column("y0")[i].as_py(),
            lines.column("x1")[i].as_py(),
            lines.column("y1")[i].as_py(), cfg.pixel_size, cfg)
        vis, first = _oracle_los(prof, 1.8, 0.0)
        r = got[lid]
        assert r["visible"] == vis, lid
        assert r["first_block_step"] == first, lid
        assert r["n_steps"] == len(prof)
        assert r["n_valid"] == sum(p[5] != OUT_OF_AREA for p in prof)
        verdicts.append(vis)
    assert got["zero"]["visible"]                 # degenerate line: true
    assert not got["exit"]["visible"]             # target off-grid
    assert any(verdicts) and not all(verdicts)    # both outcomes occur
