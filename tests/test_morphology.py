"""Expand/Shrink morphology vs a brute-force per-pixel oracle, and
tiled-vs-whole-raster parity through the halo-window stage."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.morphology import expand_kernel, shrink_kernel
from balrog_ray.tiles.synth import SynthConfig
from test_hydrology import _mosaic, _tiles_from_array

ND = -99.0


def _classy(shape, seed, n_classes=5, nodata_frac=0.04):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, n_classes + 1,
                     (shape[0] // 3 + 1, shape[1] // 3 + 1))
    a = np.kron(a, np.ones((3, 3), np.int64))[:shape[0], :shape[1]]
    a = a.astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _brute(arr, n, zones, mode):
    """Per-pixel reference: nearest source within the n-disk wins,
    ties (d^2, then value) ascending."""
    H, W = arr.shape
    out = arr.copy()
    valid = arr != np.float32(ND)
    in_zone = valid & np.isin(arr, np.asarray(sorted(zones), np.float32))
    src = in_zone if mode == "expand" else (valid & ~in_zone)
    tgt = (valid & ~in_zone) if mode == "expand" else in_zone
    for r in range(H):
        for c in range(W):
            if not tgt[r, c]:
                continue
            best = None
            for dy in range(-n, n + 1):
                for dx in range(-n, n + 1):
                    d2 = dy * dy + dx * dx
                    if d2 == 0 or d2 > n * n:
                        continue
                    rr, cc = r + dy, c + dx
                    if 0 <= rr < H and 0 <= cc < W and src[rr, cc]:
                        cand = (d2, float(arr[rr, cc]))
                        if best is None or cand < best:
                            best = cand
            if best is not None:
                out[r, c] = np.float32(best[1])
    return out


@pytest.mark.parametrize("mode,kern", [("expand", expand_kernel),
                                       ("shrink", shrink_kernel)])
@pytest.mark.parametrize("n", [1, 2, 3])
def test_kernel_matches_bruteforce(mode, kern, n):
    arr = _classy((30, 26), seed=50 + n)
    zones = (2.0, 5.0)
    got = kern(arr, n, zones, ND)
    want = _brute(arr, n, zones, mode)
    assert np.array_equal(got, want)
    # nodata inert both ways
    assert np.array_equal(got == np.float32(ND), arr == np.float32(ND))


def test_expand_shrink_duality_on_binary():
    # on a clean two-class raster, expanding class A by n equals
    # shrinking class B by n (same allocation, swapped roles)
    arr = _classy((24, 24), seed=7, n_classes=2, nodata_frac=0.0)
    e = expand_kernel(arr, 2, (1.0,), ND)
    s = shrink_kernel(arr, 2, (2.0,), ND)
    assert np.array_equal(e, s)


@pytest.mark.usefixtures("ray_session")
def test_tiled_parity():
    import ray
    import ray.data

    from balrog_ray.stages.morphology import expand, shrink

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _classy((32, 48), seed=51)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(_tiles_from_array(arr, cfg, layer="veg"))
    for stage, kern, layer in ((expand, expand_kernel, "expand_veg"),
                               (shrink, shrink_kernel, "shrink_veg")):
        out = stage(ds, spec, layer="veg", n_cells=3,
                    zones=(2.0, 5.0)).materialize()
        tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
                if t.num_rows]
        got = _mosaic(pa.concat_tables(tabs), layer, cfg)
        want = kern(arr, 3, (2.0, 5.0), ND)
        assert np.array_equal(got, want)
