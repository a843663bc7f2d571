"""Gaussian blur + Sobel vs scalar per-pixel oracles, and tiled-stage
parity: the windowed-stage run must be bit-identical to the whole-raster
kernels across tile seams (same fold order, same zero-pad truncation)."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.filters import (gaussian_blur, gaussian_kernel,
                                       gaussian_weights, sobel_edges,
                                       sobel_kernel)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import Caption, decode_tile, encode_tile, phash64
from balrog_ray.tiles.synth import TILES_SCHEMA, SynthConfig

ND = -99.0


def _field(shape, seed, nodata_frac=0.06):
    rng = np.random.default_rng(seed)
    a = (rng.random(shape) * 80).astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _gauss_scalar(a, sigma, radius, nd):
    H, W = a.shape
    w = gaussian_weights(sigma, radius)
    out = np.full((H, W), np.float32(nd), np.float32)
    for r in range(H):
        for c in range(W):
            if a[r, c] == np.float32(nd):
                continue
            num = den = 0.0
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    r2, c2 = r + dy, c + dx
                    if not (0 <= r2 < H and 0 <= c2 < W):
                        continue
                    if a[r2, c2] == np.float32(nd):
                        continue
                    wt = w[dy + radius] * w[dx + radius]
                    num += wt * float(a[r2, c2])
                    den += wt
            out[r, c] = np.float32(num / den)
    return out


def _sobel_scalar(a, ps, nd):
    H, W = a.shape
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64)
    out = np.full((H, W), np.float32(nd), np.float32)
    for r in range(1, H - 1):
        for c in range(1, W - 1):
            win = a[r - 1:r + 2, c - 1:c + 2]
            if (win == np.float32(nd)).any():
                continue
            gx = float((kx * win).sum())
            gy = float((kx.T * win).sum())
            out[r, c] = np.float32(np.hypot(gx, gy) / (8.0 * ps))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_gaussian_kernel_matches_scalar(seed):
    a = _field((12, 15), seed)
    got = gaussian_kernel(a, 1.5, 3, ND)
    want = _gauss_scalar(a, 1.5, 3, ND)
    valid = a != np.float32(ND)
    assert np.array_equal(got[~valid], want[~valid])
    assert np.allclose(got[valid], want[valid], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [2, 3])
def test_sobel_kernel_matches_scalar(seed):
    a = _field((12, 15), seed)
    got = sobel_kernel(a, 2.5, ND)
    want = _sobel_scalar(a, 2.5, ND)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-6)
    # borders are nodata by contract
    assert (got[0] == np.float32(ND)).all()
    assert (got[:, -1] == np.float32(ND)).all()


def _tiles_from_array(arr, cfg, layer="dem"):
    T = cfg.tile_px
    rows = {n: [] for n in TILES_SCHEMA.names}
    for ty in range(cfg.tiles_y):
        for tx in range(cfg.tiles_x):
            core = np.ascontiguousarray(
                arr[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T])
            cap = Caption(layer=layer, x0=tx * T * cfg.pixel_size,
                          y0=cfg.y_north - ty * T * cfg.pixel_size,
                          pixel_size=cfg.pixel_size, nodata=ND,
                          tx=tx, ty=ty,
                          edge={"n": ty == 0, "s": ty == cfg.tiles_y - 1,
                                "w": tx == 0, "e": tx == cfg.tiles_x - 1})
            payload, cap = encode_tile(core, "npz", cap)
            rows["image_id"].append(f"{layer}/{tx}/{ty}")
            rows["bytes"].append(payload)
            rows["w"].append(np.int32(T))
            rows["h"].append(np.int32(T))
            rows["fmt"].append("npz")
            rows["caption"].append(cap.to_json())
            rows["phash"].append(np.int64(phash64(core)))
    return pa.table(rows, schema=TILES_SCHEMA)


def _mosaic(tab, layer, cfg):
    T = cfg.tile_px
    out = np.full((cfg.tiles_y * T, cfg.tiles_x * T), np.float32(ND),
                  np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != layer:
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    return out


@pytest.mark.parametrize("stage,kernel_args", [
    ("gauss", dict(sigma=1.8)),
    ("sobel", dict()),
])
def test_tiled_filters_match_whole_raster(ray_session, stage, kernel_args):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px), 7)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    if stage == "gauss":
        out = gaussian_blur(tiles, spec, **kernel_args).materialize()
        r = int(np.ceil(3.0 * kernel_args["sigma"]))
        want = gaussian_kernel(arr, kernel_args["sigma"], r, ND)
        layer = "gauss"
    else:
        out = sobel_edges(tiles, spec).materialize()
        want = sobel_kernel(arr, cfg.pixel_size, ND)
        layer = "sobel"
    tabs = [t for t in (ray.get(rf) for rf in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), layer, cfg)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")


def test_gaussian_blur_validation():
    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    with pytest.raises(ValueError):
        gaussian_blur(None, spec, sigma=0.0)


from balrog_ray.stages.filters import (focal_majority, focal_median,
                                       majority_kernel, median_kernel)


def _median_scalar(a, r, nd):
    H, W = a.shape
    out = np.full((H, W), np.float32(nd), np.float32)
    for i in range(H):
        for j in range(W):
            if a[i, j] == np.float32(nd):
                continue
            vals = [float(a[y, x])
                    for y in range(max(0, i - r), min(H, i + r + 1))
                    for x in range(max(0, j - r), min(W, j + r + 1))
                    if a[y, x] != np.float32(nd)]
            out[i, j] = np.float32(np.median(vals))
    return out


def _majority_scalar(a, r, nd):
    H, W = a.shape
    out = np.full((H, W), np.float32(nd), np.float32)
    for i in range(H):
        for j in range(W):
            if a[i, j] == np.float32(nd):
                continue
            vals = [float(a[y, x])
                    for y in range(max(0, i - r), min(H, i + r + 1))
                    for x in range(max(0, j - r), min(W, j + r + 1))
                    if a[y, x] != np.float32(nd)]
            best, bc = None, 0
            for v in sorted(set(vals)):
                c = vals.count(v)
                if c > bc:
                    best, bc = v, c
            out[i, j] = np.float32(best)
    return out


@pytest.mark.parametrize("seed,r", [(4, 1), (5, 2)])
def test_median_kernel_matches_scalar(seed, r):
    a = _field((11, 14), seed)
    assert np.array_equal(median_kernel(a, r, ND),
                          _median_scalar(a, r, ND))


@pytest.mark.parametrize("seed,r", [(6, 1), (7, 2)])
def test_majority_kernel_matches_scalar(seed, r):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 6, (11, 14)).astype(np.float32)
    a[rng.random(a.shape) < 0.08] = ND
    assert np.array_equal(majority_kernel(a, r, ND),
                          _majority_scalar(a, r, ND))


def test_majority_kernel_rejects_continuous():
    a = np.arange(400, dtype=np.float32).reshape(20, 20)
    with pytest.raises(ValueError, match="categorical"):
        majority_kernel(a, 1, ND, max_classes=64)


@pytest.mark.parametrize("which", ["median", "majority"])
def test_tiled_median_majority_match_whole_raster(ray_session, which):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    shape = (cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px)
    rng = np.random.default_rng(9)
    if which == "median":
        arr = _field(shape, 9)
        want = median_kernel(arr, 2, ND)
    else:
        arr = rng.integers(1, 7, shape).astype(np.float32)
        arr[rng.random(shape) < 0.05] = ND
        want = majority_kernel(arr, 1, ND)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    out = (focal_median(tiles, spec, radius=2) if which == "median"
           else focal_majority(tiles, spec, layer="dem", radius=1))
    tabs = [t for t in (ray.get(rf) for rf in out.materialize()
                        .to_arrow_refs()) if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs),
                  "median" if which == "median" else "majority", cfg)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")


def _bilateral_scalar(a, sigma_s, sigma_r, radius, nd):
    H, W = a.shape
    out = np.full((H, W), np.float32(nd), np.float32)
    for r in range(H):
        for c in range(W):
            if a[r, c] == np.float32(nd):
                continue
            vc = float(np.float64(a[r, c]))
            num = den = 0.0
            for dy in range(-radius, radius + 1):
                for dx in range(-radius, radius + 1):
                    r2, c2 = r + dy, c + dx
                    if not (0 <= r2 < H and 0 <= c2 < W):
                        continue
                    if a[r2, c2] == np.float32(nd):
                        continue
                    vn = float(np.float64(a[r2, c2]))
                    w = (np.exp(-0.5 * (dy * dy + dx * dx)
                                / sigma_s ** 2)
                         * np.exp(-0.5 * (vn - vc) ** 2 / sigma_r ** 2))
                    num += w * vn
                    den += w
            out[r, c] = np.float32(num / den)
    return out


@pytest.mark.parametrize("seed", [3, 19])
def test_bilateral_kernel_matches_scalar(seed):
    from balrog_ray.stages.filters import bilateral_kernel

    a = _field((14, 13), seed)
    got = bilateral_kernel(a, 1.5, 8.0, 3, ND)
    want = _bilateral_scalar(a, 1.5, 8.0, 3, ND)
    m = a != np.float32(ND)
    assert np.allclose(got[m], want[m], rtol=1e-6, atol=1e-4)
    assert (got[~m] == np.float32(ND)).all()
    # edge preservation: smooths less across a sharp step than gaussian
    step = np.zeros((11, 11), np.float32)
    step[:, 5:] = 100.0
    bi = bilateral_kernel(step, 1.5, 8.0, 3, ND)
    ga = gaussian_kernel(step, 1.5, 3, ND)
    assert abs(float(bi[5, 4])) < abs(float(ga[5, 4]))
    assert abs(float(bi[5, 4])) < 1.0


def test_tiled_bilateral_matches_whole_raster(ray_session):
    import ray
    import ray.data

    from balrog_ray.stages.filters import bilateral_filter, \
        bilateral_kernel

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px),
                 11)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    out = bilateral_filter(tiles, spec, sigma_s=2.0, sigma_r=6.0)
    tabs = [t for t in (ray.get(rf) for rf in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "bilateral", cfg)
    want = bilateral_kernel(arr, 2.0, 6.0, 6, ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")


def _kuwahara_scalar(a, radius, nd):
    """Per-pixel oracle: four overlapping (r+1)^2 quadrants, smallest
    variance wins, earlier quadrant (NW, NE, SW, SE) wins ties."""
    H, W = a.shape
    out = np.full((H, W), np.float32(nd), np.float32)
    quads = (((-radius, 0), (-radius, 0)), ((-radius, 0), (0, radius)),
             ((0, radius), (-radius, 0)), ((0, radius), (0, radius)))
    for r in range(H):
        for c in range(W):
            if a[r, c] == np.float32(nd):
                continue
            best = None
            for (ylo, yhi), (xlo, xhi) in quads:
                vals = []
                for dy in range(ylo, yhi + 1):
                    for dx in range(xlo, xhi + 1):
                        r2, c2 = r + dy, c + dx
                        if (0 <= r2 < H and 0 <= c2 < W
                                and a[r2, c2] != np.float32(nd)):
                            vals.append(float(a[r2, c2]))
                if not vals:
                    continue
                n = len(vals)
                s = sum(vals)
                mean = s / n
                var = sum(x * x for x in vals) / n - mean * mean
                if best is None or var < best[0]:
                    best = (var, mean)
            out[r, c] = np.float32(best[1])
    return out


@pytest.mark.parametrize("seed,r", [(0, 1), (1, 2)])
def test_kuwahara_kernel_matches_scalar(seed, r):
    from balrog_ray.stages.filters import kuwahara_kernel

    a = _field((20, 17), seed)
    got = kuwahara_kernel(a, r, ND)
    want = _kuwahara_scalar(a, r, ND)
    # float64 accumulation order differs between the vectorized kernel
    # (shifted adds) and the scalar loop only through a/b association;
    # both compute identical sums of identical terms -> exact
    assert np.allclose(got, want, rtol=0, atol=1e-4)
    assert np.array_equal(got == np.float32(ND), a == np.float32(ND))


def test_kuwahara_flat_region_identity():
    from balrog_ray.stages.filters import kuwahara_kernel

    a = np.full((12, 12), 7.25, np.float32)
    got = kuwahara_kernel(a, 2, ND)
    assert np.allclose(got, 7.25, atol=1e-6)


def test_kuwahara_preserves_step_edge():
    """A vertical step edge survives: pixels adjacent to the edge take
    the mean of their own side (the straddling quadrants have higher
    variance)."""
    from balrog_ray.stages.filters import kuwahara_kernel

    a = np.zeros((16, 16), np.float32)
    a[:, 8:] = 100.0
    got = kuwahara_kernel(a, 2, ND)
    assert np.allclose(got[:, :8], 0.0)
    assert np.allclose(got[:, 8:], 100.0)


def test_tiled_kuwahara_matches_whole_raster(ray_session):
    import ray
    import ray.data

    from balrog_ray.stages.filters import kuwahara, kuwahara_kernel

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _field((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px),
                 23)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(_tiles_from_array(arr, cfg))
    out = kuwahara(tiles, spec, radius=2).materialize()
    tabs = [t for t in (ray.get(rf) for rf in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "kuwahara", cfg)
    want = kuwahara_kernel(arr, 2, ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")
