"""GLCM texture: the integral-image kernel vs a per-pixel brute-force
pair-collection oracle, and tiled-pipeline parity with the whole-raster
kernel run."""

import math

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.texture import glcm_kernel, glcm_texture
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table

ND = -99.0


def _brute(arr, metric, levels, vmin, vmax, radius, dy, dx):
    a = np.asarray(arr, np.float32)
    H, W = a.shape
    valid = a != np.float32(ND)
    span = max(vmax - vmin, 1e-30)
    q = np.clip(((a.astype(np.float64) - vmin) / span * levels)
                .astype(np.int64), 0, levels - 1)
    out = np.full((H, W), ND, np.float32)
    for py in range(H):
        for px in range(W):
            if not valid[py, px]:
                continue
            cnt: dict = {}
            tot = 0
            for y in range(py - radius, py + radius + 1):
                for x in range(px - radius, px + radius + 1):
                    y2, x2 = y + dy, x + dx
                    if not (0 <= y < H and 0 <= x < W
                            and 0 <= y2 < H and 0 <= x2 < W):
                        continue
                    if not (valid[y, x] and valid[y2, x2]):
                        continue
                    k = (int(q[y, x]), int(q[y2, x2]))
                    cnt[k] = cnt.get(k, 0) + 1
                    tot += 1
            if tot == 0:
                continue
            if metric == "contrast":
                v = sum(c * (i - j) ** 2 for (i, j), c in cnt.items()) / tot
            elif metric == "homogeneity":
                v = sum(c / (1.0 + (i - j) ** 2)
                        for (i, j), c in cnt.items()) / tot
            elif metric == "energy":
                v = sum(c * c for c in cnt.values()) / (tot * tot)
            else:
                v = -sum((c / tot) * math.log(c / tot)
                         for c in cnt.values())
            out[py, px] = v
    return out


@pytest.mark.parametrize("metric", ["contrast", "homogeneity", "energy",
                                    "entropy"])
@pytest.mark.parametrize("off", [(0, 1), (1, 0), (1, 1)])
def test_glcm_kernel_matches_brute_force(metric, off):
    rng = np.random.default_rng(11)
    arr = rng.uniform(0, 50, (17, 14)).astype(np.float32)
    arr[rng.random((17, 14)) < 0.12] = ND
    dy, dx = off
    got = glcm_kernel(arr, ND, metric=metric, levels=5, vmin=0.0,
                      vmax=50.0, radius=2, dy=dy, dx=dx)
    want = _brute(arr, metric, 5, 0.0, 50.0, 2, dy, dx)
    nd = got == np.float32(ND)
    assert (nd == (want == np.float32(ND))).all()
    assert np.allclose(got[~nd], want[~nd], atol=1e-4)


def test_glcm_pipeline_matches_whole_raster(ray_session):
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

    vmin, vmax = 0.0, float(dem[dem != np.float32(ND)].max())
    exp = glcm_kernel(dem, ND, metric="contrast", levels=8, vmin=vmin,
                      vmax=vmax, radius=3, dy=1, dx=1)
    out = glcm_texture(ray.data.from_arrow(tab), spec, metric="contrast",
                       levels=8, vmin=vmin, vmax=vmax, radius=3,
                       dy=1, dx=1).take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    for row in out:
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "glcm_contrast"
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        want = exp[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T]
        nd = arr == np.float32(ND)
        assert (nd == (want == np.float32(ND))).all()
        assert np.allclose(arr[~nd], want[~nd], atol=1e-3), (cap.tx, cap.ty)
