"""NCC template matching: the shift-accumulate kernel vs a per-pixel
brute-force Pearson oracle, tiled-pipeline parity with the whole-raster
kernel run, and the distributed top-k reduction vs a full argsort."""

import numpy as np
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.match import ncc_kernel, template_match, top_matches
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, dem_window, tiles_table

ND = -99.0


def _brute(arr, template):
    a = np.asarray(arr, np.float64)
    t = np.asarray(template, np.float64)
    k = t.shape[0]
    r = k // 2
    H, W = a.shape
    valid = np.asarray(arr, np.float32) != np.float32(ND)
    tm = t - t.mean()
    tn = np.sqrt((tm * tm).sum())
    out = np.full((H, W), ND, np.float32)
    for y in range(r, H - r):
        for x in range(r, W - r):
            patch = a[y - r:y + r + 1, x - r:x + r + 1]
            if not valid[y - r:y + r + 1, x - r:x + r + 1].all():
                continue
            pm = patch - patch.mean()
            pn = np.sqrt((pm * pm).sum())
            if pn * tn <= 1e-12:
                continue
            out[y, x] = np.clip((pm * tm).sum() / (pn * tn), -1.0, 1.0)
    return out


def test_ncc_kernel_matches_brute_force():
    rng = np.random.default_rng(7)
    arr = rng.uniform(0, 80, (19, 16)).astype(np.float32)
    arr[rng.random((19, 16)) < 0.1] = ND
    arr[3:6, 3:6] = 42.0                      # a constant patch -> nodata
    tmpl = rng.uniform(0, 80, (5, 5))
    got = ncc_kernel(arr, ND, tmpl)
    want = _brute(arr, tmpl)
    nd = got == np.float32(ND)
    assert (nd == (want == np.float32(ND))).all()
    assert np.allclose(got[~nd], want[~nd], atol=1e-5)
    # perfect self-match: plant the template verbatim, score ~= 1
    arr2 = rng.uniform(0, 10, (15, 15)).astype(np.float32)
    arr2[5:10, 5:10] = np.asarray(tmpl, np.float32)
    got2 = ncc_kernel(arr2, ND, tmpl)
    assert got2[7, 7] > 0.9999


def test_ncc_rejects_bad_templates():
    arr = np.zeros((8, 8), np.float32)
    with pytest.raises(ValueError):
        ncc_kernel(arr, ND, np.ones((4, 4)))     # even side
    with pytest.raises(ValueError):
        ncc_kernel(arr, ND, np.ones((3, 3)))     # constant template


def test_template_match_pipeline_matches_whole_raster(ray_session):
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

    tmpl = dem_window(cfg, 20, 30, 9, 9).astype(np.float64)
    exp = ncc_kernel(dem, ND, tmpl)
    out_ds = template_match(ray.data.from_arrow(tab), spec, tmpl)
    out = out_ds.take_all()
    assert len(out) == cfg.tiles_x * cfg.tiles_y
    for row in out:
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "ncc_score"
        arr = decode_tile(row["bytes"], row["fmt"], cap)
        want = exp[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T]
        nd = arr == np.float32(ND)
        assert (nd == (want == np.float32(ND))).all()
        assert np.allclose(arr[~nd], want[~nd], atol=1e-4), (cap.tx, cap.ty)

    # the planted window is the global best match, found at its center
    top = top_matches(out_ds, k_top=5)
    assert top.num_rows == 5
    assert top.column("row")[0].as_py() == 24
    assert top.column("col")[0].as_py() == 34
    assert top.column("score_u")[0].as_py() >= 999_999

    # distributed top-k == full-raster argsort top-k
    sc = np.rint(np.where(exp == np.float32(ND), -np.inf,
                          exp.astype(np.float64)) * 1e6)
    flat = sc.ravel()
    order = np.lexsort((np.arange(flat.size) % exp.shape[1],
                        np.arange(flat.size) // exp.shape[1], -flat))[:5]
    for i, ix in enumerate(order):
        assert top.column("row")[i].as_py() == ix // exp.shape[1]
        assert top.column("col")[i].as_py() == ix % exp.shape[1]
        assert top.column("score_u")[i].as_py() == int(flat[ix])
