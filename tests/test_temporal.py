"""Temporal stack operators vs whole-world single-array oracles: the tiled
groupby(cell) composite must be bit-identical to reducing the global
per-epoch arrays at once, nodata (per-epoch moving clouds + the recurring
all-epoch patch) handled exactly."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.temporal import (_reduce_stack, change_detection,
                                        temporal_composite)
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import (SynthConfig, epoch_dem_window,
                                    temporal_tiles_table)

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
N_EPOCHS = 5


def _global_stack():
    wr, wc = CFG.world_px
    return np.stack([
        epoch_dem_window(CFG, e, 0, 0, wr, wc).astype(np.float32)
        for e in range(N_EPOCHS)])


def _reassemble(ds, stat):
    wr, wc = CFG.world_px
    out = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in ds.take_all():
        cap = Caption.from_json(row["caption"])
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = tile
        assert row["image_id"] == f"dem/{stat}/{cap.tx}/{cap.ty}"
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    return out


@pytest.fixture(scope="module")
def tiles_ds(ray_session):
    import ray.data

    return ray.data.from_arrow(temporal_tiles_table(CFG, N_EPOCHS))


@pytest.mark.parametrize("stat", ["median", "mean", "min", "max", "count"])
def test_composite_matches_global(ray_session, tiles_ds, stat):
    spec = GridSpec.from_synth(CFG)
    got = _reassemble(temporal_composite(tiles_ds, spec, stat=stat), stat)
    stack = _global_stack()
    want = _reduce_stack(stack, stack != np.float32(NODATA), stat, NODATA)
    np.testing.assert_array_equal(got, want)
    # the synth must actually exercise the nodata paths
    valid_n = (stack != np.float32(NODATA)).sum(axis=0)
    assert (valid_n == 0).any(), "need an all-epoch nodata pixel"
    assert ((valid_n > 0) & (valid_n < N_EPOCHS)).any(), \
        "need partially-cloudy pixels"


def test_change_detection_matches_global(ray_session, tiles_ds):
    spec = GridSpec.from_synth(CFG)
    ea, eb, thr = 1, 4, 2.0
    rows = change_detection(tiles_ds, spec, epoch_a=ea, epoch_b=eb,
                            threshold=thr).take_all()
    a = epoch_dem_window(CFG, ea, 0, 0, *CFG.world_px).astype(np.float32)
    b = epoch_dem_window(CFG, eb, 0, 0, *CFG.world_px).astype(np.float32)
    nd = np.float32(NODATA)
    T = CFG.tile_px
    assert len(rows) == CFG.tiles_x * CFG.tiles_y
    total_changed = 0
    for row in rows:
        tx, ty = row["tx"], row["ty"]
        wa = a[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
        wb = b[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
        both = (wa != nd) & (wb != nd)
        delta = np.abs(wb.astype(np.float64) - wa.astype(np.float64))
        assert row["n_valid"] == int(both.sum())
        assert row["n_changed"] == int((both & (delta > thr)).sum())
        assert row["max_abs_delta"] == pytest.approx(
            float(delta[both].max()) if both.any() else 0.0)
        total_changed += row["n_changed"]
    assert total_changed > 0


def test_change_detection_missing_epoch(ray_session):
    """A cell whose tile is absent from one epoch emits no row (honest
    no-answer rather than a half-comparison)."""
    import ray.data

    tab = temporal_tiles_table(CFG, 2)
    # drop epoch 1's tile for cell (0, 0)
    keep = [i for i in range(tab.num_rows)
            if tab.column("image_id")[i].as_py() != "dem/e1/0/0"]
    ds = ray.data.from_arrow(tab.take(pa.array(keep, pa.int64())))
    rows = change_detection(ds, GridSpec.from_synth(CFG), epoch_a=0,
                            epoch_b=1, threshold=1.0).take_all()
    cells = {(r["tx"], r["ty"]) for r in rows}
    assert (0, 0) not in cells
    assert len(rows) == CFG.tiles_x * CFG.tiles_y - 1


@pytest.mark.parametrize("stat", ["first", "last"])
def test_mosaic_first_last(ray_session, tiles_ds, stat):
    """Mosaic semantics vs an independent sequential-fill oracle: iterate
    epochs in (reversed) order, keep the first valid value per pixel."""
    spec = GridSpec.from_synth(CFG)
    got = _reassemble(temporal_composite(tiles_ds, spec, stat=stat), stat)
    stack = _global_stack()
    nd = np.float32(NODATA)
    want = np.full_like(stack[0], nd)
    unset = np.ones(want.shape, bool)
    seq = stack if stat == "first" else stack[::-1]
    for layer in seq:
        take = unset & (layer != nd)
        want[take] = layer[take]
        unset &= ~take
    np.testing.assert_array_equal(got, want)


def test_trend_matches_polyfit(ray_session, tiles_ds):
    """Tiled per-pixel OLS slope == np.polyfit per pixel (tight allclose;
    different algorithm), nodata mask exactly where < 2 valid epochs."""
    from balrog_ray.stages.temporal import temporal_trend

    spec = GridSpec.from_synth(CFG)
    got = _reassemble(temporal_trend(tiles_ds, spec), "trend")
    stack = _global_stack()
    nd = np.float32(NODATA)
    valid = stack != nd
    e = np.arange(N_EPOCHS, dtype=np.float64)
    wr, wc = CFG.world_px
    for r in range(0, wr, 3):
        for c in range(0, wc, 3):
            m = valid[:, r, c]
            if m.sum() >= 2:
                slope = np.polyfit(e[m], stack[m, r, c].astype(np.float64),
                                   1)[0]
                assert got[r, c] == pytest.approx(slope, rel=1e-5, abs=1e-6)
            else:
                assert got[r, c] == nd
    # the moving clouds make some pixels' epoch subsets differ -> slopes
    # must not be constant
    assert np.unique(got[got != nd]).size > 100
