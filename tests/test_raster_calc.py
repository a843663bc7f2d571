"""raster_calc map algebra vs a whole-raster numpy oracle: pointwise
formula parity, nodata propagation via apply_masked, and
find_common_area drop semantics when a layer is missing a cell."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.raster_calc import apply_masked, raster_calc
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table


def _decode_all(tab):
    out = {}
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[(cap.layer, cap.tx, cap.ty)] = (arr, cap)
    return out


def _make_formula():
    # defined via factory so cloudpickle ships it by VALUE (the tests
    # module is not importable on Ray workers)
    def formula(layers, nd):
        d, v = layers["dem"], layers["veg"]
        return (d - 10.0 * v) / (np.abs(d) + 10.0 * np.abs(v) + 1.0)
    return formula


def test_raster_calc_matches_numpy_and_propagates_nodata(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    parents = _decode_all(tab)

    out = raster_calc(ray.data.from_arrow(tab), ["dem", "veg"],
                      apply_masked(_make_formula()),
                      out_layer="idx").take_all()
    cells = {(r["image_id"]): r for r in out}
    assert len(cells) == 6
    for (layer, tx, ty), (dem, dcap) in parents.items():
        if layer != "dem":
            continue
        veg, _ = parents[("veg", tx, ty)]
        want = _make_formula()({"dem": dem, "veg": veg}, -99.0).astype(np.float32)
        bad = (dem == np.float32(-99.0)) | (veg == np.float32(-99.0))
        want[bad] = np.float32(-99.0)
        row = cells[f"idx/{tx}/{ty}"]
        ocap = Caption.from_json(row["caption"])
        got = decode_tile(row["bytes"], row["fmt"], ocap)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        assert (ocap.x0, ocap.y0) == (dcap.x0, dcap.y0)
        assert ocap.layer == "idx" and (ocap.tx, ocap.ty) == (tx, ty)


def test_raster_calc_drops_cells_missing_a_layer(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg)
    # remove one veg tile -> that cell must vanish (find_common_area)
    drop = None
    for i in range(tab.num_rows):
        if tab.column("image_id")[i].as_py().startswith("veg/1/"):
            drop = i
            break
    keep = [i for i in range(tab.num_rows) if i != drop]
    tab2 = tab.take(pa.array(keep, pa.int64()))
    dropped_id = tab.column("image_id")[drop].as_py()

    out = raster_calc(ray.data.from_arrow(tab2), ["dem", "veg"],
                      apply_masked(_make_formula()),
                      out_layer="idx").take_all()
    got_ids = {r["image_id"] for r in out}
    assert len(got_ids) == 3
    assert dropped_id.replace("veg/", "idx/") not in got_ids
