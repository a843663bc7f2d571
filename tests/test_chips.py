"""extract_chips: every chip decodes to the exact parent-tile slice, the
caption georeferencing shifts correctly, edge flags survive only on true
raster boundaries, and all-nodata chips drop."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.chips import extract_chips
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table


def test_chips_exact_slices_and_georef(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=64)
    tab = tiles_table(cfg, layers=("dem",))
    parents = {}
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        parents[tab.column("image_id")[i].as_py()] = (arr, cap)

    chips = extract_chips(ray.data.from_arrow(tab), chip_px=32,
                          stride=16).take_all()
    # 64px tile, 32px chip, stride 16 -> 3x3 chips per tile
    assert len(chips) == 4 * 9
    for row in chips:
        parent_id, pos = row["image_id"].split("#")
        r0, c0 = (int(x) for x in pos[1:].split("c"))
        arr, pcap = parents[parent_id]
        ccap = Caption.from_json(row["caption"])
        got = decode_tile(row["bytes"], row["fmt"], ccap)
        np.testing.assert_array_equal(got, arr[r0:r0 + 32, c0:c0 + 32])
        assert ccap.x0 == pcap.x0 + c0 * pcap.pixel_size
        assert ccap.y0 == pcap.y0 - r0 * pcap.pixel_size
        assert row["w"] == row["h"] == 32
        # true-boundary edge flags: only outermost chips of boundary tiles
        assert ccap.edge["n"] == (pcap.edge["n"] and r0 == 0)
        assert ccap.edge["w"] == (pcap.edge["w"] and c0 == 0)
        assert ccap.edge["s"] == (pcap.edge["s"] and r0 + 32 == 64)
        assert ccap.edge["e"] == (pcap.edge["e"] and c0 + 32 == 64)
        # overlapping chips are not a grid: parent tx/ty passes through
        assert (ccap.tx, ccap.ty) == (pcap.tx, pcap.ty)

    # gridded chips (stride == chip_px): tx/ty recomputed on the chip
    # grid, so the caption grid invariant holds (unique (tx, ty) and
    # y0 == y_north - ty*chip_px*ps)
    gridded = extract_chips(ray.data.from_arrow(tab), chip_px=32).take_all()
    assert len(gridded) == 4 * 4
    seen = set()
    y_north = max(Caption.from_json(r["caption"]).y0 for r in gridded)
    for row in gridded:
        ccap = Caption.from_json(row["caption"])
        seen.add((ccap.tx, ccap.ty))
        assert ccap.y0 == y_north - ccap.ty * 32 * ccap.pixel_size
        assert ccap.x0 == ccap.tx * 32 * ccap.pixel_size
    assert len(seen) == 16


def test_chips_drop_empty_and_validate(ray_session):
    import ray.data

    from balrog_ray.stages.quarantine import validate_tiles
    from balrog_ray.tiles.codec import encode_tile, phash64

    # hand-built tile: left half nodata, right half a gradient
    arr = np.full((32, 32), -99.0, dtype=np.float32)
    arr[:, 16:] = np.arange(32 * 16, dtype=np.float32).reshape(32, 16)
    cap = Caption(layer="dem", x0=0.0, y0=3200.0, pixel_size=100.0)
    payload, cap = encode_tile(arr, "npz", cap)
    tab = pa.table({
        "image_id": pa.array(["t0"], pa.string()),
        "bytes": pa.array([payload], pa.binary()),
        "w": pa.array([32], pa.int32()),
        "h": pa.array([32], pa.int32()),
        "fmt": pa.array(["npz"], pa.string()),
        "caption": pa.array([cap.to_json()], pa.string()),
        "phash": pa.array([phash64(arr)], pa.int64())})

    chips = extract_chips(ray.data.from_arrow(tab), chip_px=16)
    rows = chips.take_all()
    # 2x2 grid of 16px chips; the two left-column chips are all-nodata
    assert sorted(r["image_id"] for r in rows) \
        == ["t0#r0c16", "t0#r16c16"]
    # chips are valid image-table rows end to end
    report = validate_tiles(chips).take_all()
    assert all(r["ok"] for r in report)

    kept = extract_chips(ray.data.from_arrow(tab), chip_px=16,
                         drop_empty=False).take_all()
    assert len(kept) == 4

    with pytest.raises(ValueError):
        extract_chips(ray.data.from_arrow(tab), chip_px=0)

    # a tile smaller than chip_px fails loudly, never a silent zero-chip
    # drop
    with pytest.raises(Exception, match="smaller than"):
        extract_chips(ray.data.from_arrow(tab),
                      chip_px=64).materialize()


def test_cli_chips(ray_session, tmp_path, capsys):
    import json

    from balrog_ray.__main__ import main

    tiles = str(tmp_path / "tiles")
    assert main(["synth", "--out", tiles, "--tiles-x", "2", "--tiles-y",
                 "2", "--tile-px", "64"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "chips")
    assert main(["chips", "--tiles", tiles, "--out", out,
                 "--chip-px", "32"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 8 tiles (2 layers x 4 cells) x 4 chips each
    assert res["chips"] == 32

    from balrog_ray.sources import read_image_table
    from balrog_ray.stages.quarantine import validate_tiles
    report = validate_tiles(read_image_table(out)).take_all()
    assert len(report) == 32 and all(r["ok"] for r in report)
