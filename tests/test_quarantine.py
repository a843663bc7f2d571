"""TileValidator quarantine: corrupt rows become error rows (never task
failures), good rows carry exact pixel stats, and drop_quarantined
streams the source minus exactly the bad ids."""

import numpy as np
import pyarrow as pa

from balrog_ray.stages.quarantine import (TileValidator, drop_quarantined,
                                          validate_tiles)
from balrog_ray.tiles.synth import SynthConfig, tiles_table


def _corrupt(tab: pa.Table):
    cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
    cols["bytes"][0] = cols["bytes"][0][:5]
    cols["caption"][1] = "{not json"
    cols["fmt"][2] = "bogus_fmt"
    cols["w"][3] = cols["w"][3] + 7
    return pa.table({c: pa.array(cols[c], tab.schema.field(c).type)
                     for c in tab.column_names})


def test_validator_classifies_and_stats():
    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = _corrupt(tiles_table(cfg).combine_chunks())
    out = TileValidator()(tab)
    ok = out.column("ok").to_pylist()
    err = out.column("error").to_pylist()
    assert ok[:4] == [False, False, False, False]
    assert all(ok[4:])
    assert err[0].startswith("decode:")
    assert err[1].startswith("caption_parse:")
    assert err[2].startswith("decode:")
    assert err[3].startswith("shape_mismatch:")
    assert all(e == "" for e in err[4:])

    # stats parity on one good row against a direct decode
    from balrog_ray.tiles.codec import Caption, decode_tile
    i = 5
    arr = decode_tile(tab.column("bytes")[i].as_py(),
                      tab.column("fmt")[i].as_py(),
                      Caption.from_json(tab.column("caption")[i].as_py()))
    valid = arr != np.float32(Caption.from_json(
        tab.column("caption")[i].as_py()).nodata)
    assert out.column("vmin")[i].as_py() == float(arr[valid].min())
    assert out.column("vmax")[i].as_py() == float(arr[valid].max())
    assert abs(out.column("nodata_frac")[i].as_py()
               - (1.0 - valid.mean())) < 1e-12


def test_drop_quarantined_streams_good_rows(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = _corrupt(tiles_table(cfg).combine_chunks())
    ds = ray.data.from_arrow(tab)
    report = validate_tiles(ds).materialize()
    assert report.count() == tab.num_rows

    bad_ids = {r["image_id"] for r in report.take_all() if not r["ok"]}
    assert len(bad_ids) == 4
    good = drop_quarantined(ds, report).take_all()
    assert {r["image_id"] for r in good} \
        == set(tab.column("image_id").to_pylist()) - bad_ids


def test_cli_validate(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from balrog_ray.__main__ import main

    tiles = str(tmp_path / "tiles")
    assert main(["synth", "--out", tiles, "--tiles-x", "2", "--tiles-y",
                 "2", "--tile-px", "32"]) == 0
    capsys.readouterr()
    report = str(tmp_path / "report")
    assert main(["validate", "--tiles", tiles, "--out", report,
                 "--strict"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quarantined"] == 0 and out["tiles"] == 8
    tab = pq.read_table(report)
    assert tab.num_rows == 8 and all(tab.column("ok").to_pylist())

    # corrupt one parquet row -> strict exit 1, exactly one quarantined
    import glob

    f = sorted(glob.glob(f"{tiles}/*.parquet"))[0]
    t = pq.read_table(f)
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    cols["bytes"][0] = b"garbage"
    pq.write_table(
        pa.table({c: pa.array(cols[c], t.schema.field(c).type)
                  for c in t.column_names}), f)
    assert main(["validate", "--tiles", tiles, "--strict"]) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["quarantined"] == 1


def test_phash_swap_detected():
    """A payload swap decodes fine and has the right shape -- only the
    phash cross-check catches it.  Clean rows (incl. lossy png) must
    stay inside the tolerance."""
    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg).combine_chunks()
    out_clean = TileValidator()(tab)
    assert all(out_clean.column("ok").to_pylist())
    dists = out_clean.column("phash_dist").to_pylist()
    assert all(0 <= d <= 4 for d in dists)

    cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
    # swap two payloads whose pixel content differs (dem vs veg layer)
    ids = cols["image_id"]
    i = next(k for k, s in enumerate(ids) if s.startswith("dem/"))
    j = next(k for k, s in enumerate(ids) if s.startswith("veg/"))
    for c in ("bytes", "fmt"):
        cols[c][i], cols[c][j] = cols[c][j], cols[c][i]
    swapped = pa.table({c: pa.array(cols[c], tab.schema.field(c).type)
                        for c in tab.column_names})
    out = TileValidator()(swapped)
    ok = out.column("ok").to_pylist()
    err = out.column("error").to_pylist()
    for k in (i, j):
        assert not ok[k] and (err[k].startswith("phash_mismatch")
                              or err[k].startswith("decode:")), err[k]
    good = [k for k in range(len(ok)) if k not in (i, j)]
    assert all(ok[k] for k in good)


def test_phash_distance_masks_sign_bit():
    """A stored hash differing from the recomputed one ONLY in bit 63
    is Hamming distance 1 (inside png tolerance), not a two's-complement
    magnitude blowup; a ~32-bit scramble is flagged."""
    cfg = SynthConfig(tiles_x=1, tiles_y=1, tile_px=32)
    tab = tiles_table(cfg).combine_chunks()
    cols = {c: tab.column(c).to_pylist() for c in tab.column_names}

    def to_signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    h = cols["phash"][0] & ((1 << 64) - 1)
    cols["phash"][0] = to_signed(h ^ (1 << 63))          # sign bit only
    one = pa.table({c: pa.array(cols[c], tab.schema.field(c).type)
                    for c in tab.column_names})
    out = TileValidator()(one)
    # the sign-bit flip costs exactly ONE bit on top of any codec noise
    # (the unmasked two's-complement bug computed ~60 here)
    base = TileValidator()(tab).column("phash_dist")[0].as_py()
    assert out.column("phash_dist")[0].as_py() == base + 1

    cols["phash"][0] = to_signed(h ^ ((1 << 63) | 0xFFFFFFFF))
    many = pa.table({c: pa.array(cols[c], tab.schema.field(c).type)
                     for c in tab.column_names})
    out2 = TileValidator()(many)
    assert not out2.column("ok")[0].as_py()
    assert out2.column("error")[0].as_py().startswith("phash_mismatch")
