"""CLI surface: main() runs in-process against the session's Ray (must not
tear it down) and round-trips synth -> bal -> resume."""

import json
import os

from balrog_ray.__main__ import main


def test_cli_synth_bal_resume(ray_session, tmp_path, capsys):
    import ray

    tiles = str(tmp_path / "tiles")
    out = str(tmp_path / "bal")
    assert main(["synth", "--out", tiles, "--tiles-x", "3", "--tiles-y", "3",
                 "--tile-px", "32"]) == 0
    assert json.loads(capsys.readouterr().out.strip())["rows"] == 18

    assert main(["bal", "--tiles", tiles, "--out", out]) == 0
    r1 = json.loads(capsys.readouterr().out.strip())
    assert r1["cells_done"] == 9 and r1["grid"] == "3x3x32px"
    # the CLI must not shut down a Ray session it did not start
    assert ray.is_initialized()

    # resume: drop one committed cell, only it is recomputed
    os.remove(os.path.join(out, "cell=4", "bands.parquet"))
    assert main(["bal", "--tiles", tiles, "--out", out, "--resume"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip())
    assert r2["cells_done"] == 1 and r2["cells_skipped_resume"] == 8


def test_cli_ingest_roundtrip(ray_session, tmp_path):
    """ingest: URL manifest -> clustered image table -> bal runs on it."""
    import json as _json

    import pyarrow as pa

    from balrog_ray.__main__ import main
    from balrog_ray.sources import write_url_bundles
    from balrog_ray.tiles.synth import SynthConfig, tiles_table

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32, pixel_size=25.0)
    tab = tiles_table(cfg)
    urls = write_url_bundles(tab, str(tmp_path / "bundles"),
                             tiles_per_zip=3)
    manifest = tmp_path / "urls.txt"
    manifest.write_text("\n".join(urls) + "\n")
    out = tmp_path / "ingested"
    rc = main(["ingest", "--urls", str(manifest), "--out", str(out),
               "--cluster", "--num-cpus", "4"])
    assert rc == 0

    import pyarrow.dataset as pads
    t = pads.dataset(str(out), format="parquet").to_table()
    assert t.num_rows == tab.num_rows
    assert "hilbert_key" in t.column_names

    bal_out = tmp_path / "bal"
    rc = main(["bal", "--tiles", str(out), "--out", str(bal_out),
               "--num-cpus", "4"])
    assert rc == 0


def test_cli_pyramid(ray_session, tmp_path, capsys):
    import json

    from balrog_ray.__main__ import main

    tiles = str(tmp_path / "tiles")
    assert main(["synth", "--out", tiles, "--tiles-x", "4", "--tiles-y",
                 "4", "--tile-px", "32", "--num-cpus", "4"]) == 0
    capsys.readouterr()
    out = str(tmp_path / "pyr")
    assert main(["pyramid", "--tiles", tiles, "--out", out,
                 "--levels", "3", "--num-cpus", "4"]) == 0
    r = json.loads(capsys.readouterr().out.strip())
    # 4x4 -> 2x2 -> 1x1: the build stops once a level is a single tile
    assert [lv["grid"] for lv in r["levels"]] == ["2x2x32px", "1x1x32px"]
    import pyarrow.dataset as pads
    assert pads.dataset(out + "/level=1",
                        format="parquet").to_table().num_rows == 8


def test_cli_derive(ray_session, tmp_path, capsys):
    import json as _json

    tiles = str(tmp_path / "tiles")
    assert main(["synth", "--out", tiles, "--tiles-x", "3", "--tiles-y",
                 "2", "--tile-px", "32"]) == 0
    capsys.readouterr()
    for op, n_expect in (("sobel", 6), ("watershed", 6)):
        out = str(tmp_path / f"d_{op}")
        assert main(["derive", "--tiles", tiles, "--out", out,
                     "--op", op]) == 0
        r = _json.loads(capsys.readouterr().out.strip())
        assert r["op"] == op and r["tiles"] == n_expect


def test_cli_scrub(ray_session, tmp_path, capsys):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from balrog_ray.__main__ import main

    docs = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["mail a@b.co now", "ip 10.1.2.3", "clean"],
                         pa.string())}), docs)
    out = tmp_path / "clean"
    assert main(["scrub", "--docs", str(docs), "--out", str(out)]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (rep["docs"], rep["n_email"], rep["n_ip"]) == (3, 1, 1)
    got = {r["doc_id"]: r["clean"]
           for r in pq.read_table(out).to_pylist()}
    assert got == {1: "mail <EMAIL> now", 2: "ip <IP>", 3: "clean"}
