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
