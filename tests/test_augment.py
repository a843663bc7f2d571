"""augment_images: bit-exact replay of the deterministic draw, run-to-run
stability, crop bounds, and that the epoch axis actually varies."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.augment import _draw, apply_d4, augment_images
from balrog_ray.tiles.codec import Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, tiles_table


def _decode_all(rows):
    out = {}
    for r in rows:
        cap = Caption.from_json(r["caption"])
        out[r["image_id"]] = decode_tile(r["bytes"], r["fmt"], cap)
    return out


def test_augment_matches_direct_replay(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    tab = tiles_table(cfg, layers=("dem",))
    rows = augment_images(ray.data.from_arrow(tab), epoch=3).take_all()
    assert len(rows) == tab.num_rows
    got = _decode_all(rows)

    for i in range(tab.num_rows):
        img_id = tab.column("image_id")[i].as_py()
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        src = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        k = _draw(img_id, 3, 0) % 8
        want = apply_d4(src, k)
        key = f"{img_id}@e3t{k}"
        assert key in got
        assert np.array_equal(got[key], want)

    # run-to-run determinism (block order independent)
    rows2 = augment_images(
        ray.data.from_arrow(tab).repartition(4), epoch=3).take_all()
    got2 = _decode_all(rows2)
    assert set(got2) == set(got)
    assert all(np.array_equal(got2[k], got[k]) for k in got)

    # a different epoch draws different transforms for at least one tile
    rows4 = augment_images(ray.data.from_arrow(tab), epoch=4).take_all()
    assert {r["image_id"].split("@")[0] for r in rows4} \
        == {r["image_id"].split("@")[0] for r in rows}
    assert {r["image_id"] for r in rows4} != {r["image_id"] for r in rows}


def test_augment_crop(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=2, tiles_y=1, tile_px=32)
    tab = tiles_table(cfg, layers=("dem",))
    rows = augment_images(ray.data.from_arrow(tab), epoch=0,
                          crop_px=16).take_all()
    for r in rows:
        assert (r["w"], r["h"]) == (16, 16)
        img_id, cap = r["image_id"].split("@")[0], None
        i = tab.column("image_id").to_pylist().index(img_id)
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        src = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        rnd = _draw(img_id, 0, 0)
        a = apply_d4(src, rnd % 8)
        r0 = (rnd >> 8) % (a.shape[0] - 16 + 1)
        c0 = (rnd >> 32) % (a.shape[1] - 16 + 1)
        want = a[r0:r0 + 16, c0:c0 + 16]
        have = decode_tile(r["bytes"], r["fmt"],
                           Caption.from_json(r["caption"]))
        assert np.array_equal(have, want)

    with pytest.raises(Exception):
        augment_images(ray.data.from_arrow(tab), epoch=0,
                       crop_px=64).take_all()
