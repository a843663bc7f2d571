"""Distributed Canny: the class kernel vs a per-pixel brute-force
oracle, 8-conn mask labeling vs BFS, whole-world pipeline parity
(hysteresis included), and a corner-diagonal-only connectivity case
that ONLY the corner exchange can resolve."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.canny import (ND, _CANNY_SCHEMA, _canny_keep_table,
                                     _hysteresis_rows, _label_mask8,
                                     canny_class_kernel, canny_edges,
                                     canny_kernel)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import NODATA, Caption, decode_tile
from balrog_ray.tiles.synth import SynthConfig, epoch_dem_window

CFG = SynthConfig(tiles_x=3, tiles_y=2, tile_px=32)
LOW, HIGH = 4.0, 12.0


def _brute_class(arr, nodata, low, high):
    a32 = np.asarray(arr, np.float32)
    H, W = a32.shape
    valid = a32 != np.float32(nodata)
    a = np.where(valid, a32.astype(np.float64), 0.0)
    mag = np.zeros((H, W))
    sec = np.zeros((H, W), int)
    gdef = np.zeros((H, W), bool)
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            if not valid[y - 1:y + 2, x - 1:x + 2].all():
                continue
            gdef[y, x] = True
            gx = ((a[y - 1, x + 1] + 2 * a[y, x + 1] + a[y + 1, x + 1])
                  - (a[y - 1, x - 1] + 2 * a[y, x - 1] + a[y + 1, x - 1]))
            gy = ((a[y + 1, x - 1] + 2 * a[y + 1, x] + a[y + 1, x + 1])
                  - (a[y - 1, x - 1] + 2 * a[y - 1, x] + a[y - 1, x + 1]))
            mag[y, x] = np.hypot(gx, gy)
            ang = np.mod(np.degrees(np.arctan2(gy, gx)), 180.0)
            sec[y, x] = (0 if ang < 22.5 or ang >= 157.5
                         else 1 if ang < 67.5
                         else 2 if ang < 112.5 else 3)
    offs = {0: ((0, 1), (0, -1)), 1: ((-1, 1), (1, -1)),
            2: ((-1, 0), (1, 0)), 3: ((-1, -1), (1, 1))}
    out = np.zeros((H, W), np.float32)
    for y in range(H):
        for x in range(W):
            if not valid[y, x]:
                out[y, x] = ND
                continue
            if not gdef[y, x] or mag[y, x] <= 0:
                continue
            n = []
            for dy, dx in offs[sec[y, x]]:
                yy, xx = y + dy, x + dx
                n.append(mag[yy, xx]
                         if 0 <= yy < H and 0 <= xx < W else 0.0)
            if mag[y, x] >= n[0] and mag[y, x] >= n[1]:
                if mag[y, x] >= high:
                    out[y, x] = 2.0
                elif mag[y, x] >= low:
                    out[y, x] = 1.0
    return out


def test_class_kernel_matches_brute_force():
    rng = np.random.default_rng(5)
    arr = rng.uniform(0, 50, (14, 13)).astype(np.float32)
    arr[rng.random((14, 13)) < 0.08] = NODATA
    got = canny_class_kernel(arr, NODATA, low=3.0, high=20.0)
    want = _brute_class(arr, NODATA, 3.0, 20.0)
    assert np.array_equal(got, want)
    assert (want == 1.0).any() and (want == 2.0).any()


def test_label_mask8_matches_bfs():
    rng = np.random.default_rng(9)
    mask = rng.random((20, 17)) < 0.35
    labels, n = _label_mask8(mask)
    # BFS reference
    want = np.full(mask.shape, -1, int)
    nxt = 0
    for y0 in range(mask.shape[0]):
        for x0 in range(mask.shape[1]):
            if mask[y0, x0] and want[y0, x0] < 0:
                stack = [(y0, x0)]
                want[y0, x0] = nxt
                while stack:
                    y, x = stack.pop()
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            yy, xx = y + dy, x + dx
                            if (0 <= yy < mask.shape[0]
                                    and 0 <= xx < mask.shape[1]
                                    and mask[yy, xx]
                                    and want[yy, xx] < 0):
                                want[yy, xx] = nxt
                                stack.append((yy, xx))
                nxt += 1
    assert n == nxt
    assert (labels >= 0).sum() == (want >= 0).sum()
    # same partition: label pairs must biject
    seen = {}
    for g, w in zip(labels[mask], want[mask]):
        assert seen.setdefault(int(g), int(w)) == int(w)


def test_pipeline_matches_whole_world(ray_session):
    import ray.data

    from tests.test_filters import _tiles_from_array

    wr, wc = CFG.world_px
    world = epoch_dem_window(CFG, 1, 0, 0, wr, wc).astype(np.float32)
    # recode the synth epoch nodata to the filters helper's ND constant
    from tests.test_filters import ND as TILE_ND

    world = np.where(world == np.float32(NODATA), np.float32(TILE_ND),
                     world)
    ds = ray.data.from_arrow(_tiles_from_array(world, CFG))
    spec = GridSpec.from_synth(CFG)
    out = canny_edges(ds, spec, low=LOW, high=HIGH)

    want = canny_kernel(world, TILE_ND, low=LOW, high=HIGH)
    cls = canny_class_kernel(world, TILE_ND, low=LOW, high=HIGH)
    # the case is only interesting if hysteresis does real work
    kept_weak = int(((want == 1.0) & (cls == 1.0)).sum())
    dropped_weak = int(((want == 0.0) & (cls == 1.0)).sum())
    assert kept_weak > 0 and dropped_weak > 0

    got = np.full((wr, wc), np.nan, np.float32)
    n = 0
    for row in out.take_all():
        cap = Caption.from_json(row["caption"])
        assert cap.layer == "canny"
        tile = decode_tile(row["bytes"], row["fmt"], cap)
        T = CFG.tile_px
        got[cap.ty * T:(cap.ty + 1) * T,
            cap.tx * T:(cap.tx + 1) * T] = tile
        n += 1
    assert n == CFG.tiles_x * CFG.tiles_y
    assert np.array_equal(got, want)


def test_corner_diagonal_hysteresis(ray_session):
    """A weak pixel whose ONLY path to a strong pixel is the diagonal
    across a 4-tile corner point -- missed by every line exchange."""
    import ray.data

    spec = GridSpec(2, 2, 32, 25.0, 0.0)
    T = 32
    tiles = {}
    for ty in range(2):
        for tx in range(2):
            tiles[(tx, ty)] = np.zeros((T, T), np.float32)
    tiles[(0, 0)][T - 1, T - 1] = 1.0      # weak at SE corner
    tiles[(0, 0)][0, 0] = 1.0              # isolated weak control
    tiles[(1, 1)][0, 0] = 2.0              # strong at NW corner
    # line-adjacent border pixels stay 0, so only the corner connects
    out = {n: [] for n in _CANNY_SCHEMA.names}
    for (tx, ty), cls in tiles.items():
        rows = _hysteresis_rows(cls, spec, tx, ty)
        for n in _CANNY_SCHEMA.names:
            out[n].extend(rows[n])
    combined = ray.data.from_arrow(pa.table(out, schema=_CANNY_SCHEMA))
    kept = _canny_keep_table(combined, spec).take_all()
    kept_cells = {r["cell"] for r in kept}
    assert 0 in kept_cells and 3 in kept_cells
    # exactly one weak fragment of tile (0,0) survives: the corner one
    from balrog_ray.stages.polygonize import _LABEL_BITS

    cell0 = [r["gid"] - (0 << _LABEL_BITS) for r in kept
             if r["cell"] == 0]
    labels, _ = _label_mask8(tiles[(0, 0)] >= 1.0)
    assert set(cell0) == {int(labels[T - 1, T - 1])}
    assert int(labels[0, 0]) not in cell0
