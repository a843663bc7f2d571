"""D8 flow direction + global flow accumulation vs whole-raster oracles:
a scalar per-pixel loop pins d8_kernel, a step-the-water simulation pins
accumulate_kernel, and the tiled distributed stages must match the
whole-raster kernels pixel-exactly across tile seams (the accumulation
path exercises the border-entry propagation loop)."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.halo import GridSpec
from balrog_ray.stages.hydrology import (D8_CODES, accumulate_kernel,
                                         d8_kernel, flow_accumulation,
                                         flow_direction, strahler_kernel,
                                         stream_order, watershed)
from balrog_ray.tiles.codec import Caption, decode_tile, encode_tile, phash64
from balrog_ray.tiles.synth import TILES_SCHEMA, SynthConfig

ND = -99.0

_NB = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def _d8_scalar(a: np.ndarray, nd: float) -> np.ndarray:
    """Per-pixel loop reference for d8_kernel."""
    H, W = a.shape
    out = np.full((H, W), -1, np.int8)
    for r in range(H):
        for c in range(W):
            if a[r, c] == np.float32(nd):
                out[r, c] = -2
                continue
            best, bk = 0.0, -1
            for k, (dy, dx) in enumerate(_NB):
                r2, c2 = r + dy, c + dx
                if not (0 <= r2 < H and 0 <= c2 < W):
                    continue
                if a[r2, c2] == np.float32(nd):
                    continue
                dist = np.sqrt(2.0) if dy and dx else 1.0
                drop = (float(a[r, c]) - float(a[r2, c2])) / dist
                if drop > best:
                    best, bk = drop, k
            out[r, c] = bk
    return out


def _acc_simulate(dirs: np.ndarray) -> np.ndarray:
    """Step-the-water reference for accumulate_kernel: one unit of water
    per valid pixel, moved one hop at a time; a pixel's accumulation is
    every arrival."""
    H, W = dirs.shape
    acc = np.zeros((H, W), np.int64)
    cur = (dirs != -2).astype(np.int64)
    while cur.any():
        nxt = np.zeros_like(cur)
        for k, (dy, dx) in enumerate(_NB):
            m = (dirs == k) & (cur > 0)
            if m.any():
                src = np.argwhere(m)
                for r, c in src:
                    nxt[r + dy, c + dx] += cur[r, c]
        acc += nxt
        cur = nxt
    acc[dirs == -2] = -1
    return acc


def _bumpy_dem(shape, seed, nodata_frac=0.03) -> np.ndarray:
    """Random smoothed terrain in [0, 100) with nodata holes: varied
    drainage with basins, ridges and cross-tile paths."""
    rng = np.random.default_rng(seed)
    a = rng.random(shape)
    for _ in range(3):                       # box blur
        a = (a + np.roll(a, 1, 0) + np.roll(a, -1, 0)
             + np.roll(a, 1, 1) + np.roll(a, -1, 1)) / 5.0
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]]
    a = a * 60 + 0.05 * xx + 0.08 * yy       # tilt so water crosses tiles
    a = a.astype(np.float32)
    a[rng.random(shape) < nodata_frac] = ND
    return a


def _tiles_from_array(arr: np.ndarray, cfg, layer="dem") -> pa.Table:
    T = cfg.tile_px
    rows = {n: [] for n in TILES_SCHEMA.names}
    for ty in range(cfg.tiles_y):
        for tx in range(cfg.tiles_x):
            core = np.ascontiguousarray(
                arr[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T])
            cap = Caption(layer=layer, x0=tx * T * cfg.pixel_size,
                          y0=cfg.y_north - ty * T * cfg.pixel_size,
                          pixel_size=cfg.pixel_size, nodata=ND,
                          tx=tx, ty=ty,
                          edge={"n": ty == 0, "s": ty == cfg.tiles_y - 1,
                                "w": tx == 0, "e": tx == cfg.tiles_x - 1})
            payload, cap = encode_tile(core, "npz", cap)
            rows["image_id"].append(f"{layer}/{tx}/{ty}")
            rows["bytes"].append(payload)
            rows["w"].append(np.int32(T))
            rows["h"].append(np.int32(T))
            rows["fmt"].append("npz")
            rows["caption"].append(cap.to_json())
            rows["phash"].append(np.int64(phash64(core)))
    return pa.table(rows, schema=TILES_SCHEMA)


def _mosaic(tab, layer, cfg):
    T = cfg.tile_px
    out = np.full((cfg.tiles_y * T, cfg.tiles_x * T), np.float32(ND),
                  np.float32)
    for i in range(tab.num_rows):
        cap = Caption.from_json(tab.column("caption")[i].as_py())
        if cap.layer != layer:
            continue
        arr = decode_tile(tab.column("bytes")[i].as_py(),
                          tab.column("fmt")[i].as_py(), cap)
        out[cap.ty * T:(cap.ty + 1) * T, cap.tx * T:(cap.tx + 1) * T] = arr
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_d8_kernel_matches_scalar_loop(seed):
    a = _bumpy_dem((13, 17), seed, nodata_frac=0.08)
    assert np.array_equal(d8_kernel(a, ND), _d8_scalar(a, ND))


def test_accumulate_kernel_matches_simulation():
    a = _bumpy_dem((16, 16), 7)
    dirs = d8_kernel(a, ND)
    assert np.array_equal(accumulate_kernel(dirs), _acc_simulate(dirs))


def test_accumulate_kernel_ramp():
    # single west-east descending row: everything drains east
    a = np.array([[3.0, 2.0, 1.0, 0.0]], np.float32)
    dirs = d8_kernel(a, ND)
    assert np.array_equal(dirs, [[0, 0, 0, -1]])     # E,E,E,pit
    assert np.array_equal(accumulate_kernel(dirs), [[0, 1, 2, 3]])


def test_accumulate_kernel_rejects_cycle():
    dirs = np.array([[0, 4]], np.int8)               # a->b, b->a
    with pytest.raises(ValueError, match="cycle"):
        accumulate_kernel(dirs)


@pytest.mark.parametrize("seed", [3, 4])
def test_tiled_flow_direction_matches_whole_raster(ray_session, seed):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((cfg.tiles_y * cfg.tile_px, cfg.tiles_x * cfg.tile_px),
                     seed)
    out = flow_direction(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        GridSpec.from_synth(cfg)).materialize()
    import ray

    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "d8", cfg)
    d = d8_kernel(arr, ND)
    want = np.zeros_like(arr)
    want[d >= 0] = D8_CODES[d[d >= 0]].astype(np.float32)
    want[d == -2] = np.float32(ND)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("seed,tx,ty,T", [(5, 3, 2, 16), (6, 4, 4, 8)])
def test_tiled_flow_accumulation_matches_whole_raster(
        ray_session, seed, tx, ty, T):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=tx, tiles_y=ty, tile_px=T)
    arr = _bumpy_dem((ty * T, tx * T), seed)
    out = flow_accumulation(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        GridSpec.from_synth(cfg)).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "flow_acc", cfg)
    d = d8_kernel(arr, ND)
    acc = accumulate_kernel(d)
    want = acc.astype(np.float32)
    want[d == -2] = np.float32(ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ; "
        f"max |diff| {np.abs(got - want).max()}")
    # drainage actually crossed tile borders on this input
    assert acc.max() > T, "test DEM produced no cross-tile drainage"


def _watershed_oracle(arr: np.ndarray, nd: float) -> np.ndarray:
    """Whole-raster basin labels: follow each valid pixel's D8 path to
    its pit by pointer doubling; label = pit's global flat index."""
    d = d8_kernel(arr, nd)
    H, W = d.shape
    idx = np.arange(H * W, dtype=np.int64)
    r, c = np.divmod(idx, W)
    dv = d.ravel()
    flows = dv >= 0
    tr = r + np.where(flows, _DY_T[np.clip(dv, 0, 7)], 0)
    tc = c + np.where(flows, _DX_T[np.clip(dv, 0, 7)], 0)
    ptr = np.where(flows, tr * W + tc, idx)
    while True:
        nxt = ptr[ptr]
        if np.array_equal(nxt, ptr):
            break
        ptr = nxt
    out = ptr.astype(np.float32)
    out[dv == -2] = np.float32(nd)
    return out.reshape(H, W)


_DY_T = np.array([dy for dy, dx in _NB], np.int64)
_DX_T = np.array([dx for dy, dx in _NB], np.int64)


@pytest.mark.parametrize("seed,tx,ty,T", [(8, 3, 2, 16), (9, 4, 4, 8)])
def test_tiled_watershed_matches_whole_raster(ray_session, seed, tx, ty, T):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=tx, tiles_y=ty, tile_px=T)
    arr = _bumpy_dem((ty * T, tx * T), seed)
    out = watershed(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        GridSpec.from_synth(cfg)).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "watershed", cfg)
    want = _watershed_oracle(arr, ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")
    # basins actually span tile borders on this input: some pixel's pit
    # lives in a different tile than the pixel
    d = d8_kernel(arr, ND)
    pit_r, pit_c = np.divmod(want[d != -2].astype(np.int64), tx * T)
    own_r, own_c = np.nonzero(d != -2)
    crossed = ((pit_r // T != own_r // T) | (pit_c // T != own_c // T))
    assert crossed.any(), "test DEM produced no cross-tile basin"


def _strahler_scalar(dirs: np.ndarray) -> np.ndarray:
    """Resolve-when-children-done scalar reference for strahler_kernel."""
    H, W = dirs.shape
    children = {}
    for r in range(H):
        for c in range(W):
            d = dirs[r, c]
            if d >= 0:
                t = (r + _NB[d][0], c + _NB[d][1])
                children.setdefault(t, []).append((r, c))
    order = np.full((H, W), -1, np.int64)
    todo = {(r, c) for r in range(H) for c in range(W)
            if dirs[r, c] != -2}
    while todo:
        ready = [p for p in todo
                 if all(order[ch] >= 0 for ch in children.get(p, []))]
        assert ready, "cycle"
        for p in ready:
            os_ = [int(order[ch]) for ch in children.get(p, [])]
            if not os_:
                order[p] = 1
            else:
                m = max(os_)
                order[p] = m + (1 if os_.count(m) >= 2 else 0)
            todo.discard(p)
    return order


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_strahler_kernel_matches_scalar(seed):
    a = _bumpy_dem((13, 17), seed, nodata_frac=0.08)
    d = d8_kernel(a, ND)
    assert np.array_equal(strahler_kernel(d), _strahler_scalar(d))


def test_strahler_kernel_simple_confluence():
    # two order-1 streams meeting -> order 2 at the junction's target
    dirs = np.array([[2, -2, 2],      # S . S
                     [1, -2, 3],      # SE . SW
                     [-2, -1, -2]],   # . pit .
                    np.int8)
    got = strahler_kernel(dirs)
    assert got[2, 1] == 2             # pit receives two order-1 children
    assert got[1, 0] == 1 and got[1, 2] == 1


@pytest.mark.parametrize("seed,tx,ty,T", [(13, 3, 2, 16), (14, 4, 4, 8)])
def test_tiled_stream_order_matches_whole_raster(ray_session, seed,
                                                 tx, ty, T):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=tx, tiles_y=ty, tile_px=T)
    arr = _bumpy_dem((ty * T, tx * T), seed)
    out = stream_order(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        GridSpec.from_synth(cfg)).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "strahler", cfg)
    d = d8_kernel(arr, ND)
    so = strahler_kernel(d)
    want = so.astype(np.float32)
    want[d == -2] = np.float32(ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ")
    assert so.max() >= 3, "test DEM produced a trivially shallow network"


def test_flow_accumulation_validation():
    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    with pytest.raises(ValueError):
        flow_accumulation(None, GridSpec(2, 2, 1, 25.0, spec.y_north))


from balrog_ray.stages.hydrology import flow_length, flow_length_kernel


def _flow_length_scalar(dirs, ps):
    """Step-the-path scalar reference for flow_length_kernel."""
    H, W = dirs.shape
    out = np.full((H, W), -1.0, np.float32)
    for r in range(H):
        for c in range(W):
            if dirs[r, c] == -2:
                continue
            a = b = 0
            rr, cc = r, c
            while dirs[rr, cc] >= 0:
                dy, dx = _NB[dirs[rr, cc]]
                r2, c2 = rr + dy, cc + dx
                if not (0 <= r2 < H and 0 <= c2 < W):
                    break
                if dy and dx:
                    b += 1
                else:
                    a += 1
                rr, cc = r2, c2
            out[r, c] = np.float32(a * ps + b * (np.sqrt(2.0) * ps))
    return out


@pytest.mark.parametrize("seed", [15, 16])
def test_flow_length_kernel_matches_scalar(seed):
    a = _bumpy_dem((13, 17), seed, nodata_frac=0.08)
    d = d8_kernel(a, ND)
    got = flow_length_kernel(d, 25.0)
    want = _flow_length_scalar(d, 25.0)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("seed,tx,ty,T", [(17, 3, 2, 16), (18, 4, 4, 8)])
def test_tiled_flow_length_matches_whole_raster(ray_session, seed,
                                                tx, ty, T):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=tx, tiles_y=ty, tile_px=T)
    arr = _bumpy_dem((ty * T, tx * T), seed)
    out = flow_length(
        ray.data.from_arrow(_tiles_from_array(arr, cfg)),
        GridSpec.from_synth(cfg)).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "flow_len", cfg)
    d = d8_kernel(arr, ND)
    want = flow_length_kernel(d, cfg.pixel_size)
    want[d == -2] = np.float32(ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ; "
        f"max |diff| {np.nanmax(np.abs(got - want))}")
    # some pixel's pit lies in a different tile: paths crossed borders
    ws = _watershed_oracle(arr, ND)
    pit_r, pit_c = np.divmod(ws[d != -2].astype(np.int64), tx * T)
    own_r, own_c = np.nonzero(d != -2)
    crossed = ((pit_r // T != own_r // T) | (pit_c // T != own_c // T))
    assert crossed.any(), "test DEM produced no cross-tile flow path"


def test_flow_accumulation_exact_hop_budget_converges(ray_session):
    """Regression for the for/else convergence check: when the FINAL
    permitted hop drains the front, the loop must report convergence
    (old code raised 'did not converge' despite having converged).
    Finds the minimal max_hops by search, asserts it succeeds with
    output identical to a generous run, and that one fewer raises."""
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=2, tile_px=16)
    arr = _bumpy_dem((2 * 16, 3 * 16), 5)
    tab = _tiles_from_array(arr, cfg)
    spec = GridSpec.from_synth(cfg)

    def run(max_hops):
        out = flow_accumulation(ray.data.from_arrow(tab), spec,
                                max_hops=max_hops).materialize()
        tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
                if t.num_rows]
        return _mosaic(pa.concat_tables(tabs), "flow_acc", cfg)

    want = run(256)
    lo = 1
    while True:
        try:
            got = run(lo)
            break
        except RuntimeError:
            lo += 1
            assert lo <= 64, "no minimal hop budget found"
    assert lo > 1, "drainage never crossed a tile boundary"
    assert np.array_equal(got, want)
    with pytest.raises(RuntimeError, match="did not converge"):
        run(lo - 1)
