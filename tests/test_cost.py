"""Cost distance vs exact oracles: a heapq Dijkstra pins
cost_relax_kernel (same edge-weight fold order), and the tiled
distributed stage must be BIT-identical to the whole-raster kernel --
the module's float64 fixed-fold contract, exercised across tile seams
and multi-tile border iterations."""

import heapq

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.stages.cost import (_half_steps, cost_distance,
                                    cost_relax_kernel)
from balrog_ray.stages.halo import GridSpec
from balrog_ray.tiles.codec import Caption, decode_tile, encode_tile, phash64
from balrog_ray.tiles.synth import TILES_SCHEMA, SynthConfig

ND = -99.0

_NB = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1)]


def _dijkstra(cost: np.ndarray, srcmask: np.ndarray, nd: float,
              pixel_size: float = 1.0) -> np.ndarray:
    """Scalar shortest-path reference with the SAME edge fold order as
    the kernel: (d[u] + c[u]*halfL) + c[v]*halfL."""
    H, W = cost.shape
    half = _half_steps(pixel_size)
    valid = cost != np.float32(nd)
    c = cost.astype(np.float64)
    dist = np.full((H, W), np.inf)
    heap = []
    for r, co in zip(*np.nonzero(srcmask & valid)):
        dist[r, co] = 0.0
        heapq.heappush(heap, (0.0, int(r), int(co)))
    while heap:
        d, r, co = heapq.heappop(heap)
        if d > dist[r, co]:
            continue
        for k, (dy, dx) in enumerate(_NB):
            r2, c2 = r + dy, co + dx
            if not (0 <= r2 < H and 0 <= c2 < W) or not valid[r2, c2]:
                continue
            ndist = (d + c[r, co] * half[k]) + c[r2, c2] * half[k]
            if ndist < dist[r2, c2]:
                dist[r2, c2] = ndist
                heapq.heappush(heap, (ndist, r2, c2))
    dist[~valid] = np.inf
    return dist


def _cost_world(shape, seed, nodata_frac=0.05):
    rng = np.random.default_rng(seed)
    cost = (0.5 + 1.5 * rng.random(shape)).astype(np.float32)
    cost[rng.random(shape) < nodata_frac] = ND
    src = np.zeros(shape, dtype=bool)
    n_src = max(2, shape[0] * shape[1] // 200)
    rr = rng.integers(0, shape[0], n_src)
    cc = rng.integers(0, shape[1], n_src)
    src[rr, cc] = True
    src &= cost != np.float32(ND)
    return cost, src


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_relax_kernel_matches_dijkstra(seed):
    cost, src = _cost_world((14, 18), seed)
    seed_grid = np.where(src, 0.0, np.inf)
    got = cost_relax_kernel(cost, seed_grid, ND, pixel_size=2.5)
    want = _dijkstra(cost, src, ND, pixel_size=2.5)
    assert np.array_equal(got, want)


def _tiles_from_arrays(named_arrays, cfg) -> pa.Table:
    T = cfg.tile_px
    rows = {n: [] for n in TILES_SCHEMA.names}
    for layer, arr in named_arrays.items():
        for ty in range(cfg.tiles_y):
            for tx in range(cfg.tiles_x):
                core = np.ascontiguousarray(
                    arr[ty * T:(ty + 1) * T,
                        tx * T:(tx + 1) * T].astype(np.float32))
                cap = Caption(layer=layer, x0=tx * T * cfg.pixel_size,
                              y0=cfg.y_north - ty * T * cfg.pixel_size,
                              pixel_size=cfg.pixel_size, nodata=ND,
                              tx=tx, ty=ty,
                              edge={"n": ty == 0,
                                    "s": ty == cfg.tiles_y - 1,
                                    "w": tx == 0,
                                    "e": tx == cfg.tiles_x - 1})
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


@pytest.mark.parametrize("seed,tx,ty,T", [(3, 3, 2, 16), (4, 3, 3, 8)])
def test_tiled_cost_distance_matches_whole_raster(ray_session, seed,
                                                  tx, ty, T):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=tx, tiles_y=ty, tile_px=T)
    cost, src = _cost_world((ty * T, tx * T), seed)
    # sources only in the top-left tile: every other tile's distances
    # MUST arrive through border offers (multi-hop for far tiles)
    src[T:, :] = False
    src[:, T:] = False
    for r, c in ((1, 1), (T // 2, T // 2)):       # deterministic seeds
        if cost[r, c] != np.float32(ND):
            src[r, c] = True
    assert src.any()
    tiles = _tiles_from_arrays(
        {"cost": cost, "srcmask": src.astype(np.float32)}, cfg)
    spec = GridSpec.from_synth(cfg)
    out = cost_distance(ray.data.from_arrow(tiles), spec,
                        cost_layer="cost", src_layer="srcmask",
                        src_value=1.0).materialize()
    tabs = [t for t in (ray.get(r) for r in out.to_arrow_refs())
            if t.num_rows]
    got = _mosaic(pa.concat_tables(tabs), "cost_dist", cfg)
    dist = cost_relax_kernel(cost, np.where(src, 0.0, np.inf), ND,
                             pixel_size=cfg.pixel_size)
    want = dist.astype(np.float32)
    want[~np.isfinite(dist)] = np.float32(ND)
    want[cost == np.float32(ND)] = np.float32(ND)
    assert np.array_equal(got, want), (
        f"{int((got != want).sum())} px differ; "
        f"max |diff| {np.nanmax(np.abs(got - want))}")
    # far tiles actually got reached (cross-tile propagation happened)
    far = got[-T:, -T:]
    assert (far != np.float32(ND)).any(), "far tile never reached"


def test_cost_distance_validation():
    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=16)
    spec = GridSpec.from_synth(cfg)
    with pytest.raises(ValueError):
        cost_distance(None, GridSpec(2, 2, 1, 25.0, spec.y_north),
                      src_value=1.0)


from balrog_ray.stages.cost import _DX8, _DY8, cost_path


def _path_oracle(cost, src, nd, dests, pixel_size):
    """Whole-raster gradient walk with the stage's exact fold and
    k-order tie-break."""
    dist = cost_relax_kernel(cost, np.where(src, 0.0, np.inf), nd,
                             pixel_size=pixel_size)
    H, W = cost.shape
    valid = cost != np.float32(nd)
    c = np.where(valid, cost.astype(np.float64), np.inf)
    half = _half_steps(pixel_size)
    rows = []
    for dest_id, r0, c0 in dests:
        r, col = r0, c0
        step = 0
        if not np.isfinite(dist[r, col]):
            continue
        while True:
            rows.append((dest_id, step, r, col, float(dist[r, col])))
            if dist[r, col] == 0.0:
                break
            nk = -1
            for k in range(8):
                r2, c2 = r + int(_DY8[k]), col + int(_DX8[k])
                if not (0 <= r2 < H and 0 <= c2 < W):
                    continue
                f = ((dist[r2, c2] + c[r2, c2] * half[k])
                     + c[r, col] * half[k])
                if f == dist[r, col]:
                    nk = k
                    break
            assert nk >= 0, "oracle: no predecessor"
            r, col = r + int(_DY8[nk]), col + int(_DX8[nk])
            step += 1
    return sorted(rows)


@pytest.mark.parametrize("seed,tx,ty,T", [(5, 3, 2, 16), (6, 3, 3, 8)])
def test_cost_path_matches_oracle(ray_session, seed, tx, ty, T):
    import ray
    import ray.data

    cfg = SynthConfig(tiles_x=tx, tiles_y=ty, tile_px=T)
    cost, src = _cost_world((ty * T, tx * T), seed)
    src[T:, :] = False          # sources only in the top-left tile:
    src[:, T:] = False          # paths from far dests must cross tiles
    for r, c in ((1, 1), (T // 2, T // 2)):
        if cost[r, c] != np.float32(ND):
            src[r, c] = True
    dests = [(0, ty * T - 2, tx * T - 2), (1, 1, tx * T - 1),
             (2, ty * T - 1, 2)]
    tiles = _tiles_from_arrays(
        {"cost": cost, "srcmask": src.astype(np.float32)}, cfg)
    spec = GridSpec.from_synth(cfg)
    got = sorted(
        (int(r["dest_id"]), int(r["step"]), int(r["row"]),
         int(r["col"]), float(r["dist"]))
        for r in cost_path(ray.data.from_arrow(tiles), spec, dests,
                           cost_layer="cost", src_layer="srcmask",
                           src_value=1.0).take_all())
    want = _path_oracle(cost, src, ND, dests, cfg.pixel_size)
    assert got == want
    # the walk really crossed tiles and really reached sources
    reached = {d for d, s, r, c, dv in got if dv == 0.0}
    walked = {d for d, *_ in got}
    assert reached == walked and walked, "no path reached a source"
    tiles_touched = {(r // T, c // T) for _, _, r, c, _ in got}
    assert len(tiles_touched) > 1, "no path crossed a tile border"


from balrog_ray.stages.cost import _half_steps  # noqa: E402  (oracle use)
