"""Distributed sieve filter: remove connected regions smaller than a
pixel threshold from a categorical raster, merging each into its largest
neighbour (``gdal_sieve``'s role -- the raster-cleanup step GDAL applies
before polygonize; the reference's vector-side analogue is dropping
sliver polygons in ``03_explode_multipolygons_and_classify.sql``).

Semantics (deterministic, documented where GDAL leaves order undefined):

* regions are 4-connected components of equal value (nodata excluded),
  labeled globally across tile boundaries;
* iteratively, the smallest region below ``min_px`` (ties: lowest
  anchor = min row-major pixel index, a tiling-independent identity)
  merges into its largest neighbour by current size (ties: lowest
  anchor), taking the neighbour's value; sizes, anchors and adjacency
  contract as merges proceed -- including re-forming components when a
  rewrite makes two same-value regions touch -- so chains of slivers
  resolve exactly as a pixel-level rewrite-and-relabel loop would;
* a small region with no neighbour (islanded by nodata / raster edge)
  survives; nodata pixels are never rewritten.

Scale shape: the pixel-scale work is two ``map_batches`` passes (label +
rewrite) and the shared border-strip shuffle; everything in between
operates on the REGION graph, which is orders of magnitude smaller than
the raster for categorical layers.  Under ``max_regions`` the merge loop
runs driver-side over that bounded graph (the same bounded-
materialization contract as the lineage tables); past it,
``_sieve_merge_distributed`` contracts the graph per CONNECTED COMPONENT
-- merges never cross components, so the sequential loop runs
independently inside ``map_groups`` with byte-identical results -- and
only the (changed-region -> new value) map reaches the driver for the
``ray.put`` rewrite broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .halo import GridSpec
from .polygonize import _LABEL_BITS, _label_tile

_SIEVE_SCHEMA = pa.schema([
    ("kind", pa.int8()),         # 0 region partial, 1 border strip, 2 adj
    ("gid", pa.int64()), ("value", pa.float64()), ("n_px", pa.int64()),
    ("anchor", pa.int64()),
    ("edge_id", pa.int64()), ("side", pa.int8()),
    ("vals", pa.binary()), ("gids", pa.binary()),
    ("id_b", pa.int64())])


def _tile_regions(arr: np.ndarray, nodata: float, base: np.int64,
                  row0: int, col0: int, world_w: int):
    """Label one tile; return (labels, packed gid per label, value per
    label, count per label, min-global-pixel anchor per label, unique
    within-tile adjacency gid pairs).  The anchor (row-major flat index
    over the WHOLE raster) is the tiling-independent identity every
    ordering decision uses."""
    labels, n_lab = _label_tile(arr, nodata)
    if n_lab == 0:
        z = np.empty(0, np.int64)
        return (labels, z, np.empty(0, np.float64), z.copy(), z.copy(),
                z.reshape(0, 2))
    flat = labels.ravel()
    sel = flat >= 0
    lab = flat[sel].astype(np.int64)
    counts = np.bincount(lab, minlength=n_lab)
    vals = np.zeros(n_lab, np.float64)
    vals[lab] = arr.ravel()[sel]
    h, w = arr.shape
    gpix = ((np.repeat(np.arange(h, dtype=np.int64), w) + row0) * world_w
            + np.tile(np.arange(w, dtype=np.int64), h) + col0)[sel]
    anchor = np.full(n_lab, np.iinfo(np.int64).max)
    np.minimum.at(anchor, lab, gpix)
    gid2d = np.where(labels >= 0, base + labels.astype(np.int64),
                     np.int64(-1))
    # within-tile adjacency between DIFFERENT regions (differing labels
    # imply differing values after same-value merging)
    pairs = []
    for a, b in ((gid2d[:, :-1], gid2d[:, 1:]),
                 (gid2d[:-1, :], gid2d[1:, :])):
        m = (a >= 0) & (b >= 0) & (a != b)
        if m.any():
            pairs.append(np.stack([a[m], b[m]], axis=1))
    adj = (np.unique(np.concatenate(pairs), axis=0)
           if pairs else np.empty((0, 2), np.int64))
    gids = base + np.arange(n_lab, dtype=np.int64)
    return labels, gids, vals, counts.astype(np.int64), anchor, adj


def _fragment_graph(ds, spec: GridSpec, layer: str):
    """Shared front half of sieve / region_group: label every tile's
    4-connected same-value fragments and resolve cross-tile pixel
    adjacencies.  Returns ``(combined, cross)`` -- the materialized
    fragment table (kind 0 partials, kind 2 within-tile adjacency) and
    the cross-tile edge table (ek 0 same-value merge, ek 1
    different-value adjacency)."""
    if spec.tile_px * spec.tile_px >= (1 << _LABEL_BITS):
        raise ValueError("tile_px packs more labels than _LABEL_BITS")
    T = spec.tile_px
    tiles_x, tiles_y = spec.tiles_x, spec.tiles_y

    def label_stage(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption, decode_tile

        out = {n: [] for n in _SIEVE_SCHEMA.names}

        def row(**kw):
            for n in _SIEVE_SCHEMA.names:
                out[n].append(kw.get(n))

        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            tx, ty = cap.tx, cap.ty
            cell = spec.cell_id(tx, ty)
            base = np.int64(cell) << _LABEL_BITS
            labels, gids, vals, counts, anchor, adj = _tile_regions(
                arr, float(cap.nodata), base,
                ty * T, tx * T, tiles_x * T)
            for j in range(len(gids)):
                row(kind=0, gid=int(gids[j]), value=float(vals[j]),
                    n_px=int(counts[j]), anchor=int(anchor[j]))
            for a, b_ in adj:
                row(kind=2, gid=int(a), id_b=int(b_))
            gid2d = np.where(labels >= 0,
                             base + labels.astype(np.int64), np.int64(-1))
            for vline, gline, eid, ok, side in (
                (arr[:, -1], gid2d[:, -1],
                 np.int64(cell) * 2, tx + 1 < tiles_x, 0),
                (arr[:, 0], gid2d[:, 0],
                 np.int64(spec.cell_id(tx - 1, ty)) * 2, tx > 0, 1),
                (arr[-1, :], gid2d[-1, :],
                 np.int64(cell) * 2 + 1, ty + 1 < tiles_y, 0),
                (arr[0, :], gid2d[0, :],
                 np.int64(spec.cell_id(tx, ty - 1)) * 2 + 1, ty > 0, 1),
            ):
                if not ok:
                    continue
                row(kind=1, edge_id=int(eid), side=side,
                    vals=np.ascontiguousarray(
                        vline, dtype=np.float32).tobytes(),
                    gids=np.ascontiguousarray(gline).tobytes())
        return pa.table(out, schema=_SIEVE_SCHEMA)

    combined = (ds.map_batches(label_stage,
                               batch_format="pyarrow").materialize())

    def cross_edges(group: pa.Table) -> pa.Table:
        """Cross-tile pixel adjacencies: same-value -> merge edge
        (kind 0 in the output), different-value -> adjacency (kind 1)."""
        empty = pa.table({"ek": pa.array([], pa.int8()),
                          "id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if group.num_rows != 2:
            return empty
        side = group.column("side").to_pylist()
        a, b_ = (0, 1) if side[0] == 0 else (1, 0)
        va = np.frombuffer(group.column("vals")[a].as_py(), np.float32)
        vb = np.frombuffer(group.column("vals")[b_].as_py(), np.float32)
        ga = np.frombuffer(group.column("gids")[a].as_py(), np.int64)
        gb = np.frombuffer(group.column("gids")[b_].as_py(), np.int64)
        both = (ga >= 0) & (gb >= 0)
        out_k, out_a, out_b = [], [], []
        for ek, m in ((0, both & (va == vb)), (1, both & (va != vb))):
            if m.any():
                pairs = np.unique(np.stack([ga[m], gb[m]], axis=1), axis=0)
                out_k.append(np.full(len(pairs), ek, np.int8))
                out_a.append(pairs[:, 0])
                out_b.append(pairs[:, 1])
        if not out_k:
            return empty
        return pa.table({
            "ek": pa.array(np.concatenate(out_k), pa.int8()),
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64())})

    cross = (combined.filter(expr="kind == 1")
             .select_columns(["edge_id", "side", "vals", "gids"])
             .groupby("edge_id")
             .map_groups(cross_edges, batch_format="pyarrow")
             .materialize())
    return combined, cross


def _canon_join(src, key_col: str, mapping, n_parts: int):
    """left-join ``src[key_col]`` against the components mapping and
    coalesce misses to identity, into a ``canon`` column."""
    import pyarrow.compute as pc2

    j = src.join(mapping, "left_outer", num_partitions=n_parts,
                 on=(key_col,), right_on=("doc_id",))

    def fold(b: pa.Table) -> pa.Table:
        canon = pc2.coalesce(b.column("component_id"),
                             b.column(key_col)).cast(pa.int64())
        b = b.drop_columns([c for c in ("doc_id", "component_id")
                            if c in b.column_names])
        return b.append_column("canon", canon)

    return j.map_batches(fold, batch_format="pyarrow")


def sieve(ds, spec: GridSpec, *, layer: str, min_px: int,
          fmt: str = "npz", max_regions: int = 5_000_000,
          max_component_regions: int = 5_000_000):
    """Image-table Dataset -> image-table Dataset (layer
    ``sieve_<layer>``) with sub-threshold regions dissolved into their
    largest neighbours.  Exact whole-raster parity is asserted in
    tests/test_sieve.py.

    ``max_regions`` bounds the driver-side merge loop: the raw region
    count is measured DISTRIBUTED first, and past the bound the merge
    switches to :func:`_sieve_merge_distributed` -- per-component
    distributed contraction with identical output (speckle-heavy
    rasters approach pixels/min_px regions but their components stay
    tiny).  Either way the fragment->canonical mapping, per-region
    size/anchor aggregation and adjacency dedup run as Dataset
    joins/groupbys; the driver only ever holds the changed-value map.
    ``max_component_regions`` loudly bounds the one irreducibly
    sequential unit, a single connected component's graph."""
    if min_px < 2:
        raise ValueError("min_px must be >= 2 (1 would be a no-op)")
    T = spec.tile_px

    combined, cross = _fragment_graph(ds, spec, layer)

    import ray
    import ray.data.aggregate as agg

    from ..functions.components import connected_components

    # bound check BEFORE anything region-sized reaches the driver: under
    # the gate the merge loop runs driver-side over the bounded graph;
    # past it the per-COMPONENT distributed contraction path takes over
    # (the docstring's named alternative -- no hard stop)
    n_regions = combined.filter(expr="kind == 0").count()
    distributed_merge = n_regions > max_regions
    from ..partitions import shuffle_width

    n_parts = shuffle_width(n_regions)

    # ---- distributed graph contraction: fragment -> canonical ----
    parts_ds = combined.filter(expr="kind == 0") \
        .select_columns(["gid", "value", "n_px", "anchor"])
    merge_edges = cross.filter(expr="ek == 0") \
        .select_columns(["id_a", "id_b"])

    def _with_canon(src, key_col: str, mapping):
        return _canon_join(src, key_col, mapping, n_parts)

    if merge_edges.count():
        mapping = connected_components(
            merge_edges, "id_a", "id_b").materialize()
        parts_c = _with_canon(parts_ds, "gid", mapping).materialize()

        adj_raw = (combined.filter(expr="kind == 2")
                   .map_batches(lambda b: pa.table(
                       {"id_a": b.column("gid"),
                        "id_b": b.column("id_b")}),
                       batch_format="pyarrow")
                   .union(cross.filter(expr="ek == 1")
                          .select_columns(["id_a", "id_b"])))
        a_mapped = (_with_canon(adj_raw, "id_a", mapping)
                    .map_batches(lambda b: pa.table(
                        {"id_a": b.column("canon"),
                         "id_b": b.column("id_b")}),
                        batch_format="pyarrow"))
        adj_c = (_with_canon(a_mapped, "id_b", mapping)
                 .map_batches(lambda b: pa.table(
                     {"id_a": b.column("id_a"),
                      "id_b": b.column("canon")}),
                     batch_format="pyarrow"))
    else:
        def ident(b: pa.Table) -> pa.Table:
            return b.append_column("canon", b.column("gid"))

        parts_c = parts_ds.map_batches(
            ident, batch_format="pyarrow").materialize()
        adj_c = (combined.filter(expr="kind == 2")
                 .map_batches(lambda b: pa.table(
                     {"id_a": b.column("gid"),
                      "id_b": b.column("id_b")}),
                     batch_format="pyarrow")
                 .union(cross.filter(expr="ek == 1")
                        .select_columns(["id_a", "id_b"])))

    # canonical-region partials (<= n_regions rows, usually far fewer)
    canon_ds = (parts_c
                .groupby("canon")
                .aggregate(agg.Sum("n_px", alias_name="n_px"),
                           agg.Min("anchor", alias_name="anchor"),
                           agg.Min("value", alias_name="value")))

    # canonical adjacency, deduped distributed
    def drop_self(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        return b.filter(pc2.not_equal(b.column("id_a"),
                                      b.column("id_b")))

    adj_dedup = (adj_c
                 .map_batches(drop_self, batch_format="pyarrow")
                 .groupby(["id_a", "id_b"])
                 .aggregate(agg.Count(alias_name="_n"))
                 .select_columns(["id_a", "id_b"]))

    if distributed_merge:
        ck, cv = _sieve_merge_distributed(
            canon_ds, adj_dedup, min_px, n_parts,
            max_component_regions=max_component_regions)
    else:
        size: dict[int, int] = {}
        value: dict[int, float] = {}
        anchor: dict[int, int] = {}
        for r in canon_ds.take_all():
            c = int(r["canon"])
            size[c] = int(r["n_px"])
            value[c] = float(r["value"])
            anchor[c] = int(r["anchor"])
        neigh: dict[int, set] = {c: set() for c in size}
        for r in adj_dedup.take_all():
            a, b_ = int(r["id_a"]), int(r["id_b"])
            neigh[a].add(b_)
            neigh[b_].add(a)

        final = sieve_merge(size, value, anchor, neigh, min_px)

        # raw gid -> final value, only where the value changed.  Merge
        # edges connect same-value fragments, so a fragment changes iff
        # its canonical region changes.
        changed_canon = {c: value[final[c]] for c in size
                         if value[final[c]] != value[c]}
        ck = np.array(sorted(changed_canon), np.int64)
        cv = np.array([changed_canon[k] for k in ck], np.float32)
    # broadcast the canonical change map (bounded by the changed-region
    # count) and scan the fragment table distributed
    cref = ray.put((ck, cv))

    def changed_frags(b: pa.Table) -> pa.Table:
        k, v = ray.get(cref)
        g = b.column("gid").to_numpy()
        c = b.column("canon").to_numpy()
        if not len(k) or not len(g):
            return pa.table({"gid": pa.array([], pa.int64()),
                             "nv": pa.array([], pa.float32())})
        pos = np.clip(np.searchsorted(k, c), 0, len(k) - 1)
        hit = k[pos] == c
        return pa.table({"gid": pa.array(g[hit], pa.int64()),
                         "nv": pa.array(v[pos[hit]], pa.float32())})

    ch_rows = parts_c.map_batches(
        changed_frags, batch_format="pyarrow").take_all()
    keys = np.array([r["gid"] for r in ch_rows], np.int64)
    vals_arr = np.array([r["nv"] for r in ch_rows], np.float32)
    srt = np.argsort(keys)
    keys, vals_arr = keys[srt], vals_arr[srt]
    map_ref = ray.put((keys, vals_arr))

    def rewrite(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        k, v = ray.get(map_ref)
        out = {n: [] for n in TILES_SCHEMA.names}
        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            tx, ty = cap.tx, cap.ty
            base = np.int64(spec.cell_id(tx, ty)) << _LABEL_BITS
            labels, _ = _label_tile(arr, float(cap.nodata))
            new = arr.copy()
            if len(k) and labels.max() >= 0:
                gid2d = base + labels.astype(np.int64)
                pos = np.searchsorted(k, gid2d.ravel())
                pos = np.clip(pos, 0, len(k) - 1)
                hit = (labels.ravel() >= 0) & (k[pos] == gid2d.ravel())
                flat = new.ravel()
                flat[hit] = v[pos[hit]]
                new = flat.reshape(arr.shape)
            ocap = Caption(layer=f"sieve_{layer}", x0=cap.x0, y0=cap.y0,
                           pixel_size=cap.pixel_size, crs=cap.crs,
                           nodata=cap.nodata, edge=dict(cap.edge),
                           tx=tx, ty=ty)
            payload, ocap = encode_tile(new, fmt, ocap)
            out["image_id"].append(f"sieve_{layer}/{tx}/{ty}")
            out["bytes"].append(payload)
            out["w"].append(np.int32(new.shape[1]))
            out["h"].append(np.int32(new.shape[0]))
            out["fmt"].append(fmt)
            out["caption"].append(ocap.to_json())
            out["phash"].append(np.int64(phash64(new)))
        from ..tiles.synth import TILES_SCHEMA as S

        return pa.table(out, schema=S)

    return ds.map_batches(rewrite, batch_format="pyarrow")


def _sieve_merge_distributed(canon_ds, adj_ds, min_px: int,
                             n_parts: int,
                             max_component_regions: int = 5_000_000,
                             max_changed_broadcast: int = 50_000_000):
    """Past-gate merge: rounds of distributed region-graph contraction
    (the docstring's named alternative to the driver loop).

    EXACTNESS: :func:`sieve_merge`'s global smallest-first order only
    matters BETWEEN regions that can reach each other -- merges never
    cross a connected component of the region adjacency graph, so
    running the identical sequential loop independently per component
    yields the same final labeling as the global loop (tested against
    whole-raster parity with the gate forced down).  So: components via
    the union-find tree-reduce (functions/components.py), one keyed
    exchange co-locating each component's region rows + edges, and the
    sequential core runs PER COMPONENT inside ``map_groups`` -- the
    driver never holds the region graph, only the changed-value map.

    Bounds, loud: a single component larger than
    ``max_component_regions`` is irreducibly sequential state and
    raises (a speckle raster's components are tiny -- the count grows,
    not the component); a changed-map larger than
    ``max_changed_broadcast`` would blow the rewrite broadcast and
    raises naming the per-cell join alternative."""
    import ray.data.aggregate as agg

    from ..functions.components import connected_components

    comp_map = connected_components(adj_ds, "id_a", "id_b").materialize()

    def canon_comp(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        comp = pc2.coalesce(b.column("component_id"),
                            b.column("canon")).cast(pa.int64())
        return pa.table({
            "comp": comp, "kind": pa.array(
                np.zeros(b.num_rows, np.int8)),
            "a": b.column("canon").cast(pa.int64()),
            "b": pa.array(np.zeros(b.num_rows, np.int64)),
            "value": b.column("value").cast(pa.float64()),
            "n_px": b.column("n_px").cast(pa.int64()),
            "anchor": b.column("anchor").cast(pa.int64())})

    regions = (canon_ds.join(comp_map, "left_outer",
                             num_partitions=n_parts,
                             on=("canon",), right_on=("doc_id",))
               .map_batches(canon_comp, batch_format="pyarrow"))

    def edge_comp(b: pa.Table) -> pa.Table:
        z = np.zeros(b.num_rows, np.float64)
        return pa.table({
            "comp": b.column("component_id").cast(pa.int64()),
            "kind": pa.array(np.ones(b.num_rows, np.int8)),
            "a": b.column("id_a").cast(pa.int64()),
            "b": b.column("id_b").cast(pa.int64()),
            "value": pa.array(z),
            "n_px": pa.array(z.astype(np.int64)),
            "anchor": pa.array(z.astype(np.int64))})

    edges = (adj_ds.join(comp_map, "inner", num_partitions=n_parts,
                         on=("id_a",), right_on=("doc_id",))
             .map_batches(edge_comp, batch_format="pyarrow"))

    def per_component(g: pa.Table) -> pa.Table:
        kind = g.column("kind").to_numpy()
        reg = kind == 0
        n_reg = int(reg.sum())
        if n_reg > max_component_regions:
            raise RuntimeError(
                f"sieve: one region-graph component holds {n_reg} "
                f"regions (> {max_component_regions}); its merge order "
                "is irreducibly sequential -- raise the bound on a "
                "bigger worker or sieve per sub-raster")
        a = g.column("a").to_numpy()
        size = dict(zip(a[reg].tolist(),
                        g.column("n_px").to_numpy()[reg].tolist()))
        value = dict(zip(a[reg].tolist(),
                         g.column("value").to_numpy()[reg].tolist()))
        anchor = dict(zip(a[reg].tolist(),
                          g.column("anchor").to_numpy()[reg].tolist()))
        neigh: dict[int, set] = {c: set() for c in size}
        eb = g.column("b").to_numpy()
        for x, y in zip(a[~reg].tolist(), eb[~reg].tolist()):
            neigh[x].add(y)
            neigh[y].add(x)
        final = sieve_merge(size, value, anchor, neigh, min_px)
        out_c, out_v = [], []
        for c in size:
            nv = value[final[c]]
            if nv != value[c]:
                out_c.append(c)
                out_v.append(nv)
        return pa.table({"canon": pa.array(out_c, pa.int64()),
                         "nv": pa.array(out_v, pa.float64())})

    changed = (regions.union(edges)
               .groupby("comp")
               .map_groups(per_component, batch_format="pyarrow")
               .materialize())
    n_changed = changed.count()
    if n_changed > max_changed_broadcast:
        raise RuntimeError(
            f"sieve: {n_changed} changed regions exceed the rewrite "
            f"broadcast bound {max_changed_broadcast} (~12 B each); "
            "route the change map to tiles by cell id (gid >> "
            "_LABEL_BITS) with a keyed join instead of ray.put")
    rows = changed.take_all()
    ck = np.array([r["canon"] for r in rows], np.int64)
    cv = np.array([r["nv"] for r in rows], np.float32)
    srt = np.argsort(ck)
    return ck[srt], cv[srt]


def sieve_merge(size: dict[int, int], value: dict[int, float],
                anchor: dict[int, int], neigh: dict[int, set],
                min_px: int) -> dict[int, int]:
    """The contraction loop over the region graph, matching PIXEL-LEVEL
    semantics (rewrite the small region's pixels, re-form components):
    repeatedly take the smallest sub-threshold region (ties: lowest
    anchor = min row-major pixel index, a tiling-independent identity),
    merge it into its largest current neighbour (ties: lowest anchor),
    then absorb any of its other neighbours that share the target's
    value -- exactly what re-labeling after a pixel rewrite would do.
    Returns region id -> the id of the region it ends up part of
    (identity for survivors).  Pure function of the graph -- exercised
    directly against a pixel-level oracle in tests."""
    import heapq

    parent = {c: c for c in size}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def absorb(tgt: int, src: int):
        """Union src (canonical) into tgt, then cascade same-value
        neighbours (iterative, no recursion)."""
        stack = [src]
        while stack:
            s_ = stack.pop()
            if find(s_) == tgt:
                continue
            parent[s_] = tgt
            size[tgt] += size[s_]
            anchor[tgt] = min(anchor[tgt], anchor[s_])
            neigh[tgt] |= neigh.pop(s_, set())
            cur = {find(n) for n in neigh[tgt]} - {tgt}
            neigh[tgt] = cur
            # pixel semantics: same-value touching regions are ONE region
            stack.extend(n for n in cur if value[n] == value[tgt])

    heap = [(s, anchor[c], c) for c, s in size.items() if s < min_px]
    heapq.heapify(heap)
    while heap:
        s, a, c = heapq.heappop(heap)
        if find(c) != c or size[c] != s or anchor[c] != a or s >= min_px:
            continue                      # stale entry
        cands = {find(n) for n in neigh[c]} - {c}
        if not cands:
            continue                      # islanded: survives
        tgt = max(cands, key=lambda n: (size[n], -anchor[n]))
        absorb(tgt, c)
        if size[tgt] < min_px:
            heapq.heappush(heap, (size[tgt], anchor[tgt], tgt))
    return {c: find(c) for c in parent}


#: float32 label tiles represent dense region ids exactly only below
#: 2**24 -- the output FORMAT bound of region_group (both paths).
_DENSE_ID_CAP = 1 << 24


def region_group(ds, spec: GridSpec, *, layer: str, fmt: str = "npz",
                 max_regions: int = 5_000_000):
    """RegionGroup (the ArcGIS Spatial Analyst op): label every
    4-connected same-value region of a categorical layer with a DENSE
    global region id, stable across tilings (ids are assigned in
    ascending order of each region's anchor = min row-major global
    pixel index, starting at 1).  Returns ``(labels_ds, regions)``:

    * ``labels_ds`` -- image-table Dataset (layer ``regions_<layer>``)
      whose pixels are the region ids (float32 tiles -- exact because
      ids are dense and gated < 2**24; nodata passes through);
    * ``regions`` -- the RegionGroup attribute table ``(region_id,
      value, n_px, anchor)``: a pyarrow Table under ``max_regions``, a
      DATASET on the distributed path (its cardinality is exactly what
      exceeded the gate).

    Scale shape: the shared `_fragment_graph` label pass + cross-edge
    shuffle, components over same-value merge edges, one
    groupby(canon) aggregation.  Under ``max_regions`` raw fragments
    the dense-id assignment and relabel map are driver-held (the
    bounded-materialization contract -- fastest at bench scale); past
    it, :func:`_region_group_distributed` assigns ids by a bucketed
    anchor rank (driver holds one 65536-entry histogram) and ships the
    fragment->id map to its tiles by cell key, so fragment and region
    cardinality are unbounded up to the float32 format cap
    ``_DENSE_ID_CAP`` (2**24), past which it raises loudly (label per
    sub-raster to go further)."""
    combined, cross = _fragment_graph(ds, spec, layer)

    import ray
    import ray.data.aggregate as agg

    from ..functions.components import connected_components
    from ..partitions import shuffle_width

    n_frags = combined.filter(expr="kind == 0").count()
    n_parts = shuffle_width(n_frags)

    parts_ds = combined.filter(expr="kind == 0") \
        .select_columns(["gid", "value", "n_px", "anchor"])
    merge_edges = cross.filter(expr="ek == 0") \
        .select_columns(["id_a", "id_b"])

    if merge_edges.count():
        mapping = connected_components(
            merge_edges, "id_a", "id_b").materialize()
        parts_c = _canon_join(parts_ds, "gid", mapping,
                              n_parts).materialize()
    else:
        parts_c = parts_ds.map_batches(
            lambda b: b.append_column("canon", b.column("gid")),
            batch_format="pyarrow").materialize()

    canon_agg = (parts_c
                 .groupby("canon")
                 .aggregate(agg.Sum("n_px", alias_name="n_px"),
                            agg.Min("anchor", alias_name="anchor"),
                            agg.Min("value", alias_name="value")))

    if n_frags > max_regions:
        return _region_group_distributed(ds, spec, layer, fmt, parts_c,
                                         canon_agg, n_frags)

    canon_rows = canon_agg.take_all()
    canon_rows.sort(key=lambda r: int(r["anchor"]))
    rid = {int(r["canon"]): i + 1 for i, r in enumerate(canon_rows)}
    regions = pa.table({
        "region_id": pa.array(range(1, len(canon_rows) + 1), pa.int64()),
        "value": pa.array([float(r["value"]) for r in canon_rows],
                          pa.float64()),
        "n_px": pa.array([int(r["n_px"]) for r in canon_rows],
                         pa.int64()),
        "anchor": pa.array([int(r["anchor"]) for r in canon_rows],
                           pa.int64())})

    frag_rows = parts_c.select_columns(["gid", "canon"]).take_all()
    keys = np.array([r["gid"] for r in frag_rows], np.int64)
    vals = np.array([rid[int(r["canon"])] for r in frag_rows],
                    np.float32)
    srt = np.argsort(keys)
    map_ref = ray.put((keys[srt], vals[srt]))

    def relabel(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        k, v = ray.get(map_ref)
        out = {n: [] for n in TILES_SCHEMA.names}
        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            tx, ty = cap.tx, cap.ty
            base = np.int64(spec.cell_id(tx, ty)) << _LABEL_BITS
            labels, _ = _label_tile(arr, float(cap.nodata))
            new = np.full(arr.shape, np.float32(cap.nodata), np.float32)
            if len(k) and labels.max() >= 0:
                gid2d = base + labels.astype(np.int64)
                pos = np.clip(np.searchsorted(k, gid2d.ravel()),
                              0, len(k) - 1)
                hit = (labels.ravel() >= 0) & (k[pos] == gid2d.ravel())
                flat = new.ravel()
                flat[hit] = v[pos[hit]]
                new = flat.reshape(arr.shape)
            ocap = Caption(layer=f"regions_{layer}", x0=cap.x0,
                           y0=cap.y0, pixel_size=cap.pixel_size,
                           crs=cap.crs, nodata=cap.nodata,
                           edge=dict(cap.edge), tx=tx, ty=ty)
            payload, ocap = encode_tile(new, fmt, ocap)
            out["image_id"].append(f"regions_{layer}/{tx}/{ty}")
            out["bytes"].append(payload)
            out["w"].append(np.int32(new.shape[1]))
            out["h"].append(np.int32(new.shape[0]))
            out["fmt"].append(fmt)
            out["caption"].append(ocap.to_json())
            out["phash"].append(np.int64(phash64(new)))
        return pa.table(out, schema=TILES_SCHEMA)

    return ds.map_batches(relabel, batch_format="pyarrow"), regions


def _region_group_distributed(ds, spec: GridSpec, layer: str, fmt: str,
                              parts_c, canon_agg, n_frags: int):
    """Past-gate body of :func:`region_group`: nothing fragment- or
    region-cardinality-sized touches the driver.

    Dense anchor-ordered ids come from a BUCKETED RANK: anchors are
    unique per region (disjoint pixel sets, min pixel index), and
    ``bucket = anchor // bw`` is monotone in anchor, so
    ``region_id = prefix[bucket] + rank_within_bucket + 1`` with
    ``prefix`` the exclusive cumsum of the per-bucket counts.  The
    driver holds ONE 65536-entry histogram (merged from per-block
    partials); the within-bucket rank runs in a keyed fold that
    co-locates each bucket.  The fragment -> region-id map then joins
    ``parts_c`` distributed and rides a cell-keyed union to its OWN
    tiles (the _sidecar_join shape: ray's shard builder null-unifies
    the two schemas), so the relabel fold sees every tile next to
    exactly its fragments' id rows."""
    import ray

    from ..partitions import keyed_fold, shuffle_width

    T = spec.tile_px
    world_px = spec.tiles_x * T * spec.tiles_y * T
    NB = 1 << 16
    bw = max(1, -(-world_px // NB))          # bucket width in pixels

    def tag_bucket(b: pa.Table) -> pa.Table:
        a = b.column("anchor").to_numpy()
        return b.append_column("bucket", pa.array(a // bw, pa.int64()))

    cb = canon_agg.map_batches(tag_bucket,
                               batch_format="pyarrow").materialize()

    def bucket_partial(b: pa.Table) -> pa.Table:
        u, c = np.unique(b.column("bucket").to_numpy(),
                         return_counts=True)
        return pa.table({"bucket": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})

    counts = np.zeros(NB, np.int64)
    for t in ray.get(cb.map_batches(bucket_partial,
                                    batch_format="pyarrow")
                     .materialize().to_arrow_refs()):
        if t.num_rows:
            np.add.at(counts, t.column("bucket").to_numpy(),
                      t.column("n").to_numpy())
    total = int(counts.sum())
    if total >= _DENSE_ID_CAP:
        raise RuntimeError(
            f"region_group: {total} regions reach the float32 dense-id "
            f"format cap 2**24; label per sub-raster (or emit int32 "
            f"label tiles) to go further")
    prefix = np.concatenate([[0], np.cumsum(counts)[:-1]])
    prefix_ref = ray.put(prefix)

    def rank_fold(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "bucket" not in b.column_names:
            return pa.table({
                "canon": pa.array([], pa.int64()),
                "n_px": pa.array([], pa.int64()),
                "anchor": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
                "region_id": pa.array([], pa.int64())})
        pf = ray.get(prefix_ref)
        bu = b.column("bucket").to_numpy()
        a = b.column("anchor").to_numpy()
        order = np.lexsort((a, bu))
        b2 = b.take(pa.array(order, pa.int64()))
        bu = bu[order]
        starts = np.flatnonzero(np.r_[True, bu[1:] != bu[:-1]])
        local = np.arange(len(bu)) - np.repeat(
            starts, np.diff(np.r_[starts, len(bu)]))
        rid = pf[bu] + local + 1
        return (b2.drop_columns(["bucket"])
                .append_column("region_id", pa.array(rid, pa.int64())))

    rid_width = shuffle_width(total)
    rid_ds = keyed_fold(cb, ["bucket"], rank_fold,
                        num_partitions=rid_width).materialize()
    regions_ds = rid_ds.select_columns(
        ["region_id", "value", "n_px", "anchor"])

    # fragment -> region id rows, keyed by their tile's cell
    fmap = (parts_c.select_columns(["gid", "canon"])
            .join(rid_ds.select_columns(["canon", "region_id"]),
                  "inner", num_partitions=shuffle_width(n_frags),
                  on=("canon",)))

    def tag_map(b: pa.Table) -> pa.Table:
        gid = b.column("gid").to_numpy()
        return pa.table({
            "cell": pa.array(gid >> _LABEL_BITS, pa.int64()),
            "gid": b.column("gid"),
            "rid": b.column("region_id").cast(pa.int64())})

    map_side = fmap.map_batches(tag_map, batch_format="pyarrow")

    def tag_tiles(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption

        keep, cells = [], []
        for i in range(b.num_rows):
            cap_raw = b.column("caption")[i].as_py()
            if json.loads(cap_raw).get("layer") != layer:
                continue
            cap = Caption.from_json(cap_raw)
            keep.append(i)
            cells.append(int(spec.cell_id(cap.tx, cap.ty)))
        t = b.take(pa.array(keep, pa.int64()))
        return t.append_column("cell", pa.array(cells, pa.int64()))

    tile_side = ds.map_batches(tag_tiles, batch_format="pyarrow")

    def relabel_fold(b: pa.Table) -> pa.Table:
        import json

        from ..tiles.codec import Caption, decode_tile, encode_tile, \
            phash64
        from ..tiles.synth import TILES_SCHEMA

        out = {n: [] for n in TILES_SCHEMA.names}
        empty = pa.table(
            {n: pa.array([], TILES_SCHEMA.field(n).type)
             for n in TILES_SCHEMA.names}, schema=TILES_SCHEMA)
        if b.num_rows == 0 or "caption" not in b.column_names:
            return empty
        # schema unification marks the sides: tile rows carry a valid
        # caption, map rows a null one (and vice versa for gid)
        has_map = "gid" in b.column_names
        if has_map:
            cap_col = b.column("caption")
            is_tile = np.array([cap_col[i].is_valid
                                for i in range(b.num_rows)])
        else:
            is_tile = np.full(b.num_rows, True)
        cells = b.column("cell").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # per-cell fragment map from this block's map rows
        lut: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if has_map:
            midx = np.flatnonzero(~is_tile)
            if len(midx):
                mc = cells[midx]
                mg = np.asarray(
                    b.column("gid").take(pa.array(midx, pa.int64()))
                    .to_pylist(), np.int64)
                mr = np.asarray(
                    b.column("rid").take(pa.array(midx, pa.int64()))
                    .to_pylist(), np.float32)
                order = np.lexsort((mg, mc))
                mc, mg, mr = mc[order], mg[order], mr[order]
                cstarts = np.flatnonzero(
                    np.r_[True, mc[1:] != mc[:-1]])
                cbounds = np.r_[cstarts, len(mc)]
                for ci in range(len(cstarts)):
                    s, e = cbounds[ci], cbounds[ci + 1]
                    lut[int(mc[s])] = (mg[s:e], mr[s:e])
        for i in np.flatnonzero(is_tile):
            cap_raw = b.column("caption")[i].as_py()
            cap = Caption.from_json(cap_raw)
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            tx, ty = cap.tx, cap.ty
            cell = int(spec.cell_id(tx, ty))
            base = np.int64(cell) << _LABEL_BITS
            labels, _ = _label_tile(arr, float(cap.nodata))
            new = np.full(arr.shape, np.float32(cap.nodata), np.float32)
            k, v = lut.get(cell, (np.empty(0, np.int64),
                                  np.empty(0, np.float32)))
            if len(k) and labels.max() >= 0:
                gid2d = base + labels.astype(np.int64)
                pos = np.clip(np.searchsorted(k, gid2d.ravel()),
                              0, len(k) - 1)
                hit = (labels.ravel() >= 0) & (k[pos] == gid2d.ravel())
                flat = new.ravel()
                flat[hit] = v[pos[hit]]
                new = flat.reshape(arr.shape)
            ocap = Caption(layer=f"regions_{layer}", x0=cap.x0,
                           y0=cap.y0, pixel_size=cap.pixel_size,
                           crs=cap.crs, nodata=cap.nodata,
                           edge=dict(cap.edge), tx=tx, ty=ty)
            payload, ocap = encode_tile(new, fmt, ocap)
            out["image_id"].append(f"regions_{layer}/{tx}/{ty}")
            out["bytes"].append(payload)
            out["w"].append(np.int32(new.shape[1]))
            out["h"].append(np.int32(new.shape[0]))
            out["fmt"].append(fmt)
            out["caption"].append(ocap.to_json())
            out["phash"].append(np.int64(phash64(new)))
        return pa.table(out, schema=TILES_SCHEMA)

    labels_ds = keyed_fold(
        tile_side.union(map_side), ["cell"], relabel_fold,
        num_partitions=shuffle_width(n_frags))
    return labels_ds, regions_ds
