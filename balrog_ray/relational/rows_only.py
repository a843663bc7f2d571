"""Rows-only queries (no SQL oracle): the geospatial engine's own pipelines
over the deterministic synthetic world, plus non-SQL-expressible dedup /
ANN / multimodal ops over the driver tables.  The driver records a weaker
rows-only check for these; their *real* verification lives in tests/
(whole-raster oracle parity, brute-force join oracles, exact-ANN recall).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _t1_cfg():
    from ..tiles.synth import SynthConfig

    return SynthConfig(tiles_x=4, tiles_y=4, tile_px=64)


def _head_rows(path: str, columns, n: int) -> pa.Table:
    """First ``n`` rows of a parquet file via its FIRST ROW GROUP only
    -- a driver read bounded by row-group size at every SF, for
    queries that need a handful of seed/query rows (never the
    SF-growing whole-table ``pq.read_table``)."""
    f = pq.ParquetFile(path)
    tab = f.read_row_group(0, columns=list(columns))
    if tab.num_rows < n:
        raise ValueError(
            f"{path}: first row group holds {tab.num_rows} rows < {n}")
    return tab.slice(0, n)


def q_bal_band_histogram(sf_dir: str):
    """Flagship: full BAL engine on the t1 synthetic world -> per-band
    pixel histogram (deterministic integers)."""
    import ray.data

    from ..pipelines.bal_pipeline import bal_pipeline, band_histogram
    from ..stages.halo import GridSpec
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(tiles_table(cfg))
    return band_histogram(bal_pipeline(ds, GridSpec.from_synth(cfg)))


def q_bal_polygon_mask(sf_dir: str):
    """BAL engine restricted to an arbitrary polygon AOI (extract_by_mask,
    sa_tools.py:48-136): histogram over the masked output."""
    import ray.data

    from ..geo.geometry import Polygon
    from ..geo.wkb import polygon_to_wkb
    from ..pipelines.bal_pipeline import bal_pipeline, band_histogram
    from ..stages.halo import GridSpec
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    W = cfg.tiles_x * cfg.tile_px * cfg.pixel_size
    H = cfg.tiles_y * cfg.tile_px * cfg.pixel_size
    poly = Polygon(np.array([
        [0.3 * W, 0.25 * H], [0.7 * W, 0.3 * H], [0.75 * W, 0.65 * H],
        [0.45 * W, 0.8 * H], [0.25 * W, 0.55 * H]]))
    ds = ray.data.from_arrow(tiles_table(cfg))
    return band_histogram(bal_pipeline(ds, GridSpec.from_synth(cfg),
                                       mask=polygon_to_wkb(poly)))


def q_bal_offgrid_veg(sf_dir: str):
    """BAL engine fed half-resolution vegetation via the NN regrid stage
    (ProjectRaster analogue, bal.py:55-57)."""
    import ray.data

    from ..pipelines.bal_pipeline import bal_pipeline, band_histogram
    from ..stages.halo import GridSpec
    from ..tiles.synth import SynthConfig, tiles_table

    cfg = _t1_cfg()
    veg_cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=64, pixel_size=50.0)
    dem = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    veg = ray.data.from_arrow(tiles_table(veg_cfg, layers=("veg",)))
    return band_histogram(bal_pipeline(dem, GridSpec.from_synth(cfg),
                                       veg_ds=veg))


def q_tile_quarantine(sf_dir: str):
    """Poison-pill ingest gate: the t1 tile table with 4 deterministically
    corrupted rows (truncated payload, garbled caption JSON, wrong format
    tag, lying dimensions) -> per-row quarantine/quality report.  Every
    row is accounted for; no decode error kills a task (SURVEY §4's
    per-row poison-pill handling, vs the reference's silent
    ``except: return None`` at ga_5m/01_...py:241-242)."""
    import ray.data

    from ..stages.quarantine import validate_tiles
    from ..tiles.synth import tiles_table

    tab = tiles_table(_t1_cfg()).combine_chunks()
    cols = {c: tab.column(c).to_pylist() for c in tab.column_names}
    cols["bytes"][3] = cols["bytes"][3][:7]              # truncated payload
    cols["caption"][5] = cols["caption"][5][:-4]         # broken JSON
    cols["fmt"][8] = "npz" if cols["fmt"][8] != "npz" else "png"
    cols["w"][11] = cols["w"][11] + 1                    # lying dimensions
    bad = pa.table({c: pa.array(cols[c], tab.schema.field(c).type)
                    for c in tab.column_names})
    return validate_tiles(ray.data.from_arrow(bad))


def q_tile_chips(sf_dir: str):
    """Training-chip extraction over the t1 tiles (DEM layer): 64px tiles
    -> 32px chips at stride 32, each a self-describing image row; returns
    per-chip phash + caption so the driver sees a stable schema."""
    import ray.data

    from ..stages.chips import extract_chips
    from ..tiles.synth import tiles_table

    ds = ray.data.from_arrow(tiles_table(_t1_cfg(), layers=("dem",)))
    chips = extract_chips(ds, chip_px=32, stride=32)
    return chips.select_columns(["image_id", "w", "h", "fmt", "phash"])


def q_spatial_join_sites(sf_dir: str):
    import ray.data

    from ..stages.spatial_join import broadcast_spatial_join
    from ..tiles.synth import sites_table, veg_polygon_table

    cfg = _t1_cfg()
    return broadcast_spatial_join(
        ray.data.from_arrow(sites_table(cfg, n=64)),
        veg_polygon_table(cfg))


def q_partitioned_join_sites(sf_dir: str):
    import ray.data

    from ..stages.spatial_join import partitioned_spatial_join
    from ..tiles.synth import sites_table, veg_polygon_table

    cfg = _t1_cfg()
    return partitioned_spatial_join(
        ray.data.from_arrow(sites_table(cfg, n=64)),
        veg_polygon_table(cfg), cfg.grid, hot_cell_threshold=3, n_salt=2)


def q_veg_within_range(sf_dir: str):
    """RANGE spatial join on the synthetic world: every (site, veg
    polygon) pair within 40 m -- the neighborhood generalization of the
    nearest-veg join (the reference reports only the single nearest,
    xx_fiona_testing.py:205-218).  Brute-force parity in
    tests/test_spatial_join.py."""
    import ray.data

    from ..stages.spatial_join import within_distance_join
    from ..tiles.synth import sites_table, veg_polygon_table

    cfg = _t1_cfg()
    return within_distance_join(
        ray.data.from_arrow(sites_table(cfg, n=64)),
        veg_polygon_table(cfg), max_dist=40.0)


def q_veg_knn3(sf_dir: str):
    """k-NN polygon join (k=3 nearest veg polygons per site, distance
    ties to lowest gid) on the synthetic world -- the k>1 sibling of
    the range join above."""
    import ray.data

    from ..stages.spatial_join import within_distance_join
    from ..tiles.synth import sites_table, veg_polygon_table

    cfg = _t1_cfg()
    return within_distance_join(
        ray.data.from_arrow(sites_table(cfg, n=64)),
        veg_polygon_table(cfg), max_dist=200.0, k=3)


def q_wgs84_veg_distance(sf_dir: str):
    """Distance-to-vegetation on the WGS84 ELLIPSOID
    (metric='geodesic_wgs84', geo/wgs84.py Vincenty): lon/lat sites
    derived deterministically from supplier keys near Perth, joined
    against a fixed degree-CRS polygon set -- the pyproj ``Geod.inv``
    numbers of the reference (xx_fiona_testing.py:205-218) with no
    spherical bias.  Distances reported in exact integer millimetres;
    mm-level correctness is proven in tests/test_wgs84.py against
    ECEF-chord / RK4 / quadrature oracles."""
    import ray.data

    from ..geo.geometry import Polygon
    from ..geo.wkb import polygon_to_wkb
    from ..stages.spatial_join import broadcast_spatial_join

    rings = [
        np.array([[115.00, -32.00], [115.02, -32.00], [115.02, -31.98],
                  [115.00, -31.98], [115.00, -32.00]]),
        np.array([[115.05, -32.03], [115.07, -32.03], [115.07, -32.01],
                  [115.05, -32.01], [115.05, -32.03]]),
        np.array([[114.96, -31.95], [114.99, -31.96], [114.98, -31.93],
                  [114.96, -31.95]]),
    ]
    veg = pa.table({
        "gid": pa.array([1, 2, 3], pa.int64()),
        "bal_number": pa.array([2, 5, 7], pa.int16()),
        "geom": pa.array([polygon_to_wkb(Polygon(r)) for r in rings],
                         pa.binary())})

    def sites(b: pa.Table) -> pa.Table:
        k = b.column("s_suppkey").to_numpy()
        return pa.table({
            "site_id": pa.array([f"s{v}" for v in k], pa.string()),
            "x": pa.array(114.94 + (k * 53 % 1000) / 7000.0),
            "y": pa.array(-32.05 + (k * 97 % 1000) / 9000.0)})

    import pyarrow.parquet as _pq

    site_ds = (ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                     columns=["s_suppkey"])
               .map_batches(sites, batch_format="pyarrow"))
    joined = broadcast_spatial_join(site_ds, veg, max_dist=5_000.0,
                                    metric="geodesic_wgs84")

    def to_mm(b: pa.Table) -> pa.Table:
        d = b.column("distance_m").to_numpy()
        mm = np.where(d < 0, -1, np.rint(d * 1000.0)).astype(np.int64)
        return pa.table({
            "site_id": b.column("site_id"),
            "in_gid": b.column("in_gid"),
            "near_gid": b.column("near_gid"),
            "near_bal_number": b.column("near_bal_number"),
            "dist_mm": pa.array(mm, pa.int64())})

    return joined.map_batches(to_mm, batch_format="pyarrow")


def q_buffer_clip_areas(sf_dir: str):
    """Per-site buffer ^ vegetation intersection areas per class (SURVEY
    op 39, reference xx_fiona_testing.py:155-170) on the boolean kit."""
    import ray.data

    from ..stages.spatial_join import buffer_intersection_areas
    from ..tiles.synth import sites_table, veg_polygon_table

    cfg = _t1_cfg()
    return buffer_intersection_areas(
        ray.data.from_arrow(sites_table(cfg, n=48)),
        veg_polygon_table(cfg), radius=150.0)


def q_polygon_cell_cover(sf_dir: str):
    from ..stages.spatial_join import polygons_to_cells
    from ..tiles.synth import veg_polygon_table

    cfg = _t1_cfg()
    return polygons_to_cells(veg_polygon_table(cfg), cfg.grid)


def q_quad_polygon_cover(sf_dir: str):
    """Adaptive mixed-resolution polygon cover (the S2 ``RegionCoverer``
    role of geo/quad.py) over the synth veg polygons: interior cells stay
    coarse, only the boundary refines to max_res, and the result is
    ``compact()``-normal.  Per-polygon covers run INSIDE map_batches (the
    per-partition shape a 10^12-row polygon table needs); the output is
    one stats row per polygon: cell count, coarsest/finest resolution and
    the equivalent fine-cell count the hierarchy avoided shipping."""
    import ray.data

    from ..geo.quad import adaptive_cover, expand, qcell_res
    from ..geo.wkb import from_wkb
    from ..tiles.synth import veg_polygon_table

    cfg = _t1_cfg()
    size = float(cfg.tiles_x * cfg.tile_px * cfg.pixel_size)
    y_north = float(cfg.y_north)
    max_res = 7

    def cover_stats(b: pa.Table) -> pa.Table:
        gids, n_cells, r_min, r_max, n_fine = [], [], [], [], []
        for gid, geom in zip(b.column("gid").to_pylist(),
                             b.column("geom").to_pylist()):
            obj = from_wkb(geom)
            polys = obj if isinstance(obj, list) else [obj]
            for k, poly in enumerate(polys):
                ids = adaptive_cover(poly, 0.0, y_north, size,
                                     max_res=max_res, min_res=2)
                gids.append(gid * 16 + k)
                n_cells.append(len(ids))
                rs = qcell_res(ids)
                r_min.append(int(rs.min()) if len(ids) else -1)
                r_max.append(int(rs.max()) if len(ids) else -1)
                n_fine.append(len(expand(ids, max_res)))
        return pa.table({"gid": pa.array(gids, pa.int64()),
                         "n_cells": pa.array(n_cells, pa.int64()),
                         "res_min": pa.array(r_min, pa.int64()),
                         "res_max": pa.array(r_max, pa.int64()),
                         "n_fine": pa.array(n_fine, pa.int64())})

    return (ray.data.from_arrow(veg_polygon_table(cfg))
            .map_batches(cover_stats, batch_format="pyarrow")
            .sort("gid"))


def q_zonal_sites(sf_dir: str):
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.zonal import zonal_stats
    from ..tiles.synth import sites_table, tiles_table

    cfg = _t1_cfg()
    return zonal_stats(ray.data.from_arrow(sites_table(cfg, n=32)),
                       tiles_table(cfg, layers=("dem",)),
                       GridSpec.from_synth(cfg))


def q_multimodal_features(sf_dir: str):
    import ray.data

    from ..functions.multimodal import ImageDecodeActor
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    return ray.data.from_arrow(tiles_table(cfg, layers=("dem",))).map_batches(
        ImageDecodeActor, batch_format="pyarrow", concurrency=(1, 2))


def q_video_frames(sf_dir: str):
    """Video frame-sampling stage (multimodal family): deterministic
    nvid containers -> every-5th frame as ordinary image-tile rows via
    the FrameSampleActor pool, reduced to per-video frame stats."""
    import ray.data

    from ..functions.multimodal import FrameSampleActor, pack_video
    from ..tiles.codec import Caption

    vids = {"video_id": [], "bytes": [], "fmt": [], "caption": []}
    cap = Caption(layer="video", x0=0.0, y0=0.0, pixel_size=1.0)
    for v in range(4):
        x = np.arange(16, dtype=np.float32)
        frames = [np.outer(x + v, x + t) for t in range(12)]
        vids["video_id"].append(f"vid{v}")
        vids["bytes"].append(pack_video(frames, cap))
        vids["fmt"].append("nvid")
        vids["caption"].append(cap.to_json())
    tab = pa.table({k: pa.array(v) for k, v in vids.items()})
    frames_ds = ray.data.from_arrow(tab).map_batches(
        FrameSampleActor, fn_constructor_args=(5,),
        batch_format="pyarrow", concurrency=(1, 2))

    def stats(b: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption as Cap, decode_tile
        vid, idx, mean = [], [], []
        for r in b.to_pylist():
            v, f = r["image_id"].rsplit("/f", 1)
            arr = decode_tile(r["bytes"], r["fmt"],
                              Cap.from_json(r["caption"]))
            vid.append(v)
            idx.append(int(f))
            mean.append(round(float(arr.mean()), 4))
        return pa.table({"video_id": pa.array(vid, pa.string()),
                         "frame_idx": pa.array(idx, pa.int64()),
                         "mean": pa.array(mean, pa.float64())})

    return (frames_ds.map_batches(stats, batch_format="pyarrow")
            .sort(["video_id", "frame_idx"]))


def q_fingerprint_docs(sf_dir: str):
    import ray.data

    from ..functions.text import fingerprint_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def distinct_fp(group: pa.Table) -> pa.Table:
        return pa.table({
            "lang": [group.column("lang")[0].as_py()],
            "n_distinct_fp": pa.array(
                [len(set(group.column("fingerprint").to_pylist()))],
                pa.int64())})

    return (ds.map_batches(
        lambda b: fingerprint_batch(b).drop_columns(["text"]),
        batch_format="pyarrow")
        .groupby("lang").map_groups(distinct_fp, batch_format="pyarrow"))


def q_minhash_pairs_docs(sf_dir: str):
    import ray.data

    from ..functions.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return minhash_lsh_pairs(ds, threshold=0.9)


def q_curate_corpus(sf_dir: str):
    """The full industrial curation chain, composed end-to-end as ONE
    streaming pipeline over the documents table: quality gate (the
    SQL-checked quality_filter rule) -> language filter (n-gram
    heuristic, keep the corpus's majority language) -> exact dedup
    (content-hash first-wins) -> near-dup survivors (MinHash LSH ->
    union-find components -> canonical anti-join) -> 64-token chunking
    -> 512-token FFD sequence packing.  Returns the integer funnel:
    per-stage doc counts plus chunk/sequence/token conservation stats
    -- every number deterministic, so the rows-only gate pins it."""
    import ray.data

    from ..functions.components import connected_components, dedup_survivors
    from ..functions.dedup import content_hash_batch, minhash_lsh_pairs
    from ..functions.packing import pack_sequences, packing_stats
    from ..functions.text import langid_batch, quality_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    n_in = docs.count()

    def quality_gate(b: pa.Table) -> pa.Table:
        # length + mean-token-shape gates (the stopword-density rule of
        # the SQL-checked quality_filter would gut this synthetic
        # token-soup corpus and starve the downstream dedup stages)
        m = quality_batch(b)
        keep = ((m.column("n_tokens").to_numpy() >= 5)
                & (m.column("avg_token_len").to_numpy() >= 2.0))
        return b.filter(pa.array(keep))

    q = docs.map_batches(quality_gate,
                         batch_format="pyarrow").materialize()
    n_quality = q.count()

    # ONE langid pass: tag, pick the majority language from the tagged
    # set, filter the same tagged set
    tagged = q.map_batches(langid_batch,
                           batch_format="pyarrow").materialize()
    lang_counts = tagged.groupby("lang_pred").count().take_all()
    top_lang = max(lang_counts, key=lambda r: (r["count()"],
                                               r["lang_pred"]))["lang_pred"]
    lng = (tagged.filter(expr=f"lang_pred == '{top_lang}'")
           .drop_columns(["lang_pred"]).materialize())
    n_lang = lng.count()

    # exact dedup: first-wins by min doc_id per content hash
    import ray.data.aggregate as a

    from ..partitions import shuffle_width

    width = shuffle_width(n_lang)
    hashed = lng.map_batches(content_hash_batch, batch_format="pyarrow")
    firsts = (hashed.groupby("content_hash")
              .aggregate(a.Min("doc_id", alias_name="doc_id"))
              .select_columns(["doc_id"]))
    exact = lng.join(firsts, "inner", num_partitions=width,
                     on=("doc_id",)).materialize()
    n_exact = exact.count()

    pairs = minhash_lsh_pairs(exact, threshold=0.9)
    comp = connected_components(pairs)
    survivors = dedup_survivors(exact, comp).materialize()
    n_neardup = survivors.count()

    def chunks(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        lens = pc.list_value_length(toks).cast(pa.int64()).to_numpy()
        n_chunks = -(-lens // 64)
        rep = np.repeat(np.arange(len(lens)), n_chunks)
        starts = np.concatenate([[0], np.cumsum(n_chunks[:-1])])
        chunk_id = np.arange(len(rep)) - starts[rep]
        n_tok = np.minimum(lens[rep] - chunk_id * 64, 64)
        return pa.table({
            "doc_id": pa.array(b.column("doc_id").to_numpy()[rep],
                               pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_tok": pa.array(n_tok, pa.int64())})

    chunked = survivors.map_batches(chunks, batch_format="pyarrow")
    packed = pack_sequences(chunked, budget=512, n_shards=8)
    stats = packing_stats(packed, budget=512)
    out = {"docs_in": n_in, "after_quality": n_quality,
           "after_langid": n_lang, "after_exact_dedup": n_exact,
           "after_neardup": n_neardup, **stats}
    return pa.table({k: pa.array([int(v)], pa.int64())
                     for k, v in out.items()})


def q_knn_graph_embeddings(sf_dir: str):
    """Approximate kNN graph over the embeddings table (every vector's
    top-5 cosine neighbors, self excluded): IVF-bucketed one-exchange
    construction, exact-at-full-probe property tested in
    tests/test_functions.py::test_knn_graph_recall."""
    import ray.data

    from ..functions.ann import knn_graph

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return knn_graph(ds, k=5, n_centroids=16, n_probe=4)


def q_incremental_dedup_docs(sf_dir: str):
    """Streaming ingest-time dedup: build the sharded actor-held
    MinHash band-bucket index over the documents corpus, then probe a
    deterministic 'new batch' (every 25th doc lightly perturbed -- one
    token swapped -- plus disjoint-vocab fresh docs) WITHOUT any
    corpus x corpus pass.  Returns verified (new_id, dup_of, est_e6)
    matches; the perturbed docs must hit their source, the fresh docs
    must miss (asserted exactly in tests/test_incremental.py)."""
    import ray.data

    from ..functions.incremental import (build_minhash_index,
                                         probe_minhash_index)

    corpus = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
    index = build_minhash_index(corpus, num_shards=4)

    # probe construction stays DISTRIBUTED (perturbed copies of every
    # 25th doc are corpus/25-sized and must never ride the driver)
    def perturb(b: pa.Table) -> pa.Table:
        ids_ = b.column("doc_id").to_numpy()
        keep = ids_ % 25 == 0
        out_i, out_t = [], []
        for i, text in zip(ids_[keep].tolist(),
                           pa.Table.from_arrays(
                               [b.column("text").filter(pa.array(keep))],
                               names=["t"]).column("t").to_pylist()):
            toks = text.split(" ")
            toks[len(toks) // 2] = "zzqxj"    # one-token perturbation
            out_i.append(1_000_000 + i)
            out_t.append(" ".join(toks))
        return pa.table({"doc_id": pa.array(out_i, pa.int64()),
                         "text": pa.array(out_t, pa.string())})

    fresh = pa.table({
        "doc_id": pa.array([2_000_000 + j for j in range(10)],
                           pa.int64()),
        "text": pa.array([" ".join(f"qq{j}w{i}" for i in range(40))
                          for j in range(10)], pa.string())})
    new_ds = (corpus.map_batches(perturb, batch_format="pyarrow")
              .union(ray.data.from_arrow(fresh)))
    return probe_minhash_index(index, new_ds, threshold=0.5)


def q_pack_chunks(sf_dir: str):
    """tokenize -> chunk -> pack: 64-token document chunks (the
    SQL-checked chunk_docs stage) packed into 512-token training
    sequences by per-shard FFD; returns the exact-integer packing
    summary (chunks/tokens conserved, zero over-budget)."""
    from ..functions.packing import pack_sequences, packing_stats
    from .queries import q_chunk_docs

    chunks = q_chunk_docs(sf_dir).drop_columns(["first_token"])
    packed = pack_sequences(chunks, budget=512, n_shards=8)
    row = packing_stats(packed, budget=512)
    return pa.table({k: pa.array([v], pa.int64()) for k, v in row.items()})


def q_raster_calc_index(sf_dir: str):
    """Generic map algebra (Raster-Calculator surface): a normalized
    dem/veg index over the t1 world, reduced to a deterministic integer
    histogram (index binned to 0.1 steps) per tile row."""
    import ray.data

    from ..stages.raster_calc import apply_masked, raster_calc
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    def formula(layers, nd):
        d, v = layers["dem"], layers["veg"]
        return (d - 10.0 * v) / (np.abs(d) + 10.0 * np.abs(v) + 1.0)

    out = raster_calc(ray.data.from_arrow(tiles_table(_t1_cfg())),
                      ["dem", "veg"], apply_masked(formula),
                      out_layer="idx")

    def hist(b: pa.Table) -> pa.Table:
        ids, bins, counts = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            binned = np.floor(arr[valid] * 10).astype(np.int64)
            u, c = np.unique(binned, return_counts=True)
            ids.extend([b.column("image_id")[i].as_py()] * len(u))
            bins.extend(u.tolist())
            counts.extend(c.tolist())
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "bin": pa.array(bins, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    return out.map_batches(hist, batch_format="pyarrow")


def q_focal_stats(sf_dir: str):
    """Focal (moving-window) statistics -- the FocalStatistics analogue
    (the general form of the reference's convo directional scan,
    calculate_bal.py:169-214): radius-3 windowed mean over the t1 dem,
    reduced to deterministic per-tile integer stats rows."""
    import ray.data

    from ..stages.focal import focal_stats
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = focal_stats(ray.data.from_arrow(tiles_table(cfg)),
                      GridSpec.from_synth(cfg), layer="dem", stat="mean",
                      radius=3)

    def stats(b: pa.Table) -> pa.Table:
        ids, n_valid, sums = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            ids.append(b.column("image_id")[i].as_py())
            n_valid.append(int(valid.sum()))
            # integer-quantized checksum: stable across float orderings
            sums.append(int(np.round(arr[valid].astype(np.float64)).sum()))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "qsum": pa.array(sums, pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_polygonize_veg(sf_dir: str):
    """Raster -> vector region extraction (gdal_polygonize's role, the
    inverse of geometry.rasterize): global 4-connected regions of the t1
    veg layer, one deterministic row per region."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.polygonize import polygonize
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = polygonize(ray.data.from_arrow(tiles_table(cfg)),
                     GridSpec.from_synth(cfg), layer="veg")

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "region_id": b.column("region_id"),
            "veg_class": pc.cast(pc.round(b.column("value")), pa.int64()),
            "n_px": b.column("n_px"),
            "xmin": pc.round(b.column("xmin"), 1),
            "ymin": pc.round(b.column("ymin"), 1),
            "xmax": pc.round(b.column("xmax"), 1),
            "ymax": pc.round(b.column("ymax"), 1)})

    return out.map_batches(fmt, batch_format="pyarrow")


def q_twi_dem(sf_dir: str):
    """Topographic Wetness Index (SAGA twi / GRASS r.topidx role): the
    flow-accumulation + Horn-slope + raster_calc composite over the t1
    dem, reduced to per-tile integer stats (TWI in milli-units)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.twi import twi
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = twi(ray.data.from_arrow(tiles_table(cfg)),
              GridSpec.from_synth(cfg))

    def stats(b: pa.Table) -> pa.Table:
        ids, n_valid, tsum, tmax = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.float64)
            ids.append(b.column("image_id")[i].as_py())
            n_valid.append(int(v.size))
            tsum.append(int(np.round(v * 1000).sum()) if v.size else 0)
            tmax.append(int(np.round(v.max() * 1000)) if v.size else 0)
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "twi_sum_m": pa.array(tsum, pa.int64()),
                         "twi_max_m": pa.array(tmax, pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_glcm_texture(sf_dir: str):
    """Haralick GLCM texture (GRASS r.texture role) over the t1 dem:
    per-tile integer stats of the windowed co-occurrence contrast layer
    (levels=8, radius=2, offset (0,1), global [0,600] quantization)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.texture import glcm_texture
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = glcm_texture(ray.data.from_arrow(tiles_table(cfg)),
                       GridSpec.from_synth(cfg), metric="contrast",
                       levels=8, vmin=0.0, vmax=600.0, radius=2)

    def stats(b: pa.Table) -> pa.Table:
        ids, n_valid, csum, cmax = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.float64)
            ids.append(b.column("image_id")[i].as_py())
            n_valid.append(int(v.size))
            csum.append(int(np.round(v * 1000).sum()) if v.size else 0)
            cmax.append(int(np.round(v.max() * 1000)) if v.size else 0)
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "contrast_sum_m": pa.array(csum, pa.int64()),
                         "contrast_max_m": pa.array(cmax, pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_retile_blocks(sf_dir: str):
    """Re-blocking (gdal_retile / BLOCKSIZE role): the t1 world re-tiled
    from 64 px to a non-divisor 96 px grid, reduced to per-tile valid-px
    counts and integer value sums -- pixel-exact re-bucketing means these
    match the source mosaic's numbers redistributed onto the new grid."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.retile import retile
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out, _ = retile(ray.data.from_arrow(tiles_table(cfg)),
                    GridSpec.from_synth(cfg), 96)

    def stats(b: pa.Table) -> pa.Table:
        ids, n_valid, vsum = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            ids.append(b.column("image_id")[i].as_py())
            n_valid.append(int(valid.sum()))
            vsum.append(int(np.round(arr[valid].astype(np.float64) * 100)
                            .sum()) if valid.any() else 0)
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "vsum_c": pa.array(vsum, pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_rasterize_burn(sf_dir: str):
    """Attribute-burn rasterization (gdal_rasterize -a's role, the
    forward direction of the polygonize roundtrip; reference analogue
    the arcpy vector->raster step inside reclass_veg, bal.py:26-73): a
    deterministic seeded polygon table painted onto a tile grid, reduced
    to per-tile (value, n_px) histograms."""
    import ray.data

    from ..geo.geometry import Polygon
    from ..geo.wkb import polygon_to_wkb
    from ..stages.halo import GridSpec
    from ..stages.rasterize import rasterize_polygons
    from ..tiles.codec import Caption, decode_tile

    spec = GridSpec(tiles_x=4, tiles_y=3, tile_px=64, pixel_size=1.0,
                    y_north=192.0)
    rng = np.random.default_rng(20240817)
    W, H = 256.0, 192.0
    gids, vals, wkbs = [], [], []
    for gid in range(40):
        x, y = rng.uniform(-8, W), rng.uniform(-8, H)
        w, h = rng.uniform(4, W * 0.4), rng.uniform(4, H * 0.4)
        if gid % 3:
            ring = [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]
        else:
            ring = [(x, y), (x + w, y + rng.uniform(0, h)),
                    (x + w / 2, y + h)]
        gids.append(gid)
        vals.append(float(rng.integers(1, 12)))
        wkbs.append(polygon_to_wkb(Polygon(np.array(ring, float))))
    polys = ray.data.from_arrow(pa.table({
        "gid": pa.array(gids, pa.int64()),
        "bal_number": pa.array(vals, pa.float64()),
        "geom": pa.array(wkbs, pa.binary())})).repartition(4)
    out = rasterize_polygons(polys, spec)

    def hist(b: pa.Table) -> pa.Table:
        ids, value, counts = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            u, c = np.unique(arr[arr != np.float32(cap.nodata)],
                             return_counts=True)
            ids.extend([b.column("image_id")[i].as_py()] * len(u))
            value.extend(np.round(u.astype(np.float64)).astype(np.int64)
                         .tolist())
            counts.extend(c.tolist())
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "value": pa.array(value, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    return out.map_batches(hist, batch_format="pyarrow")


def q_veg_proximity(sf_dir: str):
    """Bounded proximity raster (gdal_proximity's role; the generalized
    distance-to-vegetation core, calculate_bal.py:169-214) over the t1
    world: distance to veg classes {1,2} out to 100 m, binned into the
    reference's AS 3959 distance classes (value_lookup.py:15-23) as a
    deterministic per-tile histogram."""
    import ray.data

    from ..core.tables import find_dist_class
    from ..stages.halo import GridSpec
    from ..stages.proximity import proximity
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = proximity(ray.data.from_arrow(tiles_table(cfg)),
                    GridSpec.from_synth(cfg), layer="veg",
                    target_values=(1.0, 2.0), max_dist=100.0)
    dist_limit = (16.0, 21.0, 31.0, 100.0)

    def hist(b: pa.Table) -> pa.Table:
        ids, cls, counts = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            dclass = find_dist_class(arr[valid].astype(np.float64),
                                     dist_limit)
            u, c = np.unique(dclass, return_counts=True)
            ids.extend([b.column("image_id")[i].as_py()] * len(u))
            cls.extend(u.tolist())
            counts.extend(c.tolist())
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "dist_class": pa.array(cls, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    return out.map_batches(hist, batch_format="pyarrow")


def q_hillshade(sf_dir: str):
    """gdaldem hillshade analogue (SURVEY op 26; the reference runs
    gdaldem at data_prep/03_create_dem_aspect_slope_rasters.sh:24-33)
    over the t1 dem, reduced to deterministic per-tile integer stats."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.terrain import hillshade
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = hillshade(ray.data.from_arrow(tiles_table(cfg)),
                    GridSpec.from_synth(cfg))

    def stats(b: pa.Table) -> pa.Table:
        ids, n_valid, sums = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            ids.append(b.column("image_id")[i].as_py())
            n_valid.append(int(valid.sum()))
            sums.append(int(np.round(arr[valid].astype(np.float64)).sum()))
        return pa.table({"image_id": pa.array(ids, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "qsum": pa.array(sums, pa.int64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_dem_metrics(sf_dir: str):
    """gdaldem's remaining terrain modes (TPI / TRI / roughness) over the
    t1 dem -- per-tile quantized stats rows, one set per metric."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.terrain import dem_metrics
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    tab = tiles_table(cfg)
    spec = GridSpec.from_synth(cfg)

    def stats(b: pa.Table) -> pa.Table:
        met, ids, n_valid, sums = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            met.append(cap.layer)
            ids.append(b.column("image_id")[i].as_py())
            n_valid.append(int(valid.sum()))
            sums.append(int(np.round(
                arr[valid].astype(np.float64) * 10).sum()))
        return pa.table({"metric": pa.array(met, pa.string()),
                         "image_id": pa.array(ids, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "qsum": pa.array(sums, pa.int64())})

    out = None
    for metric in ("tpi", "tri", "roughness"):
        part = dem_metrics(ray.data.from_arrow(tab), spec, metric=metric)
        out = part if out is None else out.union(part)
    return out.map_batches(stats, batch_format="pyarrow")


def q_site_bal_rating(sf_dir: str):
    """The reference's END PRODUCT, composed from engine stages: full BAL
    run on the t1 world -> bal_max band tiles -> per-site point sample
    (the per-address BAL rating Gen-2 exists to produce; window-read
    pattern of testing/02_get_slope_from_buffer.py:204-251 at 0 m
    buffer).  Deterministic (site_id, x, y, bal_class) rows; sites
    outside the grid emit the reference's -9999 sentinel."""
    import ray.data

    from ..pipelines.bal_pipeline import bal_pipeline
    from ..stages.halo import GridSpec
    from ..stages.site_sample import sample_raster
    from ..tiles.synth import sites_table, tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    bal = bal_pipeline(ray.data.from_arrow(tiles_table(cfg)), spec,
                       bands=("max",))
    out = sample_raster(ray.data.from_arrow(sites_table(cfg, n=64)),
                        bal, spec, layer="bal_max", value_col="bal_class")

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "site_id": b.column("site_id"),
            "x": pc.round(b.column("x"), 2),
            "y": pc.round(b.column("y"), 2),
            "bal_class": pc.round(b.column("bal_class"), 1)})

    return out.map_batches(fmt, batch_format="pyarrow")


def q_dedup_survivor_docs(sf_dir: str):
    """The full industrial near-dup pipeline: MinHash LSH pairs ->
    distributed union-find components -> keep the min-id canonical doc
    per component plus every unpaired doc (anti-join; the corpus streams,
    only the victim table is dup-sized)."""
    import ray.data

    from ..functions.components import connected_components, dedup_survivors
    from ..functions.dedup import minhash_lsh_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "n_chars"])
    texts = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(texts, threshold=0.9)
    comp = connected_components(pairs)
    return dedup_survivors(ds, comp, id_col="doc_id")


def q_simhash_pairs_docs(sf_dir: str):
    import ray.data

    from ..functions.dedup import simhash_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=2)


def q_embedding_dups(sf_dir: str):
    """LSH-bucketed cosine pairs at the same threshold as the SQL-checked
    exact variant (``cosine_pairs``) -- the candidates it surfaces are a
    recall-limited subset of that oracle (tested in test_functions.py)."""
    import ray.data

    from ..functions.dedup import embedding_dup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return embedding_dup_pairs(ds, threshold=0.45, n_planes=4,
                               n_bands=8)


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table -> per-cluster
    row counts.  Broadcast-centroid partial/final aggregate; deterministic
    (seeded k-means++ on a hash sample, fixed-order combine)."""
    import ray.data
    import ray.data.aggregate as agg

    from ..functions.cluster import kmeans_assign, kmeans_fit

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cents = kmeans_fit(ds, 8, iters=8, sample_size=512)
    return (kmeans_assign(ds, cents)
            .groupby("cluster_id").aggregate(agg.Count(alias_name="n")))


def q_pca_embeddings(sf_dir: str):
    """Distributed PCA projection (functions/pca.py): exact integer
    moment fold (the SQL-checked ``embedding_gram`` machinery) -> driver
    eigh on the d x d covariance -> broadcast matmul projection onto the
    top-2 axes.  Parity vs a single-process numpy oracle in
    test_pca.py."""
    import ray.data

    from ..functions.pca import pca_project

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return pca_project(ds, k=2)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means partition then exact within-cluster cosine pairs
    -- recall-limited subset of the SQL-checked exact ``cosine_pairs``
    oracle (subset relation asserted in test_cluster.py)."""
    import ray.data

    from ..functions.cluster import semantic_dedup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return semantic_dedup_pairs(ds, k=8, threshold=0.45, sample_size=512)


def q_veg_prep(sf_dir: str):
    """Gen-2 data-prep flow: explode multipolygons -> NVIS classify ->
    subdivide -> per-class partial/final roll-up (ops 29-33)."""
    import ray.data

    from ..pipelines.veg_prep import veg_prep_pipeline
    from ..tiles.synth import SynthConfig, raw_nvis_table

    cfg = SynthConfig(tiles_x=4, tiles_y=4, tile_px=64, n_polygons=96)
    raw = ray.data.from_arrow(raw_nvis_table(cfg))
    _, summary = veg_prep_pipeline(raw, max_vertices=32)
    return summary


def q_simplify_veg(sf_dir: str):
    """ST_Simplify analogue: Douglas-Peucker over the veg polygon table
    (stateless map_batches, pure numpy per ring), reporting per-class
    vertex reduction and bounded area drift -- deterministic rows."""
    import ray.data

    from ..geo.geometry import simplify
    from ..geo.wkb import from_wkb, polygon_to_wkb
    from ..tiles.synth import veg_polygon_table

    cfg = _t1_cfg()
    tol = 2.0 * cfg.pixel_size

    def simp(b: pa.Table) -> pa.Table:
        cls, v_in, v_out, a_in, a_out = [], [], [], [], []
        for i in range(b.num_rows):
            g = from_wkb(b.column("geom")[i].as_py())
            parts = g if isinstance(g, list) else [g]
            for p in parts:
                s = simplify(p, tol)
                cls.append(int(b.column("bal_number")[i].as_py()))
                v_in.append(len(p.exterior) - 1)
                v_out.append(0 if s is None else len(s.exterior) - 1)
                a_in.append(p.area)
                a_out.append(0.0 if s is None else s.area)
                if s is not None:
                    polygon_to_wkb(s)  # round-trip stays valid WKB
        return pa.table({
            "bal_number": pa.array(cls, pa.int64()),
            "v_in": pa.array(v_in, pa.int64()),
            "v_out": pa.array(v_out, pa.int64()),
            "area_drift": pa.array(
                [round(abs(ai - ao), 3) for ai, ao in zip(a_in, a_out)],
                pa.float64())})

    import ray.data.aggregate as agg

    return (ray.data.from_arrow(veg_polygon_table(cfg))
            .map_batches(simp, batch_format="pyarrow")
            .groupby("bal_number")
            .aggregate(agg.Sum("v_in", alias_name="v_in"),
                       agg.Sum("v_out", alias_name="v_out"),
                       agg.Sum("area_drift", alias_name="area_drift")))


def q_veg_class_union(sf_dir: str):
    """Geometric per-class union (chunked partial/final ST_Union tree,
    reference 04_merge_geometries.py:129-205): one merged multipolygon row
    per BAL class with exact dissolve area."""
    import ray.data

    from ..pipelines.veg_prep import class_union_pipeline, veg_prep_pipeline
    from ..tiles.synth import SynthConfig, raw_nvis_table

    cfg = SynthConfig(tiles_x=4, tiles_y=4, tile_px=64, n_polygons=96)
    raw = ray.data.from_arrow(raw_nvis_table(cfg))
    prepped, _ = veg_prep_pipeline(raw, max_vertices=32)
    return (class_union_pipeline(prepped)
            .drop_columns(["geom"]))       # driver check: counts/areas


def q_ivf_ann(sf_dir: str):
    import ray.data

    from ..functions.ann import ivf_topk

    emb = _head_rows(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding"], 3)
    queries = np.array(emb.column("embedding").to_pylist(),
                       dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ivf_topk(ds, queries, k=5, n_centroids=16, n_probe=4)


def q_pq_ann(sf_dir: str):
    """Product-quantization ANN (ADC scan + exact shortlist re-rank) --
    the memory path of the similarity-search family; recall vs the brute
    baseline is asserted in tests/test_functions.py."""
    import ray.data

    from ..functions.ann import pq_topk

    emb = _head_rows(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding"], 3)
    queries = np.array(emb.column("embedding").to_pylist(),
                       dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return pq_topk(ds, queries, k=5, n_sub=8, n_codes=32)


def q_sq_ann(sf_dir: str):
    """Scalar int8-quantized ANN (1 byte/dim codes, dequantized cosine
    scan + partial top-k): the 4x-compression path of the similarity
    family; >=0.9 recall vs exact is asserted in tests/test_functions."""
    import ray.data

    from ..functions.ann import sq_encode, sq_topk, sq_train

    emb = _head_rows(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding"], 3)
    queries = np.array(emb.column("embedding").to_pylist(),
                       dtype=np.float64)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    ranges = sq_train(ds)
    return sq_topk(sq_encode(ds, ranges), queries, ranges, k=5)


def q_kmv_distinct(sf_dir: str):
    """KMV distinct-count sketch over lineitem.l_partkey -- the fixed-
    size-partial approx aggregate (no sketch exists in the reference;
    SURVEY.md §2.3). Deterministic, so the driver's rows-only check is
    stable; the pytest asserts the error bound against the exact count."""
    import ray.data

    from ..functions.sketch import kmv_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey"])
    return kmv_distinct(ds, "l_partkey", k=1024)


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-count over lineitem.l_partkey -- the
    constant-4KB-partial twin of the KMV sketch (max-merged registers,
    estimate bit-identical under any block layout; error bound pinned
    in tests/test_functions.py)."""
    import ray.data

    from ..functions.sketch import hll_distinct

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey"])
    return hll_distinct(ds, "l_partkey")


def q_approx_quantiles(sf_dir: str):
    """Histogram-sketch quantiles over lineitem.l_extendedprice -- the
    fixed-size-partial approx aggregate for continuous domains (exact
    twin: SQL-checked ``quantiles_by_flag``).  Deterministic; the pytest
    asserts the one-bin-width error bound against np.quantile."""
    import ray.data

    from ..functions.sketch import histogram_quantiles

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_extendedprice"])
    return histogram_quantiles(ds, "l_extendedprice",
                               qs=(0.25, 0.5, 0.75, 0.95), nbins=2048)


def q_phash_dup_tiles(sf_dir: str):
    """Image near-dedup over the tile table: perceptual-hash (phash)
    pigeonhole buckets + exact Hamming verify -- the image-side analogue
    of simhash text dedup, over the table's precomputed ``phash`` column
    (no pixel decode in the hot path)."""
    import ray.data

    from ..functions.dedup import hash64_dup_pairs
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(tiles_table(cfg))
    return hash64_dup_pairs(ds, id_col="image_id", hash_col="phash",
                            max_hamming=2)


def q_phash_dup_clusters(sf_dir: str):
    """The industrial image-dedup tail behind :func:`q_phash_dup_tiles`:
    phash near-dup pairs (pigeonhole bucket + exact Hamming verify) ->
    connected components (tree-reduce union-find forest contraction) ->
    per-cluster member count with the canonical survivor (min image_id ==
    the component id, the same first-wins rule as exact_dedup).  Output:
    ``(survivor, n_members)`` for every cluster of >= 2 near-duplicate
    tiles.  Only 16 B/pair ids enter the component stage -- pixels never
    leave the pair-verify buckets."""
    import ray.data
    import ray.data.aggregate as agg

    from ..functions.components import connected_components
    from ..functions.dedup import hash64_dup_pairs
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(tiles_table(cfg))
    pairs = hash64_dup_pairs(ds, id_col="image_id", hash_col="phash",
                             max_hamming=2)
    comp = connected_components(pairs, "id_a", "id_b")
    return (comp.groupby("component_id")
            .aggregate(agg.Count(alias_name="n_members"))
            .map_batches(lambda b: pa.table({
                "survivor": b.column("component_id"),
                "n_members": b.column("n_members")}),
                batch_format="pyarrow"))


def q_tile_pyramid(sf_dir: str):
    """Overview pyramid (SURVEY op 20 BuildPyramidsandStatistics): two
    2x levels over the t1 world (mean for dem, majority for veg), reduced
    to deterministic per-level/per-layer stats rows."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.overviews import build_overviews
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    levels = build_overviews(ray.data.from_arrow(tiles_table(cfg)),
                             GridSpec.from_synth(cfg), levels=2)

    def stats(batch: pa.Table, *, level: int) -> pa.Table:
        rows = {}
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            n, vp, s = rows.get(cap.layer, (0, 0, 0.0))
            rows[cap.layer] = (n + 1, vp + int(valid.sum()),
                               s + float(arr[valid].sum()))
        return pa.table({
            "level": pa.array([level] * len(rows), pa.int64()),
            "layer": list(rows),
            "n_tiles": pa.array([v[0] for v in rows.values()], pa.int64()),
            "valid_px": pa.array([v[1] for v in rows.values()], pa.int64()),
            "px_sum": pa.array([v[2] for v in rows.values()],
                               pa.float64())})

    import functools
    import ray.data.aggregate as agg

    parts = [ds.map_batches(functools.partial(stats, level=lv),
                            batch_format="pyarrow")
             for lv, _, ds in levels]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    def round_final(b: pa.Table) -> pa.Table:
        # round ONCE after the final Sum -- rounding the per-batch
        # partials would make the result depend on block partitioning
        i = b.column_names.index("px_sum")
        return b.set_column(i, "px_sum", pc.round(b.column("px_sum"), 2))

    return (merged.groupby(["level", "layer"])
            .aggregate(agg.Sum("n_tiles", alias_name="n_tiles"),
                       agg.Sum("valid_px", alias_name="valid_px"),
                       agg.Sum("px_sum", alias_name="px_sum"))
            .map_batches(round_final, batch_format="pyarrow"))


def q_contour_lines(sf_dir: str):
    """gdal_contour analogue: marching-squares iso-lines over the t1 dem
    (tiled run is segment-identical to a whole-raster pass --
    tests/test_contour.py), reduced to per-level deterministic integers:
    segment count + total length in micro-units (per-segment quantization
    keeps the sum order-independent)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..stages.contour import contour_lines
    from ..stages.halo import GridSpec
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    segs = contour_lines(ray.data.from_arrow(tiles_table(cfg)),
                         GridSpec.from_synth(cfg),
                         levels=(40.0, 70.0, 100.0), layer="dem")

    def pre(b: pa.Table) -> pa.Table:
        ax = b.column("ax").to_numpy(zero_copy_only=False)
        ay = b.column("ay").to_numpy(zero_copy_only=False)
        bx = b.column("bx").to_numpy(zero_copy_only=False)
        by = b.column("by").to_numpy(zero_copy_only=False)
        ln = np.hypot(bx - ax, by - ay)
        return pa.table({
            "level": pc.cast(b.column("level"), pa.int64()),
            "len_um": pa.array(np.round(ln * 1e6).astype(np.int64),
                               pa.int64())})

    return (segs.map_batches(pre, batch_format="pyarrow")
            .groupby("level")
            .aggregate(Count(alias_name="n_segments"),
                       Sum("len_um", alias_name="total_len_um"))
            .sort("level"))


def q_site_viewshed(sf_dir: str):
    """Per-site bounded-radius viewshed (gdal_viewshed's role, radius-
    bounded like the AS 3959 scan itself) over the t1 dem: deterministic
    per-site integer visibility counts for 48 probe sites (verified
    against a scalar R3 oracle in tests/test_viewshed.py)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.viewshed import site_viewshed
    from ..tiles.synth import sites_table, tiles_table

    cfg = _t1_cfg()
    out = site_viewshed(
        ray.data.from_arrow(sites_table(cfg, n=48)),
        ray.data.from_arrow(tiles_table(cfg)),
        GridSpec.from_synth(cfg), radius_m=5 * cfg.pixel_size,
        observer_height=0.0)
    return (out.select_columns(["site_id", "visible_px", "total_px"])
            .sort("site_id"))


def _t1_lines():
    """Deterministic transects over the t1 world for profile/LOS: random
    interior segments plus the corner diagonal and one grid-exiting
    line (the OUT_OF_AREA path)."""
    cfg = _t1_cfg()
    ps = cfg.pixel_size
    W = cfg.tiles_x * cfg.tile_px * ps
    H = cfg.tiles_y * cfg.tile_px * ps
    rng = np.random.default_rng(31)
    pts = rng.uniform(0.05, 0.95, (14, 4))
    rows = [(f"l{i:02d}", x0 * W, y0 * H, x1 * W, y1 * H)
            for i, (x0, y0, x1, y1) in enumerate(pts)]
    rows += [("diag", 0.5 * ps, 0.5 * ps, W - 0.5 * ps, H - 0.5 * ps),
             ("exit", 0.8 * W, 0.5 * H, 1.2 * W, 0.5 * H)]
    return cfg, pa.table({
        "line_id": pa.array([r[0] for r in rows], pa.string()),
        "x0": pa.array([r[1] for r in rows], pa.float64()),
        "y0": pa.array([r[2] for r in rows], pa.float64()),
        "x1": pa.array([r[3] for r in rows], pa.float64()),
        "y1": pa.array([r[4] for r in rows], pa.float64())})


def q_terrain_profile(sf_dir: str):
    """Elevation transects (gdallocationinfo-along-a-line role) over the
    t1 dem: 16 deterministic lines densified at pixel spacing, sampled
    through the one-shuffle cell-keyed plan (bit-exact vs the scalar
    oracle in tests/test_profile.py), reduced to per-line aggregates."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.profile import OUT_OF_AREA, terrain_profile
    from ..tiles.synth import tiles_table

    cfg, lines = _t1_lines()
    prof = terrain_profile(ray.data.from_arrow(lines),
                           ray.data.from_arrow(tiles_table(cfg)),
                           GridSpec.from_synth(cfg))

    def agg(group: pa.Table) -> pa.Table:
        z = group.column("z").to_numpy()
        valid = z != OUT_OF_AREA
        zmin = float(z[valid].min()) if valid.any() else OUT_OF_AREA
        zmax = float(z[valid].max()) if valid.any() else OUT_OF_AREA
        return pa.table({
            "line_id": pa.array([group.column("line_id")[0].as_py()]),
            "n_steps": pa.array([group.num_rows], pa.int64()),
            "n_valid": pa.array([int(valid.sum())], pa.int64()),
            "z_min": pa.array([round(zmin, 4)], pa.float64()),
            "z_max": pa.array([round(zmax, 4)], pa.float64())})

    return (prof.groupby("line_id")
            .map_groups(agg, batch_format="pyarrow")
            .sort("line_id"))


def q_line_of_sight(sf_dir: str):
    """Point-to-point line-of-sight verdicts (gdal_viewshed single-ray
    role) for the same 16 transects, tangent-angle rule, oracle-exact in
    tests/test_profile.py."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.profile import line_of_sight
    from ..tiles.synth import tiles_table

    cfg, lines = _t1_lines()
    out = line_of_sight(ray.data.from_arrow(lines),
                        ray.data.from_arrow(tiles_table(cfg)),
                        GridSpec.from_synth(cfg), observer_height=1.8)
    return out.sort("line_id")


def q_augment_epoch(sf_dir: str):
    """Deterministic per-epoch augmentation (stages/augment.py): two
    epochs over the t1 dem tiles, reduced to (image_id, phash) rows --
    replay-exact in tests/test_augment.py, stable across block
    orders."""
    import ray.data

    from ..stages.augment import augment_images
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    tab = tiles_table(cfg, layers=("dem",))
    eps = [augment_images(ray.data.from_arrow(tab), epoch=e, crop_px=32)
           for e in (0, 1)]
    out = eps[0].union(eps[1])
    return (out.select_columns(["image_id", "w", "h", "phash"])
            .sort("image_id"))


def q_layer_stats(sf_dir: str):
    """Per-layer raster statistics (the BuildPyramidsandStatistics
    stats half, op 20, and the training-normalization mean/std pass):
    bit-reproducible ordered fold over per-tile partials, mosaic-exact
    in tests/test_stats.py."""
    import ray.data

    from ..stages.stats import layer_statistics
    from ..tiles.synth import tiles_table

    out = layer_statistics(ray.data.from_arrow(tiles_table(_t1_cfg())))

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "layer": b.column("layer"),
            "n_valid": b.column("n_valid"),
            "mean": pc.round(b.column("mean"), 6),
            "std": pc.round(b.column("std"), 6),
            "min": pc.round(b.column("min"), 4),
            "max": pc.round(b.column("max"), 4)})

    return out.map_batches(fmt, batch_format="pyarrow").sort("layer")


def q_nms_boxes(sf_dir: str):
    """Class-aware detection-box NMS (pseudo-label filtering for vision
    training data) over deterministic clustered boxes on the t1 tile
    images -- one groupby(image) shuffle, greedy oracle-exact in
    tests/test_boxes.py."""
    import ray.data

    from ..functions.boxes import nms
    from ..tiles.synth import boxes_table

    out = nms(ray.data.from_arrow(boxes_table(_t1_cfg())), iou_thr=0.45)

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": b.column("image_id"),
            "box_id": b.column("box_id"),
            "cls": b.column("cls"),
            "score": b.column("score"),
            "x0": pc.round(b.column("x0"), 3),
            "y0": pc.round(b.column("y0"), 3),
            "x1": pc.round(b.column("x1"), 3),
            "y1": pc.round(b.column("y1"), 3)})

    return out.map_batches(fmt, batch_format="pyarrow").sort("box_id")


def q_box_match(sf_dir: str):
    """COCO-style greedy pred-vs-truth box assignment (detection eval /
    pseudo-label QA): deterministic jittered detector output matched to
    the t1 truth boxes at IoU>=0.3 -- tagged-union + one groupby(image)
    shuffle, oracle-exact in tests/test_boxes.py.  FP rows carry
    matched_id=-1, missed truths appear as box_id=-1 FN rows."""
    import ray.data

    from ..functions.boxes import match_boxes
    from ..tiles.synth import boxes_table, pred_boxes_table

    cfg = _t1_cfg()
    out = match_boxes(ray.data.from_arrow(pred_boxes_table(cfg)),
                      ray.data.from_arrow(boxes_table(cfg)),
                      iou_thr=0.3)

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": b.column("image_id"),
            "box_id": b.column("box_id"),
            "cls": b.column("cls"),
            "score": b.column("score"),
            "matched_id": b.column("matched_id"),
            "iou": pc.round(b.column("iou"), 4),
            "tp": b.column("tp")})

    return (out.map_batches(fmt, batch_format="pyarrow")
            .sort(["box_id", "matched_id"]))


def q_sieve_veg(sf_dir: str):
    """gdal_sieve analogue: dissolve sub-threshold connected regions of
    the t1 veg raster into their largest neighbours (pixel-exact vs a
    rewrite-and-relabel oracle in tests/test_sieve.py), reduced to a
    per-class pixel histogram before/after."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.sieve import sieve
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = sieve(ray.data.from_arrow(tiles_table(cfg)),
                GridSpec.from_synth(cfg), layer="veg", min_px=8)

    def hist(b: pa.Table) -> pa.Table:
        cls, counts = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v, c = np.unique(arr.astype(np.int64), return_counts=True)
            cls.extend(int(x) for x in v)
            counts.extend(int(x) for x in c)
        return pa.table({"veg_class": pa.array(cls, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    return (out.map_batches(hist, batch_format="pyarrow")
            .groupby("veg_class")
            .aggregate(Sum("n_px", alias_name="n_px"))
            .sort("veg_class"))


def q_flow_accumulation(sf_dir: str):
    """D8 flow direction + GLOBAL flow accumulation over the t1 DEM
    (FlowDirection/FlowAccumulation pair; pixel-exact vs whole-raster
    Kahn-DP oracle in tests/test_hydrology.py), reduced to per-direction
    pixel counts and drainage stats: for each D8 code, how many pixels
    flow that way and the max/total accumulation among them."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.hydrology import flow_accumulation, flow_direction
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg))
    dirs = flow_direction(tiles, spec)
    acc = flow_accumulation(tiles, spec)

    def px_rows(b: pa.Table) -> pa.Table:
        code, val = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            lay = 0 if cap.layer == "d8" else 1
            code.extend(np.full(arr.size, lay, np.int64))
            val.extend(arr.ravel().astype(np.float64))
        return pa.table({"which": pa.array(code, pa.int64()),
                         "value": pa.array(val, pa.float64())})

    # join the two rasters pixelwise: same grid, so zip via sorted key
    # is overkill -- reduce each to its own stats instead
    from ray.data.aggregate import Count, Max, Sum

    dir_hist = (dirs.map_batches(px_rows, batch_format="pyarrow")
                .groupby("value")
                .aggregate(Count(alias_name="n_px"))
                .sort("value"))
    acc_stats = (acc.map_batches(px_rows, batch_format="pyarrow")
                 .filter(expr="value >= 0")
                 .groupby("which")
                 .aggregate(Count(alias_name="n_px"),
                            Max("value", alias_name="max_acc"),
                            Sum("value", alias_name="total_acc")))
    h = dir_hist.to_pandas()
    s = acc_stats.to_pandas()
    import pandas as pd

    h["kind"] = "d8_code"
    h = h.rename(columns={"value": "key"})
    s["kind"] = "acc"
    s["key"] = s.pop("which").astype(float)
    return pd.concat([h[["kind", "key", "n_px"]],
                      s[["kind", "key", "n_px", "max_acc", "total_acc"]]],
                     ignore_index=True)


def q_watershed_basins(sf_dir: str):
    """Watershed/Basin labeling over the t1 DEM (companion of
    FlowAccumulation; pixel-exact vs the whole-raster pointer-doubling
    oracle in tests/test_hydrology.py), reduced to basin-size stats:
    per basin-size bucket (log2), how many basins and pixels."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.hydrology import watershed
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    out = watershed(ray.data.from_arrow(tiles_table(cfg)), spec)

    def basin_rows(b: pa.Table) -> pa.Table:
        bas, cnt = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.int64)
            u, c = np.unique(v, return_counts=True)
            bas.extend(int(x) for x in u)
            cnt.extend(int(x) for x in c)
        return pa.table({"basin": pa.array(bas, pa.int64()),
                         "n_px": pa.array(cnt, pa.int64())})

    from ray.data.aggregate import Count, Sum

    sizes = (out.map_batches(basin_rows, batch_format="pyarrow")
             .groupby("basin")
             .aggregate(Sum("n_px", alias_name="size")))

    def bucket(b: pa.Table) -> pa.Table:
        s = b.column("size").to_numpy(zero_copy_only=False)
        return pa.table({
            "log2_size": pa.array(
                np.floor(np.log2(s)).astype(np.int64), pa.int64()),
            "size": b.column("size")})

    return (sizes.map_batches(bucket, batch_format="pyarrow")
            .groupby("log2_size")
            .aggregate(Count(alias_name="n_basins"),
                       Sum("size", alias_name="n_px"))
            .sort("log2_size"))


def q_lm_perplexity(sf_dir: str):
    """CCNet-style corpus quality scoring: train a Laplace bigram LM on
    the documents table (count shuffle + vocab cap + one broadcast),
    score every doc's perplexity, reduce to per-log2(ppl)-bucket counts.
    Exactness vs the single-process oracle pinned in tests/test_lm.py."""
    import ray
    import ray.data

    from ..functions.lm import score_perplexity, train_bigram_lm

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    model = train_bigram_lm(ds, vocab_size=4096, min_count=1)
    scored = score_perplexity(ds, model)

    def bucket(b: pa.Table) -> pa.Table:
        ppl = b.column("ppl").to_numpy(zero_copy_only=False)
        lb = np.where(ppl > 0, np.floor(np.log2(np.maximum(ppl, 1e-9))),
                      -1).astype(np.int64)
        return pa.table({"log2_ppl": pa.array(lb, pa.int64()),
                         "n_tokens": b.column("n_tokens")})

    from ray.data.aggregate import Count, Sum

    return (scored.map_batches(bucket, batch_format="pyarrow")
            .groupby("log2_ppl")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens"))
            .sort("log2_ppl"))


def q_flow_length(sf_dir: str):
    """Downstream flow length over the t1 DEM (ArcGIS FlowLength role;
    pixel-exact vs the integer-pair pointer-doubling oracle in
    tests/test_hydrology.py), reduced to length-decile pixel counts."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.hydrology import flow_length
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    out = flow_length(ray.data.from_arrow(tiles_table(cfg)), spec)

    def hist(b: pa.Table) -> pa.Table:
        buckets, counts = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.float64)
            lb = np.where(v > 0, np.floor(np.log2(np.maximum(
                v / cap.pixel_size, 1e-9))), -1).astype(np.int64)
            u, c = np.unique(lb, return_counts=True)
            buckets.extend(int(x) for x in u)
            counts.extend(int(x) for x in c)
        return pa.table({"log2_steps": pa.array(buckets, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    return (out.map_batches(hist, batch_format="pyarrow")
            .groupby("log2_steps")
            .aggregate(Sum("n_px", alias_name="n_px"))
            .sort("log2_steps"))


def q_basin_zonal(sf_dir: str):
    """Composition showcase: watershed basins of the t1 DEM feed the
    raster-zone zonal stage -- per-basin elevation stats (ZonalStatistics
    with raster zones), top 8 basins by pixel count."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.hydrology import watershed
    from ..stages.zone_stats import zonal_by_zone_raster
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    basins = watershed(tiles, spec)
    out = zonal_by_zone_raster(tiles.union(basins), spec,
                               zone_layer="watershed", value_layer="dem")
    def sort_key(b: pa.Table) -> pa.Table:
        # single int64 sort key: pixel count desc, basin id asc tiebreak.
        # zone is a global pixel flat index; the 26-bit pack is only
        # valid under 2**26 pixels (true for t1) -- refuse loudly beyond
        n = b.column("n_px").to_numpy(zero_copy_only=False)
        z = b.column("zone").to_numpy(zero_copy_only=False)
        if z.size and int(z.max()) >= (1 << 26):
            raise ValueError("basin id >= 2**26: widen the packed sort "
                             "key before running on worlds > 67M px")
        return b.append_column(
            "neg_n_zone", pa.array(-(n.astype(np.int64) << 26) + z,
                                   pa.int64()))

    return (out.map_batches(sort_key, batch_format="pyarrow")
            .sort("neg_n_zone").limit(8).drop_columns(["neg_n_zone"]))


def q_cost_paths(sf_dir: str):
    """Least-cost path backtrace (CostPath role) from three fixed
    destinations to the nearest vegetation-class-2 source through the
    terrain friction surface; exact gradient-walk parity pinned in
    tests/test_cost.py.  Returns the full path rows."""
    import ray
    import ray.data

    from ..stages.cost import cost_path
    from ..stages.halo import GridSpec
    from ..stages.raster_calc import apply_masked, raster_calc
    from ..tiles.synth import SynthConfig, tiles_table

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=48)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg))
    cost = raster_calc(
        tiles, ["dem"],
        apply_masked(lambda L, nd: 1.0 + np.maximum(L["dem"], 0.0) / 50.0),
        out_layer="friction")
    W = cfg.tiles_x * cfg.tile_px
    dests = [(0, W - 3, W - 3), (1, 2, W - 2), (2, W - 2, 2)]
    return (cost_path(tiles.union(cost), spec, dests,
                      cost_layer="friction", src_layer="veg",
                      src_value=2.0)
            .sort(["dest_id", "step"]))


def q_stream_order(sf_dir: str):
    """Strahler stream order over the t1 DEM (ArcGIS StreamOrder role;
    pixel-exact vs the whole-raster Kahn-wave oracle in
    tests/test_hydrology.py), reduced to pixels-per-order counts."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.hydrology import stream_order
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    out = stream_order(ray.data.from_arrow(tiles_table(cfg)), spec)

    def hist(b: pa.Table) -> pa.Table:
        orders, counts = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.int64)
            u, c = np.unique(v, return_counts=True)
            orders.extend(int(x) for x in u)
            counts.extend(int(x) for x in c)
        return pa.table({"order": pa.array(orders, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    return (out.map_batches(hist, batch_format="pyarrow")
            .groupby("order")
            .aggregate(Sum("n_px", alias_name="n_px"))
            .sort("order"))


def q_cost_distance(sf_dir: str):
    """Weighted cost distance (CostDistance / r.cost role) over the t1
    world: terrain-weighted distance from vegetation class 2, bit-exact
    vs the whole-raster relaxation kernel (tests/test_cost.py), reduced
    to reachability stats per distance decile."""
    import ray
    import ray.data

    from ..stages.cost import cost_distance
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    from ..stages.raster_calc import apply_masked, raster_calc
    from ..tiles.synth import SynthConfig

    # a 3x3 world keeps the border-iteration round count (and gate
    # latency) modest while still exercising multi-tile propagation
    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=48)
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg))
    # derive a strictly positive friction layer from the DEM (the DEM
    # itself dips below zero, which cost_distance loudly rejects)
    cost = raster_calc(
        tiles, ["dem"],
        apply_masked(lambda L, nd: 1.0 + np.maximum(L["dem"], 0.0) / 50.0),
        out_layer="friction")
    out = cost_distance(tiles.union(cost), spec,
                        cost_layer="friction", src_layer="veg",
                        src_value=2.0)

    def dist_rows(b: pa.Table) -> pa.Table:
        vals = []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)]
            vals.append(v.astype(np.float64))
        flat = (np.concatenate(vals) if vals
                else np.empty(0, np.float64))
        # decile by log10 bucket: deterministic, shuffle-free reduction
        b10 = np.where(flat > 0, np.floor(np.log10(flat + 1.0)), 0)
        return pa.table({"log10_dist": pa.array(b10.astype(np.int64),
                                                pa.int64()),
                         "one": pa.array(np.ones(len(b10), np.int64),
                                         pa.int64())})

    from ray.data.aggregate import Count

    return (out.map_batches(dist_rows, batch_format="pyarrow")
            .groupby("log10_dist")
            .aggregate(Count(alias_name="n_px"))
            .sort("log10_dist"))


def q_image_filters(sf_dir: str):
    """Gaussian blur + Sobel edge magnitude + focal median + bilateral
    (edge-preserving) over the t1 DEM, bit-exact vs whole-raster kernels
    in tests/test_filters.py, reduced to per-layer valid-pixel stats."""
    import ray
    import ray.data

    from ..stages.filters import bilateral_filter, focal_median, \
        gaussian_blur, sobel_edges
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    out = (gaussian_blur(tiles, spec, sigma=2.0)
           .union(sobel_edges(tiles, spec))
           .union(focal_median(tiles, spec, radius=2))
           .union(bilateral_filter(tiles, spec, sigma_s=2.0,
                                   sigma_r=6.0)))

    def stats(b: pa.Table) -> pa.Table:
        lay, n, s, mx = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            v = arr[arr != np.float32(cap.nodata)].astype(np.float64)
            lay.append(cap.layer)
            n.append(int(v.size))
            s.append(float(v.sum()))
            mx.append(float(v.max()) if v.size else 0.0)
        return pa.table({"layer": pa.array(lay, pa.string()),
                         "n_px": pa.array(n, pa.int64()),
                         "total": pa.array(s, pa.float64()),
                         "max_val": pa.array(mx, pa.float64())})

    from ray.data.aggregate import Max, Sum

    return (out.map_batches(stats, batch_format="pyarrow")
            .groupby("layer")
            .aggregate(Sum("n_px", alias_name="n_px"),
                       Sum("total", alias_name="total"),
                       Max("max_val", alias_name="max_val"))
            .sort("layer"))


def q_warp_rotate(sf_dir: str):
    """Affine bilinear warp (gdal.Warp role): rotate the t1 DEM 30 deg
    about its center onto a fresh target grid (pixel-exact semantics
    pinned by the scalar oracle in tests/test_warp.py), reduced to
    per-tile coverage stats."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.warp import Affine, warp_to_grid
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    W = cfg.tiles_x * cfg.tile_px * cfg.pixel_size
    H = cfg.tiles_y * cfg.tile_px * cfg.pixel_size
    tspec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                     cfg.pixel_size, cfg.y_north)
    out = warp_to_grid(
        ray.data.from_arrow(tiles_table(cfg, layers=("dem",))),
        tspec, Affine.rotation(30.0, cx=W / 2, cy=H / 2), layer="warp")

    def stats(b: pa.Table) -> pa.Table:
        tile, n_valid, vmin, vmax = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            tile.append(f"{cap.tx}/{cap.ty}")
            n_valid.append(int(ok.sum()))
            vmin.append(round(float(arr[ok].min()), 3) if ok.any()
                        else None)
            vmax.append(round(float(arr[ok].max()), 3) if ok.any()
                        else None)
        return pa.table({"tile": pa.array(tile, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "vmin": pa.array(vmin, pa.float64()),
                         "vmax": pa.array(vmax, pa.float64())})

    return (out.map_batches(stats, batch_format="pyarrow").sort("tile"))


def q_reproject_geo(sf_dir: str):
    """True CRS reprojection (the reference's ``gdal.Warp -t_srs
    EPSG:4283``, ``ga_5m/01_mosaic_and_transform_images_in_one_go.py:
    245-266``): warp the projected-metre t1 DEM onto a geographic
    (degree) output grid through the plate-carree bridge (scalar
    per-pixel oracle in tests/test_warp.py), reduced to per-tile
    coverage stats."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.warp import _K_M_PER_DEG, GeoToProj, warp_to_grid
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    lat_ts = -35.0
    # degree grid sized to the source extent at the standard parallel
    h_deg = cfg.tiles_y * cfg.tile_px * cfg.pixel_size / _K_M_PER_DEG
    ps_deg = h_deg / (cfg.tiles_y * cfg.tile_px)
    tspec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px, ps_deg,
                     y_north=h_deg)
    out = warp_to_grid(
        ray.data.from_arrow(tiles_table(cfg, layers=("dem",))),
        tspec, GeoToProj(lon0=0.0, lat0=0.0, lat_ts=lat_ts),
        layer="reproj")

    def stats(b: pa.Table) -> pa.Table:
        tile, n_valid, vmin, vmax = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            tile.append(f"{cap.tx}/{cap.ty}")
            n_valid.append(int(ok.sum()))
            vmin.append(round(float(arr[ok].min()), 3) if ok.any()
                        else None)
            vmax.append(round(float(arr[ok].max()), 3) if ok.any()
                        else None)
        return pa.table({"tile": pa.array(tile, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "vmin": pa.array(vmin, pa.float64()),
                         "vmax": pa.array(vmax, pa.float64())})

    return out.map_batches(stats, batch_format="pyarrow").sort("tile")


def q_idw_sites(sf_dir: str):
    """gdal_grid (invdist) role: IDW-interpolate a deterministic value
    at the t1 probe sites onto the tile grid (brute-force oracle in
    tests/test_gridding.py), reduced to per-tile coverage stats."""
    import ray
    import ray.data

    from ..stages.gridding import idw_grid
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import sites_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    sites = sites_table(cfg, n=48).to_pydict()
    xs = np.asarray(sites["x"])
    ys = np.asarray(sites["y"])
    tab = pa.table({"x": pa.array(xs), "y": pa.array(ys),
                    "v": pa.array(np.round(np.sin(xs / 500.0)
                                           * np.cos(ys / 700.0) * 40, 6))})
    out = idw_grid(ray.data.from_arrow(tab), spec,
                   radius=6 * cfg.pixel_size)

    def stats(b: pa.Table) -> pa.Table:
        tile, n_valid, vsum = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            tile.append(f"{cap.tx}/{cap.ty}")
            n_valid.append(int(ok.sum()))
            vsum.append(round(float(arr[ok].astype(np.float64).sum()), 3))
        return pa.table({"tile": pa.array(tile, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "vsum": pa.array(vsum, pa.float64())})

    return out.map_batches(stats, batch_format="pyarrow").sort("tile")


def q_veg_class_hull(sf_dir: str):
    """Per-class convex hull (ST_ConvexHull + GROUP BY role) as the
    exact two-level partial/final hull reduce; rows of
    (bal_number, n_vertices, hull_area)."""
    import ray.data

    from ..pipelines.veg_prep import class_hull_pipeline, veg_prep_pipeline
    from ..tiles.synth import raw_nvis_table

    cfg = _t1_cfg()
    prepped, _ = veg_prep_pipeline(
        ray.data.from_arrow(raw_nvis_table(cfg)), max_vertices=32)
    out = class_hull_pipeline(prepped)

    def fmt(b: pa.Table) -> pa.Table:
        return pa.table({
            "bal_number": b.column("bal_number"),
            "n_vertices": b.column("n_vertices"),
            "hull_area": pc.round(b.column("hull_area"), ndigits=3)})

    return out.map_batches(fmt, batch_format="pyarrow").sort("bal_number")


def q_equalize_dem(sf_dir: str):
    """Histogram equalization of the t1 DEM (global-stat -> broadcast
    LUT -> map; exact whole-raster parity in tests/test_enhance.py),
    reduced to a 16-bucket histogram of the equalized output."""
    import ray
    import ray.data

    from ..stages.enhance import equalize
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = equalize(ray.data.from_arrow(tiles_table(cfg)), "dem", bins=64)

    def hist(b: pa.Table) -> pa.Table:
        buckets, counts = [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            idx = np.clip((arr[ok] / 16).astype(np.int64), 0, 15)
            c = np.bincount(idx, minlength=16)
            nz = np.flatnonzero(c)
            buckets.extend(nz.tolist())
            counts.extend(c[nz].tolist())
        return pa.table({"bucket": pa.array(buckets, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    return (out.map_batches(hist, batch_format="pyarrow")
            .groupby("bucket")
            .aggregate(Sum("n_px", alias_name="n_px"))
            .sort("bucket"))


def q_curvature_dem(sf_dir: str):
    """Zevenbergen-Thorne profile curvature over the t1 DEM (ArcGIS
    Curvature role; scalar-loop + tiled parity oracles in
    tests/test_terrain.py), reduced to per-tile summary stats."""
    import ray
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.terrain import curvature
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = curvature(ray.data.from_arrow(tiles_table(cfg, layers=("dem",))),
                    GridSpec.from_synth(cfg), kind="profile")

    def stats(b: pa.Table) -> pa.Table:
        tile, n_valid, vmean = [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            ok = arr != np.float32(cap.nodata)
            tile.append(f"{cap.tx}/{cap.ty}")
            n_valid.append(int(ok.sum()))
            vmean.append(round(float(arr[ok].astype(np.float64).mean()), 6)
                         if ok.any() else None)
        return pa.table({"tile": pa.array(tile, pa.string()),
                         "n_valid": pa.array(n_valid, pa.int64()),
                         "mean_curv": pa.array(vmean, pa.float64())})

    return out.map_batches(stats, batch_format="pyarrow").sort("tile")


def q_temporal_composite(sf_dir: str):
    """Temporal stack composite (the cloud-free-mosaic role,
    stages/temporal.py): 6 epochs of the t1 DEM with per-epoch moving
    nodata clouds -> per-pixel median/count composites -> deterministic
    per-stat tile stats rows (valid px + exact float64 sum of the
    float32 composite)."""
    import ray.data
    import ray.data.aggregate as agg

    from ..stages.halo import GridSpec
    from ..stages.temporal import temporal_composite
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 6)).materialize()
    spec = GridSpec.from_synth(cfg)

    def stats(batch: pa.Table, *, stat: str) -> pa.Table:
        n = v = 0
        s = 0.0
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            n += 1
            v += int(valid.sum())
            s += float(arr[valid].astype(np.float64).sum())
        return pa.table({"stat": pa.array([stat] * (1 if n else 0)),
                         "n_tiles": pa.array([n][:1 if n else 0],
                                             pa.int64()),
                         "valid_px": pa.array([v][:1 if n else 0],
                                              pa.int64()),
                         "px_sum": pa.array([s][:1 if n else 0],
                                            pa.float64())})

    import functools

    parts = [temporal_composite(ds, spec, stat=st)
             .map_batches(functools.partial(stats, stat=st),
                          batch_format="pyarrow")
             for st in ("median", "count")]
    out = parts[0].union(*parts[1:])
    return (out.groupby("stat")
            .aggregate(agg.Sum("n_tiles", alias_name="n_tiles"),
                       agg.Sum("valid_px", alias_name="valid_px"),
                       agg.Sum("px_sum", alias_name="px_sum")))


def q_change_detection(sf_dir: str):
    """Two-epoch change map (stages/temporal.change_detection): epochs
    1 vs 4 of the t1 temporal stack, |delta| > 2.0 -- per-tile changed /
    valid pixel counts (exact integers)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.temporal import change_detection
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 6))
    return change_detection(ds, GridSpec.from_synth(cfg), epoch_a=1,
                            epoch_b=4, threshold=2.0) \
        .select_columns(["tx", "ty", "n_changed", "n_valid"])


def q_temporal_trend(sf_dir: str):
    """Per-pixel linear trend across the 6-epoch t1 stack
    (stages/temporal.temporal_trend, the NDVI-trend role) -> per-tile
    valid-pixel count + float64 slope sum (deterministic)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.temporal import temporal_trend
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 6))
    tiles = temporal_trend(ds, GridSpec.from_synth(cfg))

    def stats(batch: pa.Table) -> pa.Table:
        out = {"tx": [], "ty": [], "valid_px": [], "slope_sum": []}
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            out["tx"].append(cap.tx)
            out["ty"].append(cap.ty)
            out["valid_px"].append(int(valid.sum()))
            out["slope_sum"].append(float(arr[valid].astype(np.float64)
                                          .sum()))
        return pa.table({"tx": pa.array(out["tx"], pa.int64()),
                         "ty": pa.array(out["ty"], pa.int64()),
                         "valid_px": pa.array(out["valid_px"], pa.int64()),
                         "slope_sum": pa.array(out["slope_sum"],
                                               pa.float64())})

    return tiles.map_batches(stats, batch_format="pyarrow")


def q_quality_classifier(sf_dir: str):
    """CCNet-style quality classifier (functions/classifier.py): featurize
    documents, train distributed logistic regression against a
    weak-supervision rule label, score every doc in one streaming pass ->
    the 2x2 confusion matrix (deterministic integers: the ordered
    gradient fold makes the weights, hence the predictions, exact)."""
    import ray.data.aggregate as agg

    from ..functions.classifier import logreg_score, logreg_train
    from ..functions.text import quality_batch

    def label(b: pa.Table) -> pa.Table:
        nt = b.column("n_tokens").to_numpy()
        sr = b.column("stopword_ratio").to_numpy()
        return b.append_column(
            "label", pa.array(((nt >= 50) & (sr >= 0.05)).astype(np.int64)))

    import ray.data

    feats = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
             .map_batches(quality_batch, batch_format="pyarrow")
             .map_batches(label, batch_format="pyarrow")
             .drop_columns(["text"]))
    cols = ["n_tokens", "n_bpe_tokens", "avg_token_len",
            "stopword_ratio", "punct_ratio"]
    model = logreg_train(feats, cols, "label", iters=30)

    def predict(b: pa.Table) -> pa.Table:
        return pa.table({
            "label": b.column("label"),
            "pred": pa.array(
                (b.column("score").to_numpy() >= 0.5).astype(np.int64))})

    return (logreg_score(feats, model)
            .map_batches(predict, batch_format="pyarrow")
            .groupby(["label", "pred"])
            .aggregate(agg.Count(alias_name="n")))


def q_fill_nodata(sf_dir: str):
    """Bounded nodata interpolation (stages/fillnodata.py, the
    gdal.FillNodata role): fill the t1 DEM's void patch from
    nearest-valid donors within 4 px -> per-tile filled / remaining
    counts (exact integers; only tile (1,1) carries the patch)."""
    import ray.data

    from ..stages.fillnodata import fill_nodata
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    spec = GridSpec.from_synth(cfg)
    filled = fill_nodata(ds, spec, layer="dem",
                         max_dist=4 * cfg.pixel_size)

    def stats(batch: pa.Table) -> pa.Table:
        out = {"tx": [], "ty": [], "n_valid": [], "n_nodata": []}
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            nd = arr == np.float32(cap.nodata)
            out["tx"].append(cap.tx)
            out["ty"].append(cap.ty)
            out["n_valid"].append(int((~nd).sum()))
            out["n_nodata"].append(int(nd.sum()))
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in out.items()})

    return filled.map_batches(stats, batch_format="pyarrow")


def q_zonal_majority(sf_dir: str):
    """Categorical zonal statistics (stages/zone_stats.
    zonal_category_stats, the ArcGIS MAJORITY/MINORITY/VARIETY role):
    derive elevation-band zones from the t1 DEM (floor(dem / 20 m),
    a streaming per-tile re-encode), then the majority / minority /
    variety of the vegetation class per band -- exact integers."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.zone_stats import zonal_category_stats
    from ..tiles.codec import Caption, decode_tile, encode_tile, phash64
    from ..tiles.synth import TILES_SCHEMA, tiles_table

    cfg = _t1_cfg()
    tab = tiles_table(cfg)                      # dem + veg layers
    spec = GridSpec.from_synth(cfg)

    def bands(batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in TILES_SCHEMA.names}
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            if cap.layer != "dem":
                continue
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            nd = arr == np.float32(cap.nodata)
            z = np.floor(arr / 20.0).astype(np.float32)
            z[nd] = np.float32(cap.nodata)
            bcap = Caption(layer="band", x0=cap.x0, y0=cap.y0,
                           pixel_size=cap.pixel_size, nodata=cap.nodata,
                           edge=cap.edge, tx=cap.tx, ty=cap.ty)
            payload, bcap = encode_tile(z, "npz", bcap)
            rows["image_id"].append(f"band/{cap.tx}/{cap.ty}")
            rows["bytes"].append(payload)
            rows["w"].append(np.int32(z.shape[1]))
            rows["h"].append(np.int32(z.shape[0]))
            rows["fmt"].append("npz")
            rows["caption"].append(bcap.to_json())
            rows["phash"].append(np.int64(phash64(z)))
        return pa.table(rows, schema=TILES_SCHEMA)

    ds = ray.data.from_arrow(tab)
    zones = ds.map_batches(bands, batch_format="pyarrow")
    return zonal_category_stats(ds.union(zones), spec,
                                zone_layer="band", value_layer="veg")


def q_audio_dup_clips(sf_dir: str):
    """Audio near-dup dedup (functions/audio.py, the Chromaprint/Shazam
    fingerprint role): deterministic PCM clips with planted noisy
    copies -> 64-bit band-energy-delta fingerprints (stateless
    map_batches) -> the shared hash64 pigeonhole bucket + exact Hamming
    verify.  Returns (id_a, id_b, hamming) pairs -- exactly the planted
    copies."""
    import ray.data

    from ..functions.audio import fingerprint_batch, synth_audio_table
    from ..functions.dedup import hash64_dup_pairs

    ds = ray.data.from_arrow(synth_audio_table())
    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    return hash64_dup_pairs(fp, id_col="audio_id", hash_col="afp",
                            max_hamming=3)


def q_dbscan_sites(sf_dir: str):
    """Distributed DBSCAN (stages/dbscan.py, the ST_ClusterDBSCAN role)
    over 256 deterministic probe sites: eps=400 m grid-bucketed
    neighbor search (ghost-cell exchange), core/border/noise labeling,
    min-id cluster components -- all three roles exercised (152/47/57
    at these parameters)."""
    import ray.data

    from ..stages.dbscan import dbscan
    from ..tiles.synth import sites_table

    cfg = _t1_cfg()
    pts = ray.data.from_arrow(sites_table(cfg, 256))
    return dbscan(pts, eps=400.0, min_pts=4)


def q_mosaic_blend(sf_dir: str):
    """Feathered mosaic of 3 overlapping synthetic acquisitions
    (stages/mosaic.py, the seamline-blend role): footprint-distance
    weights cross-fade the overlap bands -> per-tile valid-pixel count +
    exact float64 pixel sum of the blended float32 mosaic."""
    import ray.data
    import ray.data.aggregate as agg

    from ..stages.halo import GridSpec
    from ..stages.mosaic import feather_blend
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import acquisition_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(acquisition_tiles_table(cfg, 3)).materialize()
    blended = feather_blend(ds, GridSpec.from_synth(cfg), feather_px=16.0)

    def stats(batch: pa.Table) -> pa.Table:
        tx, ty, vv, ss = [], [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            tx.append(cap.tx)
            ty.append(cap.ty)
            vv.append(int(valid.sum()))
            ss.append(round(float(arr[valid].astype(np.float64).sum()), 6))
        return pa.table({"tx": pa.array(tx, pa.int64()),
                         "ty": pa.array(ty, pa.int64()),
                         "valid_px": pa.array(vv, pa.int64()),
                         "px_sum": pa.array(ss, pa.float64())})

    return blended.map_batches(stats, batch_format="pyarrow")


def q_histogram_match(sf_dir: str):
    """Histogram-match acquisition 1 to acquisition 0
    (stages/enhance.histogram_match, the radiometric-alignment step
    before mosaicking): per-tile valid-pixel count + float64 sum of the
    matched tiles (deterministic -- the LUT is a pure function of the
    two global histograms)."""
    import ray.data

    from ..stages.enhance import histogram_match
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import acquisition_tiles_table

    cfg = _t1_cfg()
    tab = acquisition_tiles_table(cfg, 3)
    src = ray.data.from_arrow(
        tab.filter(pa.compute.equal(tab.column("source"), 1)))
    ref = ray.data.from_arrow(
        tab.filter(pa.compute.equal(tab.column("source"), 0)))
    matched = histogram_match(src, ref, "dem", bins=128)

    def stats(batch: pa.Table) -> pa.Table:
        tx, ty, vv, ss = [], [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            tx.append(cap.tx)
            ty.append(cap.ty)
            vv.append(int(valid.sum()))
            ss.append(round(float(arr[valid].astype(np.float64).sum()), 6))
        return pa.table({"tx": pa.array(tx, pa.int64()),
                         "ty": pa.array(ty, pa.int64()),
                         "valid_px": pa.array(vv, pa.int64()),
                         "px_sum": pa.array(ss, pa.float64())})

    return matched.map_batches(stats, batch_format="pyarrow")


def q_area_average(sf_dir: str):
    """Area-weighted average regrid (stages/warp.area_average_to_grid,
    the ``gdalwarp -r average`` coarsening kernel): the t1 DEM onto a
    1.6x-coarser grid -> per-tile valid-pixel count + float64 sum."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.warp import area_average_to_grid
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    # 256 px world at 25 m -> 160 px at 40 m (non-integer 1.6 ratio)
    tspec = GridSpec(4, 4, 40, 40.0, y_north=cfg.y_north)
    out = area_average_to_grid(ds, tspec)

    def stats(batch: pa.Table) -> pa.Table:
        tx, ty, vv, ss = [], [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            tx.append(cap.tx)
            ty.append(cap.ty)
            vv.append(int(valid.sum()))
            ss.append(round(float(arr[valid].astype(np.float64).sum()), 6))
        return pa.table({"tx": pa.array(tx, pa.int64()),
                         "ty": pa.array(ty, pa.int64()),
                         "valid_px": pa.array(vv, pa.int64()),
                         "px_sum": pa.array(ss, pa.float64())})

    return out.map_batches(stats, batch_format="pyarrow")


def q_dsir_weights(sf_dir: str):
    """DSIR hashed-bigram importance weights (functions/dsir.py, the
    Xie et al. data-selection method): target domain = the English
    slice of the documents table; every document scored against it ->
    top-15 by (weight desc, doc_id).  Counts fold in int64, so the
    ranking is bit-deterministic (oracle: tests/test_dsir.py)."""
    import ray.data

    from ..functions.dsir import dsir_weights

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    target = ds.filter(expr="lang == 'en'")
    return (dsir_weights(ds, target)
            .sort(["weight", "doc_id"], descending=[True, False])
            .limit(15))


def q_unigram_tokens(sf_dir: str):
    """Distributed unigram-LM (SentencePiece-role) tokenizer training +
    corpus tokenization (functions/unigram.py): hard-EM a 80-piece
    model from a deterministic 1-in-3 hash sample, Viterbi-encode every
    document, report per-language word/token totals.  Training is pinned
    by the single-process oracle in tests/test_unigram.py."""
    import ray.data

    from ..functions.unigram import train_unigram, unigram_tokenize

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])

    def one_in_three(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.take(pa.array(np.flatnonzero(ids % 3 == 0)))

    sample = ds.map_batches(one_in_three, batch_format="pyarrow")
    model = train_unigram(sample, 80, num_partitions=4)

    counts = unigram_tokenize(ds, model)
    langs = ds.select_columns(["doc_id", "lang"])
    joined = counts.join(langs, "inner", num_partitions=4,
                         on=("doc_id",))

    def agg(group: pa.Table) -> pa.Table:
        nw = group.column("n_words").to_numpy().sum()
        nt = group.column("n_tokens").to_numpy().sum()
        return pa.table({
            "lang": [group.column("lang")[0].as_py()],
            "n_docs": pa.array([group.num_rows], pa.int64()),
            "n_words": pa.array([int(nw)], pa.int64()),
            "n_tokens": pa.array([int(nt)], pa.int64()),
            "tokens_per_word": pa.array(
                [round(float(nt) / max(1.0, float(nw)), 6)],
                pa.float64())})

    return (joined.groupby("lang")
            .map_groups(agg, batch_format="pyarrow")
            .sort("lang"))


def q_fill_sinks(sf_dir: str):
    """Depression filling (stages/fill_sinks, the priority-flood DEM
    conditioning step before D8 flow) over the t1 DEM -> per-tile
    raised-pixel count and integer-quantized fill volume (mm-units, so
    the cross-tile minimax fill is pinned exactly; whole-raster oracle:
    tests/test_fill_sinks.py)."""
    import ray.data

    from ..stages.fill_sinks import fill_sinks
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    filled = fill_sinks(base, spec, layer="dem")

    def stats(batch: pa.Table) -> pa.Table:
        # the synthetic source is a pure function: rebuild the dem rows
        # in-task (deterministic, no nested Dataset execution)
        dem_by_tile = {}
        src = tiles_table(cfg, layers=("dem",))
        for r in src.to_pylist():
            c = Caption.from_json(r["caption"])
            dem_by_tile[(c.tx, c.ty)] = decode_tile(
                r["bytes"], r["fmt"], c)
        tx, ty, n_up, vol = [], [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            f = decode_tile(payload, fmt, cap)
            z = dem_by_tile[(cap.tx, cap.ty)]
            valid = z != np.float32(cap.nodata)
            d = np.zeros_like(f, np.float64)
            d[valid] = (f[valid].astype(np.float64)
                        - z[valid].astype(np.float64))
            raised = valid & (d > 0)
            tx.append(cap.tx)
            ty.append(cap.ty)
            n_up.append(int(raised.sum()))
            vol.append(int(np.rint(d[raised] * 1000.0).sum()))
        return pa.table({"tx": pa.array(tx, pa.int64()),
                         "ty": pa.array(ty, pa.int64()),
                         "raised_px": pa.array(n_up, pa.int64()),
                         "fill_mm": pa.array(vol, pa.int64())})

    return (filled.map_batches(stats, batch_format="pyarrow")
            .sort(["tx", "ty"]))


def q_region_group(sf_dir: str):
    """RegionGroup (stages/sieve.region_group, the Spatial Analyst op):
    4-connected same-value components of the t1 veg layer labeled with
    dense anchor-ordered global ids -> per-class region summary
    (region count, largest region, total pixels).  Cross-tile labeling
    is pinned by the BFS oracle in tests/test_region_group.py."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.sieve import region_group
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    ds = ray.data.from_arrow(tiles_table(cfg, layers=("veg",)))
    _labels, regions = region_group(ds, spec, layer="veg")

    vals = regions.column("value").to_numpy()
    npx = regions.column("n_px").to_numpy()
    rows = []
    for v in np.unique(vals):
        m = vals == v
        rows.append((float(v), int(m.sum()), int(npx[m].max()),
                     int(npx[m].sum())))
    return pa.table({
        "value": pa.array([r[0] for r in rows], pa.float64()),
        "n_regions": pa.array([r[1] for r in rows], pa.int64()),
        "max_region_px": pa.array([r[2] for r in rows], pa.int64()),
        "total_px": pa.array([r[3] for r in rows], pa.int64())})


def q_mode_resample(sf_dir: str):
    """Majority-class regrid (stages/warp.mode_resample_to_grid, the
    ``gdalwarp -r mode`` categorical kernel): the t1 veg classes onto a
    1.6x-coarser grid -> per-tile class histogram (integer counts; the
    tie-break and area quantum are pinned by tests/test_warp.py)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.warp import mode_resample_to_grid
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(tiles_table(cfg, layers=("veg",)))
    tspec = GridSpec(4, 4, 40, 40.0, y_north=cfg.y_north)
    out = mode_resample_to_grid(ds, tspec)

    def hist(batch: pa.Table) -> pa.Table:
        tx, ty, cls, n = [], [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            vals, counts = np.unique(arr, return_counts=True)
            for v, c in zip(vals, counts):
                tx.append(cap.tx)
                ty.append(cap.ty)
                cls.append(float(v))
                n.append(int(c))
        return pa.table({"tx": pa.array(tx, pa.int64()),
                         "ty": pa.array(ty, pa.int64()),
                         "cls": pa.array(cls, pa.float64()),
                         "n_px": pa.array(n, pa.int64())})

    return (out.map_batches(hist, batch_format="pyarrow")
            .sort(["tx", "ty", "cls"]))


def q_expand_shrink(sf_dir: str):
    """Morphological Expand then Shrink of veg class 1 by 2 cells
    (stages/morphology, the ArcGIS Generalization-toolset pair) over
    the t1 world -> per-class pixel counts for the original, expanded
    and shrunk layers (closing-like roundtrip; counts pin the
    Euclidean-disk reach and tie-break semantics)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.morphology import expand, shrink
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("veg",)))
    grown = expand(base, spec, layer="veg", n_cells=2, zones=(1.0,))
    eroded = shrink(base, spec, layer="veg", n_cells=2, zones=(1.0,))

    def hist(batch: pa.Table) -> pa.Table:
        lay, cls, n = [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            vals, counts = np.unique(arr, return_counts=True)
            for v, c in zip(vals, counts):
                lay.append(cap.layer)
                cls.append(float(v))
                n.append(int(c))
        return pa.table({"layer": pa.array(lay, pa.string()),
                         "cls": pa.array(cls, pa.float64()),
                         "n_px": pa.array(n, pa.int64())})

    from .queries import _agg

    a = _agg()
    return (base.union(grown, eroded)
            .map_batches(hist, batch_format="pyarrow")
            .groupby(["layer", "cls"])
            .aggregate(a.Sum("n_px", alias_name="n_px"))
            .sort(["layer", "cls"]))


def q_gray_morph(sf_dir: str):
    """Grayscale morphology suite (stages/gray_morph: erode / dilate /
    fused open / close / top-hats / gradient, each ONE halo exchange)
    over the t1 dem -> per-op integer pixel stats: valid count, count
    of strictly-positive residual cells, and the order-free exact max
    (pins the fused radius-2n path and nodata inertness)."""
    import ray.data

    from ..stages.gray_morph import gray_morph
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    planes = [gray_morph(base, spec, op=op, layer="dem", n=2)
              for op in ("erode", "dilate", "gradient", "open",
                         "close", "white_tophat", "black_tophat")]
    allp = planes[0]
    for p in planes[1:]:
        allp = allp.union(p)

    def stats(batch: pa.Table) -> pa.Table:
        lay, nv, npos, vmax = [], [], [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            valid = arr != np.float32(cap.nodata)
            lay.append(cap.layer)
            nv.append(int(valid.sum()))
            npos.append(int((valid & (arr > 0)).sum()))
            vmax.append(float(arr[valid].max()) if valid.any()
                        else float("-inf"))
        return pa.table({"op": pa.array(lay, pa.string()),
                         "n_valid": pa.array(nv, pa.int64()),
                         "n_pos": pa.array(npos, pa.int64()),
                         "vmax": pa.array(vmax, pa.float64())})

    from .queries import _agg

    a = _agg()
    return (allp.map_batches(stats, batch_format="pyarrow")
            .groupby("op")
            .aggregate(a.Sum("n_valid", alias_name="n_valid"),
                       a.Sum("n_pos", alias_name="n_pos"),
                       a.Max("vmax", alias_name="vmax"))
            .sort("op"))


def q_h_maxima(sf_dir: str):
    """h-maxima peak suppression (stages/gray_morph.h_maxima: geodesic
    reconstruction by dilation, one dual-plane radius-1 exchange + one
    count fold per round, exact convergence) on a 2x2-tile dem world
    -> integer histogram of the suppression depth dem - hmax in
    1/4-unit bins (0 <= depth <= h everywhere; the histogram pins both
    the flood result and convergence)."""
    import ray.data

    from ..stages.gray_morph import h_maxima
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import SynthConfig, tiles_table

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    sup = h_maxima(base, spec, layer="dem", h=2.0)

    def tag(name):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column("plane",
                                   pa.array([name] * b.num_rows))
        return fn

    both = (base.map_batches(tag("dem"), batch_format="pyarrow")
            .union(sup.map_batches(tag("hmax"), batch_format="pyarrow")))

    def per_tile(batch: pa.Table) -> pa.Table:
        key, plane, blob, nd = [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            key.append(f"{cap.tx}/{cap.ty}")
            plane.append(batch.column("plane")[i].as_py())
            blob.append(arr.tobytes())
            nd.append(float(cap.nodata))
        return pa.table({"key": pa.array(key, pa.string()),
                         "plane": pa.array(plane, pa.string()),
                         "blob": pa.array(blob, pa.binary()),
                         "nodata": pa.array(nd, pa.float64())})

    def diff_hist(group: pa.Table) -> pa.Table:
        g = group.to_pydict()
        planes = dict(zip(g["plane"], g["blob"]))
        dem = np.frombuffer(planes["dem"], np.float32)
        hm = np.frombuffer(planes["hmax"], np.float32)
        valid = dem != np.float32(g["nodata"][0])
        depth = (dem - hm)[valid]
        bins = np.minimum((depth * 4).astype(np.int64), 8)
        vals, counts = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(vals, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    from .queries import _agg

    a = _agg()
    return (both.map_batches(per_tile, batch_format="pyarrow")
            .groupby("key").map_groups(diff_hist,
                                       batch_format="pyarrow")
            .groupby("bin")
            .aggregate(a.Sum("n_px", alias_name="n_px"))
            .sort("bin"))


def q_clahe(sf_dir: str):
    """CLAHE adaptive equalization (stages/clahe: per-tile clipped
    histograms shipped as 2 KB sidecars -- ONE groupby shuffle whose
    halo traffic is histograms, not pixel strips) over the t1 dem ->
    16-bin integer histogram of the equalized [0, 255] surface plus
    the valid-pixel total (pins the clip/redistribute/blend rules
    bit-exactly; value range folded from the order-free global
    min/max)."""
    import ray.data

    from ..stages.clahe import clahe
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))

    def minmax(batch: pa.Table) -> pa.Table:
        lo, hi = [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            v = arr[arr != np.float32(cap.nodata)]
            if len(v):
                lo.append(float(v.min()))
                hi.append(float(v.max()))
        return pa.table({"lo": pa.array(lo, pa.float64()),
                         "hi": pa.array(hi, pa.float64())})

    from .queries import _agg

    a = _agg()
    mm = (base.map_batches(minmax, batch_format="pyarrow")
          .aggregate(a.Min("lo", alias_name="lo"),
                     a.Max("hi", alias_name="hi")))
    vmin, vmax = float(mm["lo"]), float(mm["hi"])
    out = clahe(base, spec, layer="dem", bins=256, clip_limit=3.0,
                vmin=vmin, vmax=np.nextafter(vmax, np.inf))

    def hist16(batch: pa.Table) -> pa.Table:
        bins, counts = [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            v = arr[arr != np.float32(cap.nodata)]
            b = np.clip((v / 16.0).astype(np.int64), 0, 15)
            vals, cnts = np.unique(b, return_counts=True)
            bins.extend(int(x) for x in vals)
            counts.extend(int(x) for x in cnts)
        return pa.table({"bin": pa.array(bins, pa.int64()),
                         "n_px": pa.array(counts, pa.int64())})

    return (out.map_batches(hist16, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(a.Sum("n_px", alias_name="n_px"))
            .sort("bin"))


def q_granulometry(sf_dir: str):
    """Granulometry / pattern spectrum (Maragos 1989; the
    morphological size-distribution analysis): successive disk
    openings of the t1 dem at radii 1..3, reporting per-radius
    integer image mass ``sum(floor(v * 256))`` and the mass REMOVED
    from the previous radius (the pattern-spectrum bin -- nonnegative
    by anti-extensivity, which this query pins).  Composes the fused
    one-exchange open stage; sums are int64 folds (order-free
    exact)."""
    import ray.data

    from ..stages.gray_morph import gray_morph
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))

    def mass(tag):
        def fn(batch: pa.Table) -> pa.Table:
            tot = 0
            for payload, fmt, cap_json in zip(
                    batch.column("bytes").to_pylist(),
                    batch.column("fmt").to_pylist(),
                    batch.column("caption").to_pylist()):
                cap = Caption.from_json(cap_json)
                arr = decode_tile(payload, fmt, cap)
                v = arr[arr != np.float32(cap.nodata)]
                tot += int(np.floor(v.astype(np.float64)
                                    * 256.0).sum())
            return pa.table({"radius": pa.array([tag], pa.int64()),
                             "mass": pa.array([tot], pa.int64())})
        return fn

    parts = [base.map_batches(mass(0), batch_format="pyarrow")]
    for r in (1, 2, 3):
        opened = gray_morph(base, spec, op="open", layer="dem", n=r)
        parts.append(opened.map_batches(mass(r),
                                        batch_format="pyarrow"))
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.union(p)

    from .queries import _agg

    a = _agg()
    masses = (allp.groupby("radius")
              .aggregate(a.Sum("mass", alias_name="mass"))
              .sort("radius").to_pandas())
    m = masses["mass"].to_numpy()
    removed = np.concatenate([[0], m[:-1] - m[1:]])
    return pa.table({"radius": pa.array(masses["radius"].to_numpy(),
                                        pa.int64()),
                     "mass": pa.array(m, pa.int64()),
                     "removed": pa.array(removed, pa.int64())})


def q_kuwahara(sf_dir: str):
    """Kuwahara edge-preserving smoother (stages/filters.kuwahara)
    over the t1 dem -> integer roughness comparison: count of valid
    pixels whose 4-neighbor max absolute difference exceeds 1.0,
    before vs after (the filter must strictly reduce it -- the
    edge-preserving-smoothing contract)."""
    import ray.data

    from ..stages.filters import kuwahara
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    smooth = kuwahara(base, spec, layer="dem", radius=2)

    def rough(batch: pa.Table) -> pa.Table:
        lay, n = [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            nd = np.float32(cap.nodata)
            valid = arr != nd
            worst = np.zeros(arr.shape, np.float32)
            for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
                sh = np.full(arr.shape, nd, np.float32)
                ys = slice(max(0, dy), arr.shape[0] + min(0, dy))
                xs = slice(max(0, dx), arr.shape[1] + min(0, dx))
                yo = slice(max(0, -dy), arr.shape[0] + min(0, -dy))
                xo = slice(max(0, -dx), arr.shape[1] + min(0, -dx))
                sh[ys, xs] = arr[yo, xo]
                ok = valid & (sh != nd)
                d = np.where(ok, np.abs(arr - sh), 0.0)
                worst = np.maximum(worst, d)
            lay.append(cap.layer)
            n.append(int((valid & (worst > 1.0)).sum()))
        return pa.table({"layer": pa.array(lay, pa.string()),
                         "n_rough": pa.array(n, pa.int64())})

    from .queries import _agg

    a = _agg()
    return (base.union(smooth)
            .map_batches(rough, batch_format="pyarrow")
            .groupby("layer")
            .aggregate(a.Sum("n_rough", alias_name="n_rough"))
            .sort("layer"))


def q_zone_geometry(sf_dir: str):
    """Zonal geometry (stages/zone_geometry: ArcGIS ZonalGeometry /
    regionprops role) over the t1 veg classes -> per-zone area,
    perimeter, centroid, central moments, orientation, eccentricity,
    compactness.  ONE radius-1 halo exchange emitting integer partial
    sums, ONE python-int zone fold -- nothing pixel-sized leaves the
    tiles; every float derives from exact integers through the same
    function the whole-raster oracle uses."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.zone_geometry import zone_geometry
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("veg",)))
    return zone_geometry(base, spec, layer="veg")


def q_mmr_topk(sf_dir: str):
    """MMR-diversified retrieval (functions/ann.mmr_topk, Carbonell &
    Goldstein 1998): exact top-40 candidate pool per query (per-block
    partial top-k + tiny merge, pool vectors ride the shuffle as
    KB-sized rows) then the exact greedy rerank inside map_groups --
    the greedy itself is not SQL-expressible, hence rows-only; its
    semantics are pinned against the single-process oracle in
    tests/test_functions.py."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.ann import mmr_topk

    emb = _head_rows(f"{sf_dir}/embeddings.parquet",
                     ["vec_id", "embedding"], 64)
    qtab = emb.filter(pc.less(emb.column("vec_id"), 3))
    if qtab.num_rows != 3:
        raise ValueError(
            f"q_mmr_topk: expected 3 query rows with vec_id < 3 in the "
            f"head rows, found {qtab.num_rows} -- embeddings.parquet "
            "is not ordered by vec_id; widen the head read")
    qids = qtab.column("vec_id").to_pylist()
    queries = np.array(qtab.column("embedding").to_pylist(),
                       np.float64)
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = mmr_topk(ds, queries, k=8, lam=0.7, pool=40)

    def remap(b: pa.Table) -> pa.Table:
        qi = b.column("query_id").to_numpy()
        return pa.table({
            "query_id": pa.array([qids[i] for i in qi], pa.int64()),
            "rank": b.column("rank"),
            "vec_id": b.column("vec_id")})

    return out.map_batches(remap, batch_format="pyarrow")


def q_seam_carve(sf_dir: str):
    """Seam carving (stages/seam: wavefront DP -- tiles_y sequential
    band rounds, each one keyed exchange of the band's energy tiles +
    one M boundary row per tile; banded == whole bit-exact by the
    dependence-trapezoid argument) over the t1 dem as the energy
    field -> the optimal vertical seam as (row, col) rows plus the
    integer-scaled total cost; smallest-column tie-breaks make it
    fully deterministic."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.seam import extract_seam, seam_energy_map
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    m_ds = seam_energy_map(base, spec, layer="dem")
    seam, cost = extract_seam(m_ds, spec)
    n = len(seam)
    return pa.table({
        "row": pa.array(np.arange(n), pa.int64()),
        "col": pa.array(seam, pa.int64()),
        "cost_milli": pa.array([int(round(cost * 1000))] * n,
                               pa.int64())})


def q_watershed_markers(sf_dir: str):
    """Marker-controlled watershed (stages/flood: order-free two-phase
    formulation -- min-max flooding values, then min-label propagation
    over the admissible subgraph, both as cost-style active-front
    iterations) over the t1 dem with a deterministic 4x4 marker grid
    -> per-basin pixel counts (integers pin both phases)."""
    import ray.data

    from ..stages.flood import watershed_flood
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile, encode_tile, \
        phash64
    from ..tiles.synth import TILES_SCHEMA, tiles_table

    cfg = _t1_cfg()
    T = cfg.tile_px
    spec = GridSpec(cfg.tiles_x, cfg.tiles_y, cfg.tile_px,
                    cfg.pixel_size, y_north=cfg.y_north)
    base = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))

    def add_markers(batch: pa.Table) -> pa.Table:
        """One marker at each tile centre, label = cell_id + 1."""
        cols = {c: [] for c in TILES_SCHEMA.names}
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            mk = np.zeros(arr.shape, np.float32)
            if arr[T // 2, T // 2] != np.float32(cap.nodata):
                mk[T // 2, T // 2] = cap.ty * cfg.tiles_x + cap.tx + 1
            ocap = Caption(layer="markers", x0=cap.x0, y0=cap.y0,
                           pixel_size=cap.pixel_size, crs=cap.crs,
                           nodata=cap.nodata, edge=dict(cap.edge),
                           tx=cap.tx, ty=cap.ty)
            payload, ocap = encode_tile(mk, "npz", ocap)
            h, w = mk.shape
            cols["image_id"].append(f"markers/{cap.tx}/{cap.ty}")
            cols["bytes"].append(payload)
            cols["w"].append(np.int32(w))
            cols["h"].append(np.int32(h))
            cols["fmt"].append("npz")
            cols["caption"].append(ocap.to_json())
            cols["phash"].append(np.int64(phash64(mk)))
        return pa.table(cols, schema=TILES_SCHEMA)

    markers = base.map_batches(add_markers, batch_format="pyarrow")
    labels = watershed_flood(base.union(markers), spec,
                             level_layer="dem",
                             marker_layer="markers")

    def hist(batch: pa.Table) -> pa.Table:
        lab, n = [], []
        for payload, fmt, cap_json in zip(
                batch.column("bytes").to_pylist(),
                batch.column("fmt").to_pylist(),
                batch.column("caption").to_pylist()):
            cap = Caption.from_json(cap_json)
            arr = decode_tile(payload, fmt, cap)
            v = arr[arr != np.float32(cap.nodata)]
            vals, counts = np.unique(v.astype(np.int64),
                                     return_counts=True)
            lab.extend(int(x) for x in vals)
            n.extend(int(x) for x in counts)
        return pa.table({"basin": pa.array(lab, pa.int64()),
                         "n_px": pa.array(n, pa.int64())})

    from .queries import _agg

    a = _agg()
    return (labels.map_batches(hist, batch_format="pyarrow")
            .groupby("basin")
            .aggregate(a.Sum("n_px", alias_name="n_px"))
            .sort("basin"))


def q_bpe_tokens(sf_dir: str):
    """Distributed BPE tokenizer training + corpus tokenization
    (functions/bpe.py): learn 24 merges from a deterministic 1-in-3
    hash sample of the documents table (the train-on-sample /
    apply-to-corpus shape), encode EVERY document under the learned
    merge list, and report per-language word/token totals plus the
    compression ratio.  Merge order is pinned by the single-process
    oracle in tests/test_bpe.py."""
    import ray.data

    from ..functions.bpe import bpe_tokenize, train_bpe

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    def one_in_three(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.take(pa.array(np.flatnonzero(ids % 3 == 0)))

    sample = ds.map_batches(one_in_three, batch_format="pyarrow")
    merges = train_bpe(sample, 24, num_partitions=4)

    counts = bpe_tokenize(ds, merges)
    langs = ds.select_columns(["doc_id", "lang"])
    joined = counts.join(langs, "inner", num_partitions=4,
                         on=("doc_id",))

    def agg(group: pa.Table) -> pa.Table:
        nw = group.column("n_words").to_numpy().sum()
        nt = group.column("n_tokens").to_numpy().sum()
        return pa.table({
            "lang": [group.column("lang")[0].as_py()],
            "n_docs": pa.array([group.num_rows], pa.int64()),
            "n_words": pa.array([int(nw)], pa.int64()),
            "n_tokens": pa.array([int(nt)], pa.int64()),
            "tokens_per_word": pa.array(
                [round(float(nt) / max(1.0, float(nw)), 6)],
                pa.float64())})

    return (joined.groupby("lang")
            .map_groups(agg, batch_format="pyarrow")
            .sort("lang"))


def q_template_match(sf_dir: str):
    """NCC template matching (OpenCV matchTemplate TM_CCOEFF_NORMED
    role) over the t1 dem: a 9x9 window lifted verbatim from the world
    at (20, 30) is slid over every tile via the one-shuffle halo plan;
    result is the global top-10 match locations with fixed-point micro
    scores.  The planted window itself must surface as the #1 hit with
    score_u = 1_000_000 (exact self-correlation), which pins the whole
    score raster's ordering."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.match import template_match, top_matches
    from ..tiles.synth import dem_window, tiles_table

    cfg = _t1_cfg()
    tmpl = dem_window(cfg, 20, 30, 9, 9).astype(np.float64)
    score = template_match(ray.data.from_arrow(tiles_table(cfg)),
                           GridSpec.from_synth(cfg), tmpl)
    return top_matches(score, k_top=10)


def q_ssim_change(sf_dir: str):
    """Two-epoch SSIM change map (skimage structural_similarity role)
    over the t1 temporal DEM stack: per-pixel uniform-window SSIM
    between epochs 0 and 2 through the one-shuffle halo plan, reduced
    to exact per-tile summary rows (fixed-point micro scores)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.ssim import ssim_change, ssim_tile_stats
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 3))
    out = ssim_change(ds, GridSpec.from_synth(cfg), epoch_a=0, epoch_b=2,
                      radius=3, data_range=100.0)
    return ssim_tile_stats(out)


def q_canny_edges(sf_dir: str):
    """Distributed Canny (OpenCV Canny role) over the t1 DEM: Sobel +
    NMS + double threshold through the halo plan, global cross-tile
    hysteresis via border/corner exchange + tree-reduce components;
    exact per-tile edge-pixel counts."""
    import ray.data

    from ..stages.canny import canny_edges
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = canny_edges(ray.data.from_arrow(tiles_table(cfg)),
                      GridSpec.from_synth(cfg), low=4.0, high=12.0)

    def stats(batch: pa.Table) -> pa.Table:
        txs, tys, ne, nv = [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            txs.append(cap.tx)
            tys.append(cap.ty)
            ne.append(int((arr == 1.0).sum()))
            nv.append(int((arr != np.float32(cap.nodata)).sum()))
        return pa.table({"tx": pa.array(txs, pa.int64()),
                         "ty": pa.array(tys, pa.int64()),
                         "n_edge": pa.array(ne, pa.int64()),
                         "n_valid": pa.array(nv, pa.int64())})

    return (out.map_batches(stats, batch_format="pyarrow")
            .sort(["ty", "tx"]))


def q_hough_lines(sf_dir: str):
    """Canny -> Hough composition (OpenCV Canny + HoughLines role) over
    the t1 DEM: edge tiles feed the sparse (theta, rho) vote fold;
    result is the exact global top-10 peak bins."""
    import ray.data

    from ..stages.canny import canny_edges
    from ..stages.halo import GridSpec
    from ..stages.hough import hough_lines
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    edges = canny_edges(ray.data.from_arrow(tiles_table(cfg)), spec,
                        low=4.0, high=12.0)
    return hough_lines(edges, spec, layer="canny", n_theta=60,
                       rho_res=2.0, k_top=10)


def q_harris_corners(sf_dir: str):
    """Harris corners (OpenCV cornerHarris + NMS role) over the t1 DEM:
    structure-tensor response + window NMS through the halo plan, exact
    global top-10 corners via the shared partial-top-k reduction."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.harris import harris_corners
    from ..stages.match import top_matches
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    corners = harris_corners(ray.data.from_arrow(tiles_table(cfg)),
                             GridSpec.from_synth(cfg), k=0.05, radius=2,
                             nms_radius=2, thr=0.0)
    return top_matches(corners, k_top=10, score_scale=1000)


def q_optical_flow(sf_dir: str):
    """Dense Lucas-Kanade optical flow (OpenCV calcOpticalFlowLK role)
    between epochs 0 and 2 of the t1 temporal DEM: dual-plane halo
    shuffle, 2x2 normal-equation solve per pixel; exact per-tile
    fixed-point summaries of both flow components."""
    import ray.data

    from ..stages.flow import optical_flow
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 3))
    out = optical_flow(ds, GridSpec.from_synth(cfg), epoch_a=0,
                       epoch_b=2, radius=3)

    def stats(batch: pa.Table) -> pa.Table:
        lys, txs, tys, nv, mean_u = [], [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            valid = arr != np.float32(cap.nodata)
            n = int(valid.sum())
            lys.append(cap.layer)
            txs.append(cap.tx)
            tys.append(cap.ty)
            nv.append(n)
            mean_u.append(int(np.rint(
                arr[valid].astype(np.float64).mean() * 1_000_000))
                if n else 0)
        return pa.table({"layer": pa.array(lys, pa.string()),
                         "tx": pa.array(txs, pa.int64()),
                         "ty": pa.array(tys, pa.int64()),
                         "n_valid": pa.array(nv, pa.int64()),
                         "mean_flow_u": pa.array(mean_u, pa.int64())})

    return (out.map_batches(stats, batch_format="pyarrow")
            .sort(["layer", "ty", "tx"]))


def q_stereo_disparity(sf_dir: str):
    """Stereo block-matching disparity (OpenCV StereoBM role) between
    epochs 0 and 2 of the t1 temporal DEM on the dual-plane halo plan;
    exact per-tile disparity histograms (disparities are small ints)."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.stereo import stereo_disparity
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 3))
    out = stereo_disparity(ds, GridSpec.from_synth(cfg), epoch_a=0,
                           epoch_b=2, radius=3, d_max=6)

    def hist(batch: pa.Table) -> pa.Table:
        txs, tys, dss, ns = [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            m = arr != np.float32(cap.nodata)
            vals, counts = np.unique(arr[m].astype(np.int64),
                                     return_counts=True)
            for v, c in zip(vals, counts):
                txs.append(cap.tx)
                tys.append(cap.ty)
                dss.append(int(v))
                ns.append(int(c))
        return pa.table({"tx": pa.array(txs, pa.int64()),
                         "ty": pa.array(tys, pa.int64()),
                         "disparity": pa.array(dss, pa.int64()),
                         "n_px": pa.array(ns, pa.int64())})

    return (out.map_batches(hist, batch_format="pyarrow")
            .sort(["ty", "tx", "disparity"]))


def q_phase_register(sf_dir: str):
    """Phase-correlation registration audit (OpenCV phaseCorrelate
    role) across epochs 0/1 of the t1 temporal DEM: per-tile FFT shift
    votes (cloudy tiles abstain) + the winning global translation --
    the pre-compositing alignment check."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.register import global_shift, phase_votes
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    ds = ray.data.from_arrow(temporal_tiles_table(cfg, 2))
    votes = phase_votes(ds, GridSpec.from_synth(cfg), epoch_a=0,
                        epoch_b=1, min_valid_frac=0.9)
    return global_shift(votes)


def q_slic_segments(sf_dir: str):
    """SLIC superpixels (skimage segmentation.slic role) over the t1
    DEM: broadcast-centers iteration with integer-exact moment folds;
    result is the per-superpixel size table plus fixed-point centers."""
    import ray.data
    from ray.data.aggregate import Count

    from ..stages.halo import GridSpec
    from ..stages.slic import slic_segment
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    lab_ds, ctab = slic_segment(
        ray.data.from_arrow(tiles_table(cfg)), GridSpec.from_synth(cfg),
        S=16, m=10.0, n_iter=3)

    def sizes(batch: pa.Table) -> pa.Table:
        cids, ns = [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            lab = arr[arr >= 0].astype(np.int64)
            vals, counts = np.unique(lab, return_counts=True)
            cids.extend(int(v) for v in vals)
            ns.extend(int(c) for c in counts)
        return pa.table({"cid": pa.array(cids, pa.int64()),
                         "n_px": pa.array(ns, pa.int64())})

    from ray.data.aggregate import Sum

    per_seg = (lab_ds.map_batches(sizes, batch_format="pyarrow")
               .groupby("cid")
               .aggregate(Sum("n_px", alias_name="n_px"))
               .sort("cid"))
    ctr = {int(c): (y, x) for c, y, x in
           zip(ctab.column("cid").to_pylist(),
               ctab.column("cy").to_pylist(),
               ctab.column("cx").to_pylist())}

    def attach(b: pa.Table) -> pa.Table:
        cy = [int(np.rint(ctr[int(c)][0] * 1000))
              for c in b.column("cid").to_pylist()]
        cx = [int(np.rint(ctr[int(c)][1] * 1000))
              for c in b.column("cid").to_pylist()]
        return (b.append_column("cy_milli", pa.array(cy, pa.int64()))
                .append_column("cx_milli", pa.array(cx, pa.int64())))

    return per_seg.map_batches(attach, batch_format="pyarrow")


def q_lbp_histogram(sf_dir: str):
    """LBP texture codes (skimage local_binary_pattern role) over the
    t1 DEM -> exact global 256-bin code histogram."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.lbp import lbp_codes, lbp_histogram
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    return lbp_histogram(lbp_codes(
        ray.data.from_arrow(tiles_table(cfg)), GridSpec.from_synth(cfg)))


def q_rl_deconvolve(sf_dir: str):
    """Richardson-Lucy deconvolution (skimage richardson_lucy role)
    over the t1 DEM with a 3x3 binomial PSF, 3 rounds; exact per-tile
    fixed-point mean of the estimate."""
    import ray.data

    from ..stages.deconv import rl_deconvolve
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    from ..tiles.codec import encode_tile, phash64
    from ..tiles.synth import TILES_SCHEMA

    cfg = _t1_cfg()
    psf = np.asarray([[1, 2, 1], [2, 4, 2], [1, 2, 1]],
                     np.float64) / 16.0

    def offset(batch: pa.Table) -> pa.Table:
        """RL needs nonnegative intensities: shift the DEM +30 m (its
        valid minimum is about -25 m on this synthetic world)."""
        cols = {c: [] for c in TILES_SCHEMA.names}
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            m = arr != np.float32(cap.nodata)
            out = np.where(m, arr + np.float32(30.0),
                           np.float32(cap.nodata))
            payload, ocap = encode_tile(out, "npz", cap)
            cols["image_id"].append(
                batch.column("image_id")[i].as_py())
            cols["bytes"].append(payload)
            cols["w"].append(batch.column("w")[i].as_py())
            cols["h"].append(batch.column("h")[i].as_py())
            cols["fmt"].append("npz")
            cols["caption"].append(ocap.to_json())
            cols["phash"].append(np.int64(phash64(out)))
        return pa.table(cols, schema=TILES_SCHEMA)

    src = (ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
           .map_batches(offset, batch_format="pyarrow"))
    out = rl_deconvolve(src, GridSpec.from_synth(cfg), psf=psf,
                        n_iter=3)

    def stats(batch: pa.Table) -> pa.Table:
        txs, tys, nv, mean_u = [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            m = arr != np.float32(cap.nodata)
            txs.append(cap.tx)
            tys.append(cap.ty)
            nv.append(int(m.sum()))
            mean_u.append(int(np.rint(
                arr[m].astype(np.float64).mean() * 1_000_000))
                if m.any() else 0)
        return pa.table({"tx": pa.array(txs, pa.int64()),
                         "ty": pa.array(tys, pa.int64()),
                         "n_valid": pa.array(nv, pa.int64()),
                         "mean_est_u": pa.array(mean_u, pa.int64())})

    return (out.map_batches(stats, batch_format="pyarrow")
            .sort(["ty", "tx"]))


def q_feature_match(sf_dir: str):
    """ORB-style feature registration (OpenCV ORB + BFMatcher role)
    between epochs 0 and 1 of the t1 temporal DEM: Harris corners +
    BRIEF descriptors per epoch, Hamming ratio-test matching, winning
    integer translation by consensus vote."""
    import ray.data

    from ..stages.features import (extract_features, match_features,
                                   translation_consensus)
    from ..stages.halo import GridSpec
    from ..tiles.synth import temporal_tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    tab = temporal_tiles_table(cfg, 2)
    base = ray.data.from_arrow(tab)
    fa = extract_features(base.filter(expr="epoch == 0")
                          .drop_columns(["epoch"]), spec)
    fb = extract_features(base.filter(expr="epoch == 1")
                          .drop_columns(["epoch"]), spec)
    return translation_consensus(match_features(fa, fb))


def q_skeletonize(sf_dir: str):
    """Canny -> Zhang-Suen skeleton composition (cv2 thinning role)
    over the t1 DEM edge mask; exact per-tile skeleton pixel counts."""
    import ray.data

    from ..stages.canny import canny_edges
    from ..stages.halo import GridSpec
    from ..stages.skeleton import skeletonize
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    edges = canny_edges(ray.data.from_arrow(tiles_table(cfg)), spec,
                        low=4.0, high=12.0)
    out = skeletonize(edges, spec, layer="canny")

    def stats(batch: pa.Table) -> pa.Table:
        txs, tys, ns = [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            txs.append(cap.tx)
            tys.append(cap.ty)
            ns.append(int((arr == np.float32(1.0)).sum()))
        return pa.table({"tx": pa.array(txs, pa.int64()),
                         "ty": pa.array(tys, pa.int64()),
                         "n_skel": pa.array(ns, pa.int64())})

    return (out.map_batches(stats, batch_format="pyarrow")
            .sort(["ty", "tx"]))


def q_hog_descriptors(sf_dir: str):
    """Dense HOG block descriptors (skimage feature.hog / Dalal-Triggs
    role) over the t1 DEM: one halo exchange, fixed-point per-block
    L2-normalized 36-d rows reduced to a per-block checksum table."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.hog import hog_descriptors
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    rows = hog_descriptors(ray.data.from_arrow(tiles_table(cfg)),
                           GridSpec.from_synth(cfg), cell=8, n_bins=9)

    def fold_partial(batch: pa.Table) -> pa.Table:
        by = batch.column("by").to_numpy()
        bx = batch.column("bx").to_numpy()
        k = batch.column("k").to_numpy()
        v = batch.column("v_u").to_numpy()
        key = by * 1_000_000 + bx
        order = np.argsort(key, kind="stable")
        uq, starts = np.unique(key[order], return_index=True)
        sums = np.add.reduceat(v[order], starts)
        # position-weighted checksum makes swapped components visible
        wsum = np.add.reduceat((v * (k + 1))[order], starts)
        return pa.table({"key": pa.array(uq, pa.int64()),
                         "sum_v": pa.array(sums, pa.int64()),
                         "wsum_v": pa.array(wsum, pa.int64())})

    # associative partial fold per batch, exact total via groupby sum
    # (a block's 36 rows may straddle a batch boundary)
    agg = (rows.map_batches(fold_partial, batch_format="pyarrow")
           .groupby("key").sum(["sum_v", "wsum_v"]))

    def finish(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        return pa.table({
            "by": pa.array(key // 1_000_000, pa.int64()),
            "bx": pa.array(key % 1_000_000, pa.int64()),
            "sum_v": batch.column("sum(sum_v)"),
            "wsum_v": batch.column("sum(wsum_v)")})

    return agg.map_batches(finish, batch_format="pyarrow") \
        .sort(["by", "bx"])


def q_threshold_masks(sf_dir: str):
    """Otsu global + adaptive mean thresholding (cv2 THRESH_OTSU /
    adaptiveThreshold roles) over the t1 DEM -> per-tile foreground
    pixel counts for both masks, plus the Otsu bin in every row."""
    import ray.data

    from ..stages.halo import GridSpec
    from ..stages.threshold import adaptive_threshold, otsu_threshold
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    spec = GridSpec.from_synth(cfg)
    tiles = ray.data.from_arrow(tiles_table(cfg, layers=("dem",)))
    otsu_ds, info = otsu_threshold(tiles, layer="dem", bins=256)
    both = otsu_ds.union(adaptive_threshold(tiles, spec, radius=6,
                                            c=1.0))
    thr = int(info["thr_bin"])

    def counts(b: pa.Table) -> pa.Table:
        lay, tys, txs, nfg = [], [], [], []
        for i in range(b.num_rows):
            cap = Caption.from_json(b.column("caption")[i].as_py())
            arr = decode_tile(b.column("bytes")[i].as_py(),
                              b.column("fmt")[i].as_py(), cap)
            lay.append(cap.layer)
            tys.append(cap.ty)
            txs.append(cap.tx)
            nfg.append(int((arr == np.float32(1.0)).sum()))
        return pa.table({"layer": pa.array(lay, pa.string()),
                         "ty": pa.array(tys, pa.int64()),
                         "tx": pa.array(txs, pa.int64()),
                         "n_fg": pa.array(nfg, pa.int64()),
                         "otsu_bin": pa.array([thr] * len(lay),
                                              pa.int64())})

    return (both.map_batches(counts, batch_format="pyarrow")
            .sort(["layer", "ty", "tx"]))


def q_wavelet_energy(sf_dir: str):
    """2-level Haar DWT (PyWavelets wavedec2 role) over the t1 DEM ->
    exact integer per-subband energy table (7 rows); the transform is
    tile-local (no shuffle), the energy fold is integer-exact.  The t1
    DEM carries a nodata patch, so this exercises the documented
    zero-embedding contract."""
    import ray.data

    from ..stages.wavelet import haar_dwt, subband_energy
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    coef = haar_dwt(ray.data.from_arrow(tiles_table(cfg)),
                    layer="dem", levels=2, nodata_policy="zero")
    return subband_energy(coef).sort("band")


def q_pm_diffuse(sf_dir: str):
    """Perona-Malik anisotropic diffusion (edge-preserving iterative
    smoother) over the t1 DEM, 4 rounds; exact per-tile fixed-point
    mean of the diffused estimate."""
    import ray.data

    from ..stages.diffusion import pm_diffuse
    from ..stages.halo import GridSpec
    from ..tiles.codec import Caption, decode_tile
    from ..tiles.synth import tiles_table

    cfg = _t1_cfg()
    out = pm_diffuse(
        ray.data.from_arrow(tiles_table(cfg, layers=("dem",))),
        GridSpec.from_synth(cfg), kappa=8.0, lam=0.2, n_iter=4)

    def stats(batch: pa.Table) -> pa.Table:
        txs, tys, nv, mean_u = [], [], [], []
        for i in range(batch.num_rows):
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            m = arr != np.float32(cap.nodata)
            txs.append(cap.tx)
            tys.append(cap.ty)
            nv.append(int(m.sum()))
            mean_u.append(int(np.rint(
                arr[m].astype(np.float64).mean() * 1_000_000))
                if m.any() else 0)
        return pa.table({"tx": pa.array(txs, pa.int64()),
                         "ty": pa.array(tys, pa.int64()),
                         "n_valid": pa.array(nv, pa.int64()),
                         "mean_u": pa.array(mean_u, pa.int64())})

    return (out.map_batches(stats, batch_format="pyarrow")
            .sort(["ty", "tx"]))


ROWS_ONLY = {
    "curvature_dem": q_curvature_dem,
    "equalize_dem": q_equalize_dem,
    "veg_class_hull": q_veg_class_hull,
    "idw_sites": q_idw_sites,
    "warp_rotate": q_warp_rotate,
    "reproject_geo": q_reproject_geo,
    "flow_accumulation": q_flow_accumulation,
    "watershed_basins": q_watershed_basins,
    "stream_order": q_stream_order,
    "flow_length": q_flow_length,
    "basin_zonal": q_basin_zonal,
    "lm_perplexity": q_lm_perplexity,
    "cost_distance": q_cost_distance,
    "cost_paths": q_cost_paths,
    "image_filters": q_image_filters,
    "contour_lines": q_contour_lines,
    "site_viewshed": q_site_viewshed,
    "terrain_profile": q_terrain_profile,
    "line_of_sight": q_line_of_sight,
    "nms_boxes": q_nms_boxes,
    "box_match": q_box_match,
    "layer_stats": q_layer_stats,
    "augment_epoch": q_augment_epoch,
    "sieve_veg": q_sieve_veg,
    "tile_pyramid": q_tile_pyramid,
    "tile_quarantine": q_tile_quarantine,
    "tile_chips": q_tile_chips,
    "bal_band_histogram": q_bal_band_histogram,
    "bal_polygon_mask": q_bal_polygon_mask,
    "bal_offgrid_veg": q_bal_offgrid_veg,
    "spatial_join_sites": q_spatial_join_sites,
    "partitioned_join_sites": q_partitioned_join_sites,
    "wgs84_veg_distance": q_wgs84_veg_distance,
    "veg_within_range": q_veg_within_range,
    "veg_knn3": q_veg_knn3,
    "polygon_cell_cover": q_polygon_cell_cover,
    "quad_polygon_cover": q_quad_polygon_cover,
    "buffer_clip_areas": q_buffer_clip_areas,
    "zonal_sites": q_zonal_sites,
    "multimodal_features": q_multimodal_features,
    "video_frames": q_video_frames,
    "fingerprint_docs": q_fingerprint_docs,
    "minhash_pairs_docs": q_minhash_pairs_docs,
    "incremental_dedup_docs": q_incremental_dedup_docs,
    "knn_graph_embeddings": q_knn_graph_embeddings,
    "curate_corpus": q_curate_corpus,
    "dedup_survivor_docs": q_dedup_survivor_docs,
    "pack_chunks": q_pack_chunks,
    "raster_calc_index": q_raster_calc_index,
    "focal_stats": q_focal_stats,
    "polygonize_veg": q_polygonize_veg,
    "rasterize_burn": q_rasterize_burn,
    "retile_blocks": q_retile_blocks,
    "glcm_texture_dem": q_glcm_texture,
    "twi_dem": q_twi_dem,
    "veg_proximity": q_veg_proximity,
    "hillshade_dem": q_hillshade,
    "dem_metrics": q_dem_metrics,
    "site_bal_rating": q_site_bal_rating,
    "simhash_pairs_docs": q_simhash_pairs_docs,
    "phash_dup_tiles": q_phash_dup_tiles,
    "phash_dup_clusters": q_phash_dup_clusters,
    "kmv_distinct": q_kmv_distinct,
    "hll_distinct": q_hll_distinct,
    "approx_quantiles": q_approx_quantiles,
    "embedding_dups": q_embedding_dups,
    "kmeans_embeddings": q_kmeans_embeddings,
    "pca_embeddings": q_pca_embeddings,
    "semantic_dedup": q_semantic_dedup,
    "ivf_ann": q_ivf_ann,
    "pq_ann": q_pq_ann,
    "sq_ann": q_sq_ann,
    "veg_prep": q_veg_prep,
    "veg_class_union": q_veg_class_union,
    "simplify_veg": q_simplify_veg,
    "temporal_composite": q_temporal_composite,
    "change_detection": q_change_detection,
    "temporal_trend": q_temporal_trend,
    "quality_classifier": q_quality_classifier,
    "fill_nodata": q_fill_nodata,
    "zonal_majority": q_zonal_majority,
    "audio_dup_clips": q_audio_dup_clips,
    "dbscan_sites": q_dbscan_sites,
    "mosaic_blend": q_mosaic_blend,
    "histogram_match": q_histogram_match,
    "area_average": q_area_average,
    "bpe_tokens": q_bpe_tokens,
    "mode_resample": q_mode_resample,
    "expand_shrink": q_expand_shrink,
    "gray_morph": q_gray_morph,
    "h_maxima_depth": q_h_maxima,
    "clahe_enhance": q_clahe,
    "granulometry": q_granulometry,
    "kuwahara_smooth": q_kuwahara,
    "zone_geometry_veg": q_zone_geometry,
    "mmr_topk": q_mmr_topk,
    "seam_carve": q_seam_carve,
    "watershed_markers": q_watershed_markers,
    "unigram_tokens": q_unigram_tokens,
    "dsir_weights": q_dsir_weights,
    "region_group_veg": q_region_group,
    "fill_sinks_dem": q_fill_sinks,
    "template_match_dem": q_template_match,
    "ssim_change_dem": q_ssim_change,
    "canny_edges_dem": q_canny_edges,
    "hough_lines_dem": q_hough_lines,
    "harris_corners_dem": q_harris_corners,
    "optical_flow_dem": q_optical_flow,
    "stereo_disparity_dem": q_stereo_disparity,
    "phase_register_dem": q_phase_register,
    "slic_segments_dem": q_slic_segments,
    "lbp_histogram_dem": q_lbp_histogram,
    "rl_deconvolve_dem": q_rl_deconvolve,
    "feature_match_dem": q_feature_match,
    "skeleton_dem": q_skeletonize,
    "hog_descriptors_dem": q_hog_descriptors,
    "threshold_masks_dem": q_threshold_masks,
    "wavelet_energy_dem": q_wavelet_energy,
    "pm_diffuse_dem": q_pm_diffuse,
}
