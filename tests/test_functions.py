"""Training-data function tests: text analysis, dedup family, ANN."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.functions import ann, dedup, text
from balrog_ray.functions.multimodal import (ImageDecodeActor,
                                             ImageResizeActor,
                                             frame_sample_stub)
from balrog_ray.tiles import synth


def docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again",  # dup
        "the quick brown fox jumps over the lazy dog again and AGAIN",  # near
        "completely different content about ray data pipelines here",
        "short one",
        "another unrelated sentence with many different words inside it",
    ]
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_token_count_matches_python_split():
    batch = docs_table()
    out = text.token_count_batch(batch)
    expected = [len(t.split(" ")) for t in batch.column("text").to_pylist()]
    assert out.column("n_tokens").to_pylist() == expected


def test_quality_and_langid_deterministic():
    out = text.quality_batch(docs_table())
    assert out.column("n_tokens").to_pylist()[4] == 2
    assert all(0 <= v <= 1 for v in out.column("stopword_ratio").to_pylist())
    lang = text.langid_batch(docs_table()).column("lang_pred").to_pylist()
    assert lang == text.langid_batch(docs_table()).column("lang_pred").to_pylist()
    assert lang.count("en") >= 4          # English fixtures classify as en
    assert text.langid_heuristic("你好世界 这是中文文本") == "zh"


def test_fingerprint_properties():
    t = "the quick brown fox jumps over the lazy dog"
    assert text.fingerprint(t) == text.fingerprint(t)
    # disjoint token sets yield different fingerprints
    assert text.fingerprint(t) != text.fingerprint(
        "zulu xray november papa whiskey oscar tango sierra kilo")
    assert text.fingerprint("") == 0


def test_exact_dedup(ray_session):
    import ray.data

    ds = ray.data.from_arrow(docs_table())
    survivors = dedup.exact_dedup(ds).take_all()
    # 6 docs, one exact duplicate pair -> 5 distinct hashes; dup keeps id 0
    assert len(survivors) == 5
    kept = {r["keep_id"] for r in survivors}
    assert 0 in kept and 1 not in kept


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data

    ds = ray.data.from_arrow(docs_table())
    pairs = dedup.minhash_lsh_pairs(ds, threshold=0.7).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found            # exact dup
    assert (0, 2) in found or (1, 2) in found   # near dup
    assert all(a < b for a, b in found)
    # unrelated docs never pair
    assert not any(3 in p or 5 in p for p in found)


def test_minhash_loose_threshold_many_candidates(ray_session):
    """Loose threshold -> near-all-pairs candidates: the exact verify must
    still produce correct jaccard-filtered pairs (the verify path is a
    distributed semi-join; candidate explosion must not change results)."""
    import ray.data

    # 20 docs in two families of high mutual similarity
    base_a = "the quick brown fox jumps over the lazy dog " * 6
    base_b = "pack my box with five dozen liquor jugs today " * 6
    texts = [base_a + f"tail {i}" for i in range(10)] \
        + [base_b + f"tail {i}" for i in range(10)]
    tbl = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                    "text": pa.array(texts)})
    pairs = dedup.minhash_lsh_pairs(
        ray.data.from_arrow(tbl), threshold=0.5, est_slack=0.4).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    # exact-jaccard oracle over all pairs
    sh = [dedup.shingle_set(t) for t in texts]
    expected = {(i, j) for i in range(20) for j in range(i + 1, 20)
                if dedup.jaccard(sh[i], sh[j]) >= 0.5}
    # verify output must be a subset of truth (precision 1) and catch the
    # in-family mass (recall of LSH at this band config)
    assert found <= expected
    assert len(found) >= 0.8 * len(expected)
    for r in pairs:
        assert np.isclose(r["jaccard"],
                          dedup.jaccard(sh[r["id_a"]], sh[r["id_b"]]))


def test_simhash_pairs(ray_session):
    import ray.data

    ds = ray.data.from_arrow(docs_table())
    pairs = dedup.simhash_pairs(ds, max_hamming=3).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in found
    assert not any(3 in p or 4 in p or 5 in p for p in found)


def test_jaccard_exact():
    a = dedup.shingle_set("abcdefg", k=3)
    assert dedup.jaccard(a, a) == 1.0
    b = dedup.shingle_set("xyzuvw", k=3)
    assert dedup.jaccard(a, b) == 0.0


def test_embedding_dup_pairs(ray_session):
    import ray.data

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((40, 16))
    vecs[7] = vecs[3] + rng.standard_normal(16) * 0.01    # near-dup pair
    tbl = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    pairs = dedup.embedding_dup_pairs(ray.data.from_arrow(tbl),
                                      threshold=0.98).take_all()
    assert {(r["id_a"], r["id_b"]) for r in pairs} >= {(3, 7)}


def test_embedding_dup_pairs_string_ids_and_empty_blocks(ray_session):
    """Regressions: bucketize crashed on a zero-row pyarrow block, and
    verify_group forced ids through int() (string vec_id crashed)."""
    import ray.data

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((24, 16))
    vecs[5] = vecs[2] + rng.standard_normal(16) * 0.005
    tbl = pa.table({"vec_id": pa.array([f"doc-{i:03d}" for i in range(24)]),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    # tiny override_num_blocks -> some empty blocks after repartition
    ds = ray.data.from_arrow(tbl).repartition(40)
    pairs = dedup.embedding_dup_pairs(ds, threshold=0.98).take_all()
    assert {(r["id_a"], r["id_b"]) for r in pairs} >= {("doc-002", "doc-005")}
    for r in pairs:
        assert isinstance(r["id_a"], str) and r["id_a"] < r["id_b"]


def test_brute_force_topk_tie_break_across_blocks(ray_session):
    """More than k cosine-tied vectors split across blocks: the merged
    top-k must keep the LOWEST vec_ids (the oracle's (cosine desc, id asc)
    order), which raw per-block argpartition violated."""
    import ray.data

    rng = np.random.default_rng(2)
    base = rng.standard_normal(8)
    # 30 identical vectors (all cosine 1.0 vs the query) + 10 decoys
    vecs = np.vstack([np.tile(base, (30, 1)),
                      rng.standard_normal((10, 8))])
    ids = np.arange(40)
    rng.shuffle(ids)        # ids NOT aligned with row order
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    got = ann.brute_force_topk(ray.data.from_arrow(tbl), base[None, :],
                               k=10, batch_size=7).take_all()
    tied_ids = sorted(ids[:30].tolist())
    assert sorted(r["vec_id"] for r in got) == tied_ids[:10]


def test_cosine_pairs_exact_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 16))
    vecs[11] = vecs[2] * 1.5 + rng.standard_normal(16) * 0.05
    vecs[40] = vecs[25] + rng.standard_normal(16) * 0.02
    tbl = pa.table({"vec_id": pa.array(range(60), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    th = 0.6
    got = dedup.cosine_pairs_exact(
        ray.data.from_arrow(tbl), threshold=th, batch_size=17).take_all()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}

    v = vecs.astype(np.float32).astype(np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = unit @ unit.T
    ia, ib = np.where(np.triu(sims >= th, k=1))
    expected = set(zip(ia.tolist(), ib.tolist()))
    assert got_pairs == expected and {(2, 11), (25, 40)} <= got_pairs


@pytest.fixture(scope="module")
def emb_data():
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((300, 32))
    queries = rng.standard_normal((5, 32))
    tbl = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                    "embedding": pa.array(vecs.tolist(),
                                          pa.list_(pa.float32()))})
    return tbl, vecs, queries


def numpy_topk(vecs, queries, k):
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(n == 0, 1, n)
    # float32 storage roundtrip to match the dataset column
    sims = unit(vecs.astype(np.float32).astype(np.float64)) @ unit(queries).T
    out = {}
    for qi in range(queries.shape[0]):
        order = np.lexsort((np.arange(len(vecs)), -sims[:, qi]))[:k]
        out[qi] = list(order)
    return out


def test_brute_force_topk_exact(ray_session, emb_data):
    import ray.data

    tbl, vecs, queries = emb_data
    got = ann.brute_force_topk(ray.data.from_arrow(tbl), queries,
                               k=10).take_all()
    expected = numpy_topk(vecs, queries, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    assert by_q == expected


def test_ivf_topk_recall(ray_session, emb_data):
    import ray.data

    tbl, vecs, queries = emb_data
    got = ann.ivf_topk(ray.data.from_arrow(tbl), queries, k=10,
                       n_centroids=8, n_probe=4).take_all()
    exact = numpy_topk(vecs, queries, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(by_q.get(q, set()) & set(exact[q])) / 10 for q in exact]
    assert np.mean(recalls) >= 0.6


def test_multimodal_decode_and_resize(ray_session):
    import ray.data

    cfg = synth.SynthConfig(tiles_x=2, tiles_y=2, tile_px=64)
    ds = ray.data.from_arrow(synth.tiles_table(cfg, layers=("dem",)))
    feats = ds.map_batches(ImageDecodeActor, batch_format="pyarrow",
                           concurrency=(1, 2)).take_all()
    assert len(feats) == 4
    assert all(f["w"] == 64 and np.isfinite(f["mean"]) for f in feats)

    small = ds.map_batches(ImageResizeActor, fn_constructor_args=(2,),
                           batch_format="pyarrow",
                           concurrency=(1, 2)).take_all()
    assert all(r["w"] == 32 and r["h"] == 32 for r in small)

    with pytest.raises(NotImplementedError):
        frame_sample_stub(b"")
    actor = ImageDecodeActor()
    bad = pa.table({"image_id": ["x"], "bytes": [b""], "w": [1], "h": [1],
                    "fmt": ["jpeg"], "caption": ["{}"], "phash": [0]})
    with pytest.raises(NotImplementedError):
        actor(bad)


@pytest.mark.skipif(not __import__("os").path.isdir("/root/testdata/sf0.001"),
                    reason="driver testdata not present")
def test_lsh_embedding_pairs_subset_of_exact(ray_session):
    """Every LSH-surfaced pair must appear in the exact broadcast join at
    the same threshold (precision 1; recall < 1 is expected and measured)."""
    import pyarrow.parquet as pq
    import ray.data

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    exact = dedup.cosine_pairs_exact(ds, threshold=0.45).take_all()
    lsh = dedup.embedding_dup_pairs(ds, threshold=0.45, n_planes=4,
                                    n_bands=8).take_all()
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact}
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh}
    assert lsh_pairs <= exact_pairs
    assert len(exact_pairs) > 0
    recall = len(lsh_pairs) / len(exact_pairs)
    assert recall >= 0.5         # 8 bands x 4 planes: ~0.8 expected


def test_minhash_string_ids(ray_session):
    """id_col is schema-generic: string doc ids survive the whole LSH +
    exact-verify path (regression: ids were force-cast to int64)."""
    import pyarrow as pa
    import ray.data

    tbl = docs_table()
    tbl = tbl.set_column(0, "doc_id", pa.array(
        [f"d{i}" for i in range(tbl.num_rows)], pa.string()))
    pairs = dedup.minhash_lsh_pairs(ray.data.from_arrow(tbl),
                                    threshold=0.7).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert ("d0", "d1") in found


def test_simhash_string_ids(ray_session):
    import pyarrow as pa
    import ray.data

    tbl = docs_table()
    tbl = tbl.set_column(0, "doc_id", pa.array(
        [f"d{i}" for i in range(tbl.num_rows)], pa.string()))
    pairs = dedup.simhash_pairs(ray.data.from_arrow(tbl),
                                max_hamming=3).take_all()
    assert ("d0", "d1") in {(r["id_a"], r["id_b"]) for r in pairs}


def test_resize_preserves_nodata(ray_session):
    """Block-mean must never blend the nodata sentinel into data values:
    mixed blocks average only valid pixels, all-nodata blocks stay nodata."""
    import pyarrow as pa
    import ray.data

    from balrog_ray.tiles.codec import Caption, decode_tile, encode_tile

    arr = np.full((8, 8), 10.0, dtype=np.float32)
    arr[:2, :2] = -99.0             # one all-nodata 2x2 block
    arr[0, 4] = -99.0               # one mixed block
    cap = Caption(layer="dem", x0=0, y0=0, pixel_size=25)
    payload, cap = encode_tile(arr, "npy", cap)
    tbl = pa.table({"image_id": ["t"], "bytes": [payload], "w": [8],
                    "h": [8], "fmt": ["npy"], "caption": [cap.to_json()],
                    "phash": [0]})
    out = ray.data.from_arrow(tbl).map_batches(
        ImageResizeActor, fn_constructor_args=(2,),
        batch_format="pyarrow", concurrency=(1, 1)).take_all()[0]
    small = decode_tile(out["bytes"], out["fmt"],
                        Caption.from_json(out["caption"]))
    assert small[0, 0] == np.float32(-99.0)       # all-nodata block
    assert small[0, 2] == np.float32(10.0)        # mixed block: valid mean
    assert (small[1:, :] == np.float32(10.0)).all()


def test_hash64_dup_pairs_brute_force_parity(ray_session):
    """Generic 64-bit-hash near-dup (the phash/simhash core) equals an
    all-pairs Hamming scan on random hashes with planted near-dups."""
    import ray.data

    rng = np.random.default_rng(42)
    base = rng.integers(-2**63, 2**63 - 1, size=40, dtype=np.int64)
    hashes = list(base)
    # plant near-dups at hamming 1..3 of existing hashes
    for i, bits in [(0, 1), (3, 2), (7, 3), (7, 1)]:
        h = int(base[i])
        for b in rng.choice(64, size=bits, replace=False):
            h ^= (1 << int(b))
        if h >= 2**63:
            h -= 2**64
        hashes.append(h)
    ids = list(range(len(hashes)))
    tbl = pa.table({"img_id": pa.array(ids, pa.int64()),
                    "h64": pa.array(hashes, pa.int64())})

    got = dedup.hash64_dup_pairs(ray.data.from_arrow(tbl),
                                 id_col="img_id", hash_col="h64",
                                 max_hamming=3).take_all()
    got_set = {(r["id_a"], r["id_b"], r["hamming"]) for r in got}

    expect = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            d = bin((int(hashes[i]) ^ int(hashes[j]))
                    & 0xFFFFFFFFFFFFFFFF).count("1")
            if d <= 3:
                expect.add((i, j, d))
    assert got_set == expect
    assert len(expect) >= 4              # the planted pairs were found


def test_phash_dup_tiles_runs(ray_session):
    from balrog_ray.relational.rows_only import q_phash_dup_tiles

    rows = q_phash_dup_tiles("unused").take_all()
    # uniform-content tiles share a phash -> at least one pair, all exact
    assert all(r["hamming"] <= 2 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_kmv_distinct_error_bound(ray_session):
    """KMV sketch estimate within ~4 standard errors of the exact
    distinct count, and exact below the k threshold."""
    import ray.data

    from balrog_ray.functions.sketch import kmv_distinct

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50_000, size=200_000)
    exact = len(np.unique(vals))
    # multi-block on purpose: duplicate hashes across blocks must merge
    # distinct (the single-block version hid a collapse-to-tiny-estimate bug)
    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array(vals, pa.int64())})).repartition(8)
    k = 1024
    est = kmv_distinct(ds, "v", k=k).column("estimate")[0].as_py()
    assert abs(est - exact) / exact < 4.0 / np.sqrt(k)

    # fewer distincts than k -> exact answer
    small = ray.data.from_arrow(pa.table(
        {"v": pa.array(rng.integers(0, 100, size=5_000),
                       pa.int64())})).repartition(6)
    est_small = kmv_distinct(small, "v", k=k).column("estimate")[0].as_py()
    assert est_small == len(np.unique(
        np.array(small.to_pandas()["v"])))


def test_kmv_distinct_string_column(ray_session):
    import ray.data

    from balrog_ray.functions.sketch import kmv_distinct

    tbl = pa.table({"s": pa.array([f"user-{i % 37}" for i in range(1000)],
                                  pa.string())})
    est = kmv_distinct(ray.data.from_arrow(tbl), "s",
                       k=256).column("estimate")[0].as_py()
    assert est == 37                      # below k -> exact


def test_hll_distinct_error_and_merge_determinism(ray_session):
    """HLL estimate within ~4 standard errors (1.04/sqrt(m)) of exact,
    and bit-identical under different block layouts (max-merge is
    order-independent)."""
    import ray.data

    from balrog_ray.functions.sketch import hll_distinct

    rng = np.random.default_rng(9)
    vals = rng.integers(0, 80_000, size=300_000)
    exact = len(np.unique(vals))
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
    t = hll_distinct(ds, "v")
    est = t.column("estimate")[0].as_py()
    m = t.column("m")[0].as_py()
    assert abs(est - exact) / exact < 4 * 1.04 / np.sqrt(m)
    est2 = hll_distinct(ds.repartition(11), "v"
                        ).column("estimate")[0].as_py()
    assert est2 == est

    # small-range linear counting: near-exact at low cardinality
    small = ray.data.from_arrow(pa.table(
        {"v": pa.array(rng.integers(0, 200, size=5_000), pa.int64())}))
    est_small = hll_distinct(small, "v").column("estimate")[0].as_py()
    exact_small = 200
    assert abs(est_small - exact_small) <= 4


def test_hll_distinct_string_column(ray_session):
    import ray.data

    from balrog_ray.functions.sketch import hll_distinct

    tbl = pa.table({"s": pa.array([f"user-{i % 500}" for i in range(5000)],
                                  pa.string())})
    est = hll_distinct(ray.data.from_arrow(tbl),
                       "s").column("estimate")[0].as_py()
    assert abs(est - 500) <= 15


def test_hash64_dup_pairs_skewed_bucket_blocked_verify(ray_session):
    """3000 rows sharing one 16-bit chunk land in a single bucket: the
    row-blocked popcount verify (peak memory capped) must still find
    exactly the planted near pairs."""
    import ray.data

    n = 3000
    hashes = [((i << 20) | 0x0ABC) for i in range(n)]
    hashes[100] = hashes[7] ^ (1 << 40)           # hamming 1
    hashes[2500] = hashes[2499] ^ (1 << 33) ^ (1 << 50)   # hamming 2
    signed = [h - (1 << 64) if h >= (1 << 63) else h for h in hashes]
    tbl = pa.table({"img_id": pa.array(range(n), pa.int64()),
                    "h64": pa.array(signed, pa.int64())})
    got = dedup.hash64_dup_pairs(ray.data.from_arrow(tbl),
                                 id_col="img_id", hash_col="h64",
                                 max_hamming=3).take_all()
    expect = set()
    for i in range(n):
        for j in (7, 100, 2499, 2500):
            if i < j and bin(hashes[i] ^ hashes[j]).count("1") <= 3:
                expect.add((i, j))
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert pairs >= {(7, 100), (2499, 2500)}
    # no false positives: every reported pair is a true near pair
    for a, b in pairs:
        assert bin(hashes[a] ^ hashes[b]).count("1") <= 3


def test_histogram_quantiles_error_bound(ray_session):
    """Histogram-sketch quantile within one bin width of np.quantile,
    across multiple blocks, plus the degenerate constant/empty cases."""
    import ray.data

    from balrog_ray.functions.sketch import histogram_quantiles

    rng = np.random.default_rng(11)
    vals = rng.lognormal(mean=3.0, sigma=1.0, size=100_000)
    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array(vals, pa.float64())})).repartition(7)
    nbins = 2048
    qs = (0.1, 0.25, 0.5, 0.9, 0.99)
    out = histogram_quantiles(ds, "v", qs=qs, nbins=nbins)
    width = (vals.max() - vals.min()) / nbins
    for q, est in zip(out.column("q").to_pylist(),
                      out.column("estimate").to_pylist()):
        assert abs(est - np.quantile(vals, q)) <= width + 1e-9

    const = ray.data.from_arrow(pa.table(
        {"v": pa.array([5.0] * 100, pa.float64())}))
    out = histogram_quantiles(const, "v", qs=(0.0, 0.5, 1.0))
    assert out.column("estimate").to_pylist() == [5.0, 5.0, 5.0]

    empty = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert histogram_quantiles(empty, "v", qs=(0.5,)).num_rows == 0

    with pytest.raises(ValueError):
        histogram_quantiles(const, "v", qs=(1.5,))


def test_stratified_sample_matches_oracle_per_group(ray_session):
    """q_stratified_sample: exactly k rows per stratum, and the chosen
    keys equal the k smallest by the shared multiplicative hash --
    the same rule the SQL oracle's row_number() applies."""
    import duckdb

    from balrog_ray.relational.queries import (SQL_STRATIFIED_SAMPLE,
                                               q_stratified_sample)

    sf_dir = "/root/testdata/sf0.001"
    got = q_stratified_sample(sf_dir).take_all()
    con = duckdb.connect()
    con.execute(f"create view orders as select * from "
                f"read_parquet('{sf_dir}/orders.parquet')")
    want = con.execute(SQL_STRATIFIED_SAMPLE).fetchall()
    got_set = {(r["o_orderstatus"], r["o_orderkey"]) for r in got}
    assert got_set == set(want)
    from collections import Counter
    per = Counter(s for s, _ in got_set)
    assert all(v == 8 for v in per.values())


def test_ngram_jaccard_pairs_exact_vs_bruteforce(ray_session):
    """ngram_jaccard_pairs finds EXACTLY the pairs a brute-force
    all-pairs Jaccard finds -- no approximation -- and max_df only
    drops pairs, never invents them."""
    import ray.data

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(40)]
    texts[10] = texts[3]                                   # exact dup
    near = texts[7].split(" ")
    near[5] = "zz"                                         # near dup
    texts[20] = " ".join(near)
    texts[30] = "a b"                                      # < n words
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})

    def shset(t, n=3):
        w = t.split(" ")
        return {" ".join(w[j:j + n]) for j in range(len(w) - n + 1)}

    thr = 0.5
    expect = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            sa, sb = shset(texts[a]), shset(texts[b])
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= thr:
                expect[(a, b)] = inter / (len(sa) + len(sb) - inter)

    got = dedup.ngram_jaccard_pairs(
        ray.data.from_arrow(tbl).repartition(4),
        threshold=thr).take_all()
    got_map = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got}
    assert set(got_map) == set(expect)
    assert (3, 10) in got_map and got_map[(3, 10)] == 1.0
    assert (7, 20) in got_map
    for k, v in expect.items():
        assert abs(got_map[k] - v) < 1e-12

    capped = dedup.ngram_jaccard_pairs(
        ray.data.from_arrow(tbl), threshold=thr, max_df=2).take_all()
    assert {(r["id_a"], r["id_b"]) for r in capped} <= set(expect)


def test_pq_topk_recall_beats_floor(ray_session, emb_data):
    import ray.data

    tbl, vecs, queries = emb_data
    got = ann.pq_topk(ray.data.from_arrow(tbl), queries, k=10,
                      n_sub=4, n_codes=32).take_all()
    exact = numpy_topk(vecs, queries, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(by_q.get(q, set()) & set(exact[q])) / 10 for q in exact]
    assert np.mean(recalls) >= 0.7
    # reported cosines are EXACT (re-ranked), not ADC approximations
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(n == 0, 1, n)
    uv = unit(vecs.astype(np.float32).astype(np.float64))
    uq = unit(queries)
    for r in got:
        true = float(uv[r["vec_id"]] @ uq[r["query_id"]])
        assert abs(r["cosine"] - true) < 1e-9


def test_pq_encode_compresses_and_is_deterministic(ray_session, emb_data):
    import ray.data

    tbl, vecs, _ = emb_data
    ds = ray.data.from_arrow(tbl)
    cb = ann.pq_train(ds, n_sub=8, n_codes=16)
    assert cb.shape == (8, 16, 4)
    rows = ann.pq_encode(ds, cb).take_all()
    assert len(rows) == len(vecs)
    assert all(len(r["codes"]) == 8 for r in rows)       # 32 dim -> 8 B
    rows2 = ann.pq_encode(ds, cb).take_all()
    assert {r["vec_id"]: r["codes"] for r in rows} == \
        {r["vec_id"]: r["codes"] for r in rows2}


def test_pq_train_guards(ray_session, emb_data):
    import ray.data

    tbl, _, _ = emb_data
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="divisible"):
        ann.pq_train(ds, n_sub=5)
    with pytest.raises(ValueError, match="uint8"):
        ann.pq_train(ds, n_sub=4, n_codes=300)


def test_sq_topk_recall(ray_session, emb_data):
    import ray.data

    tbl, vecs, queries = emb_data
    ds = ray.data.from_arrow(tbl)
    ranges = ann.sq_train(ds)
    assert ranges.shape == (2, vecs.shape[1])
    assert (ranges[1] > ranges[0]).all()
    codes = ann.sq_encode(ds, ranges).materialize()
    got = ann.sq_topk(codes, queries, ranges, k=10).take_all()
    exact = numpy_topk(vecs, queries, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # int8 per-dim quantization is nearly lossless for top-k ranking
    recalls = [len(by_q.get(q, set()) & set(exact[q])) / 10 for q in exact]
    assert np.mean(recalls) >= 0.9
    # codes really are 1 byte/dim
    row = codes.take(1)[0]
    assert len(row["code"]) == vecs.shape[1]


def test_frame_sampling_actor_pool(ray_session):
    """FrameSampleActor: every-N sampling over the nvid container in an
    actor pool -- sampled frames round-trip exactly; H.264 stays an
    honest loud stub."""
    import ray.data

    from balrog_ray.functions.multimodal import (FrameSampleActor,
                                                 pack_video, unpack_video)
    from balrog_ray.tiles.codec import Caption, decode_tile

    rng = np.random.default_rng(5)
    frames = [rng.normal(size=(16, 16)).astype(np.float32)
              for _ in range(10)]
    cap = Caption(layer="video", x0=0.0, y0=0.0, pixel_size=1.0)
    payload = pack_video(frames, cap)
    # container round-trip
    got = dict(unpack_video(payload, cap))
    assert len(got) == 10
    assert all(np.array_equal(got[i], frames[i]) for i in range(10))

    vids = pa.table({
        "video_id": pa.array(["vid0"], pa.string()),
        "bytes": pa.array([payload], pa.binary()),
        "fmt": pa.array(["nvid"], pa.string()),
        "caption": pa.array([cap.to_json()], pa.string())})
    out = (ray.data.from_arrow(vids)
           .map_batches(FrameSampleActor, fn_constructor_args=(3,),
                        batch_format="pyarrow", concurrency=(1, 2))
           .take_all())
    assert [r["image_id"] for r in out] == [
        "vid0/f0", "vid0/f3", "vid0/f6", "vid0/f9"]
    for r, idx in zip(out, (0, 3, 6, 9)):
        arr = decode_tile(r["bytes"], r["fmt"],
                          Caption.from_json(r["caption"]))
        assert np.array_equal(arr, frames[idx])

    actor = FrameSampleActor(every_n=2)
    h264 = pa.table({"video_id": ["v"], "bytes": [b""],
                     "fmt": ["h264"], "caption": [cap.to_json()]})
    with pytest.raises(NotImplementedError):
        actor(h264)


def test_heavy_hitters_exact_under_tiny_width(ray_session):
    """Misra-Gries candidates + exact recount equals the brute-force
    HAVING filter even when the sketch width is far below the distinct
    token count (the regime where the sketch MUST evict) -- the superset
    guarantee plus the recount make the output exact, not approximate."""
    import ray
    from collections import Counter

    from balrog_ray.functions.sketch import heavy_hitter_tokens

    rng = np.random.default_rng(3)
    # zipf-ish corpus: few hot tokens, a long unique tail >> width
    hot = [f"hot{i}" for i in range(8)]
    docs = []
    for d in range(64):
        toks = [hot[int(i)] for i in rng.integers(0, 8, 40)]
        toks += [f"tail{d}_{j}" for j in range(30)]   # 1920 uniques total
        rng.shuffle(toks)
        docs.append(" ".join(toks))
    tbl = pa.table({"text": pa.array(docs, pa.string())})

    width, denom = 32, 32 - 1  # denom < width, tiny sketch
    got = (heavy_hitter_tokens(
        ray.data.from_arrow(tbl).repartition(8), width=width, denom=denom)
        .to_pandas().sort_values("token").reset_index(drop=True))

    cnt = Counter(tok for d in docs for tok in d.split(" "))
    total = sum(cnt.values())
    thr = total // denom + 1
    want = sorted((t, c) for t, c in cnt.items() if c >= thr)
    assert list(zip(got["token"], got["n"])) == want
    assert len(want) > 0          # the test actually checks something


def test_heavy_hitters_rejects_bad_denom(ray_session):
    import ray

    from balrog_ray.functions.sketch import heavy_hitter_tokens

    tbl = pa.table({"text": pa.array(["a b", "a c"], pa.string())})
    with pytest.raises(ValueError):
        heavy_hitter_tokens(ray.data.from_arrow(tbl), width=8, denom=8)


def test_dup_window_counts_bruteforce(ray_session):
    """128-bit window keys + groupby/join reproduce the brute-force
    cross-doc duplicated-window position counts, across blocks and with
    in-doc repeats (which must count once per POSITION, not per window)."""
    import ray
    from collections import Counter

    from balrog_ray.functions.dedup import dup_window_counts

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    shared = "alpha beta gamma delta".split()      # planted 4-token phrase
    docs = []
    for d in range(40):
        toks = [vocab[i] for i in rng.integers(0, 30, 25)]
        if d % 3 == 0:                              # plant in 14 docs
            at = int(rng.integers(0, 20))
            toks[at:at] = shared
        if d == 0:                                  # plant TWICE in doc 0
            toks += shared
        docs.append(" ".join(toks))
    tbl = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                    "text": pa.array(docs, pa.string())})

    W = 4
    wins = {d: [" ".join(t.split(" ")[i:i + W])
                for i in range(len(t.split(" ")) - W + 1)]
            for d, t in enumerate(docs)}
    ndocs = Counter()
    for d, ws in wins.items():
        for w in set(ws):
            ndocs[w] += 1
    want = sorted((d, sum(1 for w in ws if ndocs[w] >= 2))
                  for d, ws in wins.items()
                  if any(ndocs[w] >= 2 for w in ws))

    got = (dup_window_counts(ray.data.from_arrow(tbl).repartition(7), win=W)
           .to_pandas().sort_values("doc_id"))
    assert list(zip(got["doc_id"], got["dup_windows"])) == want
    assert len(want) >= 14                          # the plant was live


def test_dup_window_counts_short_docs(ray_session):
    """Docs shorter than the window emit nothing and never crash."""
    import ray

    from balrog_ray.functions.dedup import dup_window_counts

    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["a b", "a b", "x"], pa.string())})
    got = dup_window_counts(ray.data.from_arrow(tbl), win=8)
    assert got.count() == 0


def test_repetition_stats_integer_boundary(ray_session):
    """A doc exactly AT the threshold (top*5 == n_tokens) is flagged --
    the integer cross-multiplication makes the boundary exact where a
    float share >= 0.2 could round either way."""
    import ray

    from balrog_ray.functions.text import repetition_stats

    docs = ["a a b c d",          # top=2, n=5 -> 2*5 >= 5*1: flagged
            "a b c d e",          # top=1, n=5 -> 5 < 5*... 1*5>=5: flagged!
            "a b c d e f g h i j"]  # top=1, n=10: not flagged
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = (repetition_stats(ray.data.from_arrow(tbl), max_top_share=0.2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == [0, 1]
    assert list(got["n_tokens"]) == [5, 5]
    assert list(got["n_distinct"]) == [4, 5]
    assert list(got["top_count"]) == [2, 1]


def test_top_bigram_stats_boundary(ray_session):
    """Adjacent-pair rule: exactly-at-threshold flagged (integer
    cross-multiplication), single-token docs produce no pairs."""
    import ray

    from balrog_ray.functions.text import top_bigram_stats

    docs = ["a b a b a b a b c d d",  # pairs=10, top('a b')=4: flagged
            "a b c d e f g h i j k",  # pairs=10, top=1: 1*10>=10: flagged
            "a b c d e f g h i j k l m n o p q r s t u v",  # top=1,n=21
            "solo"]                   # no pairs
    tbl = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                    "text": pa.array(docs, pa.string())})
    got = (top_bigram_stats(ray.data.from_arrow(tbl),
                            max_top_share=0.1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(got["doc_id"]) == [0, 1]
    assert list(got["n_pairs"]) == [10, 10]
    assert list(got["top_count"]) == [4, 1]


def test_phash_dup_clusters_closure(ray_session):
    """Cluster sizes equal the brute-force transitive closure of the
    verified phash pair set, and every survivor is its cluster's
    lexicographic minimum."""
    from collections import defaultdict

    from balrog_ray.relational.rows_only import (q_phash_dup_clusters,
                                                 q_phash_dup_tiles)

    pairs = q_phash_dup_tiles("").to_pandas()
    # brute-force closure over the pair list
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    members = defaultdict(set)
    for x in set(pairs["id_a"]) | set(pairs["id_b"]):
        members[find(x)].add(x)
    want = sorted((m, len(s)) for m, s in members.items() if len(s) >= 2)

    got = (q_phash_dup_clusters("").to_pandas()
           .sort_values("survivor").reset_index(drop=True))
    assert list(zip(got["survivor"], got["n_members"])) == want
    assert all(min(members[s]) == s for s in got["survivor"])
    assert len(want) > 0


def test_lev1_dist_vs_brute_force():
    """_lev1_dist agrees with full DP Levenshtein (clamped at 2) on every
    pair over a small alphabet, lengths 0-4."""
    from itertools import product

    from balrog_ray.functions.dedup import _lev1_dist

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                cur = d[j]
                d[j] = min(d[j] + 1, d[j - 1] + 1,
                           prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return d[n]

    words = ["".join(w) for k in range(4)
             for w in product("abc", repeat=k)]
    for a in words:
        for b in words:
            assert _lev1_dist(a, b) == min(lev(a, b), 2), (a, b)


def test_edit_distance_pairs_exact(ray_session):
    """edit_distance_pairs == brute-force lev<=1 pairs (exactly once,
    id_a < id_b) on a vocabulary with substitutions, indels, repeated
    chars and unrelated strings."""
    import ray.data

    from balrog_ray.functions.dedup import _lev1_dist, edit_distance_pairs

    names = ["kitten", "sitten", "mitten", "kitte", "kittens", "kit",
             "aab", "ab", "ba", "abc", "zzz", "zz", "z", "", "a",
             "banana", "bananna", "bananas", "banan"]
    tab = pa.table({"sid": pa.array(range(len(names)), pa.int64()),
                    "s": pa.array(names, pa.string())})
    got = edit_distance_pairs(ray.data.from_arrow(tab), "sid", "s") \
        .to_pandas()
    got_pairs = sorted(zip(got["id_a"], got["id_b"], got["dist"]))
    want = sorted((i, j, _lev1_dist(names[i], names[j]))
                  for i in range(len(names))
                  for j in range(i + 1, len(names))
                  if _lev1_dist(names[i], names[j]) <= 1)
    assert got_pairs == want
    assert len(want) >= 10


def _numpy_mmr(vecs, query, k, lam, pool):
    """Single-process oracle mirroring the distributed two-stage rule:
    pool by (cosine desc, id asc), then greedy_mmr."""
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(n == 0, 1, n)
    u = unit(vecs.astype(np.float32).astype(np.float64))
    q = unit(query[None, :])[0]
    cos = u @ q
    ids = np.arange(len(vecs), dtype=np.int64)
    order = np.lexsort((ids, -cos))[:pool]
    ids, cos, u = ids[order], cos[order], u[order]
    sel, scores = ann.greedy_mmr(cos, u, ids, k=k, lam=lam,
                                 return_scores=True)
    return list(ids[sel]), scores


def test_mmr_topk_matches_oracle(ray_session, emb_data):
    import ray.data

    tbl, vecs, queries = emb_data
    got = ann.mmr_topk(ray.data.from_arrow(tbl), queries, k=8,
                       lam=0.6, pool=32).take_all()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["mmr_score"], 9)))
    for qi in range(queries.shape[0]):
        ids, scores = _numpy_mmr(vecs, queries[qi], 8, 0.6, 32)
        assert by_q[qi] == [(i, round(s, 9))
                            for i, s in zip(ids, scores)]


def test_mmr_diversifies(ray_session, emb_data):
    """lam < 1 must not increase the mean pairwise similarity of the
    selection vs the plain top-k (equality only if top-k is already
    diverse); lam=1.0 must reproduce the plain top-k order."""
    import ray.data

    tbl, vecs, queries = emb_data
    ds = ray.data.from_arrow(tbl)

    def mean_pair_sim(ids):
        def unit(m):
            n = np.linalg.norm(m, axis=1, keepdims=True)
            return m / np.where(n == 0, 1, n)
        u = unit(vecs[ids].astype(np.float32).astype(np.float64))
        s = u @ u.T
        iu = np.triu_indices(len(ids), 1)
        return float(s[iu].mean())

    plain = ann.brute_force_topk(ds, queries, k=8).take_all()
    div = ann.mmr_topk(ds, queries, k=8, lam=0.5, pool=64).take_all()
    ident = ann.mmr_topk(ds, queries, k=8, lam=1.0, pool=64).take_all()
    by_q_p, by_q_d, by_q_i = {}, {}, {}
    for r in plain:
        by_q_p.setdefault(r["query_id"], []).append(r["vec_id"])
    for r in sorted(div, key=lambda r: (r["query_id"], r["rank"])):
        by_q_d.setdefault(r["query_id"], []).append(r["vec_id"])
    for r in sorted(ident, key=lambda r: (r["query_id"], r["rank"])):
        by_q_i.setdefault(r["query_id"], []).append(r["vec_id"])
    for qi in by_q_p:
        assert by_q_i[qi] == by_q_p[qi]          # lam=1 == relevance
        assert (mean_pair_sim(by_q_d[qi])
                <= mean_pair_sim(by_q_p[qi]) + 1e-12)


def test_knn_graph_recall(ray_session, emb_data):
    import ray.data

    tbl, vecs, _ = emb_data
    got = ann.knn_graph(ray.data.from_arrow(tbl), k=5, n_centroids=8,
                        n_probe=4, num_partitions=4).take_all()
    # brute-force oracle: per-vector top-5, self excluded,
    # (cosine desc, id asc) tie-break, same float32 roundtrip
    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(n == 0, 1, n)
    u = unit(vecs.astype(np.float32).astype(np.float64))
    sims = u @ u.T
    np.fill_diagonal(sims, -np.inf)
    exact = {}
    for i in range(len(vecs)):
        order = np.lexsort((np.arange(len(vecs)), -sims[i]))[:5]
        exact[i] = set(order.tolist())
    by_q = {}
    for r in got:
        assert r["vec_id"] != r["query_id"]          # self excluded
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(by_q) == len(vecs)                    # every vector ranked
    assert all(len(v) <= 5 for v in by_q.values())
    recalls = [len(by_q[q] & exact[q]) / 5 for q in exact]
    assert np.mean(recalls) >= 0.6

    # exactness where the probe covers the truth: raising n_probe to
    # n_centroids makes the graph exact (every list probed)
    full = ann.knn_graph(ray.data.from_arrow(tbl), k=5, n_centroids=8,
                         n_probe=8, num_partitions=4).take_all()
    by_q2 = {}
    for r in full:
        by_q2.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert all(by_q2[q] == exact[q] for q in exact)
