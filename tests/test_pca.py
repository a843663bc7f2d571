"""Distributed PCA (functions/pca.py) vs a single-process numpy oracle:
the integer moment fold must be EXACT (block-order independent), and the
projection must match an oracle that never distributes anything."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _vectors():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = (t.column("embedding").combine_chunks().flatten()
           .to_numpy(zero_copy_only=False)
           .astype(np.float64).reshape(len(ids), -1))
    return ids, mat


def test_gram_fold_exact_vs_duckdb(ray_session):
    import ray.data

    from balrog_ray.functions.pca import gram_fold

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                               columns=["embedding"])
    got = {(r["i"], r["j"]): (r["n"], r["sxy"])
           for r in gram_fold(ds, dim=64).take_all()}

    con = duckdb.connect()
    con.execute(f"create view embeddings as select * from "
                f"read_parquet('{SF_DIR}/embeddings.parquet')")
    want = con.execute("""
        with e as (
          select vec_id, i.range as i,
                 cast(floor(cast(embedding[i.range] as double) * 10000 + 0.5) as bigint)
                     as q
          from embeddings, range(1, 65) i)
        select a.i, b.i, count(*), cast(sum(a.q * b.q) as bigint)
        from e a join e b using (vec_id)
        where a.i <= b.i group by 1, 2""").fetchall()
    assert len(got) == len(want) == 64 * 65 // 2
    for i, j, n, sxy in want:
        assert got[(i, j)] == (n, sxy)


def test_pca_projection_matches_numpy_oracle(ray_session):
    import ray.data

    from balrog_ray.functions.pca import SCALE, fit_pca, pca_project

    ids, mat = _vectors()
    q = np.floor(mat * SCALE + 0.5)
    mu = q.mean(axis=0)
    cov = (q - mu).T @ (q - mu) / len(q)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:2]
    comps = v[:, order].T
    amax = np.argmax(np.abs(comps), axis=1)
    sign = np.sign(comps[np.arange(2), amax])
    comps = comps * sign[:, None]
    want = (q / SCALE - mu / SCALE) @ comps.T

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    eng_mu, eng_c = fit_pca(ds, k=2)
    # moments are integer-exact, so mean and axes agree to float64 noise
    np.testing.assert_allclose(eng_mu, mu / SCALE, rtol=0, atol=1e-12)
    assert np.abs(np.abs(np.sum(eng_c * comps, axis=1)) - 1.0).max() < 1e-9

    rows = pca_project(ds, k=2).take_all()
    got = {int(r["vec_id"]): (r["pc1"], r["pc2"]) for r in rows}
    assert len(got) == len(ids)
    g = np.array([got[int(i)] for i in ids])
    np.testing.assert_allclose(g, want, rtol=0, atol=1e-8)

    # variance actually concentrates: pc1 var >= pc2 var > 0
    assert g[:, 0].var() >= g[:, 1].var() > 0


def test_pca_dim_mismatch_raises(ray_session):
    import ray.data

    from balrog_ray.functions.pca import gram_fold

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                               columns=["embedding"])
    # Ray wraps the worker's ValueError in RayTaskError
    with pytest.raises(Exception, match="dim 64 != declared 32"):
        gram_fold(ds, dim=32).take_all()


def test_block_order_independence(ray_session):
    """Same Gram regardless of block layout -- the fold is exact int64,
    so a 7-block re-split must reproduce every cell bit-for-bit."""
    import ray.data

    from balrog_ray.functions.pca import gram_fold

    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                               columns=["embedding"])
    a = {(r["i"], r["j"]): r["sxy"] for r in gram_fold(ds).take_all()}
    b = {(r["i"], r["j"]): r["sxy"]
         for r in gram_fold(ds.repartition(7)).take_all()}
    assert a == b
