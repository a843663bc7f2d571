"""Bloom join prefilter: zero false negatives (exactness), measured
false-positive rate near theory, and real row reduction on a selective
key set."""

import numpy as np
import pyarrow as pa

from balrog_ray.functions.bloom import (_hashes, build_bloom,
                                        filter_by_bloom)


def test_bloom_no_false_negatives_and_low_fp(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=2000, replace=False)
    others = np.setdiff1d(rng.choice(10_000_000, size=50_000,
                                     replace=False), members)

    small = ray.data.from_arrow(pa.table(
        {"k": pa.array(members, pa.int64())})).repartition(4)
    bloom = build_bloom(small, "k", n_bits=1 << 16, k=4)

    probe = pa.table({"k": pa.array(np.concatenate([members, others]),
                                    pa.int64())})
    kept = filter_by_bloom(ray.data.from_arrow(probe).repartition(3),
                           "k", bloom, k=4).take_all()
    kept_keys = {r["k"] for r in kept}
    # every member survives (no false negatives -> join stays exact)
    assert set(members.tolist()) <= kept_keys
    # fp rate: theory (1-e^{-kn/m})^k ~ (1-e^{-8000/65536})^4 ~ 1.7e-4
    fp = len(kept_keys - set(members.tolist()))
    assert fp / len(others) < 0.01
    # and the prefilter actually removes the bulk of non-matching rows
    assert len(kept) < 0.1 * probe.num_rows


def test_bloom_hash_positions_in_range():
    pos = _hashes(np.array([0, 1, 2**63 - 1, -5], dtype=np.int64),
                  1 << 12, 5)
    assert pos.shape == (4, 5)
    assert (pos < (1 << 12)).all()
