"""Audio family: npcm roundtrip, framed features vs a scalar loop
oracle, fingerprint separation (planted near-dups vs distinct clips),
and the end-to-end dedup composition through hash64_dup_pairs."""

import numpy as np
import pyarrow as pa
import pytest

from balrog_ray.functions.audio import (AudioFeatureActor,
                                        audio_fingerprint64,
                                        fingerprint_batch, pack_audio,
                                        synth_audio_table, unpack_audio)


def test_npcm_roundtrip():
    rng = np.random.default_rng(3)
    w = rng.uniform(-1, 1, 5000)
    got, sr = unpack_audio(pack_audio(w, 16000))
    assert sr == 16000 and len(got) == 5000
    assert np.abs(got - w).max() <= 1.0 / 32767 + 1e-9


def test_features_match_scalar_oracle():
    rng = np.random.default_rng(4)
    w = rng.uniform(-1, 1, 4096)
    tab = pa.table({"audio_id": ["a"], "bytes": [pack_audio(w, 8000)],
                    "fmt": ["npcm"]})
    got = AudioFeatureActor(frame=1024, hop=512)(tab)
    dec, _ = unpack_audio(pack_audio(w, 8000))
    n_frames = 1 + (len(dec) - 1024) // 512
    assert got.num_rows == n_frames
    for i in range(n_frames):
        fr = dec[i * 512:i * 512 + 1024]
        assert got.column("rms")[i].as_py() == pytest.approx(
            float(np.sqrt((fr * fr).mean())), rel=1e-12)
        zc = sum(1 for j in range(1, 1024)
                 if np.signbit(fr[j]) != np.signbit(fr[j - 1]))
        assert got.column("zero_crossings")[i].as_py() == zc


def test_feature_actor_stubs_loudly():
    tab = pa.table({"audio_id": ["x"], "bytes": [b"???"], "fmt": ["mp3"]})
    with pytest.raises(NotImplementedError, match="mp3"):
        AudioFeatureActor()(tab)


def test_fingerprint_short_clip_guard():
    with pytest.raises(ValueError, match="too short"):
        audio_fingerprint64(np.zeros(50))


def test_fingerprint_separation():
    tab = synth_audio_table()
    fp = fingerprint_batch(tab)
    h = dict(zip(fp.column("audio_id").to_pylist(),
                 fp.column("afp").to_pylist()))

    def ham(a, b):
        return bin((a ^ b) & (2 ** 64 - 1)).count("1")

    for i in range(5):
        assert ham(h[f"dup{i}a"], h[f"dup{i}b"]) <= 3
    import itertools
    solos = [k for k in h if k.startswith("solo")]
    assert min(ham(h[a], h[b])
               for a, b in itertools.combinations(solos, 2)) > 3


def test_audio_dedup_end_to_end(ray_session):
    """fingerprint map_batches -> hash64_dup_pairs finds exactly the
    planted pairs (the same kit as simhash / image phash)."""
    import ray.data

    from balrog_ray.functions.dedup import hash64_dup_pairs

    ds = ray.data.from_arrow(synth_audio_table())
    fp = ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    pairs = hash64_dup_pairs(fp, id_col="audio_id", hash_col="afp",
                             max_hamming=3).take_all()
    got = sorted((min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
                 for r in pairs)
    assert got == [(f"dup{i}a", f"dup{i}b") for i in range(5)]
