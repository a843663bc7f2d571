"""Audio-payload operators: the audio third of the multimodal family
(images: :class:`.multimodal.ImageDecodeActor`, video:
:class:`.multimodal.FrameSampleActor`).

Audio rides the same opaque-binary-column contract as images and video:
``(audio_id, bytes, fmt, caption)`` rows where ``fmt`` names the codec.
MP3/FLAC/OGG decoders are not in this container and raise loudly
(honest stubs); the deterministic ``npcm`` container (magic + sample
rate + int16 PCM) is a real, tested payload format that exercises the
identical dataflow -- actor-pool decode, vectorized per-frame features,
fingerprint dedup.

Operators:

* :class:`AudioFeatureActor` -- actor-pool ``map_batches`` stage:
  decode once, then fully vectorized frame features (RMS energy +
  zero-crossing count per hop window, stride-tricked framing, no Python
  loop over samples).
* :func:`audio_fingerprint64` -- a 64-bit Chromaprint/Shazam-role
  fingerprint: 33 equal segments x 2 FFT band energies -> 32 x 2
  energy-delta sign bits.  Equal audio gives equal bits; small noise
  flips only near-tie bits, so near-duplicate clips land within a small
  Hamming distance and the generic
  :func:`balrog_ray.functions.dedup.hash64_dup_pairs` pigeonhole kit
  (shared with text simhash and image phash) finds them with ONE
  bucket shuffle -- no new dedup machinery.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_NPCM_MAGIC = b"NPCM"

#: codecs a real deployment would plug in; absent here, so loud stubs
STUB_AUDIO_FMTS = ("mp3", "flac", "ogg", "aac", "wav")


def pack_audio(wave: np.ndarray, sample_rate: int) -> bytes:
    """float waveform in [-1, 1] -> ``npcm`` payload (int16 PCM)."""
    w = np.clip(np.asarray(wave, np.float64), -1.0, 1.0)
    pcm = np.round(w * 32767.0).astype("<i2")
    return b"".join([_NPCM_MAGIC,
                     struct.pack(">II", int(sample_rate), len(pcm)),
                     pcm.tobytes()])


def unpack_audio(data: bytes) -> tuple[np.ndarray, int]:
    """``npcm`` payload -> (float64 waveform in [-1, 1], sample_rate)."""
    if data[:4] != _NPCM_MAGIC:
        raise ValueError("not an npcm container")
    sr, n = struct.unpack(">II", data[4:12])
    pcm = np.frombuffer(data, "<i2", count=n, offset=12)
    return pcm.astype(np.float64) / 32767.0, sr


def _frames(wave: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(n_frames, frame) stride-tricked view; tail samples that do not
    fill a frame are dropped (standard STFT framing)."""
    n = 1 + max(0, (len(wave) - frame)) // hop
    if len(wave) < frame:
        return np.empty((0, frame), wave.dtype)
    return np.lib.stride_tricks.as_strided(
        wave, shape=(n, frame),
        strides=(wave.strides[0] * hop, wave.strides[0]), writeable=False)


class AudioFeatureActor:
    """Audio rows -> one row per analysis frame: ``(audio_id, frame_idx,
    rms, zero_crossings)``.  Framing params are per-actor state; decode
    + features are vectorized over all frames of a clip at once."""

    def __init__(self, frame: int = 1024, hop: int = 512):
        if frame < 2 or hop < 1:
            raise ValueError("need frame >= 2 and hop >= 1")
        self.frame = frame
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"audio_id": [], "frame_idx": [], "rms": [],
               "zero_crossings": []}
        for row in batch.to_pylist():
            if row["fmt"] in STUB_AUDIO_FMTS:
                raise NotImplementedError(
                    f"audio codec {row['fmt']!r} not available in this "
                    "container; plug a real decoder into "
                    "AudioFeatureActor")
            if row["fmt"] != "npcm":
                raise ValueError(f"not an audio payload: {row['fmt']!r}")
            wave, _sr = unpack_audio(row["bytes"])
            fr = _frames(wave, self.frame, self.hop)
            if not len(fr):
                continue
            rms = np.sqrt((fr * fr).mean(axis=1))
            zc = (np.signbit(fr[:, 1:]) != np.signbit(fr[:, :-1])) \
                .sum(axis=1)
            out["audio_id"].extend([row["audio_id"]] * len(fr))
            out["frame_idx"].extend(range(len(fr)))
            out["rms"].extend(rms.tolist())
            out["zero_crossings"].extend(zc.astype(int).tolist())
        return pa.table({
            "audio_id": pa.array(out["audio_id"], pa.string()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "rms": pa.array(out["rms"], pa.float64()),
            "zero_crossings": pa.array(out["zero_crossings"],
                                       pa.int64())})


def audio_fingerprint64(wave: np.ndarray) -> int:
    """64-bit energy-delta fingerprint: split the clip into 33 equal
    segments, take low/high FFT band energy per segment, emit one sign
    bit per (band, consecutive-segment delta) -- 2 x 32 = 64 bits,
    MSB-first (band 0 deltas then band 1).  Deterministic; robust to
    small amplitude noise (only near-tie deltas flip)."""
    w = np.asarray(wave, np.float64)
    n_seg = 33
    seg_len = len(w) // n_seg
    # seg_len >= 8 keeps BOTH band slices non-empty (rfft length
    # seg_len//2+1 >= 5, so bins 1..k//2-1 exist); shorter clips would
    # silently zero all 32 low-band bits and double the collision rate
    if seg_len < 8:
        raise ValueError("clip too short to fingerprint (need >= 264 "
                         "samples)")
    segs = w[:seg_len * n_seg].reshape(n_seg, seg_len)
    spec = np.abs(np.fft.rfft(segs, axis=1)) ** 2
    k = spec.shape[1]
    low = spec[:, 1:k // 2].sum(axis=1)          # skip DC
    high = spec[:, k // 2:].sum(axis=1)
    bits = np.concatenate([np.diff(low) > 0, np.diff(high) > 0])
    h = np.uint64(0)
    for b in bits:
        h = (h << np.uint64(1)) | np.uint64(bool(b))
    return int(h.astype(np.int64))


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Stateless map: audio rows -> ``(audio_id, afp)`` int64 rows,
    ready for :func:`balrog_ray.functions.dedup.hash64_dup_pairs`."""
    ids, fps = [], []
    for row in batch.to_pylist():
        if row["fmt"] != "npcm":
            raise NotImplementedError(
                f"audio codec {row['fmt']!r} not available")
        wave, _ = unpack_audio(row["bytes"])
        ids.append(row["audio_id"])
        fps.append(audio_fingerprint64(wave))
    return pa.table({"audio_id": pa.array(ids, pa.string()),
                     "afp": pa.array(fps, pa.int64())})


def synth_audio_table(n_clips: int = 24, *, sr: int = 8000,
                      seconds: float = 1.0, n_dup_pairs: int = 5,
                      seed: int = 7) -> pa.Table:
    """Deterministic audio table with planted near-duplicate pairs:
    clip ``dup{i}b`` is ``dup{i}a`` plus tiny amplitude noise (same
    content, different bytes)."""
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    rows = {"audio_id": [], "bytes": [], "fmt": [], "sr": []}

    def add(aid: str, wave: np.ndarray):
        rows["audio_id"].append(aid)
        rows["bytes"].append(pack_audio(wave, sr))
        rows["fmt"].append("npcm")
        rows["sr"].append(sr)

    def clip(i: int) -> np.ndarray:
        f1 = 150.0 + 37.0 * i
        f2 = 900.0 + 53.0 * i
        env = 0.4 + 0.3 * np.sin(2 * np.pi * (0.7 + 0.13 * i) * t)
        return env * (0.6 * np.sin(2 * np.pi * f1 * t)
                      + 0.3 * np.sin(2 * np.pi * f2 * t))

    for i in range(n_dup_pairs):
        base = clip(i)
        add(f"dup{i}a", base)
        add(f"dup{i}b", base + rng.normal(0, 1e-4, n))
    for i in range(n_dup_pairs, n_clips - n_dup_pairs):
        add(f"solo{i}", clip(i))
    return pa.table({"audio_id": pa.array(rows["audio_id"], pa.string()),
                     "bytes": pa.array(rows["bytes"], pa.binary()),
                     "fmt": pa.array(rows["fmt"], pa.string()),
                     "sr": pa.array(rows["sr"], pa.int32())})
