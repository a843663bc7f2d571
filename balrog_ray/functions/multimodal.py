"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a ``fmt`` tag and a JSON
caption.  The Ray-side plumbing (schema, actor signature, batch sizing,
output layout) is real and tested; codec backends the container lacks
(JPEG/MP3/H.264) are stubbed behind ``NotImplementedError`` with the
engine's own ``npy``/``png`` codecs as the working deterministic path.

Stages follow the stateful actor-pool pattern: decoder tables /
"models" initialize once per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..tiles.codec import Caption, decode_tile, encode_tile, phash64

SUPPORTED_FMTS = ("npy", "png")
STUB_FMTS = ("jpeg", "webp", "mp3", "wav", "h264")


class ImageDecodeActor:
    """Decode -> feature-extract stage.  ``__init__`` is where a real
    deployment loads its codec/model weights; here it precompiles the
    supported-format dispatch."""

    def __init__(self, features: bool = True):
        self.features = features
        self.dispatch = {f: decode_tile for f in SUPPORTED_FMTS}

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "w": [], "h": [], "mean": [], "std": [],
               "p_nodata": [], "phash": []}
        for row in batch.to_pylist():
            fmt = row["fmt"]
            if fmt in STUB_FMTS:
                raise NotImplementedError(
                    f"codec for {fmt!r} not available in this container; "
                    "plug a real decoder into ImageDecodeActor.dispatch")
            cap = Caption.from_json(row["caption"])
            arr = self.dispatch[fmt](row["bytes"], fmt, cap)
            out["image_id"].append(row["image_id"])
            out["h"].append(arr.shape[0])
            out["w"].append(arr.shape[1])
            valid = arr != np.float32(cap.nodata)
            out["mean"].append(float(arr[valid].mean()) if valid.any()
                               else float("nan"))
            out["std"].append(float(arr[valid].std()) if valid.any()
                              else float("nan"))
            out["p_nodata"].append(float((~valid).mean()))
            out["phash"].append(phash64(arr))
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "mean": pa.array(out["mean"], pa.float64()),
            "std": pa.array(out["std"], pa.float64()),
            "p_nodata": pa.array(out["p_nodata"], pa.float64()),
            "phash": pa.array(out["phash"], pa.int64()),
        })


class ImageResizeActor:
    """Block-mean downsample (factor must divide the tile); re-encodes with
    the same codec.  The decode-transform-encode roundtrip shape of any
    image-preprocessing stage."""

    def __init__(self, factor: int = 2):
        self.factor = factor

    def __call__(self, batch: pa.Table) -> pa.Table:
        f = self.factor
        rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": [],
                "caption": [], "phash": []}
        for row in batch.to_pylist():
            if row["fmt"] in STUB_FMTS:
                raise NotImplementedError(f"codec {row['fmt']!r} stubbed")
            cap = Caption.from_json(row["caption"])
            arr = decode_tile(row["bytes"], row["fmt"], cap)
            h, w = arr.shape
            # nodata-aware block mean: the sentinel must never blend into
            # data values (a block's mean covers only its valid pixels;
            # an all-nodata block stays nodata)
            nod = np.float64(cap.nodata)
            a = arr[:h - h % f, :w - w % f].astype(np.float64)
            blocks = a.reshape(h // f, f, w // f, f)
            valid = blocks != nod
            n_valid = valid.sum(axis=(1, 3))
            sums = np.where(valid, blocks, 0.0).sum(axis=(1, 3))
            with np.errstate(invalid="ignore"):
                small = np.where(n_valid > 0, sums / np.maximum(n_valid, 1),
                                 nod)
            cap.pixel_size *= f
            payload, cap = encode_tile(small, row["fmt"], cap)
            rows["image_id"].append(row["image_id"])
            rows["bytes"].append(payload)
            rows["h"].append(small.shape[0])
            rows["w"].append(small.shape[1])
            rows["fmt"].append(row["fmt"])
            rows["caption"].append(cap.to_json())
            rows["phash"].append(phash64(small))
        from ..tiles.synth import TILES_SCHEMA
        return pa.table({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "caption": pa.array(rows["caption"], pa.string()),
            "phash": pa.array(rows["phash"], pa.int64()),
        }, schema=TILES_SCHEMA)


def frame_sample_stub(video_bytes: bytes, every_n: int = 30):
    """Video frame sampling requires an H.264 decoder -- not in this
    container.  The signature and output layout are fixed here so the
    pipeline plumbing is real."""
    raise NotImplementedError(
        "video decoding unavailable; expected output: list of (frame_idx, "
        "encoded frame bytes) rows")


# ---------------------------------------------------------------------------
# video frame sampling: real actor-pool plumbing over a deterministic
# container ("nvid": length-prefixed npz frames); H.264 honestly stubbed

_NVID_MAGIC = b"NVID"


def pack_video(frames, caption: Caption) -> bytes:
    """Pack float32 frames into the engine's deterministic ``nvid``
    container: magic + frame count + length-prefixed npz frames.  Stands
    in for a real video codec so the frame-sampling stage's plumbing
    (actor signature, batching, per-frame output rows) is testable."""
    import struct

    parts = [_NVID_MAGIC, struct.pack(">I", len(frames))]
    for fr in frames:
        payload, _ = encode_tile(np.asarray(fr, np.float32), "npz",
                                 caption)
        parts.append(struct.pack(">I", len(payload)))
        parts.append(payload)
    return b"".join(parts)


def unpack_video(data: bytes, caption: Caption, *, every_n: int = 1):
    """Iterate (frame_idx, float32 frame) from an ``nvid`` payload.
    ``every_n`` > 1 SEEKS past unsampled frames using the length
    prefixes -- their payloads are never decompressed, so a sampler
    pays decode cost only for the frames it keeps."""
    import struct

    if data[:4] != _NVID_MAGIC:
        raise ValueError("not an nvid container")
    (n,) = struct.unpack(">I", data[4:8])
    pos = 8
    for i in range(n):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        pos += 4
        if i % every_n == 0:
            yield i, decode_tile(data[pos:pos + ln], "npz", caption)
        pos += ln


class FrameSampleActor:
    """Every-N frame sampler: video rows (``video_id, bytes, fmt,
    caption``) -> one TILES_SCHEMA-style row per sampled frame.  A real
    deployment loads its H.264 decoder in ``__init__`` (stubbed fmts
    raise loudly); the ``nvid`` path exercises the identical dataflow.
    Frame payloads re-encode with ``out_fmt`` so downstream stages see
    ordinary image tiles."""

    def __init__(self, every_n: int = 30, out_fmt: str = "npz"):
        if every_n < 1:
            raise ValueError("every_n must be >= 1")
        self.every_n = every_n
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..tiles.synth import TILES_SCHEMA

        rows = {n: [] for n in TILES_SCHEMA.names}
        for row in batch.to_pylist():
            if row["fmt"] in STUB_FMTS:
                raise NotImplementedError(
                    f"video codec {row['fmt']!r} not available in this "
                    "container; plug a real decoder into FrameSampleActor")
            if row["fmt"] != "nvid":
                raise ValueError(f"not a video payload: {row['fmt']!r}")
            cap = Caption.from_json(row["caption"])
            vid = row.get("video_id") or row.get("image_id")
            for idx, frame in unpack_video(row["bytes"], cap,
                                           every_n=self.every_n):
                payload, ocap = encode_tile(frame, self.out_fmt, cap)
                rows["image_id"].append(f"{vid}/f{idx}")
                rows["bytes"].append(payload)
                rows["w"].append(np.int32(frame.shape[1]))
                rows["h"].append(np.int32(frame.shape[0]))
                rows["fmt"].append(self.out_fmt)
                rows["caption"].append(ocap.to_json())
                rows["phash"].append(np.int64(phash64(frame)))
        return pa.table(rows, schema=TILES_SCHEMA)
