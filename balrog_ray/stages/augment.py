"""Deterministic per-epoch image augmentation -- the random-flip /
rotate / crop stage of a vision training pipeline, made reproducible
the same way stages/epoch_shuffle is: the transform for a row is a pure
function of ``(image_id, epoch, seed)``, so any worker, block order, or
retry produces the identical augmented corpus (lineage-safe resume; an
epoch re-run after a failure re-emits byte-identical rows).

Each row draws from the 8-element dihedral group (identity, 3
rotations, 4 flip combinations) plus an optional deterministic crop
offset.  Decode -> one numpy view op (rot90/flip are views; only the
crop + re-encode copy) -> re-encode; stateless ``map_batches``, no
shuffle.

Augmented rows are TRAINING data, not geodata: flips/rotations
invalidate the caption's north-up georeferencing, so ``image_id`` gains
an ``@e{epoch}t{k}`` suffix and the caption is kept only as provenance
(layer/grid id); geospatial stages should not consume augmented tables.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: op k: (number of rot90 turns, flip left-right after rotating)
_D4 = [(0, False), (1, False), (2, False), (3, False),
       (0, True), (1, True), (2, True), (3, True)]


def _draw(image_id: str, epoch: int, seed: int) -> int:
    h = hashlib.blake2b(f"{image_id}|{epoch}|{seed}".encode(),
                        digest_size=8).digest()
    return int.from_bytes(h, "big")


def apply_d4(arr: np.ndarray, k: int) -> np.ndarray:
    turns, flip = _D4[k % 8]
    out = np.rot90(arr, turns)
    return np.fliplr(out) if flip else out


def augment_images(ds, *, epoch: int, seed: int = 0,
                   crop_px: int | None = None, fmt: str = "npz"):
    """Image-table Dataset -> augmented image-table Dataset (one row
    per input row).  ``crop_px`` additionally takes a deterministic
    ``crop_px``-square window (requires crop_px <= tile size)."""

    def aug(batch: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, encode_tile, phash64

        out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                               "caption", "phash")}
        for i in range(batch.num_rows):
            img_id = batch.column("image_id")[i].as_py()
            cap = Caption.from_json(batch.column("caption")[i].as_py())
            arr = decode_tile(batch.column("bytes")[i].as_py(),
                              batch.column("fmt")[i].as_py(), cap)
            rnd = _draw(img_id, epoch, seed)
            k = rnd % 8
            a = apply_d4(arr, k)
            if crop_px is not None:
                if crop_px > min(a.shape):
                    raise ValueError(
                        f"crop_px {crop_px} exceeds image side "
                        f"{min(a.shape)}")
                r0 = (rnd >> 8) % (a.shape[0] - crop_px + 1)
                c0 = (rnd >> 32) % (a.shape[1] - crop_px + 1)
                a = a[r0:r0 + crop_px, c0:c0 + crop_px]
            a = np.ascontiguousarray(a)
            payload, cap2 = encode_tile(a, fmt, cap)
            out["image_id"].append(f"{img_id}@e{epoch}t{k}")
            out["bytes"].append(payload)
            out["w"].append(np.int32(a.shape[1]))
            out["h"].append(np.int32(a.shape[0]))
            out["fmt"].append(fmt)
            out["caption"].append(cap2.to_json())
            out["phash"].append(np.int64(phash64(a)))
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "bytes": pa.array(out["bytes"], pa.binary()),
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "fmt": pa.array(out["fmt"], pa.string()),
            "caption": pa.array(out["caption"], pa.string()),
            "phash": pa.array(out["phash"], pa.int64())})

    return ds.map_batches(aug, batch_format="pyarrow", batch_size=16)
