"""Corrupt-row quarantine for image-table ingest -- the per-row
poison-pill handling SURVEY §4 assigns to the engine (the reference drops
failures silently with bare ``except: return None``, ga_5m/01_...py:241-242
/ 02_get_slope_from_buffer.py:260-266; here every row is accounted for).

At 10^11 rows some payloads WILL be truncated, mis-tagged or undecodable;
a decode error must cost one quarantine row, not a task retry loop that
eventually kills the job.  ``TileValidator`` attempts a full decode +
georeferencing parse of every tile and NEVER raises: good rows emit pixel
stats (the ingest-time quality gate), bad rows emit a machine-readable
error class.  The report composes downstream exactly like the
checkpoint/lineage table: filter the source by ``ok`` via anti-join on
the quarantined ids, or alert on per-class counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class TileValidator:
    """Actor-pool ``map_batches`` stage (state: none to build, but the
    actor form keeps per-worker codec warm-up out of the per-batch path
    and matches the engine's other decode stages)."""

    #: max Hamming distance between the table's phash column and the
    #: hash of the DECODED pixels.  The stored hash is computed on the
    #: pre-encode array, so lossy png quantization may flip a couple of
    #: block-mean comparisons; lossless codecs must round-trip the hash
    #: exactly.  A payload/caption swap scrambles ~half the 64 bits, so
    #: the gap between tolerance and failure is wide.
    PHASH_TOL = {"png": 4}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..tiles.codec import Caption, decode_tile, phash64

        n = batch.num_rows
        ids = batch.column("image_id").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        caps = batch.column("caption").to_pylist()
        ws = batch.column("w").to_pylist()
        hs = batch.column("h").to_pylist()
        payloads = batch.column("bytes").to_pylist()
        phashes = (batch.column("phash").to_pylist()
                   if "phash" in batch.schema.names else [None] * n)

        ok = np.zeros(n, dtype=bool)
        err = [""] * n
        phash_dist = np.full(n, -1, dtype=np.int64)
        nodata_frac = np.full(n, np.nan)
        vmin = np.full(n, np.nan)
        vmax = np.full(n, np.nan)
        vmean = np.full(n, np.nan)
        for i in range(n):
            try:
                cap = Caption.from_json(caps[i])
            except Exception as e:  # noqa: BLE001 -- quarantine, not crash
                err[i] = f"caption_parse: {type(e).__name__}"
                continue
            try:
                arr = decode_tile(payloads[i], fmts[i], cap)
            except Exception as e:  # noqa: BLE001
                err[i] = f"decode: {type(e).__name__}"
                continue
            if arr.ndim != 2 or arr.shape != (hs[i], ws[i]):
                err[i] = (f"shape_mismatch: got {tuple(arr.shape)}, "
                          f"caption says ({hs[i]}, {ws[i]})")
                continue
            valid = arr != np.float32(cap.nodata)
            if not np.isfinite(arr[valid]).all():
                err[i] = "non_finite_pixels"
                continue
            if phashes[i] is not None:
                # phash64 values live in signed-int64 range: mask the
                # XOR to 64 bits so a sign-bit difference counts as ONE
                # flipped bit, not a two's-complement magnitude blowup
                d = (((int(phash64(arr)) ^ int(phashes[i]))
                      & ((1 << 64) - 1)).bit_count())
                phash_dist[i] = d
                if d > self.PHASH_TOL.get(fmts[i], 0):
                    err[i] = f"phash_mismatch: hamming {d}"
                    continue
            ok[i] = True
            nodata_frac[i] = 1.0 - valid.mean()
            if valid.any():
                v = arr[valid]
                vmin[i] = float(v.min())
                vmax[i] = float(v.max())
                vmean[i] = float(v.mean())
        return pa.table({
            "image_id": pa.array(ids, batch.schema.field("image_id").type),
            "ok": pa.array(ok),
            "error": pa.array(err, pa.string()),
            "phash_dist": pa.array(phash_dist, pa.int64()),
            "nodata_frac": pa.array(nodata_frac, pa.float64()),
            "vmin": pa.array(vmin, pa.float64()),
            "vmax": pa.array(vmax, pa.float64()),
            "vmean": pa.array(vmean, pa.float64())})


def validate_tiles(ds, *, concurrency: int = 4, batch_size: int = 64):
    """Image-table Dataset -> per-row quarantine/quality report
    (image_id, ok, error, nodata_frac, vmin, vmax, vmean).

    The pool autoscales from 1 so it never starves the upstream read
    tasks of CPUs on a small cluster (min=concurrency would deadlock a
    4-CPU node)."""
    return ds.map_batches(TileValidator, batch_size=batch_size,
                          batch_format="pyarrow",
                          concurrency=(1, concurrency))


def drop_quarantined(ds, report_ds, id_col: str = "image_id"):
    """Stream the source minus the quarantined rows: anti-join against
    the (small) bad-row id table -- the same resume-shape as the
    checkpoint anti-join (SURVEY op 44)."""
    def bad_ids(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"__bad": b.filter(
            pc.invert(b.column("ok"))).column(id_col)})

    # bad-id table is bounded (failure rows); the corpus streams
    # through the anti-join
    bad = report_ds.map_batches(bad_ids, batch_format="pyarrow")
    return ds.join(bad, "left_anti", num_partitions=8,
                   on=(id_col,), right_on=("__bad",))
