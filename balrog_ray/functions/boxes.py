"""Detection-box operations for vision training-data pipelines:
class-aware non-maximum suppression over a distributed box table (the
pseudo-label / weak-label filtering pass that precedes training on
model-generated boxes), and pairwise IoU as the shared kernel.

Scale shape: ONE ``groupby(image_id)`` shuffle -- box rows are a few
dozen bytes, detections per image are bounded (hundreds), so each
group's greedy scan is tiny and the fleet parallelizes across images.
The IoU matrix per (image, class) is vectorized numpy; the only Python
loop is the inherently sequential greedy pick, O(#survivors) steps per
group on class-filtered candidates.

Determinism: ties in score break on the lower ``box_id``, so output is
reproducible under any block order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BOX_COLS = ["x0", "y0", "x1", "y1"]


def iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n,4) x (m,4) [x0,y0,x1,y1] -> (n,m) IoU; degenerate boxes give
    zero area, IoU 0 against everything (0/0 -> 0)."""
    ax0, ay0, ax1, ay1 = (a[:, i][:, None] for i in range(4))
    bx0, by0, bx1, by1 = (b[:, i][None, :] for i in range(4))
    iw = np.maximum(0.0, np.minimum(ax1, bx1) - np.maximum(ax0, bx0))
    ih = np.maximum(0.0, np.minimum(ay1, by1) - np.maximum(ay0, by0))
    inter = iw * ih
    area_a = np.maximum(0.0, ax1 - ax0) * np.maximum(0.0, ay1 - ay0)
    area_b = np.maximum(0.0, bx1 - bx0) * np.maximum(0.0, by1 - by0)
    union = area_a + area_b - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.where(union > 0.0, inter / union, 0.0)
    return out


def greedy_nms_indices(boxes: np.ndarray, scores: np.ndarray,
                       box_ids: np.ndarray, iou_thr: float) -> np.ndarray:
    """Indices (into the input arrays) of surviving boxes, greedy
    highest-score-first, suppressing IoU > iou_thr."""
    order = np.lexsort((box_ids, -scores))
    iou = iou_matrix(boxes[order], boxes[order])
    alive = np.ones(len(order), bool)
    keep = []
    for i in range(len(order)):
        if not alive[i]:
            continue
        keep.append(order[i])
        alive &= iou[i] <= iou_thr
        alive[i] = False
    return np.asarray(keep, np.int64)


def nms(boxes_ds, *, iou_thr: float = 0.5, image_col: str = "image_id",
        class_col: str | None = "cls", score_col: str = "score",
        id_col: str = "box_id"):
    """Distributed class-aware NMS: keeps each image's surviving boxes
    (all input columns preserved).  ``class_col=None`` suppresses
    across classes (class-agnostic)."""

    def per_image(group: pa.Table) -> pa.Table:
        boxes = np.stack([group.column(c).to_numpy()
                          for c in BOX_COLS], axis=1).astype(np.float64)
        scores = group.column(score_col).to_numpy().astype(np.float64)
        ids = group.column(id_col).to_numpy()
        if class_col is None:
            keep = greedy_nms_indices(boxes, scores, ids, iou_thr)
        else:
            cls = group.column(class_col).to_numpy()
            keep_parts = []
            for c in np.unique(cls):
                sel = np.flatnonzero(cls == c)
                k = greedy_nms_indices(boxes[sel], scores[sel],
                                       ids[sel], iou_thr)
                keep_parts.append(sel[k])
            keep = (np.concatenate(keep_parts) if keep_parts
                    else np.array([], np.int64))
        keep.sort()
        return group.take(pa.array(keep, pa.int64()))

    return (boxes_ds.groupby(image_col)
            .map_groups(per_image, batch_format="pyarrow"))


_MATCH_SCHEMA = pa.schema([
    ("image_id", pa.string()), ("side", pa.int8()),
    ("box_id", pa.int64()), ("cls", pa.int32()),
    ("score", pa.float64()),
    ("x0", pa.float64()), ("y0", pa.float64()),
    ("x1", pa.float64()), ("y1", pa.float64())])


def greedy_match_indices(pred_boxes, pred_scores, pred_ids,
                         truth_boxes, truth_ids, iou_thr: float):
    """COCO-style single-threshold assignment: preds in score order
    (ties: lower box_id) each claim the unmatched truth with highest
    IoU >= iou_thr (ties: lower truth box_id).  Returns (matched truth
    index or -1, iou) arrays aligned to the input pred order."""
    m = np.full(len(pred_ids), -1, np.int64)
    mi = np.zeros(len(pred_ids), np.float64)
    if len(truth_ids) == 0 or len(pred_ids) == 0:
        return m, mi
    order = np.lexsort((pred_ids, -pred_scores))
    iou = iou_matrix(pred_boxes, truth_boxes)
    t_order = np.argsort(truth_ids)            # tie-break: lower id
    taken = np.zeros(len(truth_ids), bool)
    for i in order:
        row = iou[i][t_order]
        row = np.where(taken[t_order], -1.0, row)
        j = int(np.argmax(row))                # first max = lowest id
        if row[j] >= iou_thr and row[j] > 0.0:
            m[i] = t_order[j]
            mi[i] = row[j]
            taken[t_order[j]] = True
    return m, mi


def match_boxes(pred_ds, truth_ds, *, iou_thr: float = 0.5,
                image_col: str = "image_id", class_col: str = "cls",
                score_col: str = "score", id_col: str = "box_id"):
    """Distributed pred-vs-truth box matching: per-pred rows
    ``(image_id, box_id, cls, score, matched_id, iou, tp)`` where
    ``matched_id`` is the claimed truth box (or -1 / FP), plus
    unclaimed truths as ``tp = false`` rows with ``box_id = -1`` and
    ``matched_id`` the missed truth id (FN accounting) -- precision /
    recall are one aggregate away.  One groupby(image) shuffle over a
    tagged union, same plan shape as nms()."""

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table({
                "image_id": b.column(image_col),
                "side": pa.array(np.full(n, side, np.int8)),
                "box_id": b.column(id_col).cast(pa.int64()),
                "cls": b.column(class_col).cast(pa.int32()),
                "score": (b.column(score_col).cast(pa.float64())
                          if side == 0 else
                          pa.array(np.zeros(n), pa.float64())),
                "x0": b.column("x0").cast(pa.float64()),
                "y0": b.column("y0").cast(pa.float64()),
                "x1": b.column("x1").cast(pa.float64()),
                "y1": b.column("y1").cast(pa.float64())},
                schema=_MATCH_SCHEMA)
        return fn

    def per_image(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy()
        cls = group.column("cls").to_numpy()
        boxes = np.stack([group.column(c).to_numpy()
                          for c in BOX_COLS], axis=1).astype(np.float64)
        ids = group.column("box_id").to_numpy()
        scores = group.column("score").to_numpy()
        img = group.column("image_id")[0].as_py()
        out = {"image_id": [], "box_id": [], "cls": [], "score": [],
               "matched_id": [], "iou": [], "tp": []}
        for c in np.unique(cls):
            p = np.flatnonzero((side == 0) & (cls == c))
            t = np.flatnonzero((side == 1) & (cls == c))
            m, mi = greedy_match_indices(
                boxes[p], scores[p], ids[p], boxes[t], ids[t], iou_thr)
            claimed = set()
            for k in range(len(p)):
                tid = int(ids[t[m[k]]]) if m[k] >= 0 else -1
                if tid >= 0:
                    claimed.add(tid)
                out["image_id"].append(img)
                out["box_id"].append(int(ids[p[k]]))
                out["cls"].append(int(c))
                out["score"].append(float(scores[p[k]]))
                out["matched_id"].append(tid)
                out["iou"].append(float(mi[k]))
                out["tp"].append(tid >= 0)
            for j in t:                        # unclaimed truths: FN rows
                if int(ids[j]) not in claimed:
                    out["image_id"].append(img)
                    out["box_id"].append(-1)
                    out["cls"].append(int(c))
                    out["score"].append(0.0)
                    out["matched_id"].append(int(ids[j]))
                    out["iou"].append(0.0)
                    out["tp"].append(False)
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "box_id": pa.array(out["box_id"], pa.int64()),
            "cls": pa.array(out["cls"], pa.int32()),
            "score": pa.array(out["score"], pa.float64()),
            "matched_id": pa.array(out["matched_id"], pa.int64()),
            "iou": pa.array(out["iou"], pa.float64()),
            "tp": pa.array(out["tp"], pa.bool_())})

    both = (pred_ds.map_batches(tag(0), batch_format="pyarrow")
            .union(truth_ds.map_batches(tag(1), batch_format="pyarrow")))
    return (both.groupby("image_id")
            .map_groups(per_image, batch_format="pyarrow"))
