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
