"""Distributed NMS vs a scalar greedy oracle, plus IoU kernel cases."""

import numpy as np
import pyarrow as pa

from balrog_ray.functions.boxes import greedy_nms_indices, iou_matrix, nms
from balrog_ray.tiles.synth import SynthConfig, boxes_table


def _oracle_nms(rows, iou_thr, class_aware=True):
    """Scalar greedy NMS over one image's [(box_id, cls, score, box)]."""
    def iou(a, b):
        iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = iw * ih
        ua = (max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
              + max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    kept = []
    pool = sorted(rows, key=lambda r: (-r[2], r[0]))
    while pool:
        best = pool.pop(0)
        kept.append(best[0])
        pool = [r for r in pool
                if (class_aware and r[1] != best[1])
                or iou(r[3], best[3]) <= iou_thr]
    return sorted(kept)


def test_iou_matrix_cases():
    a = np.array([[0, 0, 2, 2], [0, 0, 0, 0], [5, 5, 6, 6]], float)
    m = iou_matrix(a, a)
    assert m[0, 0] == 1.0
    assert m[1, 1] == 0.0          # degenerate box: IoU 0 even vs itself
    assert m[0, 2] == 0.0          # disjoint
    b = np.array([[1, 1, 3, 3]], float)
    assert np.isclose(iou_matrix(a[:1], b)[0, 0], 1.0 / 7.0)


def test_greedy_tie_break():
    boxes = np.array([[0, 0, 2, 2], [0.1, 0, 2.1, 2]], float)
    scores = np.array([0.5, 0.5])
    ids = np.array([7, 3])
    keep = greedy_nms_indices(boxes, scores, ids, 0.5)
    assert list(keep) == [1]       # lower box_id wins the tie


def test_nms_matches_oracle(ray_session):
    import ray.data

    cfg = SynthConfig(tiles_x=3, tiles_y=3, tile_px=32)
    tab = boxes_table(cfg)
    got = nms(ray.data.from_arrow(tab), iou_thr=0.45).take_all()
    by_img: dict[str, list[int]] = {}
    for r in got:
        by_img.setdefault(r["image_id"], []).append(r["box_id"])

    rows_by_img: dict[str, list] = {}
    for i in range(tab.num_rows):
        r = {c: tab.column(c)[i].as_py() for c in tab.schema.names}
        rows_by_img.setdefault(r["image_id"], []).append(
            (r["box_id"], r["cls"], r["score"],
             (r["x0"], r["y0"], r["x1"], r["y1"])))
    assert set(by_img) == set(rows_by_img)
    suppressed_any = False
    for img, rows in rows_by_img.items():
        want = _oracle_nms(rows, 0.45)
        assert sorted(by_img[img]) == want, img
        suppressed_any |= len(want) < len(rows)
    assert suppressed_any             # the synth overlaps enough to cut

    # class-agnostic mode suppresses at least as much
    ag = nms(ray.data.from_arrow(tab), iou_thr=0.45,
             class_col=None).take_all()
    assert len(ag) <= len(got)
    for img, rows in rows_by_img.items():
        want = _oracle_nms(rows, 0.45, class_aware=False)
        have = sorted(r["box_id"] for r in ag if r["image_id"] == img)
        assert have == want, img
