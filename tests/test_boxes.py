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


def _oracle_match(preds, truths, iou_thr):
    """Scalar greedy COCO assignment for one (image, class) pool:
    preds [(id, score, box)], truths [(id, box)]."""
    def iou(a, b):
        iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = iw * ih
        ua = (max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
              + max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    taken, out = set(), {}
    for pid, score, pb in sorted(preds, key=lambda r: (-r[1], r[0])):
        best, best_iou = -1, 0.0
        for tid, tb in sorted(truths, key=lambda r: r[0]):
            if tid in taken:
                continue
            v = iou(pb, tb)
            if v >= iou_thr and v > best_iou:
                best, best_iou = tid, v
        if best >= 0:
            taken.add(best)
        out[pid] = (best, best_iou)
    return out, taken


def test_match_boxes_oracle(ray_session):
    import ray.data

    from balrog_ray.functions.boxes import match_boxes

    cfg = SynthConfig(tiles_x=2, tiles_y=2, tile_px=32)
    truth = boxes_table(cfg, per_image=8)
    rng = np.random.default_rng(11)

    # preds: jittered copies of most truths + pure false positives
    cols = {c: truth.column(c).to_pylist() for c in truth.schema.names}
    p = {k: [] for k in cols}
    bid = 10_000
    for i in range(truth.num_rows):
        if i % 5 == 4:
            continue                       # dropped truth -> FN
        for c in truth.schema.names:
            p[c].append(cols[c][i])
        p["box_id"][-1] = bid
        p["score"][-1] = round(float(rng.uniform(0.2, 0.99)), 2)
        for c in ("x0", "y0", "x1", "y1"):
            p[c][-1] = p[c][-1] + float(rng.normal(0, 0.6))
        bid += 1
    for img in sorted(set(cols["image_id"])):  # 2 FPs per image
        for _ in range(2):
            x, y = rng.uniform(0, 20, 2)
            p["image_id"].append(img)
            p["box_id"].append(bid)
            p["cls"].append(0)
            p["score"].append(0.9)
            p["x0"].append(x + 100.0)
            p["y0"].append(y + 100.0)
            p["x1"].append(x + 104.0)
            p["y1"].append(y + 104.0)
            bid += 1
    pred = pa.table({k: pa.array(v, truth.schema.field(k).type
                                 if k in truth.schema.names else None)
                     for k, v in p.items()})

    got = match_boxes(ray.data.from_arrow(pred),
                      ray.data.from_arrow(truth),
                      iou_thr=0.3).take_all()

    # oracle per (image, cls)
    want_match, want_fn = {}, set()
    keys = {(r, c) for r, c in zip(cols["image_id"], cols["cls"])} | \
           {(r, c) for r, c in zip(p["image_id"], p["cls"])}
    for img, c in keys:
        preds = [(p["box_id"][i], p["score"][i],
                  (p["x0"][i], p["y0"][i], p["x1"][i], p["y1"][i]))
                 for i in range(len(p["box_id"]))
                 if p["image_id"][i] == img and p["cls"][i] == c]
        truths = [(cols["box_id"][i],
                   (cols["x0"][i], cols["y0"][i], cols["x1"][i],
                    cols["y1"][i]))
                  for i in range(truth.num_rows)
                  if cols["image_id"][i] == img and cols["cls"][i] == c]
        m, taken = _oracle_match(preds, truths, 0.3)
        want_match.update(m)
        want_fn |= {tid for tid, _ in truths} - taken

    pred_rows = {r["box_id"]: r for r in got if r["box_id"] >= 0}
    fn_rows = {r["matched_id"] for r in got if r["box_id"] == -1}
    assert set(pred_rows) == set(want_match)
    for pid, (tid, v) in want_match.items():
        r = pred_rows[pid]
        assert r["matched_id"] == tid and r["tp"] == (tid >= 0), pid
        assert np.isclose(r["iou"], v)
    assert fn_rows == want_fn
    assert any(not r["tp"] for r in got)      # FPs and FNs both exist
    assert any(r["tp"] for r in got)
