"""STR-packed R-tree over bounding boxes (NumPy, no GEOS).

This is the stateful index held by spatial-join actor pools -- the role the
reference fills with a PostGIS GiST index / fiona's spatial filter
(``xx_fiona_testing.py:153-156``).  Sort-Tile-Recursive packing gives a
static, build-once tree which is exactly the actor-``__init__`` pattern:
build once per actor, query per batch.
"""

from __future__ import annotations

import heapq

import numpy as np


class STRtree:
    def __init__(self, boxes: np.ndarray, node_capacity: int = 16):
        """``boxes``: (N, 4) array of (xmin, ymin, xmax, ymax)."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.n = len(boxes)
        self.boxes = boxes
        if self.n == 0:
            self.order = np.empty(0, dtype=np.int64)
            self.levels = []
            return
        cap = node_capacity
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        # STR packing: sort by cx, cut into vertical slices, sort each by cy
        n_leaves = int(np.ceil(self.n / cap))
        n_slices = int(np.ceil(np.sqrt(n_leaves)))
        slice_size = n_slices * cap
        order = np.argsort(cx, kind="stable")
        for s in range(0, self.n, slice_size):
            part = order[s:s + slice_size]
            order[s:s + slice_size] = part[np.argsort(cy[part], kind="stable")]
        self.order = order

        # build levels bottom-up: each level is (boxes, child_start) where
        # node i covers children [i*cap, (i+1)*cap) of the level below
        self.levels = []
        cur = boxes[order]
        while len(cur) > 1:
            m = int(np.ceil(len(cur) / cap))
            pad = m * cap - len(cur)
            padded = np.vstack([cur, np.tile([np.inf, np.inf, -np.inf,
                                              -np.inf], (pad, 1))])
            grouped = padded.reshape(m, cap, 4)
            parents = np.column_stack([grouped[:, :, 0].min(axis=1),
                                       grouped[:, :, 1].min(axis=1),
                                       grouped[:, :, 2].max(axis=1),
                                       grouped[:, :, 3].max(axis=1)])
            self.levels.append(cur)
            cur = parents
        self.levels.append(cur)          # root level (length 1)
        self.cap = cap

    def query(self, box) -> np.ndarray:
        """Indices of input boxes intersecting ``box`` (xmin,ymin,xmax,ymax)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64)
        qx0, qy0, qx1, qy1 = box
        nodes = np.array([0], dtype=np.int64)
        for level in range(len(self.levels) - 1, -1, -1):
            lb = self.levels[level]
            b = lb[nodes]
            hit = ((b[:, 0] <= qx1) & (b[:, 2] >= qx0)
                   & (b[:, 1] <= qy1) & (b[:, 3] >= qy0))
            nodes = nodes[hit]
            if level == 0 or len(nodes) == 0:
                break
            children = (nodes[:, None] * self.cap
                        + np.arange(self.cap)[None, :]).reshape(-1)
            nodes = children[children < len(self.levels[level - 1])]
        return self.order[nodes]

    def query_many(self, qboxes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batch query: all (query, box) intersections for (Q, 4) query
        boxes, descending every tree level for ALL live (query, node)
        frontier pairs at once -- no per-query Python loop.  Returns
        parallel arrays (query_index, input_box_index)."""
        qboxes = np.asarray(qboxes, dtype=np.float64).reshape(-1, 4)
        nq = len(qboxes)
        if self.n == 0 or nq == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        qi = np.arange(nq, dtype=np.int64)
        nodes = np.zeros(nq, dtype=np.int64)
        for level in range(len(self.levels) - 1, -1, -1):
            b = self.levels[level][nodes]
            qb = qboxes[qi]
            hit = ((b[:, 0] <= qb[:, 2]) & (b[:, 2] >= qb[:, 0])
                   & (b[:, 1] <= qb[:, 3]) & (b[:, 3] >= qb[:, 1]))
            qi, nodes = qi[hit], nodes[hit]
            if level == 0 or len(nodes) == 0:
                break
            children = (nodes[:, None] * self.cap
                        + np.arange(self.cap)[None, :]).reshape(-1)
            qi = np.repeat(qi, self.cap)
            keep = children < len(self.levels[level - 1])
            qi, nodes = qi[keep], children[keep]
        return qi, self.order[nodes]

    def query_point(self, x: float, y: float) -> np.ndarray:
        return self.query((x, y, x, y))

    def nearest(self, x: float, y: float, k: int = 1,
                max_dist: float = np.inf):
        """k nearest boxes by bbox distance (best-first search).  Returns
        (indices, bbox_distances); callers refine with exact geometry."""
        if self.n == 0:
            return (np.empty(0, dtype=np.int64), np.empty(0))
        root_level = len(self.levels) - 1
        heap = [(0.0, root_level, 0)]
        found_idx, found_d = [], []
        while heap and len(found_idx) < k:
            d, level, node = heapq.heappop(heap)
            if d > max_dist:
                break
            if level == 0:
                found_idx.append(self.order[node])
                found_d.append(d)
                continue
            start = node * self.cap
            child_level = self.levels[level - 1]
            end = min(start + self.cap, len(child_level))
            for c in range(start, end):
                heapq.heappush(
                    heap, (_box_dist(child_level[c], x, y), level - 1, c))
        return (np.asarray(found_idx, dtype=np.int64), np.asarray(found_d))


def _box_dist(box, x, y) -> float:
    dx = max(box[0] - x, 0.0, x - box[2])
    dy = max(box[1] - y, 0.0, y - box[3])
    return float(np.hypot(dx, dy))
