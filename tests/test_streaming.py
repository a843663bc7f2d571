"""Watermark-gated streaming windows (stages/streaming.py) against a
scalar stream-replay oracle: events are replayed one at a time in
arrival (seq) order per key, the watermark advances as
max(prior ts) - lateness, and an event whose tumbling window already
closed is dropped late -- the driver-table oracle can't exercise
lateness (its events arrive nearly ordered), so this synthesizes
genuinely out-of-order arrivals."""

import numpy as np
import pyarrow as pa
import pytest

W = 100          # window_us
L = 30           # lateness_us


def replay_oracle(rows):
    """rows: (key, seq, ts, value_cents).  Returns {(key, win_start):
    (n_admitted, n_late, admitted_sum)}."""
    out = {}
    by_key = {}
    for k, s, t, v in sorted(rows, key=lambda r: (r[0], r[1])):
        by_key.setdefault(k, []).append((t, v))
    for k, evs in by_key.items():
        wm = None
        for t, v in evs:
            ws = (t // W) * W
            late = wm is not None and ws + W <= wm
            key = (k, ws)
            na, nl, sv = out.get(key, (0, 0, 0))
            if late:
                out[key] = (na, nl + 1, sv)
            else:
                out[key] = (na + 1, nl, sv + v)
            wm = t - L if wm is None else max(wm, t - L)
    return out


def _run(rows, ray_session):
    import ray
    import ray.data

    from balrog_ray.stages.streaming import watermark_tumbling

    tab = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "tus": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64())})
    ds = ray.data.from_arrow(tab)
    out = watermark_tumbling(ds, key_col="k", ts_col="tus",
                             seq_col="seq", value_col="value",
                             window_us=W, lateness_us=L,
                             num_partitions=4)
    got = {}
    for r in [x for t in ray.get(out.to_arrow_refs())
              for x in t.to_pylist()]:
        got[(r["k"], r["win_start"])] = (r["n_admitted"], r["n_late"],
                                         r["admitted_v_c"])
    return got


def test_late_events_dropped_exactly(ray_session):
    # key 1: an event at t=350 advances the watermark to 320; the
    # arrival at t=90 (window [0,100) closed long ago) must be late;
    # the arrival at t=310 (window [300,400) still open) must admit
    rows = [(1, 0, 10, 100), (1, 1, 350, 200), (1, 2, 90, 400),
            (1, 3, 310, 800)]
    got = _run(rows, ray_session)
    assert got == replay_oracle(rows)
    assert got[(1, 0)] == (1, 1, 100)        # t=90 dropped late
    assert got[(1, 300)] == (2, 0, 1000)     # t=310 admitted


def test_boundary_window_end_equals_watermark(ray_session):
    # watermark exactly AT the window end closes it (<= rule)
    rows = [(2, 0, 230, 10), (2, 1, 95, 20)]
    # wm before seq 1 = 230 - 30 = 200; window of 95 is [0,100),
    # end 100 <= 200 -> late
    got = _run(rows, ray_session)
    assert got == replay_oracle(rows)
    assert got[(2, 0)] == (0, 1, 0)
    rows = [(3, 0, 128, 10), (3, 1, 95, 20)]
    # wm = 98; window end 100 > 98 -> admitted
    got = _run(rows, ray_session)
    assert got == replay_oracle(rows)
    assert got[(3, 0)] == (1, 0, 20)


@pytest.mark.parametrize("seed", [1, 2])
def test_random_streams_match_replay(ray_session, seed):
    rng = np.random.default_rng(seed)
    rows = []
    seqs = {}
    for _ in range(600):
        k = int(rng.integers(0, 12))
        s = seqs.get(k, 0)
        seqs[k] = s + 1
        # heavy-tailed backwards jitter so some windows re-open late
        t = int(rng.integers(0, 2000)) + int(rng.exponential(50))
        rows.append((k, s, t, int(rng.integers(0, 1000))))
    got = _run(rows, ray_session)
    want = replay_oracle(rows)
    assert got == want
    assert sum(v[1] for v in want.values()) > 0   # lateness exercised


def replay_oracle_hopping(rows, window, hop):
    out = {}
    by_key = {}
    for k, s, t, v in sorted(rows, key=lambda r: (r[0], r[1])):
        by_key.setdefault(k, []).append((t, v))
    n_inst = window // hop
    for k, evs in by_key.items():
        wm = None
        for t, v in evs:
            for j in range(n_inst):
                ws = (t // hop - j) * hop
                late = wm is not None and ws + window <= wm
                key = (k, ws)
                na, nl, sv = out.get(key, (0, 0, 0))
                if late:
                    out[key] = (na, nl + 1, sv)
                else:
                    out[key] = (na + 1, nl, sv + v)
            wm = t - L if wm is None else max(wm, t - L)
    return out


def test_hopping_per_pane_admission(ray_session):
    """One arrival late for its OLD pane but admitted to its NEW pane:
    hop=50, window=100 -> the event at t=120 sits in panes [50,150)
    and [100,200); the prior event at t=210 sets wm=180, so pane
    [50,150) (end 150 <= 180) is late while [100,200) (end 200 > 180)
    admits -- the per-pane firing split."""
    import ray
    import ray.data

    from balrog_ray.stages.streaming import watermark_tumbling

    rows = [(5, 0, 210, 100), (5, 1, 120, 700)]
    tab = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "tus": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64())})
    out = watermark_tumbling(
        ray.data.from_arrow(tab), key_col="k", ts_col="tus",
        seq_col="seq", value_col="value", window_us=100,
        lateness_us=L, hop_us=50, num_partitions=2)
    got = {(r["k"], r["win_start"]):
           (r["n_admitted"], r["n_late"], r["admitted_v_c"])
           for t in ray.get(out.to_arrow_refs())
           for r in t.to_pylist()}
    assert got == replay_oracle_hopping(rows, 100, 50)
    assert got[(5, 50)] == (0, 1, 0)      # t=120 late for the old pane
    assert got[(5, 100)] == (1, 0, 700)   # ... admitted to the new one


@pytest.mark.parametrize("seed", [3])
def test_random_hopping_matches_replay(ray_session, seed):
    import ray
    import ray.data

    from balrog_ray.stages.streaming import watermark_tumbling

    rng = np.random.default_rng(seed)
    rows = []
    seqs = {}
    for _ in range(400):
        k = int(rng.integers(0, 8))
        s = seqs.get(k, 0)
        seqs[k] = s + 1
        t = int(rng.integers(0, 1500)) + int(rng.exponential(40))
        rows.append((k, s, t, int(rng.integers(0, 1000))))
    tab = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "tus": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64())})
    out = watermark_tumbling(
        ray.data.from_arrow(tab), key_col="k", ts_col="tus",
        seq_col="seq", value_col="value", window_us=100,
        lateness_us=L, hop_us=25, num_partitions=4)
    got = {(r["k"], r["win_start"]):
           (r["n_admitted"], r["n_late"], r["admitted_v_c"])
           for t in ray.get(out.to_arrow_refs())
           for r in t.to_pylist()}
    want = replay_oracle_hopping(rows, 100, 25)
    assert got == want
    assert sum(v[1] for v in want.values()) > 0


def test_many_segments_one_block_no_overflow(ray_session):
    """Regression: the pre-round-5 banded running max (seg_id << 52)
    wrapped int64 once a single fold block held >= 2048 key segments,
    silently admitting late events.  2500 keys x 3 out-of-order events
    forced into ONE partition must still match the scalar replay."""
    rows = []
    for k in range(2500):
        # arrival order: far-future event first, then a late-for-its-
        # window arrival, then an open-window arrival
        rows.append((k, 0, 900 + k, 10))
        rows.append((k, 1, 90, 40))       # window [0,100) closed: late
        rows.append((k, 2, 890 + k, 80))
    got = _run_np(rows, ray_session, num_partitions=1)
    want = replay_oracle(rows)
    assert got == want
    assert sum(v[1] for v in want.values()) == 2500   # one late per key


def _run_np(rows, ray_session, *, num_partitions):
    import ray
    import ray.data

    from balrog_ray.stages.streaming import watermark_tumbling

    tab = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "tus": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64())})
    out = watermark_tumbling(ray.data.from_arrow(tab), key_col="k",
                             ts_col="tus", seq_col="seq",
                             value_col="value", window_us=W,
                             lateness_us=L,
                             num_partitions=num_partitions)
    return {(r["k"], r["win_start"]):
            (r["n_admitted"], r["n_late"], r["admitted_v_c"])
            for t in ray.get(out.to_arrow_refs())
            for r in t.to_pylist()}


def test_prev_running_max_unit():
    """Direct unit check of the grouped prior-max helper at a segment
    count past the old wrap point, including a huge time span (the old
    band also assumed span < 2^52)."""
    from balrog_ray.stages.streaming import _NO_PRIOR, _prev_running_max

    n_seg, per = 3000, 4
    tus = np.empty(n_seg * per, np.int64)
    rng = np.random.default_rng(7)
    # span ~ 2^60: would have overflowed any banded formulation
    vals = rng.integers(0, 1 << 60, size=n_seg * per)
    tus[:] = vals
    starts = np.arange(0, n_seg * per, per)
    prev, no_prior = _prev_running_max(tus, starts)
    for s in range(0, n_seg * per, per):
        assert no_prior[s] and prev[s] == _NO_PRIOR
        run = _NO_PRIOR
        for i in range(s + 1, s + per):
            run = max(run, tus[i - 1]) if run != _NO_PRIOR else tus[i - 1]
            assert prev[i] == run and not no_prior[i]


def test_watermark_sessions_replay(ray_session):
    """Session windows with event-level watermark drops against a
    scalar replay: late arrivals (ts <= wm) never extend or bridge a
    session; admitted events sessionize by event time."""
    import ray
    import ray.data

    from balrog_ray.stages.streaming import watermark_sessions

    GAP = 100
    rng = np.random.default_rng(9)
    rows = []
    seqs = {}
    for _ in range(500):
        k = int(rng.integers(0, 10))
        s = seqs.get(k, 0)
        seqs[k] = s + 1
        t = int(rng.integers(0, 3000)) + int(rng.exponential(60))
        rows.append((k, s, t, int(rng.integers(0, 1000))))

    # scalar replay oracle
    want = {}
    by_key = {}
    for k, s, t, v in sorted(rows, key=lambda r: (r[0], r[1])):
        by_key.setdefault(k, []).append((t, s, v))
    any_late = False
    for k, evs in by_key.items():
        wm = None
        admitted, n_late = [], 0
        for t, s, v in evs:
            if wm is not None and t <= wm:
                n_late += 1
                any_late = True
            else:
                admitted.append((t, s, v))
            wm = t - L if wm is None else max(wm, t - L)
        admitted.sort()
        sess = []
        for t, s, v in admitted:
            if not sess or t - sess[-1][1] > GAP:
                sess.append([t, t, 1, v])
            else:
                sess[-1][1] = t
                sess[-1][2] += 1
                sess[-1][3] += v
        for st, _, ne, sv in sess:
            want[(k, st)] = (ne, sv, n_late)
    assert any_late

    tab = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "tus": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] / 100.0 for r in rows], pa.float64())})
    out = watermark_sessions(
        ray.data.from_arrow(tab), key_col="k", ts_col="tus",
        seq_col="seq", value_col="value", gap_us=GAP,
        lateness_us=L, num_partitions=4)
    got = {(r["k"], r["session_start"]):
           (r["n_events"], r["session_v_c"], r["n_late_key"])
           for t in ray.get(out.to_arrow_refs())
           for r in t.to_pylist()}
    assert got == want


def test_watermark_stream_join_replay(ray_session):
    """Stream-stream join vs a scalar replay with genuinely
    out-of-order arrivals: late events (either side) never match;
    admitted probes count admitted builds in their trailing window
    regardless of relative arrival order (final-state semantics)."""
    import ray
    import ray.data

    from balrog_ray.stages.streaming import watermark_stream_join

    W, LT = 200, 30
    rng = np.random.default_rng(21)
    rows = []          # (key, seq, ts, side, id, cents)
    seqs = {}
    for i in range(600):
        k = int(rng.integers(0, 9))
        s = seqs.get(k, 0)
        seqs[k] = s + 1
        t = int(rng.integers(0, 2000)) + int(rng.exponential(60))
        rows.append((k, s, t, int(rng.integers(0, 2)), i,
                     int(rng.integers(0, 500))))

    # scalar replay
    want = {}
    by_key = {}
    for k, s, t, side, i, v in sorted(rows):
        by_key.setdefault(k, []).append((s, t, side, i, v))
    any_late = False
    for k, evs in by_key.items():
        wm = None
        adm = []
        for s, t, side, i, v in sorted(evs):
            late = wm is not None and not (t > wm - LT)
            if late:
                any_late = True
            else:
                adm.append((t, side, i, v))
            wm = t if wm is None else max(wm, t)
        builds = [(t, v) for t, side, i, v in adm if side == 1]
        for t, side, i, v in adm:
            if side != 0:
                continue
            ms = [bv for bt, bv in builds if t - W <= bt < t]
            want[i] = (len(ms), sum(ms))
    assert any_late

    tab = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "tus": pa.array([r[2] for r in rows], pa.int64()),
        "side": pa.array([r[3] for r in rows], pa.int64()),
        "id": pa.array([r[4] for r in rows], pa.int64()),
        "value": pa.array([r[5] / 100.0 for r in rows], pa.float64())})
    out = watermark_stream_join(
        ray.data.from_arrow(tab), key_col="k", ts_col="tus",
        seq_col="seq", side_col="side", id_col="id",
        value_col="value", window_us=W, lateness_us=LT,
        num_partitions=4)
    got = {r["id"]: (r["n_matches"], r["matched_v_c"])
           for t in ray.get(out.to_arrow_refs())
           for r in t.to_pylist()}
    assert got == want
