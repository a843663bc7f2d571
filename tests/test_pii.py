"""redact_pii edge cases: multiple matches, adjacency, pattern order
(emails must vanish before the IP rule sees their digit runs), and the
no-match identity path."""

import pyarrow as pa

from balrog_ray.functions.pii import redact_batch, redact_pii


def test_redact_batch_cases():
    txt = pa.array([
        "mail a.b+c%d@x-y.co.uk and 192.168.0.1 then +61-555-0042",
        "two mails p@q.io r@s.ai, ip 1.2.3.4 5.6.7.8",
        "no pii here at all",
        "",
        "version 1.2.3 stays, 1.2.3.4.5 clips to the first quad",
    ], pa.string())
    clean, counts = redact_batch(txt)
    got = clean.to_pylist()
    assert got[0] == "mail <EMAIL> and <IP> then <PHONE>"
    assert got[1] == "two mails <EMAIL> <EMAIL>, ip <IP> <IP>"
    assert got[2] == "no pii here at all"
    assert got[3] == ""
    # 1.2.3 (three octets) never matches; 1.2.3.4.5: RE2 leftmost match
    # takes 1.2.3.4, the trailing .5 survives
    assert got[4] == "version 1.2.3 stays, <IP>.5 clips to the first quad"
    assert counts["n_email"].to_pylist() == [1, 2, 0, 0, 0]
    assert counts["n_ip"].to_pylist() == [1, 2, 0, 0, 1]
    assert counts["n_phone"].to_pylist() == [1, 0, 0, 0, 0]


def test_redact_pii_dataset(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x@y.org at 10.0.0.1", "clean"], pa.string())}))
    rows = sorted(redact_pii(ds).take_all(), key=lambda r: r["doc_id"])
    assert rows[0]["clean"] == "<EMAIL> at <IP>"
    assert (rows[0]["n_email"], rows[0]["n_ip"]) == (1, 1)
    assert rows[1]["clean"] == "clean"
    assert set(rows[0]) == {"doc_id", "n_email", "n_ip", "n_phone",
                            "clean"}
