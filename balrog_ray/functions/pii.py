"""PII detection + redaction -- the scrubbing pass every training-data
pipeline runs before anything else sees the text (emails, phone
numbers, IP addresses replaced by typed placeholder tokens, with
per-document match counts kept for filtering/audit).

Scale shape: stateless ``map_batches`` -- each pattern is ONE
vectorized RE2 count + ONE vectorized RE2 replace over the whole Arrow
string column (``pyarrow.compute.count_substring_regex`` /
``replace_substring_regex``); no per-row Python, no shuffle, no state.
Patterns apply in list order, so earlier replacements cannot re-match
later ones (placeholder tokens contain no pattern-matchable chars).

RE2 everywhere: pyarrow's regex kernels and DuckDB's regexp functions
are both RE2, so the oracle SQL runs the LITERAL same patterns --
byte-identical redaction on both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (count column, RE2 pattern, placeholder).  Order matters: emails
# first (their local/domain parts would otherwise feed the IP rule's
# digit runs), then IPs, then phones.
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("n_email",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_ip",
     r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("n_phone",
     r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
]


def redact_batch(txt: pa.ChunkedArray | pa.Array, patterns=None):
    """One Arrow string column -> (clean column, {count col: int64
    array}).  Non-overlapping RE2 matches, applied in pattern order."""
    patterns = DEFAULT_PATTERNS if patterns is None else patterns
    counts = {}
    for name, pat, tok in patterns:
        counts[name] = pc.count_substring_regex(txt, pat).cast(pa.int64())
        txt = pc.replace_substring_regex(txt, pat, replacement=tok)
    return txt, counts


def redact_pii(ds, *, text_col: str = "text", keep_cols=("doc_id",),
               clean_col: str = "clean", patterns=None):
    """Dataset pass: ``keep_cols`` + per-pattern match counts + the
    redacted text.  Row count conserved."""

    def scrub(b: pa.Table) -> pa.Table:
        clean, counts = redact_batch(b.column(text_col), patterns)
        cols = {c: b.column(c) for c in keep_cols}
        for name, arr in counts.items():
            cols[name] = arr
        cols[clean_col] = clean
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")
