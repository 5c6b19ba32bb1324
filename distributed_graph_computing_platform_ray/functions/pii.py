"""PII detection / redaction over a text column.

Training-data pipelines scrub personal identifiers before anything
else sees the text. This stage counts and redacts emails, phone
numbers, and IPv4 addresses with RE2-compatible patterns (no
backrefs / lookarounds), so the exact same regexes run in DuckDB for
the oracle. Redaction is sequential (email -> phone -> ip) and the
scrubbed text is certified by a sha256 hex digest, making the whole
transform hash-checkable end-to-end.

Scale design: pure per-row map (no shuffle); patterns compile once
per process (module level), counting/replacing is pandas .str vector
ops; sha256 is per-row C-speed hashing.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd

# RE2-compatible (also valid Python re): keep in sync with the SQL in
# __ray_entry__.oracle_sql()["doc_pii_scrub"].
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

_EMAIL = re.compile(EMAIL_RE)
_PHONE = re.compile(PHONE_RE)
_IPV4 = re.compile(IPV4_RE)


def scrub_frame(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """-> (doc_id, n_emails, n_phones, n_ips, digest) per row."""
    s = df[text_col].astype(str)
    n_emails = s.str.count(EMAIL_RE).astype("int64")
    n_phones = s.str.count(PHONE_RE).astype("int64")
    n_ips = s.str.count(IPV4_RE).astype("int64")
    red = (
        s.str.replace(EMAIL_RE, "<EMAIL>", regex=True)
        .str.replace(PHONE_RE, "<PHONE>", regex=True)
        .str.replace(IPV4_RE, "<IP>", regex=True)
    )
    digest = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in red]
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
            "digest": digest,
        }
    )
