"""Driver-contract registry invariants (__ray_entry__.py).

Every queries() entry must have an oracle_sql() entry with the same
key (the correctness gate compares them pairwise), no oracle may be
orphaned, and the module must be importable without Ray initialised
(the driver imports it BEFORE/AFTER its own ray.init — library import
must never touch the session).
"""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_under_test", os.path.join(REPO, "__ray_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_every_query_has_an_oracle_and_vice_versa():
    m = _load_entry()
    q = set(m.queries().keys())
    o = set(m.oracle_sql().keys())
    assert o - q == set(), f"orphaned oracles: {sorted(o - q)}"
    assert q - o == set(), f"queries without an oracle: {sorted(q - o)}"
    assert len(q) >= 325  # ratchet: coverage must never shrink


def test_oracle_sql_strings_are_nonempty_select_statements():
    m = _load_entry()
    for k, sql in m.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), k
        head = sql.lstrip().upper()
        assert head.startswith(("SELECT", "WITH")), f"{k}: {head[:40]}"
