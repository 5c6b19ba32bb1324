"""Fuzzy string similarity self-join (edit distance <= 1).

FastSS / 1-deletion-neighborhood blocking (Bocek et al. 2007): two
strings are at Levenshtein distance <= 1 **iff** they share a key in
{s} ∪ {s minus one character}. The blocking is therefore EXACT (no
recall loss), the key expansion is linear in total characters, and
candidate groups are bounded by how many strings map to one variant —
the same shape as MinHash-band buckets in stages/dedup.py.

Pipeline: distinct strings -> vectorized per-length deletion-variant
expansion -> hash-bucketed self-join on the variant key -> global pair
distinct -> vectorized distance-1 verify (mismatch count for equal
lengths; first-mismatch + shifted-suffix compare for length diff 1).
No reference counterpart (the reference engine has no string ops);
included as a training-data-cleaning operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .join import _BUCKET, add_bucket, distinct


def _char_matrix(strings: np.ndarray, length: int) -> np.ndarray:
    """(n, length) uint8 matrix from equal-length ASCII strings."""
    joined = "".join(strings.tolist())
    return np.frombuffer(joined.encode("utf-8"), dtype=np.uint8).reshape(
        -1, length
    )


def _deletion_keys(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """(key, s) rows: identity + every 1-deletion variant of s.

    Vectorized per (length, deleted-position): one slice-concat per
    pair instead of a per-row Python loop.
    """
    s = df[col].astype(str).to_numpy()
    lens = np.char.str_len(s.astype(str))
    keys: list[np.ndarray] = [s]
    orig: list[np.ndarray] = [s]
    for ln in np.unique(lens):
        grp = s[lens == ln]
        if ln < 1:
            continue
        if ln == 1:
            # the 1-deletion variant of a single char is the EMPTY string
            # — without it 'a'/'b' never share a key and the distance-1
            # substitution pair is lost (caught by a hypothesis property)
            keys.append(np.full(len(grp), "", dtype=object))
            orig.append(grp)
            continue
        mat = _char_matrix(grp, int(ln))
        for i in range(int(ln)):
            cut = np.concatenate([mat[:, :i], mat[:, i + 1 :]], axis=1)
            step = int(ln) - 1
            keys.append(
                np.frombuffer(cut.tobytes(), dtype=f"S{step}").astype(str)
            )
            orig.append(grp)
    return pd.DataFrame(
        {"key": np.concatenate(keys), "s": np.concatenate(orig)}
    )


def _pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
    m = g.merge(g, on="key")
    m = m[m["s_x"] < m["s_y"]]
    return m[["s_x", "s_y"]].drop_duplicates().rename(
        columns={"s_x": "a", "s_y": "b"}
    )


def _verify_d1(df: pd.DataFrame) -> pd.DataFrame:
    """Keep exactly the pairs at Levenshtein distance 1 (candidates
    sharing a deletion key can be at distance 2)."""
    if not len(df):
        return pd.DataFrame({"a": [], "b": []}).astype(str)
    a = df["a"].astype(str).to_numpy()
    b = df["b"].astype(str).to_numpy()
    la = np.char.str_len(a.astype(str))
    lb = np.char.str_len(b.astype(str))
    keep = np.zeros(len(df), dtype=bool)
    # equal length: distance 1 == exactly one substitution
    for ln in np.unique(la[la == lb]):
        m = (la == ln) & (lb == ln)
        if ln == 0 or not m.any():
            continue
        am, bm = _char_matrix(a[m], int(ln)), _char_matrix(b[m], int(ln))
        keep[np.flatnonzero(m)[(am != bm).sum(axis=1) == 1]] = True
    # length diff 1: distance 1 == one deletion from the longer side
    diff = np.abs(la - lb) == 1
    lo = np.where(la < lb, a, b)
    hi = np.where(la < lb, b, a)
    lhi = np.maximum(la, lb)
    for ln in np.unique(lhi[diff]):
        m = diff & (lhi == ln)
        if not m.any():
            continue
        if ln == 1:  # ('', 'x'): one insertion — always distance 1
            keep[np.flatnonzero(m)] = True
            continue
        hm = _char_matrix(hi[m], int(ln))
        lm = _char_matrix(lo[m], int(ln) - 1)
        eq = hm[:, : ln - 1] == lm
        p = np.where(eq.all(axis=1), ln - 1, eq.argmin(axis=1))
        idx = np.arange(ln - 1)[None, :]
        ok = ((hm[:, 1:] == lm) | (idx < p[:, None])).all(axis=1)
        keep[np.flatnonzero(m)[ok]] = True
    return df[["a", "b"]][keep]


def fuzzy_pairs_d1(
    ds: rd.Dataset, col: str, n_buckets: int = 64
) -> rd.Dataset:
    """All unordered pairs of DISTINCT values of ``col`` at Levenshtein
    distance exactly 1. One shuffle on the deletion-variant key, one on
    the pair set; verify is a stateless vectorized map."""
    uniq = distinct(ds, [col]).map_batches(
        lambda df: _deletion_keys(df, col), batch_format="pandas"
    )
    from .join import bucket_map_groups

    cand = bucket_map_groups(
        add_bucket(uniq, ["key"], n_buckets), n_buckets, _pairs_in_bucket
    )
    return distinct(cand, ["a", "b"]).map_batches(
        _verify_d1, batch_format="pandas"
    )
