"""FastSS distance-1 similarity join vs a brute-force DP oracle."""

import numpy as np
import pandas as pd
import ray.data as rd

from distributed_graph_computing_platform_ray.stages.fuzzy import fuzzy_pairs_d1


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_bruteforce(ray_session):
    # substitutions, insertions, deletions, distance-2 traps (shared
    # deletion key but lev=2), duplicates collapsing, short strings
    vals = [
        "widget", "widges", "widgets", "widet", "xwidget",
        "bolt", "boot", "bool", "bolts", "b", "bo", "widget",
        "gear 7", "gear 17", "gear 77", "gasr 7", "pump", "dump", "jump",
    ]
    ds = rd.from_pandas(pd.DataFrame({"s": vals}))
    got = fuzzy_pairs_d1(ds, "s").to_pandas()
    got_set = set(zip(got["a"], got["b"]))
    uniq = sorted(set(vals))
    exp_set = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) == 1
    }
    assert got_set == exp_set
    assert len(got) == len(got_set)  # no duplicate pair rows
