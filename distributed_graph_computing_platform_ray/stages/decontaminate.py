"""Benchmark decontamination over a document corpus.

Flags training documents that share word n-grams with a benchmark /
eval corpus — the standard contamination pass run over web-scale
training data before LLM training (n-gram overlap in the style of the
GPT-3 appendix-C / PaLM 8-gram checks). Shape chosen for 100 TB:

  * the benchmark side is TINY by construction (eval sets are MBs):
    its distinct n-grams are collected once and broadcast via
    ``ray.put``; each actor rehydrates the set once in ``__init__``.
  * the corpus side STREAMS through a single ``map_batches`` — zero
    shuffles, zero materialization; contamination is a per-position
    membership probe (``pandas.Series.isin`` — a C hash lookup per
    gram) followed by a bincount per document.
  * at real scale the broadcast set would hold u64 fingerprints or a
    Bloom filter; exact gram STRINGS are kept here so the SQL oracle
    reproduces membership verbatim with no hash function to mirror.

Tokenization matches the repo's other n-gram ops (whitespace split;
docs with fewer than n tokens produce no positions and are dropped),
so DuckDB's ``regexp_split_to_array(trim(text), '\\s+')`` reproduces
it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def benchmark_ngrams(texts, n: int) -> frozenset:
    """Distinct word n-grams of the (small) benchmark corpus."""
    out: set[str] = set()
    for text in texts:
        ts = str(text).split()
        out.update(" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1))
    return frozenset(out)


def decontaminate(
    ds: rd.Dataset,
    bench: frozenset,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Per-document contamination stats vs a broadcast benchmark set.

    Returns (id_col, n_grams, n_hits): total word-n-gram positions and
    how many of them hit the benchmark set. Documents with fewer than
    n tokens yield no positions and are dropped (mirrors the oracle's
    ``len(ts) >= n`` gram filter). No shuffle — one streaming pass.
    """
    ref = ray.put(bench)

    class Contam:
        def __init__(self):
            self.bench = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            grams: list[str] = []
            counts = np.zeros(len(df), dtype=np.int64)
            for i, text in enumerate(df[text_col].astype(str)):
                ts = text.split()
                m = len(ts) - n + 1
                if m <= 0:
                    continue
                grams.extend(" ".join(ts[j : j + n]) for j in range(m))
                counts[i] = m
            idx = np.repeat(np.arange(len(df)), counts)
            hit = pd.Series(grams, dtype=object).isin(self.bench).to_numpy()
            keep = counts > 0
            return pd.DataFrame(
                {
                    id_col: df[id_col].to_numpy()[keep],
                    "n_grams": counts[keep],
                    "n_hits": np.bincount(idx, weights=hit, minlength=len(df))
                    .astype(np.int64)[keep],
                }
            )

    _ckey = ("contam", ref.hex())

    def contam_batch(df: pd.DataFrame) -> pd.DataFrame:
        from .taskify import worker_cached

        return worker_cached(_ckey, Contam)(df)

    return ds.map_batches(contam_batch, batch_format="pandas")
