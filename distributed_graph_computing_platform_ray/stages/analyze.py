"""Fused page-analysis stage: the flagship training-data pipeline.

One actor-pool pass over pages computing everything a pretraining
data pipeline wants per document:

  extracted text (byte-identical invariant), outgoing link count,
  language id, quality score, whitespace + BPE-ish token counts,
  MinHash band hashes (near-dup LSH keys), 64-bit SimHash.

Fusing these into ONE stage means the html bytes are decoded once and
never leave the worker — at 100 TB the html column is the dominant
IO, so every independent pass over it is a full re-read. This stage
is the unit the scaling benchmark times (CPU-bound per-doc work —
the part of the pipeline that actually buys more from 4x nodes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions import html as H
from ..functions.hashing import band_hashes, minhash_params, minhash_signature, simhash64
from ..functions.text import (
    lang_id_counts_lwords,
    quality_score_words,
    shingle_hashes_lwords,
    token_count_bpe_ish,
)
from ..utils import stable_hash_array
from .extract import _pool_size


class PageAnalyze:
    def __init__(self, n_perm: int = 128, n_bands: int = 16, shingle_k: int = 3):
        self.a, self.b = minhash_params(n_perm)
        self.n_bands = n_bands
        self.k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        htmls = t["html"].to_pylist()
        n = len(urls)
        out = {
            "url": urls,
            "n_links": np.zeros(n, dtype=np.int64),
            "lang_pred": [""] * n,
            "quality_e6": np.zeros(n, dtype=np.int64),
            "n_tokens": np.zeros(n, dtype=np.int64),
            "n_bpe_tokens": np.zeros(n, dtype=np.int64),
            "simhash": np.zeros(n, dtype=np.int64),
            "band_hashes": [None] * n,
        }
        for i in range(n):
            html = H.decode_html(htmls[i])
            text = H.extract_text(html)
            links = H.extract_links(html, urls[i])
            # split/lowercase ONCE per doc and feed every consumer the
            # precomputed lists: identical outputs (conformance-tested),
            # ~5x fewer token-list allocations — allocation/store
            # bandwidth is what limits per-core throughput at high
            # concurrency on one socket (BASELINE.md scaling analysis)
            words = text.split()
            lwords = [w.lower() for w in words]
            out["n_links"][i] = len(links)
            out["lang_pred"][i] = lang_id_counts_lwords(lwords)[0]
            out["quality_e6"][i] = int(quality_score_words(text, words, lwords) * 1e6)
            out["n_tokens"][i] = len(words)
            out["n_bpe_tokens"][i] = token_count_bpe_ish(text)
            toks = np.array(lwords, dtype=object)
            th = stable_hash_array(toks) if len(toks) else np.empty(0, dtype=np.uint64)
            out["simhash"][i] = np.int64(np.uint64(simhash64(th)).astype(np.int64))
            sig = minhash_signature(shingle_hashes_lwords(lwords, self.k), self.a, self.b)
            out["band_hashes"][i] = band_hashes(sig, self.n_bands).astype(np.int64)
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "n_links": pa.array(out["n_links"]),
                "lang_pred": pa.array(out["lang_pred"], pa.string()),
                "quality_e6": pa.array(out["quality_e6"]),
                "n_tokens": pa.array(out["n_tokens"]),
                "n_bpe_tokens": pa.array(out["n_bpe_tokens"]),
                "simhash": pa.array(out["simhash"]),
                "band_hashes": pa.array([list(b) for b in out["band_hashes"]], pa.list_(pa.int64())),
            }
        )


_ANALYZER = None


def _analyze_batch(t: pa.Table) -> pa.Table:
    # stateless-task variant: the analyzer (minhash params etc.) is
    # cached per WORKER PROCESS, so tasks skip the actor-pool ramp-up
    # while still amortizing setup — workers outlive executions.
    global _ANALYZER
    if _ANALYZER is None:
        _ANALYZER = PageAnalyze()
    return _ANALYZER(t)


def analyze_pages(pages: rd.Dataset, concurrency=None, batch_size: int = 128) -> rd.Dataset:
    return pages.map_batches(_analyze_batch, batch_format="pyarrow", batch_size=batch_size)
