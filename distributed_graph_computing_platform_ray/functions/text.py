"""Text-analysis primitives for training-data pipelines.

All deterministic, dependency-free, vectorized where the work allows.
These back the documents-table queries (language id, quality scoring,
token counting, fingerprinting) — extensions beyond the reference
(which has no string functions at all, SURVEY.md §2.8).
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_BPE = re.compile(r"[A-Za-z]+(?:'[a-z]+)?|[0-9]{1,3}|[^\sA-Za-z0-9]")
_PUNCT = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles (public common-word lists)
_LANG_STOPS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "den", "zu", "im"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "des", "du", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "no", "una", "con", "por", "para", "del"},
}


def tokens_ws(text: str) -> list[str]:
    return text.split()


def token_count_bpe_ish(text: str) -> int:
    """Sub-word-ish token count: alpha runs, short digit groups, and
    individual punctuation — a cheap proxy for BPE token counts."""
    return len(_TOKEN_BPE.findall(text))


def lang_id_counts_lwords(lwords: list[str]) -> tuple[str, int, int]:
    """``lang_id_counts`` over pre-lowercased words (first 200 used) —
    the allocation-free path for fused stages that already split."""
    words = lwords[:200]
    if not words:
        return "und", 0, 0
    best, best_hits = "und", 0
    for lang, stops in _LANG_STOPS.items():
        hits = sum(1 for w in words if w in stops)
        if hits > best_hits:
            best, best_hits = lang, hits
    if best_hits == 0:
        return "und", 0, len(words)
    return best, best_hits, len(words)


def lang_id_counts(text: str) -> tuple[str, int, int]:
    """(lang, stopword_hits, n_words_considered) over the first 200
    whitespace tokens, lowercased. Ties break by profile order
    (en, de, fr, es); zero hits -> 'und'. Integer outputs so callers
    can scale confidence with exact integer arithmetic (the SQL oracle
    reproduces the same formula)."""
    return lang_id_counts_lwords([w.lower() for w in text.split()[:200]])


def lang_id(text: str) -> tuple[str, float]:
    """Stopword-profile language id over {en,de,fr,es}; returns
    (lang, confidence). 'und' (undetermined) when nothing matches —
    deterministic n-gram/stopword heuristic, no model."""
    lang, hits, n = lang_id_counts(text)
    if n == 0 or hits == 0:
        return ("und", 0.0)
    return lang, round(hits / n, 6)


def _count_upper(text: str) -> int:
    """Exact count of ``c.isupper()`` chars: for ASCII text (the
    common case) a vectorized byte-range test — for ASCII, isupper()
    is true exactly for A-Z — else the per-char loop."""
    if text.isascii():
        b = np.frombuffer(text.encode(), dtype=np.uint8)
        return int(((b >= 65) & (b <= 90)).sum())
    return sum(1 for c in text if c.isupper())


def quality_features_words(text: str, words: list[str], lwords: list[str]) -> dict:
    """``quality_features`` over a pre-split (and pre-lowercased)
    token list — identical outputs, no re-splitting (fused stages)."""
    n_chars = len(text)
    n_words = len(words)
    mean_wlen = (sum(map(len, words)) / n_words) if n_words else 0.0
    n_punct = len(_PUNCT.findall(text))
    n_upper = _count_upper(text)
    stop_hits = sum(1 for w in lwords if w in _LANG_STOPS["en"])
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": round(mean_wlen, 6),
        "punct_ratio": round(n_punct / max(1, n_chars), 6),
        "upper_ratio": round(n_upper / max(1, n_chars), 6),
        "stopword_ratio": round(stop_hits / max(1, n_words), 6),
    }


def quality_features(text: str) -> dict:
    """Raw quality-signal features (C4/Gopher-style heuristics)."""
    words = text.split()
    return quality_features_words(text, words, [w.lower() for w in words])


def _quality_score_from(f: dict) -> float:
    score = 1.0
    if f["n_words"] < 5:
        score *= 0.2
    elif f["n_words"] < 20:
        score *= 0.7
    if not (2.0 <= f["mean_word_len"] <= 12.0):
        score *= 0.5
    if f["punct_ratio"] > 0.2:
        score *= 0.4
    if f["stopword_ratio"] < 0.01:
        score *= 0.8
    return round(score, 6)


def quality_score(text: str) -> float:
    """[0,1] composite: length in a sane band, some stopwords, not
    punctuation soup, plausible word lengths. Deterministic."""
    return _quality_score_from(quality_features(text))


def quality_score_words(text: str, words: list[str], lwords: list[str]) -> float:
    """``quality_score`` over a pre-split token list (fused stages)."""
    return _quality_score_from(quality_features_words(text, words, lwords))


def word_ngrams(words: list[str], k: int) -> list[str]:
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def shingle_hashes_lwords(lwords: list[str], k: int = 3) -> np.ndarray:
    """``shingle_hashes`` over pre-lowercased words (fused stages)."""
    from .hashing import fnv1a64

    grams = word_ngrams(lwords, k)
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(fnv1a64(grams))


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of lowercase word k-shingles (deduped).

    FNV-1a so the minhash SQL oracle can recompute identical shingle
    hashes; collisions at 64 bits are negligible, so set Jaccard over
    these hashes equals Jaccard over the shingle strings."""
    return shingle_hashes_lwords([w.lower() for w in text.split()], k)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 shingle sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


_ROLL_BASE = np.uint64(1099511628211)


def rolling_fingerprint(text: str, k: int = 8, keep: int = 4) -> list[int]:
    """Winnowing-style document fingerprint: polynomial rolling hash
    over character k-grams, keep the ``keep`` smallest hashes —
    deterministic, robust to local edits."""
    data = text.encode("utf-8")
    if len(data) < k:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for c in data:
                h = h * _ROLL_BASE + np.uint64(c)
        return [int(h)]
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        # vectorized rolling hash: h[i] = sum base^(k-1-j) * c[i+j]
        powers = np.array([_ROLL_BASE ** np.uint64(k - 1 - j) for j in range(k)], dtype=np.uint64)
        n = len(arr) - k + 1
        h = np.zeros(n, dtype=np.uint64)
        for j in range(k):  # k is small (8); O(k * n) vector ops
            h += powers[j] * arr[j : j + n]
    smallest = np.unique(h)[:keep]
    return [int(x) for x in smallest]
