"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` as a smoke
check, runs each ``queries()[name](sf_dir)`` at sf=0.01 and compares
against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash). Nothing here (or in the library) calls
``ray.init()`` / ``ray.shutdown()``.

Column-name/type contract: every float-valued output is integer-scaled
(``*_e8`` / ``*_e6``) on BOTH sides so value hashes compare exactly.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# shared SQL fragments (must mirror pipelines/testdata.py derivations)

_EB_LINEITEM = (
    "eb AS (SELECT DISTINCT l_orderkey % 2000 AS src, "
    "2000 + (l_partkey % 2000) AS dst FROM lineitem)"
)
_ES = "es AS (SELECT src, dst FROM eb UNION ALL SELECT dst, src FROM eb)"
_V = "v AS (SELECT DISTINCT src AS id FROM es)"
_U_ORDERS = (
    "u AS (SELECT DISTINCT least(o_custkey % 500, o_orderkey % 500) AS a, "
    "greatest(o_custkey % 500, o_orderkey % 500) AS b FROM orders "
    "WHERE o_custkey % 500 <> o_orderkey % 500)"
)


def _stops_sql(lang: str) -> str:
    """IN-list literal for a language's stopword profile, imported from
    the engine so SQL oracle and engine can never drift."""
    from distributed_graph_computing_platform_ray.functions.text import _LANG_STOPS

    return "(" + ", ".join(f"'{w}'" for w in sorted(_LANG_STOPS[lang])) + ")"


def _langid_sql() -> str:
    """Mirror functions.text.lang_id_counts + the integer half-up
    confidence scaling in pipelines/testdata.q_doc_langid."""
    hits = ", ".join(
        f"count(*) FILTER (word IN {_stops_sql(lg)}) AS h_{lg}"
        for lg in ("en", "de", "fr", "es")
    )
    best = "greatest(h_en, h_de, h_fr, h_es)"
    return (
        "WITH w AS ( "
        "  SELECT doc_id, lower(word) AS word FROM ( "
        "    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')[1:200]) AS word "
        "    FROM documents WHERE trim(text) <> '')), "
        f"h AS (SELECT doc_id, count(*)::BIGINT AS n, {hits} FROM w GROUP BY doc_id) "
        "SELECT d.doc_id, "
        f"CASE WHEN h.doc_id IS NULL OR {best} = 0 THEN 'und' "
        f"     WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en' "
        f"     WHEN h_de >= h_fr AND h_de >= h_es THEN 'de' "
        f"     WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS lang_pred, "
        f"(CASE WHEN h.doc_id IS NULL OR {best} = 0 THEN 0 "
        f"      ELSE ({best} * 2000000 + n) // (2 * n) END)::BIGINT AS conf_e6 "
        "FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"
    )


def _rolling_fp_sql() -> str:
    """Mirror functions.text.rolling_fingerprint's smallest window hash
    (fp_min): polynomial rolling hash base 1099511628211 over byte
    k-grams (k=8) mod 2^64 — HUGEINT arithmetic, powers precomputed
    here so SQL needs no wraparound multiply. Text is ASCII in the
    testdata tables, so ord(char) == byte value."""
    B, K, M = 1099511628211, 8, 1 << 64
    pw = [(j + 1, pow(B, K - 1 - j, M)) for j in range(K)]  # idx 1..8 -> B^7..B^0
    pw_rows = ", ".join(f"({i}, {v}::HUGEINT)" for i, v in pw)
    return (
        f"WITH pw(idx, val) AS (VALUES {pw_rows}), "
        "d AS (SELECT doc_id, text, length(text) AS L, "
        "      least(8, length(text)) AS w FROM documents), "
        "wh AS ( "
        "  SELECT d.doc_id, gi.i, "
        f"    SUM(pw.val * ord(substr(d.text, gi.i + pw.idx - (9 - d.w), 1))::HUGEINT) "
        f"      % {M}::HUGEINT AS h "
        "  FROM d, LATERAL unnest(generate_series(1, d.L - d.w + 1)) AS gi(i), pw "
        "  WHERE d.L > 0 AND pw.idx >= 9 - d.w GROUP BY d.doc_id, gi.i), "
        "mh AS (SELECT doc_id, min(h) AS m FROM wh GROUP BY doc_id) "
        "SELECT d.doc_id, "
        f"(CASE WHEN mh.m IS NULL THEN 0 WHEN mh.m >= {1 << 63}::HUGEINT "
        f"      THEN mh.m - {M}::HUGEINT ELSE mh.m END)::BIGINT AS fp_min "
        "FROM d LEFT JOIN mh ON mh.doc_id = d.doc_id"
    )


_M64 = 18446744073709551616  # 2^64
_FNV_TOK = (
    # FNV-1a 64 per distinct lowercase token, byte-at-a-time via a
    # recursive CTE (prime < 2^41, so HUGEINT*BIGINT never overflows).
    "tokd AS (SELECT DISTINCT tok FROM toks), "
    "fnv AS ( "
    "  SELECT tok, 0 AS i, CAST(14695981039346656037 AS HUGEINT) AS h FROM tokd "
    "  UNION ALL "
    "  SELECT tok, i + 1, "
    "    (xor(h::UBIGINT, ord(substr(tok, i + 1, 1))::UBIGINT)::HUGEINT "
    f"     * 1099511628211) % {_M64}::HUGEINT "
    "  FROM fnv WHERE i < length(tok)), "
    "tokh AS (SELECT tok, h::UBIGINT AS h FROM fnv WHERE i = length(tok))"
)


def _simhash_sql() -> str:
    """Mirror stages.dedup.simhash_dedup: FNV-1a token hashes
    (multiplicity-weighted), 64-bit SimHash (bit j set iff the signed
    bit-sum is > 0), then every (a < b) pair at Hamming distance <= 3.
    The engine's 4x16-bit banding is exact for Hamming <= 3
    (pigeonhole), so the all-pairs form is the same set."""
    return (
        "WITH RECURSIVE "
        "toks AS ( "
        "  SELECT doc_id, lower(word) AS tok, count(*)::BIGINT AS cnt FROM ( "
        "    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word "
        "    FROM documents WHERE trim(text) <> '') "
        # the engine's str.split() never yields empty tokens; regexp
        # split does for e.g. tab-leading text — exclude them so both
        # sides tokenize identically on whitespace edge cases
        "  WHERE word <> '' GROUP BY doc_id, lower(word)), "
        f"{_FNV_TOK}, "
        "acc AS ( "
        "  SELECT t.doc_id, j.j, "
        "    sum(t.cnt * CASE WHEN (th.h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s "
        "  FROM toks t JOIN tokh th ON th.tok = t.tok, "
        "       LATERAL (SELECT unnest(generate_series(0, 63)) AS j) j "
        "  GROUP BY t.doc_id, j.j), "
        "sh AS ( "
        "  SELECT doc_id, "
        "    sum(CASE WHEN s > 0 THEN (1::UBIGINT << j)::HUGEINT ELSE 0::HUGEINT END) AS u "
        "  FROM acc GROUP BY doc_id), "
        "shi AS (SELECT doc_id, "
        f"  (CASE WHEN u >= {1 << 63}::HUGEINT THEN u - {_M64}::HUGEINT ELSE u END)::BIGINT AS s "
        "  FROM sh) "
        "SELECT x.doc_id AS a, y.doc_id AS b, "
        "  bit_count(xor(x.s, y.s))::BIGINT AS hamming "
        "FROM shi x JOIN shi y ON x.doc_id < y.doc_id "
        "WHERE bit_count(xor(x.s, y.s)) <= 3"
    )


def _minhash_clusters_wrap(outer: str) -> str:
    """Reuse the minhash-dedup oracle's full CTE chain with its final
    (doc_id, cluster_id) select folded into a ``dd`` CTE, then run
    ``outer`` over it (observability oracles: cluster sizes,
    per-source retention)."""
    base = _minhash_dedup_sql()
    final = (
        "SELECT id::BIGINT AS doc_id, lab::BIGINT AS cluster_id "
        "FROM c WHERE it = 60"
    )
    assert base.endswith(final)
    return base[: -len(final)].rstrip() + ", dd AS (" + final + ") " + outer


def _minhash_dedup_sql() -> str:
    """Oracle for stages.dedup.minhash_dedup: all (a < b) pairs whose
    EXACT word-3-shingle Jaccard (the engine's own verify step) clears
    the 0.8 threshold, clustered by min-label connected components.
    The engine reaches the same pair set through banded MinHash LSH
    candidates + exact verify; at 128 perms / 16 bands its recall at
    J >= 0.8 covers every qualifying pair in this data (checked), so
    the sets coincide. Cluster id = min doc_id of the component (the
    engine's CC label for numeric keys)."""
    return (
        "WITH RECURSIVE "
        "docs0 AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm "
        "          FROM documents WHERE trim(text) <> ''), "
        "words AS (SELECT doc_id, norm, regexp_split_to_array(norm, ' ') AS arr FROM docs0), "
        "sh AS ( "
        "  SELECT DISTINCT doc_id, g FROM ( "
        "    SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g "
        "    FROM words, LATERAL unnest(generate_series(1, len(arr) - 2)) t(i) "
        "    WHERE len(arr) >= 3 "
        "    UNION ALL "
        "    SELECT doc_id, norm AS g FROM words WHERE len(arr) BETWEEN 1 AND 2)), "
        "sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id), "
        "inter AS ( "
        "  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS i "
        "  FROM sh x JOIN sh y ON y.g = x.g AND x.doc_id < y.doc_id GROUP BY 1, 2), "
        "pairs AS ( "
        "  SELECT a, b FROM inter "
        "  JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b "
        "  WHERE CAST(ROUND(i * 1000000.0 / (sa.n + sb.n - i)) AS BIGINT) >= 800000), "
        "verts AS (SELECT DISTINCT v FROM (SELECT a AS v FROM pairs UNION ALL SELECT b FROM pairs)), "
        "relax AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs "
        "          UNION ALL SELECT v, v FROM verts), "
        "c AS ( "
        "  SELECT 0 AS it, v AS id, v AS lab FROM verts "
        "  UNION ALL "
        "  SELECT c.it + 1, r.d, MIN(c.lab) FROM c JOIN relax r ON r.s = c.id "
        "  WHERE c.it < 60 GROUP BY c.it, r.d) "
        "SELECT id::BIGINT AS doc_id, lab::BIGINT AS cluster_id FROM c WHERE it = 60"
    )


_FNV64 = 1099511628211
_SM_K = 0x9E3779B97F4A7C15
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB


def _wrap_mul(a: str, c: int) -> str:
    """(a * c) mod 2^64 for a 64-bit constant c, via 32-bit split
    partial products so every intermediate fits DuckDB's HUGEINT."""
    lo, hi = c & 0xFFFFFFFF, c >> 32
    return f"((({a}) * {lo} + ((({a}) * {hi}) % 4294967296) * 4294967296) % {_M64}::HUGEINT)"


def _splitmix_cols(src: str, out: str) -> str:
    """Column chain computing splitmix64(src) as alias `out` (DuckDB
    lateral column aliases keep the expression linear, not nested)."""
    return (
        f"((({src})::HUGEINT + {_SM_K}) % {_M64}::HUGEINT) AS {out}_z0, "
        f"xor(({out}_z0)::UBIGINT, ({out}_z0)::UBIGINT >> 30) AS {out}_z1, "
        f"{_wrap_mul(f'({out}_z1)::HUGEINT', _SM_C1)} AS {out}_z2, "
        f"xor(({out}_z2)::UBIGINT, ({out}_z2)::UBIGINT >> 27) AS {out}_z3, "
        f"{_wrap_mul(f'({out}_z3)::HUGEINT', _SM_C2)} AS {out}_z4, "
        f"xor(({out}_z4)::UBIGINT, ({out}_z4)::UBIGINT >> 31) AS {out}"
    )


_MM_KEY = "(least(x,y)*4294967296 + greatest(x,y))"
_MM_PRI_SRC = (
    f"(({_MM_KEY})::HUGEINT + it::HUGEINT * {_SM_K}::HUGEINT) % {_M64}::HUGEINT"
)
_MM_F = (
    "CASE WHEN k = first_value(k) OVER "
    "(PARTITION BY it, x ORDER BY pri) THEN 1 ELSE 0 END AS f"
)


def _MM_INNER(guard: str) -> str:
    """Live-edge scan with per-round splitmix64 priorities (maximal
    matching oracle): one reference to the recursive working table."""
    return (
        f"SELECT it, x, y, {_MM_KEY} AS k, "
        f"{_splitmix_cols(_MM_PRI_SRC, 'pri')} FROM r {guard}"
    )


def _matching_sql() -> str:
    """Luby-style matching rounds: per-round edge priority
    splitmix64(key + it*GOLDEN); r accumulates each round's LIVE
    both-plane edges, matched edges recomputed from r by the same
    mutual-argmin windows (kcore mirror-window style)."""
    return (
        f"WITH RECURSIVE {_U_ORDERS}, "
        "r AS ( "
        "  SELECT 0 AS it, x, y FROM "
        "  (SELECT a AS x, b AS y FROM u UNION ALL SELECT b, a FROM u) "
        "  UNION ALL "
        "  SELECT it + 1, x, y FROM ( "
        "    SELECT it, x, y, "
        "      max(um) OVER (PARTITION BY it, least(x,y), greatest(x,y)) AS em "
        "    FROM ( "
        "      SELECT it, x, y, max(mm) OVER (PARTITION BY it, x) AS um "
        "      FROM ( "
        "        SELECT it, x, y, "
        "          min(f) OVER (PARTITION BY it, least(x,y), greatest(x,y)) AS mm "
        f"        FROM (SELECT it, x, y, {_MM_F} FROM ({_MM_INNER('WHERE it < 40')}))))) "
        "  WHERE em = 0), "
        "mt AS ( "
        "  SELECT DISTINCT it, least(x,y) AS a, greatest(x,y) AS b FROM ( "
        "    SELECT it, x, y, "
        "      min(f) OVER (PARTITION BY it, least(x,y), greatest(x,y)) AS mm "
        f"    FROM (SELECT it, x, y, {_MM_F} FROM ({_MM_INNER('')}))) "
        "  WHERE mm = 1) "
        "SELECT a::BIGINT AS a, b::BIGINT AS b, it::BIGINT AS round FROM mt"
    )


def _pr_chain(p: str) -> str:
    """House symmetrized 30-iteration PageRank recursion over a
    prefixed edge chain ``{p}e`` (from _pages_edges_cte(n, seed, p)),
    ending at ``{p}fin(id, e8)``. Shared by the two-snapshot rank-churn
    oracle (mirrors pipelines/pages.py::build_link_graph + PageRank)."""
    return (
        f"{p}es AS (SELECT src, dst FROM {p}e UNION ALL SELECT dst, src FROM {p}e), "
        f"{p}deg AS (SELECT src AS id, count(*) AS d FROM {p}es GROUP BY src), "
        f"{p}nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {p}deg), "
        f"{p}pr AS ( "
        f"  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM {p}deg "
        f"  UNION ALL "
        f"  SELECT q.it + 1, ee.dst, 0.15/{p}nn.n + 0.85 * SUM(q.val / q.d), dd.d "
        f"  FROM {p}pr q CROSS JOIN {p}nn JOIN {p}es ee ON ee.src = q.id "
        f"       JOIN {p}deg dd ON dd.id = ee.dst "
        f"  WHERE q.it < 30 GROUP BY q.it, ee.dst, dd.d, {p}nn.n), "
        f"{p}fin AS (SELECT id, CAST(ROUND(val * 1e8) AS BIGINT) AS e8 "
        f"          FROM {p}pr WHERE it = 30)"
    )


def _page_text_sql(n: int = 2000, seed: int = 42) -> str:
    """Independent SQL reconstruction of the extractor's byte-identical
    text surface: the generator template (sources/pages.py::_page_html)
    collapses to 'Page i & friends Doc i <words> <escaped> link 0 ...'
    under functions/html.py::extract_text, with the word stream
    rebuilt from mix64(seed+3, i, j) % 23 splitmix recurrences —
    verified byte-equal to the extractor. Mirrors
    testdata.q_page_text_stats."""
    return (
        f"WITH {_page_text_cte(n, seed)} "
        "SELECT printf('https://site-%05d.example/p/%04d', i // 16, i % 16) AS url, "
        "  text, length(text)::BIGINT AS n_chars, "
        "  len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens FROM txt"
    )


def _page_text_cte(n: int = 2000, seed: int = 42) -> str:
    """Shared CTE chain ending at ``txt(i, text)`` — the independent
    reconstruction of the extractor's byte-identical text surface
    (see _page_text_sql docstring)."""
    words = (
        "web crawl graph rank link data page site index query batch engine "
        "stream shard vertex edge node hub spider fetch parse token shuffle"
    ).split()
    wl = "[" + ",".join(f"'{w}'" for w in words) + "]"
    c_seed = (seed * _FNV64) % _M64
    c3 = ((seed + 3) * _FNV64) % _M64
    return (
        f"tbase AS (SELECT i::UBIGINT AS i FROM range(0, {n}) t(i)), "
        f"th0 AS (SELECT i, xor({c_seed}::UBIGINT, i) AS acc0, "
        f"        {_splitmix_cols('acc0', 'h0')} FROM tbase), "
        f"wj AS (SELECT i, j::UBIGINT AS j, xor({c3}::UBIGINT, i) AS a1, "
        f"       xor(((a1::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT, j) AS a2, "
        f"       {_splitmix_cols('a2', 'hw')} "
        "       FROM th0, LATERAL unnest(generate_series(0, "
        "            (20 + (h0 >> 8) % 60)::BIGINT - 1)) t(j)), "
        f"ws AS (SELECT i, string_agg(({wl})[(hw % 23)::BIGINT + 1], ' ' ORDER BY j) "
        "       AS wstr FROM wj GROUP BY i), "
        "tlk AS (SELECT i, k::UBIGINT AS k FROM th0, "
        "        LATERAL unnest(generate_series(0, (4 + h0 % 12)::BIGINT - 1)) t(k)), "
        "ls AS (SELECT i, string_agg('link ' || k::BIGINT, ' ' ORDER BY k) AS lstr "
        "       FROM tlk GROUP BY i), "
        "txt AS (SELECT th0.i::BIGINT AS i, "
        "  'Page ' || th0.i::BIGINT || ' & friends Doc ' || th0.i::BIGINT || ' ' "
        "   || ws.wstr || ' <escaped> ' || ls.lstr AS text "
        "  FROM th0 JOIN ws ON ws.i = th0.i JOIN ls ON ls.i = th0.i)"
    )


def _page_analyze_rollup_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for testdata.q_page_analyze_rollup: the fused analyze
    stage per-language rollup, rebuilt fully independently — text from
    the generator recurrence (_page_text_cte, byte-identical to the
    extractor), language id / quality composite / BPE token count /
    link count recomputed in SQL (the same mirrors the doc_langid /
    doc_quality / doc_token_bpe gates use, applied to the page text)."""
    hits = ", ".join(
        f"count(*) FILTER (word IN {_stops_sql(lg)}) AS h_{lg}"
        for lg in ("en", "de", "fr", "es")
    )
    best = "greatest(h_en, h_de, h_fr, h_es)"
    en = _stops_sql("en")
    return (
        f"WITH {_page_text_cte(n, seed)}, "
        "w AS (SELECT i, lower(word) AS word FROM ( "
        "  SELECT i, unnest(regexp_split_to_array(text, '\\s+')[1:200]) AS word FROM txt)), "
        f"h AS (SELECT i, count(*)::BIGINT AS n, {hits} FROM w GROUP BY i), "
        "lang AS (SELECT t.i, "
        f"  CASE WHEN h.i IS NULL OR {best} = 0 THEN 'und' "
        "       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en' "
        "       WHEN h_de >= h_fr AND h_de >= h_es THEN 'de' "
        "       WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS lang_pred "
        "  FROM txt t LEFT JOIN h ON h.i = t.i), "
        "f AS (SELECT i, length(text)::BIGINT AS n_chars, "
        "  length(regexp_split_to_array(text, '\\s+'))::BIGINT AS n_words, "
        "  length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS sum_wlen, "
        "  (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct "
        "  FROM txt), "
        "sw AS (SELECT i, count(*) FILTER ( "
        f"   lower(word) IN {en}) AS stop_hits "
        "  FROM (SELECT i, unnest(regexp_split_to_array(text, '\\s+')) AS word FROM txt) "
        "  GROUP BY i), "
        "g AS (SELECT f.i, "
        "  CASE WHEN n_words < 5 THEN 2 WHEN n_words < 20 THEN 7 ELSE 10 END AS f1, "
        "  CASE WHEN n_words = 0 OR NOT (ROUND(sum_wlen / n_words::DOUBLE, 6) "
        "       BETWEEN 2.0 AND 12.0) THEN 5 ELSE 10 END AS f2, "
        "  CASE WHEN ROUND(n_punct / greatest(1, n_chars)::DOUBLE, 6) > 0.2 THEN 4 ELSE 10 END AS f3, "
        "  CASE WHEN ROUND(coalesce(stop_hits, 0) / greatest(1, n_words)::DOUBLE, 6) < 0.01 "
        "       THEN 8 ELSE 10 END AS f4 "
        "  FROM f LEFT JOIN sw ON sw.i = f.i), "
        "q AS (SELECT i, (1000000::BIGINT * f1 * f2 * f3 * f4 // 10000)::BIGINT AS quality_e6 FROM g), "
        "tok AS (SELECT i, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens, "
        "  length(regexp_extract_all(text, "
        "  '[A-Za-z]+(?:''[a-z]+)?|[0-9]{1,3}|[^\\sA-Za-z0-9]'))::BIGINT AS n_bpe FROM txt), "
        "lnk AS (SELECT i::BIGINT AS i, (4 + h0 % 12)::BIGINT AS n_links FROM th0) "
        "SELECT lang.lang_pred, lnk.n_links, count(*)::BIGINT AS n_pages, "
        "  sum(tok.n_tokens)::BIGINT AS sum_tokens, "
        "  sum(tok.n_bpe)::BIGINT AS sum_bpe_tokens, "
        "  sum(q.quality_e6)::BIGINT AS sum_quality_e6 "
        "FROM lang JOIN tok ON tok.i = lang.i JOIN q ON q.i = lang.i "
        "JOIN lnk ON lnk.i = lang.i GROUP BY lang.lang_pred, lnk.n_links"
    )


def _page_simhash_bands_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for testdata.q_page_simhash_bands: page text rebuilt
    from the generator recurrence, FNV-token simhash recomputed
    bit-for-bit (the _simhash_sql chain over the page tokens), then
    the per-sub-band bucket-size histogram."""
    return (
        f"WITH RECURSIVE {_page_text_cte(n, seed)}, "
        "toks AS ( "
        "  SELECT i AS doc_id, lower(word) AS tok, count(*)::BIGINT AS cnt FROM ( "
        "    SELECT i, unnest(regexp_split_to_array(text, '\\s+')) AS word FROM txt) "
        "  GROUP BY i, lower(word)), "
        f"{_FNV_TOK}, "
        "acc AS ( "
        "  SELECT t.doc_id, j.j, "
        "    sum(t.cnt * CASE WHEN (th.h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s "
        "  FROM toks t JOIN tokh th ON th.tok = t.tok, "
        "       LATERAL (SELECT unnest(generate_series(0, 63)) AS j) j "
        "  GROUP BY t.doc_id, j.j), "
        "sh AS ( "
        "  SELECT doc_id, "
        "    sum(CASE WHEN s > 0 THEN (1::UBIGINT << j)::HUGEINT ELSE 0::HUGEINT END) AS u "
        "  FROM acc GROUP BY doc_id), "
        "bnd AS (SELECT b.b AS band, "
        "    ((u::UBIGINT >> (16 * b.b)) & 65535)::BIGINT AS key, doc_id "
        "  FROM sh, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) b), "
        "sizes AS (SELECT band, key, count(*)::BIGINT AS bucket_size "
        "  FROM bnd GROUP BY band, key) "
        "SELECT band::BIGINT AS band, bucket_size, count(*)::BIGINT AS n_buckets "
        "FROM sizes GROUP BY band, bucket_size"
    )


_M61 = (1 << 61) - 1


def _page_minhash_bands_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for testdata.q_page_minhash_bands: per page, all 16
    MinHash LSH band keys recomputed fully in SQL — generator text,
    word-3-shingle FNV (recursive CTE), 128 permutations
    ((a*x mod 2^64 + b) mod 2^64 mod M61; HUGEINT holds the 122-bit
    products, mirroring the engine's uint64 wraparound), per-perm min,
    and the 8-step band fold (wraparound multiply by 0x100000001B3 +
    xor). Permutation constants come from the engine's own
    minhash_params so oracle and engine can never drift (same policy
    as the stopword lists)."""
    from distributed_graph_computing_platform_ray.functions.hashing import minhash_params

    a, b = minhash_params(128)
    perm_rows = ", ".join(
        f"({p}, {int(a[p])}::HUGEINT, {int(b[p])}::HUGEINT)" for p in range(128)
    )
    fold_p = 0x100000001B3
    # 8-step fold as chained lateral column aliases: o0 = s0,
    # o_{r+1} = wrapmul(o_r) xor s_{r+1}
    fold_cols = ["s0 AS o0"]
    for r in range(1, 8):
        fold_cols.append(
            f"xor(({_wrap_mul(f'(o{r-1})::HUGEINT', fold_p)})::UBIGINT, s{r}::UBIGINT) AS o{r}"
        )
    piv_cols = ", ".join(
        f"MAX(CASE WHEN p % 8 = {r} THEN sig END) AS s{r}" for r in range(8)
    )
    return (
        f"WITH RECURSIVE {_page_text_cte(n, seed)}, "
        "arrs AS (SELECT i AS doc_id, "
        "  regexp_split_to_array(lower(text), ' ') AS arr FROM txt), "
        "grams AS (SELECT DISTINCT doc_id, g FROM ( "
        "  SELECT doc_id, arr[gi] || ' ' || arr[gi+1] || ' ' || arr[gi+2] AS g "
        "  FROM arrs, LATERAL unnest(generate_series(1, len(arr) - 2)) t(gi) "
        "  WHERE len(arr) >= 3 "
        "  UNION ALL "
        # word_ngrams short-doc semantics: 0 < len < k emits the single
        # all-words gram (page text always has >=3 words today; this
        # keeps the gate correct if that ever changes)
        "  SELECT doc_id, array_to_string(arr, ' ') AS g FROM arrs "
        "  WHERE len(arr) BETWEEN 1 AND 2)), "
        "gramd AS (SELECT DISTINCT g FROM grams), "
        "gfnv AS ( "
        "  SELECT g, 0 AS ci, CAST(14695981039346656037 AS HUGEINT) AS h FROM gramd "
        "  UNION ALL "
        "  SELECT g, ci + 1, "
        "    (xor(h::UBIGINT, ord(substr(g, ci + 1, 1))::UBIGINT)::HUGEINT "
        f"     * 1099511628211) % {_M64}::HUGEINT "
        "  FROM gfnv WHERE ci < length(g)), "
        "gh AS (SELECT g, h FROM gfnv WHERE ci = length(g)), "
        f"gx AS (SELECT g, (h % {_M61}::HUGEINT) AS x FROM gh), "
        f"perms(p, pa, pb) AS (VALUES {perm_rows}), "
        "minh AS ( "
        "  SELECT gr.doc_id, perms.p, "
        f"  min((((perms.pa * gx.x) % {_M64}::HUGEINT + perms.pb) % {_M64}::HUGEINT) "
        f"      % {_M61}::HUGEINT) AS sig "
        "  FROM grams gr JOIN gx ON gx.g = gr.g CROSS JOIN perms "
        "  GROUP BY gr.doc_id, perms.p), "
        f"piv AS (SELECT doc_id, (p // 8)::BIGINT AS band_id, {piv_cols} "
        "  FROM minh GROUP BY doc_id, p // 8), "
        f"fold AS (SELECT doc_id, band_id, {', '.join(fold_cols)} FROM piv) "
        "SELECT printf('https://site-%05d.example/p/%04d', doc_id // 16, doc_id % 16) AS url, "
        "  band_id, "
        f"  (CASE WHEN o7::HUGEINT >= {1 << 63}::HUGEINT "
        f"        THEN o7::HUGEINT - {_M64}::HUGEINT ELSE o7::HUGEINT END)::BIGINT AS band_hash "
        "FROM fold"
    )


def _coverage_greedy_sql(n: int = 2000, seed: int = 42, k: int = 5) -> str:
    """Oracle for greedy max-coverage seed selection: FIXED-k unrolled
    chained CTEs (s_r -> w_r -> c_r), the robust form for iterated
    data-dependent argmax (see NOTES.md on unrolled vs recursive CTEs).
    Mirrors testdata.q_coverage_greedy."""
    parts = [f"WITH {_pages_edges_cte(n, seed)}, "]
    parts.append("ph AS (SELECT DISTINCT src, split_part(dst, '/', 3) AS h FROM e), ")
    prev = None
    for r in range(1, k + 1):
        if prev is None:
            parts.append(f"s{r} AS (SELECT src, count(*) AS n FROM ph GROUP BY src), ")
        else:
            parts.append(
                f"s{r} AS (SELECT src, count(*) AS n FROM ph "
                f"WHERE h NOT IN (SELECT h FROM {prev}) GROUP BY src), "
            )
        parts.append(
            f"w{r} AS (SELECT src, n FROM s{r} "
            f"QUALIFY row_number() OVER (ORDER BY n DESC, src) = 1), "
        )
        if prev is None:
            parts.append(f"c{r} AS (SELECT DISTINCT h FROM ph JOIN w{r} USING (src)), ")
        else:
            parts.append(
                f"c{r} AS (SELECT DISTINCT h FROM (SELECT h FROM {prev} "
                f"UNION ALL SELECT h FROM ph JOIN w{r} USING (src))), "
            )
        prev = f"c{r}"
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, src AS url, n::BIGINT AS n_new, "
        f"(SELECT count(*) FROM c{r})::BIGINT AS n_covered FROM w{r}"
        for r in range(1, k + 1)
    )
    return "".join(parts).rstrip(", ") + " " + sel


def _PAGE_URL(x: str) -> str:
    """SQL expression rebuilding sources/pages.py::url_of(x)."""
    return f"printf('https://site-%05d.example/p/%04d', ({x}) // 16, ({x}) % 16)"


def _host_sv_ctes() -> str:
    """Shared CTE chain ending at ``sv(s, v, dist, sigma)``: all-pairs
    shortest-path distance AND path count over the contracted host
    graph via ONE walk-count recursion (wk counts length-l walks; the
    FIRST level with a nonzero count is the shortest-path distance and
    its count the number of shortest paths). A single recursion
    referencing only the cheap generator chain — the earlier
    two-recursion form (Bellman-Ford dist + level-indexed sigma)
    re-evaluated the full dist recursion at every sigma level, ~90 s.
    Walk counts are capped at l < 8 (structural contraction diameter
    is 3; max level-7 count measured 2.8e10, far inside HUGEINT)."""
    return (
        f"{_pages_edges_cte()}, "
        "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
        "       split_part(dst, '/', 3) AS dh FROM e "
        "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
        "hs AS (SELECT DISTINCT sh AS h FROM he), "
        "vs AS (SELECT DISTINCT h FROM (SELECT sh AS h FROM he "
        "       UNION ALL SELECT dh FROM he)), "
        "wk AS ( "
        "  SELECT h AS s, h AS v, 0 AS l, 1::HUGEINT AS c FROM hs "
        "  UNION ALL "
        "  SELECT w.s, e2.dh, w.l + 1, SUM(w.c) "
        "  FROM wk w JOIN he e2 ON e2.sh = w.v "
        "  WHERE w.l < 7 GROUP BY w.s, e2.dh, w.l), "
        "sv AS (SELECT s, v, l AS dist, c::BIGINT AS sigma FROM wk "
        "  QUALIFY row_number() OVER (PARTITION BY s, v ORDER BY l) = 1)"
    )


def _host_ebt_ctes() -> str:
    """Shared CTE chain ending at ``agg(u, w, bc_e6)``: dist/sigma via
    _host_sv_ctes plus the sampled Girvan-Newman edge-dependency sums —
    used by both host_edge_betweenness and gn_communities (which cuts
    the top edges and then label-propagates)."""
    return (
        f"{_host_sv_ctes()}, "
        "hs10 AS (SELECT h FROM hs ORDER BY h LIMIT 10), "
        "svx AS (SELECT s, v, dist, sigma FROM sv "
        "  UNION ALL SELECT h, h, 0, 1::BIGINT FROM vs "
        "  WHERE h NOT IN (SELECT h FROM hs)), "
        # sampled-source slices (10 x hosts rows) so the dependency
        # join never touches the full sv x sv cross — the naive form
        # let the optimizer build a 60M-row intermediate (~90 s)
        "d1f AS (SELECT s, v, dist, sigma FROM sv "
        "  WHERE s IN (SELECT h FROM hs10)), "
        "d3f AS (SELECT s, v AS t, dist, sigma FROM sv "
        "  WHERE s IN (SELECT h FROM hs10) AND dist >= 1), "
        "tm AS ( "
        "  SELECT e3.sh AS u, e3.dh AS w, "
        "    (2 * d1.sigma * d2.sigma * 1000000 + d3.sigma) "
        "    // (2 * d3.sigma) AS term "
        "  FROM he e3 "
        "  JOIN d1f d1 ON d1.v = e3.sh "
        "  JOIN svx d2 ON d2.s = e3.dh "
        "  JOIN d3f d3 ON d3.s = d1.s AND d3.t = d2.v "
        "    AND d3.dist = d1.dist + 1 + d2.dist), "
        "agg AS (SELECT u, w, SUM(term)::BIGINT AS bc_e6 FROM tm GROUP BY u, w)"
    )


def _pages_edges_cte(n: int = 2000, seed: int = 42, prefix: str = "") -> str:
    """Shared CTE chain ending at ``e(src, dst)``: the deterministic
    page generator's DISTINCT page-level link edges, rebuilt in SQL
    (splitmix64 / mix64 reproduced exactly with HUGEINT split
    multiplies — verified bit-equal to utils.mix64), with the
    extractor's normalization semantics (self-links kept, fragments
    dropped, relative hrefs resolved, duplicate hrefs deduped by the
    distinct). Mirrors sources/pages.py::_page_html +
    functions/html.py::extract_links. Shared by the pages-PageRank and
    domain-graph oracles."""
    c_seed = (seed * _FNV64) % _M64
    c_seed1 = ((seed + 1) * _FNV64) % _M64

    def url(x: str) -> str:
        return f"printf('https://site-%05d.example/p/%04d', ({x}) // 16, ({x}) % 16)"

    return (
        f"{prefix}base AS (SELECT i::UBIGINT AS i FROM range(0, {n}) t(i)), "
        f"{prefix}h0c AS (SELECT i, xor({c_seed}::UBIGINT, i) AS acc0, "
        f"        {_splitmix_cols('acc0', 'h0')} FROM {prefix}base), "
        f"{prefix}lk AS (SELECT i, k::UBIGINT AS k, "
        f"        xor({c_seed1}::UBIGINT, i) AS a1, "
        f"        xor(((a1::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT, k) AS a2, "
        f"        {_splitmix_cols('a2', 'hk')} "
        f"        FROM {prefix}h0c, LATERAL unnest(generate_series(0, (4 + h0 % 12)::BIGINT - 1)) t(k)), "
        f"{prefix}tc AS (SELECT i::BIGINT AS i, k::BIGINT AS k, hk, "
        f"        CAST(floor({n} * power((hk >> 11)::DOUBLE / 9007199254740992.0, 3)) AS BIGINT) AS tgt "
        f"       FROM {prefix}lk), "
        f"{prefix}hrefs AS (SELECT i, k, "
        f"    CASE WHEN hk % 13 = 0 THEN {url('i')} "
        "         WHEN hk % 11 = 5 THEN printf('https://offsite-%04d.example/x', (hk % 997)::BIGINT) "
        f"         WHEN hk % 7 = 3 AND tgt // 16 = i // 16 THEN {url('tgt')} "
        "         WHEN hk % 5 = 2 AND k > 0 THEN NULL "
        f"         ELSE {url(f'tgt % {n}')} END AS base_href "
        f"    FROM {prefix}tc), "
        f"{prefix}res AS (SELECT i, k, last_value(base_href IGNORE NULLS) OVER "
        "          (PARTITION BY i ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS href "
        f"        FROM {prefix}hrefs), "
        f"{prefix}e AS (SELECT DISTINCT {url('i')} AS src, href AS dst FROM {prefix}res)"
    )


def _bpe_sql(n_merges: int = 6, output: str = "rules") -> str:
    """BPE merge-rule oracle: unrolled chained CTEs, one (pair-count,
    argmax, replace) stage per merge. Words are double-delimited
    symbol strings ('|a||b||c|'), so DuckDB replace == Python
    str.replace == greedy left-to-right BPE merging, and pair counting
    is zip-adjacent via parallel unnest of the shifted symbol list.
    Mirrors testdata.q_bpe_merges."""
    parts = [
        "WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
        "  FROM documents WHERE trim(text) <> ''), "
        "wc AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term), "
        "w0 AS (SELECT '|' || array_to_string(list_transform(range(1, length(term)+1), "
        "  i -> substr(term, i, 1)), '||') || '|' AS s, c FROM wc)"
    ]
    for r in range(1, n_merges + 1):
        parts.append(
            f"p{r} AS (SELECT lft, rgt, sum(c)::BIGINT AS w FROM ( "
            f"  SELECT c, unnest(str_split(trim(s, '|'), '||')[1:-2]) AS lft, "
            f"         unnest(str_split(trim(s, '|'), '||')[2:-1]) AS rgt FROM w{r - 1}) "
            "  GROUP BY 1, 2)"
        )
        parts.append(
            f"t{r} AS (SELECT lft, rgt, w FROM p{r} ORDER BY w DESC, lft, rgt LIMIT 1)"
        )
        parts.append(
            f"w{r} AS (SELECT replace(s, '|' || t.lft || '||' || t.rgt || '|', "
            f"  '|' || t.lft || t.rgt || '|') AS s, c FROM w{r - 1} CROSS JOIN t{r} t)"
        )
    if output == "tokens":
        sel = " UNION ALL ".join(
            f"SELECT {r} AS step, SUM(c * len(str_split(trim(s, '|'), '||')))::BIGINT AS corpus_symbols FROM w{r}"
            for r in range(0, n_merges + 1)
        )
        return ", ".join(parts) + " SELECT step::BIGINT AS step, corpus_symbols FROM (" + sel + ")"
    sel = " UNION ALL ".join(
        f"SELECT {r} AS step, lft AS sym_left, rgt AS sym_right, w AS pair_cnt FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    return ", ".join(parts) + " SELECT step::BIGINT AS step, sym_left, sym_right, pair_cnt FROM (" + sel + ")"


def _pq_sql(m: int = 4, k: int = 4, iters: int = 3, dim: int = 64) -> str:
    """Product-quantization oracle: one integer-exact Lloyd recursion
    per subspace (same recurrence as the kmeans_embeddings oracle,
    restricted to the subspace's dim range), joined on vec_id with the
    exact int64 distortion sum. Mirrors testdata.q_pq_codebook /
    stages/kmeans.py."""
    sub = dim // m
    parts = [
        "WITH RECURSIVE vexp AS ( "
        "  SELECT vec_id, d AS dim, "
        "    CAST(FLOOR(CAST(embedding[d+1] AS DOUBLE) * 1e6) AS BIGINT) AS q "
        f"  FROM embeddings, LATERAL unnest(generate_series(0, {dim - 1})) t(d))"
    ]
    for s in range(m):
        lo, hi = s * sub, (s + 1) * sub
        parts.append(
            f"r{s} AS ( "
            "  SELECT 0 AS it, vec_id, cluster, dd FROM ( "
            "    SELECT v.vec_id, c.vec_id AS cluster, "
            "      SUM((v.q - c.q)*(v.q - c.q)) AS dd "
            f"    FROM vexp v JOIN vexp c ON c.dim = v.dim AND c.vec_id < {k} "
            f"    WHERE v.dim >= {lo} AND v.dim < {hi} "
            "    GROUP BY 1, 2 "
            "    QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY dd, cluster) = 1) "
            "  UNION ALL "
            "  SELECT it, vec_id, cluster, dd FROM ( "
            f"    SELECT c.it + 1 AS it, v.vec_id, c.cluster, "
            "      SUM((v.q - c.cq)*(v.q - c.cq)) AS dd "
            f"    FROM (SELECT r.it, r.cluster, v2.dim, SUM(v2.q) // COUNT(*) AS cq "
            f"          FROM r{s} r JOIN vexp v2 USING (vec_id) "
            f"          WHERE r.it < {iters} AND v2.dim >= {lo} AND v2.dim < {hi} "
            "          GROUP BY r.it, r.cluster, v2.dim) c "
            f"    JOIN vexp v ON v.dim = c.dim "
            "    GROUP BY 1, 2, 3 "
            "    QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY dd, c.cluster) = 1))"
        )
    joins = " ".join(
        f"JOIN (SELECT vec_id, cluster, dd FROM r{s} WHERE it = {iters}) a{s} USING (vec_id)"
        for s in range(1, m)
    )
    code_cols = ", ".join(f"a{s}.cluster::BIGINT AS code_{s}" for s in range(m))
    dd_sum = " + ".join(f"a{s}.dd" for s in range(m))
    return (
        ", ".join(parts)
        + f" SELECT vec_id, {code_cols}, ({dd_sum})::BIGINT AS distortion "
        f"FROM (SELECT vec_id, cluster, dd FROM r0 WHERE it = {iters}) a0 {joins}"
    )


def _ann_recall_sql(
    k: int = 10, n_centroids: int = 8, nprobe: int = 2, n_queries: int = 10,
    dim: int = 64,
) -> str:
    """IVF recall@k vs exact brute force, all in exact int64 dot
    products (quantized q = FLOOR(1e6 x); seeded centroids = vec_id <
    n_centroids; argmax/top-k ties to lowest index). Mirrors
    testdata.q_ann_recall."""
    return (
        "WITH vexp AS ( "
        "  SELECT vec_id, d AS dim, "
        "    CAST(FLOOR(CAST(embedding[d+1] AS DOUBLE) * 1e6) AS BIGINT) AS q "
        f"  FROM embeddings, LATERAL unnest(generate_series(0, {dim - 1})) t(d)), "
        "dotvc AS (SELECT v.vec_id, c.vec_id AS c, SUM(v.q * c.q) AS d "
        f"  FROM vexp v JOIN vexp c ON c.dim = v.dim AND c.vec_id < {n_centroids} "
        "  GROUP BY 1, 2), "
        "asg AS (SELECT vec_id, c FROM dotvc "
        "  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c) = 1), "
        f"probe AS (SELECT vec_id AS query_id, c FROM dotvc WHERE vec_id < {n_queries} "
        f"  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, c) <= {nprobe}), "
        "dots AS (SELECT q.vec_id AS query_id, v.vec_id, SUM(q.q * v.q) AS d "
        f"  FROM vexp q JOIN vexp v ON v.dim = q.dim AND q.vec_id < {n_queries} "
        "  GROUP BY 1, 2), "
        "brute AS (SELECT query_id, vec_id FROM dots "
        f"  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d DESC, vec_id) <= {k}), "
        "ivf AS (SELECT d2.query_id, d2.vec_id FROM dots d2 "
        "  JOIN asg a ON a.vec_id = d2.vec_id "
        "  JOIN probe p ON p.query_id = d2.query_id AND p.c = a.c "
        f"  QUALIFY row_number() OVER (PARTITION BY d2.query_id ORDER BY d2.d DESC, d2.vec_id) <= {k}) "
        "SELECT b.query_id, count(i.vec_id)::BIGINT AS hits, count(*)::BIGINT AS k_eff "
        "FROM brute b LEFT JOIN ivf i USING (query_id, vec_id) GROUP BY 1"
    )


def _kcenter_sql(k: int = 8, dim: int = 64) -> str:
    """Farthest-first-traversal oracle: chained CTEs carry the running
    min-distance-to-chosen-set per vector (exact int64); each stage's
    argmax (dist desc, vec_id) is the next seed. Mirrors
    testdata.q_kcenter_seeds."""
    parts = [
        "WITH vexp AS ( "
        "  SELECT vec_id, d AS dim, "
        "    CAST(FLOOR(CAST(embedding[d+1] AS DOUBLE) * 1e6) AS BIGINT) AS q "
        f"  FROM embeddings, LATERAL unnest(generate_series(0, {dim - 1})) t(d)), "
        "md1 AS (SELECT v.vec_id, SUM((v.q - c.q)*(v.q - c.q))::BIGINT AS md "
        "  FROM vexp v JOIN vexp c ON c.dim = v.dim AND c.vec_id = 0 GROUP BY 1), "
        "t1 AS (SELECT vec_id, md FROM md1 ORDER BY md DESC, vec_id LIMIT 1)"
    ]
    for j in range(2, k):
        parts.append(
            f"d{j} AS (SELECT v.vec_id, SUM((v.q - c.q)*(v.q - c.q))::BIGINT AS dd "
            f"  FROM vexp v JOIN t{j - 1} tt ON true "
            f"  JOIN vexp c ON c.dim = v.dim AND c.vec_id = tt.vec_id GROUP BY 1)"
        )
        parts.append(
            f"md{j} AS (SELECT m.vec_id, least(m.md, d.dd) AS md "
            f"  FROM md{j - 1} m JOIN d{j} d USING (vec_id))"
        )
        parts.append(
            f"t{j} AS (SELECT vec_id, md FROM md{j} ORDER BY md DESC, vec_id LIMIT 1)"
        )
    sel = " UNION ALL ".join(
        f"SELECT {j}::BIGINT AS step, vec_id, md AS dist_to_set FROM t{j}"
        for j in range(1, k)
    )
    return (
        ", ".join(parts)
        + " SELECT 0::BIGINT AS step, 0::BIGINT AS vec_id, 0::BIGINT AS dist_to_set "
        + "UNION ALL " + sel
    )


def _pages_pr_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for the url-keyed flagship: generator edges (shared CTE)
    -> 30-iteration PageRank over the symmetrized multigraph -> top-25
    by integer-scaled score. Mirrors pipelines/pages.py::
    build_link_graph at n_pages=2000 (the size
    queries()['pages_linkgraph_pagerank'] uses at every sf)."""
    return (
        f"WITH RECURSIVE {_pages_edges_cte(n, seed)}, "
        "es AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e), "
        "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
        "pr AS ( "
        "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
        "  UNION ALL "
        "  SELECT p.it + 1, ee.dst, 0.15/nn.n + 0.85 * SUM(p.val / p.d), dd.d "
        "  FROM pr p CROSS JOIN nn JOIN es ee ON ee.src = p.id "
        "       JOIN deg dd ON dd.id = ee.dst "
        "  WHERE p.it < 30 GROUP BY p.it, ee.dst, dd.d, nn.n) "
        "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
        "FROM pr WHERE it = 30 ORDER BY score_e8 DESC, vertex LIMIT 25"
    )


def _domain_pr_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for the domain-graph contraction: generator edges (shared
    CTE) -> contract endpoints to their host (split_part '/' 3) ->
    parallel page links become integer edge weight -> 30-iteration
    weight-proportional PageRank over the symmetrized weighted graph ->
    top-25 domains. Mirrors testdata.q_domain_pagerank."""
    return (
        f"WITH RECURSIVE {_pages_edges_cte(n, seed)}, "
        "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
        "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
        "esw AS (SELECT s AS src, d AS dst, w FROM de UNION ALL SELECT d, s, w FROM de), "
        "deg AS (SELECT src AS id, sum(w) AS wd FROM esw GROUP BY src), "
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
        "pr AS ( "
        "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, wd FROM deg "
        "  UNION ALL "
        "  SELECT p.it + 1, e2.dst, 0.15/nn.n + 0.85 * SUM(p.val * e2.w / p.wd), dd.wd "
        "  FROM pr p CROSS JOIN nn JOIN esw e2 ON e2.src = p.id "
        "       JOIN deg dd ON dd.id = e2.dst "
        "  WHERE p.it < 30 GROUP BY p.it, e2.dst, dd.wd, nn.n) "
        "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
        "FROM pr WHERE it = 30 ORDER BY score_e8 DESC, vertex LIMIT 25"
    )


def _trustrank_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for TrustRank on the contracted domain graph: same
    weighted symmetrized recursion as _domain_pr_sql, but the restart
    mass 0.15/|S| lands only on the three trusted seed hosts. Mirrors
    testdata.q_trustrank_domains / algorithms.TrustRank."""
    seeds = ", ".join(f"'site-{i:05d}.example'" for i in range(3))
    return (
        f"WITH RECURSIVE {_pages_edges_cte(n, seed)}, "
        "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
        "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
        "esw AS (SELECT s AS src, d AS dst, w FROM de UNION ALL SELECT d, s, w FROM de), "
        "deg AS (SELECT src AS id, sum(w) AS wd FROM esw GROUP BY src), "
        f"sn AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM deg WHERE id IN ({seeds})), "
        "pr AS ( "
        "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, wd FROM deg "
        "  UNION ALL "
        f"  SELECT p.it + 1, e2.dst, "
        f"    (CASE WHEN e2.dst IN ({seeds}) THEN 0.15/sn.ns ELSE 0.0 END) "
        "     + 0.85 * SUM(p.val * e2.w / p.wd), dd.wd "
        "  FROM pr p CROSS JOIN sn JOIN esw e2 ON e2.src = p.id "
        "       JOIN deg dd ON dd.id = e2.dst "
        "  WHERE p.it < 30 GROUP BY p.it, e2.dst, dd.wd, sn.ns) "
        "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
        "FROM pr WHERE it = 30 ORDER BY score_e8 DESC, vertex LIMIT 25"
    )



def _spam_mass_sql(n: int = 2000, seed: int = 42) -> str:
    """Oracle for absolute spam mass: the _domain_pr_sql and
    _trustrank_sql recursions over ONE shared contracted-graph chain,
    joined at iteration 30; mass_e8 is the integer e8 difference."""
    seeds = ", ".join(f"'site-{i:05d}.example'" for i in range(3))
    return (
        f"WITH RECURSIVE {_pages_edges_cte(n, seed)}, "
        "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
        "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
        "esw AS (SELECT s AS src, d AS dst, w FROM de UNION ALL SELECT d, s, w FROM de), "
        "deg AS (SELECT src AS id, sum(w) AS wd FROM esw GROUP BY src), "
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
        f"sn AS (SELECT CAST(count(*) AS DOUBLE) AS ns FROM deg WHERE id IN ({seeds})), "
        "pr AS ( "
        "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, wd FROM deg "
        "  UNION ALL "
        "  SELECT p.it + 1, e2.dst, 0.15/nn.n + 0.85 * SUM(p.val * e2.w / p.wd), dd.wd "
        "  FROM pr p CROSS JOIN nn JOIN esw e2 ON e2.src = p.id "
        "       JOIN deg dd ON dd.id = e2.dst "
        "  WHERE p.it < 30 GROUP BY p.it, e2.dst, dd.wd, nn.n), "
        "tr AS ( "
        "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, wd FROM deg "
        "  UNION ALL "
        f"  SELECT p.it + 1, e2.dst, "
        f"    (CASE WHEN e2.dst IN ({seeds}) THEN 0.15/sn.ns ELSE 0.0 END) "
        "     + 0.85 * SUM(p.val * e2.w / p.wd), dd.wd "
        "  FROM tr p CROSS JOIN sn JOIN esw e2 ON e2.src = p.id "
        "       JOIN deg dd ON dd.id = e2.dst "
        "  WHERE p.it < 30 GROUP BY p.it, e2.dst, dd.wd, sn.ns) "
        "SELECT p.id AS host, "
        "  CAST(ROUND(p.val * 1e8) AS BIGINT) AS pr_e8, "
        "  CAST(ROUND(t.val * 1e8) AS BIGINT) AS tr_e8, "
        "  (CAST(ROUND(p.val * 1e8) AS BIGINT) "
        "   - CAST(ROUND(t.val * 1e8) AS BIGINT)) AS mass_e8 "
        "FROM (SELECT id, val FROM pr WHERE it = 30) p "
        "JOIN (SELECT id, val FROM tr WHERE it = 30) t ON t.id = p.id"
    )

def _user_hll_sql(p: int = 8) -> str:
    """Mirror testdata.q_user_hll: FNV-1a of the decimal user_id,
    register = top p bits, rho = leading zeros of the low 64-p bits +1
    (exact bit length via length(bin(x))), max per register."""
    w = 64 - p
    return (
        "WITH RECURSIVE "
        "toks AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS tok FROM events), "
        f"{_FNV_TOK}, "
        f"mixed AS (SELECT tok, {_splitmix_cols('h', 'hs')} FROM tokh), "
        "regs AS (SELECT "
        f"  (hs >> {w})::BIGINT AS reg, "
        f"  (CASE WHEN (hs & ((1::UBIGINT << {w}) - 1)) = 0 THEN {w + 1} "
        f"   ELSE {w} - length(bin(hs & ((1::UBIGINT << {w}) - 1))) + 1 END)::BIGINT AS rho "
        "  FROM mixed) "
        "SELECT reg, max(rho)::BIGINT AS rho FROM regs GROUP BY reg"
    )


def _kcore_sql(k: int = 20) -> str:
    """k-core oracle as a recursive CTE with ONE reference to the
    working table per round: the edge set is kept symmetric (both
    directions), per-row degree comes from a window over u, and the
    partner endpoint's degree is read off the MIRROR row via a second
    window over the undirected pair (least,greatest) — min of the two
    mirror degrees = min(deg(u), deg(v)). 60 rounds; the fixpoint is
    stable so extra rounds are no-ops."""
    return (
        f"WITH RECURSIVE {_EB_LINEITEM}, "
        "r AS ( "
        "  SELECT 0 AS it, u, v FROM "
        "    (SELECT src AS u, dst AS v FROM eb UNION ALL SELECT dst, src FROM eb) "
        "  UNION ALL "
        "  SELECT it + 1, u, v FROM ( "
        "    SELECT it, u, v, "
        "      min(du) OVER (PARTITION BY it, least(u, v), greatest(u, v)) AS mindeg "
        "    FROM (SELECT it, u, v, count(*) OVER (PARTITION BY it, u) AS du FROM r "
        "          WHERE it < 60)) "
        f"  WHERE mindeg >= {k}) "
        "SELECT DISTINCT u AS vertex FROM r WHERE it = 60"
    )


def _densest_sql(max_rounds: int = 60) -> str:
    """Densest-subgraph peeling oracle (one working-table reference
    per round, kcore-style): symmetric edge rows; per-row min
    endpoint degree via the mirror window; the round's V comes from
    a dense_rank max (COUNT(DISTINCT) is not a window aggregate) and
    2E from a plain count window; an edge survives iff
    min(deg) * 4V > 5 * 2E (Bahmani eps=1/4 peel)."""
    return (
        f"WITH RECURSIVE {_EB_CLIQUEY}, "
        "r AS ( "
        "  SELECT 0 AS it, u, v FROM "
        "    (SELECT a AS u, b AS v FROM ebq UNION ALL SELECT b, a FROM ebq) "
        "  UNION ALL "
        "  SELECT it + 1, u, v FROM ( "
        "    SELECT it, u, v, mindeg, "
        "      count(*) OVER (PARTITION BY it) AS esym, "
        "      max(dr) OVER (PARTITION BY it) AS nv "
        "    FROM ( "
        "      SELECT it, u, v, "
        "        min(du) OVER (PARTITION BY it, least(u, v), greatest(u, v)) AS mindeg, "
        "        dense_rank() OVER (PARTITION BY it ORDER BY u) AS dr "
        "      FROM (SELECT it, u, v, count(*) OVER (PARTITION BY it, u) AS du "
        f"            FROM r WHERE it < {max_rounds}))) "
        "  WHERE mindeg * 4 * nv > 5 * esym) "
        "SELECT it AS round, count(DISTINCT u)::BIGINT AS n_vertices, "
        "(count(*) // 2)::BIGINT AS n_edges, "
        "(count(*) * 500000 // count(DISTINCT u))::BIGINT AS density_e6 "
        "FROM r GROUP BY it"
    )


_EB_CLIQUEY = (
    "ebq AS ( "
    "  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM ( "
    "    SELECT (o_orderkey % 1000) AS x, "
    "           (o_orderkey % 1000) - ((o_orderkey % 1000) % 8) "
    "             + (o_custkey % 8) AS y FROM orders "
    "    UNION ALL "
    "    SELECT (o_orderkey % 1000), (o_custkey % 1000) FROM orders "
    "    WHERE (o_orderkey // 1000) % 7 = 0 "
    "  ) WHERE x <> y)"
)


def _coloring_sql(seed: int = 7, max_rounds: int = 40) -> str:
    """Jones-Plassmann greedy coloring oracle mirroring
    algorithms.GreedyColoring on the planted-block graph: the working
    table carries every directed edge with BOTH endpoint colors; per
    round each row computes both endpoints' per-round splitmix
    priorities inline, a min-window over uncolored neighbors gives the
    strict-min win test, a bit_or-window over colored neighbors gives
    the color mask, and mex = log2 of the lowest zero bit — ONE
    reference to the recursive table per round (the kcore/mis
    mirror-window pattern extended to bitmask state)."""
    acc = f"((({seed} + it)::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT"
    prio_cols = (
        f"xor({acc}, a::UBIGINT) AS acc_a, {_splitmix_cols('acc_a', 'sma')}, "
        f"xor({acc}, b::UBIGINT) AS acc_b, {_splitmix_cols('acc_b', 'smb')}, "
        "(sma >> 11)::BIGINT AS pr_a, (smb >> 11)::BIGINT AS pr_b"
    )
    mex_a = "CAST(round(log2((((~msk_a) & (msk_a + 1)))::DOUBLE)) AS BIGINT)"
    mex_b = "CAST(round(log2((((~msk_b) & (msk_b + 1)))::DOUBLE)) AS BIGINT)"
    return (
        f"WITH RECURSIVE {_EB_CLIQUEY}, "
        "r AS ( "
        "  SELECT 0 AS it, a, b, -1::BIGINT AS ca, -1::BIGINT AS cb FROM "
        "    (SELECT a, b FROM ebq UNION ALL SELECT b, a FROM ebq) "
        "  UNION ALL "
        "  SELECT it + 1, a, b, "
        f"    CASE WHEN ca = -1 AND (mn_a IS NULL OR pr_a < mn_a) THEN {mex_a} "
        "         ELSE ca END, "
        f"    CASE WHEN cb = -1 AND (mn_b IS NULL OR pr_b < mn_b) THEN {mex_b} "
        "         ELSE cb END "
        "  FROM ( "
        "    SELECT it, a, b, ca, cb, pr_a, pr_b, "
        "      min(CASE WHEN cb = -1 THEN pr_b END) OVER (PARTITION BY it, a) AS mn_a, "
        "      min(CASE WHEN ca = -1 THEN pr_a END) OVER (PARTITION BY it, b) AS mn_b, "
        "      COALESCE(bit_or(CASE WHEN cb >= 0 THEN (1::BIGINT << cb) END) "
        "               OVER (PARTITION BY it, a), 0) AS msk_a, "
        "      COALESCE(bit_or(CASE WHEN ca >= 0 THEN (1::BIGINT << ca) END) "
        "               OVER (PARTITION BY it, b), 0) AS msk_b "
        f"    FROM (SELECT it, a, b, ca, cb, {prio_cols} FROM r "
        f"          WHERE it < {max_rounds}))) "
        f"SELECT DISTINCT a::BIGINT AS vertex, ca::BIGINT AS color "
        f"FROM r WHERE it = {max_rounds}"
    )


def _mis_sql(seed: int = 7, max_rounds: int = 50) -> str:
    """Luby MIS oracle mirroring algorithms.MaximalIndependentSet on
    the lineitem graph: the recursive working table holds the directed
    edges among STILL-UNDECIDED vertices (both directions, like
    kcore's); per round each row computes both endpoints' 53-bit
    splitmix priorities directly from (round, id), a window over the
    first endpoint gives the strict-min join test, and a second window
    layer propagates "a neighbor joined" (the out test) — ONE
    reference to the working table per round. A vertex that vanishes
    from the table without an out-mark joined (possibly as an
    isolated leftover), so MIS = all vertices minus the out-set,
    recomputed from the retained per-round history."""
    acc = f"((({seed} + it)::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT"
    prio_cols = (
        f"xor({acc}, a::UBIGINT) AS acc_a, {_splitmix_cols('acc_a', 'sma')}, "
        f"xor({acc}, b::UBIGINT) AS acc_b, {_splitmix_cols('acc_b', 'smb')}, "
        "(sma >> 11)::BIGINT AS pr_a, (smb >> 11)::BIGINT AS pr_b"
    )
    join_flags = (
        "pr_a < min(pr_b) OVER (PARTITION BY it, a) AS j_a, "
        "pr_b < min(pr_a) OVER (PARTITION BY it, b) AS j_b"
    )
    return (
        f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
        "r AS ( "
        "  SELECT 0 AS it, src AS a, dst AS b FROM es "
        "  UNION ALL "
        "  SELECT it + 1, a, b FROM ( "
        "    SELECT it, a, b, j_a, j_b, "
        "      bool_or(j_b) OVER (PARTITION BY it, a) AS out_a, "
        "      bool_or(j_a) OVER (PARTITION BY it, b) AS out_b "
        f"    FROM (SELECT it, a, b, {join_flags} "
        f"          FROM (SELECT it, a, b, {prio_cols} FROM r "
        f"                WHERE it < {max_rounds}))) "
        "  WHERE NOT j_a AND NOT j_b AND NOT out_a AND NOT out_b), "
        "outs AS ( "
        "  SELECT DISTINCT a AS vertex FROM ( "
        "    SELECT it, a, j_a, bool_or(j_b) OVER (PARTITION BY it, a) AS out_a "
        f"    FROM (SELECT it, a, b, {join_flags} "
        f"          FROM (SELECT it, a, b, {prio_cols} FROM r))) "
        "  WHERE NOT j_a AND out_a) "
        "SELECT v.id AS vertex, "
        "  (CASE WHEN o.vertex IS NULL THEN 1 ELSE 0 END)::BIGINT AS in_mis "
        "FROM v LEFT JOIN outs o ON o.vertex = v.id"
    )


def _doc_split_sql() -> str:
    """Mirror testdata.q_doc_split: FNV-1a of the decimal doc_id
    (recursive CTE), bucket = h % 10, 8/1/1 split."""
    return (
        "WITH RECURSIVE "
        "toks AS (SELECT DISTINCT CAST(doc_id AS VARCHAR) AS tok FROM documents), "
        f"{_FNV_TOK} "
        "SELECT d.doc_id, (th.h % 10)::BIGINT AS bucket10, "
        "CASE WHEN th.h % 10 < 8 THEN 'train' WHEN th.h % 10 = 8 THEN 'val' "
        "ELSE 'test' END AS split "
        "FROM documents d JOIN tokh th ON th.tok = CAST(d.doc_id AS VARCHAR)"
    )


def _ngram_jaccard_sql() -> str:
    """Oracle for stages.dedup.ngram_jaccard_join at threshold 0.5 /
    df_cap 128: same shingles, same GLOBAL df filter, same exact
    integer half-up jaccard_e6 — straight set algebra in SQL."""
    return (
        "WITH "
        "docs0 AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm "
        "          FROM documents WHERE trim(text) <> ''), "
        "words AS (SELECT doc_id, norm, regexp_split_to_array(norm, ' ') AS arr FROM docs0), "
        "sh AS ( "
        "  SELECT DISTINCT doc_id, g FROM ( "
        "    SELECT doc_id, arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g "
        "    FROM words, LATERAL unnest(generate_series(1, len(arr) - 2)) t(i) "
        "    WHERE len(arr) >= 3 "
        "    UNION ALL "
        "    SELECT doc_id, norm AS g FROM words WHERE len(arr) BETWEEN 1 AND 2)), "
        "sdf AS (SELECT g, count(*) AS c FROM sh GROUP BY g), "
        "kept AS (SELECT sh.doc_id, sh.g FROM sh JOIN sdf ON sdf.g = sh.g WHERE sdf.c <= 128), "
        "sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id), "
        "inter AS ( "
        "  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS i "
        "  FROM kept x JOIN kept y ON y.g = x.g AND x.doc_id < y.doc_id GROUP BY 1, 2), "
        "sc AS ( "
        "  SELECT a, b, (2 * i * 1000000 + (sa.n + sb.n - i)) // (2 * (sa.n + sb.n - i)) AS je "
        "  FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b) "
        "SELECT a, b, je::BIGINT AS jaccard_e6 FROM sc WHERE je >= 500000"
    )


_EBW_LINEITEM = (
    "ebw AS (SELECT DISTINCT l_orderkey % 2000 AS src, "
    "2000 + (l_partkey % 2000) AS dst, "
    "CAST(1 + (l_orderkey + l_partkey) % 5 AS DOUBLE) AS w FROM lineitem)"
)


def _pagerank_weighted_sql() -> str:
    """Weighted PageRank oracle: the reference recurrence with
    weight-proportional distribution — contribution of u to v per edge
    is val(u) * w / wdeg(u), wdeg = sum of incident weights on the
    symmetrized multigraph (same derivation as q_pagerank_weighted)."""
    return (
        f"WITH RECURSIVE {_EBW_LINEITEM}, "
        "esw AS (SELECT src, dst, w FROM ebw UNION ALL SELECT dst, src, w FROM ebw), "
        "deg AS (SELECT src AS id, sum(w) AS wd FROM esw GROUP BY src), "
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
        "pr AS ( "
        "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, wd FROM deg "
        "  UNION ALL "
        "  SELECT p.it + 1, e.dst, 0.15/nn.n + 0.85 * SUM(p.val * e.w / p.wd), dd.wd "
        "  FROM pr p CROSS JOIN nn JOIN esw e ON e.src = p.id "
        "       JOIN deg dd ON dd.id = e.dst "
        "  WHERE p.it < 30 GROUP BY p.it, e.dst, dd.wd, nn.n) "
        "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
        "FROM pr WHERE it = 30"
    )


def _sssp_weighted_sql() -> str:
    """Weighted SSSP oracle: Bellman-Ford rounds as a recursive CTE
    over the symmetrized weighted multigraph (same derivation as
    testdata.edges_lineitem_weighted)."""
    return (
        f"WITH RECURSIVE {_EBW_LINEITEM}, "
        "esw AS (SELECT src, dst, w FROM ebw UNION ALL SELECT dst, src, w FROM ebw), "
        "v AS (SELECT DISTINCT src AS id FROM esw), "
        "srcv AS (SELECT min(id) AS s FROM v), "
        "relax AS (SELECT src, dst, w FROM esw "
        "          UNION ALL SELECT id, id, 0 FROM v), "
        "d AS ( "
        "  SELECT 0 AS it, id, CASE WHEN id = (SELECT s FROM srcv) "
        "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
        "  UNION ALL "
        "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d p "
        "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst) "
        "SELECT id AS vertex, CASE WHEN dist >= 1e17 THEN NULL "
        "ELSE CAST(dist AS BIGINT) END AS dist FROM d WHERE it = 60"
    )


def _earliest_arrival_sql() -> str:
    """Temporal earliest-arrival oracle: min-fixpoint of
    arr(v) = min over symmetrized edges (u,v,t) of GREATEST(t, arr(u)),
    edges stamped with the lineitem ship HOUR. Written FRONTIER-style
    (no fixed round cap — the temporal relaxation took ~75 synchronous
    rounds at sf0.01, so an iteration-indexed CTE is fragile): the
    recursive term emits improved (id, arr) candidates, UNION dedups
    against everything already produced so recursion stops exactly at
    the fixpoint, and the final per-id MIN over all emitted candidates
    is the optimum (every candidate is an achievable arrival; every
    improvement re-enters the working table and re-scatters)."""
    return (
        "WITH RECURSIVE ebt AS (SELECT DISTINCT l_orderkey % 2000 AS src, "
        "2000 + (l_partkey % 2000) AS dst, "
        "CAST(epoch_us(l_shipdate) // 3600000000 AS DOUBLE) AS t FROM lineitem), "
        "est AS (SELECT src, dst, t FROM ebt UNION ALL SELECT dst, src, t FROM ebt), "
        "v AS (SELECT DISTINCT src AS id FROM est), "
        "srcv AS (SELECT min(id) AS s FROM v), "
        "d AS ( "
        "  SELECT id, CASE WHEN id = (SELECT s FROM srcv) "
        "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS arr FROM v "
        "  UNION "
        "  SELECT r.dst AS id, MIN(GREATEST(p.arr, r.t)) AS arr "
        "  FROM d p JOIN est r ON r.src = p.id GROUP BY r.dst) "
        "SELECT id AS vertex, CASE WHEN MIN(arr) >= 1e17 THEN NULL "
        "ELSE CAST(MIN(arr) AS BIGINT) END AS arrival_hour FROM d GROUP BY id"
    )


def _anf_sql() -> str:
    """ANF oracle: per-vertex FM bitmap = lowest set bit of the low
    40 bits of splitmix64(id + seed) (replayed via HUGEINT split
    multiplies), then 4 synchronous rounds of bit_or over the
    symmetrized adjacency + self-loops; anf_units = lowest UNSET bit
    of the final mask."""
    seed = 11
    src = f"((id::HUGEINT + {seed}) % {_M64}::HUGEINT)"
    return (
        f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
        "a AS (SELECT src, dst FROM es UNION ALL SELECT id, id FROM v), "
        f"zz AS (SELECT id, {_splitmix_cols(src, 'z')} FROM v), "
        "init AS (SELECT id, CASE WHEN zl = 0 THEN 549755813888 "
        "         ELSE zl & (-zl) END AS mask FROM ( "
        "  SELECT id, (z::HUGEINT % 1099511627776)::BIGINT AS zl FROM zz)), "
        "m AS ( "
        "  SELECT 0 AS it, id, mask FROM init "
        "  UNION ALL "
        "  SELECT p.it + 1, a.dst AS id, bit_or(p.mask) FROM m p "
        "  JOIN a ON a.src = p.id WHERE p.it < 4 GROUP BY p.it, a.dst) "
        "SELECT id AS vertex, ((~mask) & (mask + 1))::BIGINT AS anf_units "
        "FROM m WHERE it = 4"
    )


def _random_failure_sql(mods=(0, 8, 4, 2)) -> str:
    """Random-failure oracle: drop vertices with splitmix64(id) % mod
    == 0 (mod 0 = none), min-label CC recursion over survivors."""
    parts = [f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "]
    parts.append(
        f"vsm AS (SELECT id, {_splitmix_cols('id', 'sm')} "
        "FROM (SELECT DISTINCT src AS id FROM es)), "
    )
    for m in mods:
        parts.append(
            f"bad{m} AS (SELECT id FROM vsm WHERE {('sm % ' + str(m) + ' = 0') if m else 'false'}), "
            f"es{m} AS (SELECT src, dst FROM es "
            f"WHERE src NOT IN (SELECT id FROM bad{m}) "
            f"AND dst NOT IN (SELECT id FROM bad{m})), "
            f"v{m} AS (SELECT DISTINCT src AS id FROM es{m}), "
            f"relax{m} AS (SELECT src, dst FROM es{m} "
            f"             UNION ALL SELECT id, id FROM v{m}), "
            f"c{m} AS ( "
            f"  SELECT 0 AS it, id, id AS lab FROM v{m} "
            "  UNION ALL "
            f"  SELECT p.it + 1, rr.dst, MIN(p.lab) FROM c{m} p "
            f"  JOIN relax{m} rr ON rr.src = p.id WHERE p.it < 60 "
            "  GROUP BY p.it, rr.dst), "
            f"s{m} AS (SELECT lab, count(*) AS n FROM c{m} WHERE it = 60 GROUP BY lab), "
        )
    selects = [
        f"SELECT {m} AS mod, (SELECT sum(n) FROM s{m})::BIGINT AS n_vertices, "
        f"(SELECT count(*) FROM s{m})::BIGINT AS n_components, "
        f"(SELECT max(n) FROM s{m})::BIGINT AS largest_cc"
        for m in mods
    ]
    body = "".join(parts)
    return body.rstrip(", ") + " " + " UNION ALL ".join(selects)


def _robustness_sql(ks=(0, 20, 50)) -> str:
    """Attack-tolerance oracle: per k, drop the top-k hubs (deg desc,
    id asc) and run the min-label CC recursion over the survivors;
    report vertices / components / largest component."""
    parts = [
        f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, ",
        "degs AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), ",
        "topk AS (SELECT id, row_number() OVER (ORDER BY d DESC, id) AS r FROM degs), ",
    ]
    for k in ks:
        parts.append(
            f"es{k} AS (SELECT src, dst FROM es "
            f"WHERE src NOT IN (SELECT id FROM topk WHERE r <= {k}) "
            f"AND dst NOT IN (SELECT id FROM topk WHERE r <= {k})), "
            f"v{k} AS (SELECT DISTINCT src AS id FROM es{k}), "
            f"relax{k} AS (SELECT src, dst FROM es{k} "
            f"             UNION ALL SELECT id, id FROM v{k}), "
            f"c{k} AS ( "
            f"  SELECT 0 AS it, id, id AS lab FROM v{k} "
            "  UNION ALL "
            f"  SELECT p.it + 1, rr.dst, MIN(p.lab) FROM c{k} p "
            f"  JOIN relax{k} rr ON rr.src = p.id WHERE p.it < 60 "
            "  GROUP BY p.it, rr.dst), "
            f"s{k} AS (SELECT lab, count(*) AS n FROM c{k} WHERE it = 60 GROUP BY lab), "
        )
    selects = [
        f"SELECT {k} AS k_removed, (SELECT sum(n) FROM s{k})::BIGINT AS n_vertices, "
        f"(SELECT count(*) FROM s{k})::BIGINT AS n_components, "
        f"(SELECT max(n) FROM s{k})::BIGINT AS largest_cc"
        for k in ks
    ]
    body = "".join(parts)
    # strip the trailing comma-space from the last CTE
    return body.rstrip(", ") + " " + " UNION ALL ".join(selects)


def _embedding_neardup_sql() -> str:
    """Oracle for testdata.q_embedding_neardup: reproduce the planted
    augmentation (x + 0.02 copies of vec_id < 16), the 12-hyperplane
    sign-pattern LSH bucket (plane constants imported from the engine,
    inlined as full-precision literals), and the exact cosine >= 0.9
    verify — pairs must share a bucket, exactly like the engine."""
    from distributed_graph_computing_platform_ray.functions.hashing import hyperplanes

    P = hyperplanes(64, 12)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(e, [{', '.join(repr(float(v)) for v in P[j])}]) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(P.shape[0])
    )
    return (
        "WITH aug AS ( "
        "  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
        "  UNION ALL "
        "  SELECT vec_id + 1000000, "
        "         list_transform(CAST(embedding AS DOUBLE[]), x -> x + 0.02) "
        "  FROM embeddings WHERE vec_id < 16), "
        f"b AS (SELECT vec_id, e, ({bucket_terms}) AS lsh FROM aug) "
        "SELECT x.vec_id AS a, y.vec_id AS b, "
        "CAST(ROUND(list_cosine_similarity(x.e, y.e) * 1e6) AS BIGINT) AS cos_e6 "
        "FROM b x JOIN b y ON y.lsh = x.lsh AND x.vec_id < y.vec_id "
        "WHERE list_cosine_similarity(x.e, y.e) >= 0.9"
    )


def _multimodal_sql() -> str:
    """Mirror stages.multimodal.DecodeMedia's deterministic stub over
    the documents-as-media derivation in testdata.q_multimodal_decode:
    payload = utf-8 text bytes, media_type = doc_id % 3 cycle, and the
    stub dimensions derive from a sha256 hex-digest chain (one block
    for n=4 words): block = sha256(sha256(payload)), word w = little-
    endian uint64 of bytes [8w, 8w+8), d = (word >> 11) / 2^53."""

    def word(w: int) -> str:
        # LE: byte b of word w sits at hex chars [2*(8w+b)+1, +2)
        parts = ", ".join(f"substr(blk, {2 * (8 * w + b) + 1}, 2)" for b in range(7, -1, -1))
        return f"CAST(concat('0x', {parts}) AS UBIGINT)"

    def dim(w: int) -> str:
        return f"(({word(w)} >> 11) / 9007199254740992.0)"

    return (
        "WITH b AS (SELECT doc_id, text, sha256(sha256(text)) AS blk FROM documents) "
        "SELECT doc_id AS media_id, "
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type, "
        f"CAST(floor(64 + {dim(0)} * 1984) AS INTEGER) AS width, "
        f"CAST(floor(64 + {dim(1)} * 1016) AS INTEGER) AS height, "
        f"CAST(floor(1 + {dim(2)} * 299) AS INTEGER) AS n_frames, "
        f"CAST(floor({dim(3)} * 600000) AS BIGINT) AS duration_ms, "
        "octet_length(encode(text))::BIGINT AS n_bytes "
        "FROM b"
    )


def _hex_word_le(hexcol: str, w: int) -> str:
    """Little-endian uint64 from bytes [8w, 8w+8) of a 64-char hex
    digest column."""
    parts = ", ".join(f"substr({hexcol}, {2 * (8 * w + b) + 1}, 2)" for b in range(7, -1, -1))
    return f"CAST(concat('0x', {parts}) AS UBIGINT)"


def _media_features_sql(dim: int = 8) -> str:
    """Mirror stages.multimodal.MediaFeatures' stub: dim digest floats
    (hex-chain sha256 blocks), cast through REAL exactly like the
    engine's float32 features, then integer-scaled."""
    cols = []
    for j in range(dim):
        blk = f"b{j // 4 + 1}"
        d = f"(({_hex_word_le(blk, j % 4)} >> 11) / 9007199254740992.0)"
        cols.append(
            f"CAST(ROUND(CAST(CAST({d} AS REAL) AS DOUBLE) * 1e6) AS BIGINT) AS f{j}_e6"
        )
    n_blocks = (dim * 8 + 31) // 32
    chain = "SELECT doc_id, sha256(sha256(text)) AS b1 FROM documents"
    for b in range(2, n_blocks + 1):
        chain = f"SELECT doc_id, b1{''.join(f', b{k}' for k in range(2, b))}, " \
                f"sha256(b{b - 1}) AS b{b} FROM ({chain})"
    return f"SELECT doc_id AS media_id, {', '.join(cols)} FROM ({chain})"


def _frame_sample_sql(n: int = 4) -> str:
    """Mirror stages.multimodal.FrameSample's stub byte-range frames:
    step = max(1, len//n), frame s = payload[s*step:(s+1)*step]."""
    return (
        "SELECT doc_id AS media_id, s::BIGINT AS frame_idx, "
        "md5(substr(text, s * step + 1, step)) AS frame_md5, "
        "length(substr(text, s * step + 1, step))::BIGINT AS frame_len "
        f"FROM (SELECT doc_id, text, greatest(1, length(text) // {n}) AS step FROM documents), "
        f"LATERAL unnest(generate_series(0, {n - 1})) t(s)"
    )


def _quality_sql() -> str:
    """Mirror functions.text.quality_score: the band tests compare the
    ROUND(...,6)-ed ratios exactly as Python does, and the composite
    score is the exact integer product of the decimal factors."""
    en = _stops_sql("en")
    return (
        "WITH f AS ( "
        "  SELECT doc_id, length(text)::BIGINT AS n_chars, "
        "    (CASE WHEN trim(text) = '' THEN 0 ELSE "
        "     length(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT AS n_words, "
        "    length(regexp_replace(text, '\\s', '', 'g'))::BIGINT AS sum_wlen, "
        "    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::BIGINT AS n_punct "
        "  FROM documents), "
        "sw AS ( "
        "  SELECT doc_id, count(*) FILTER ( "
        f"    lower(word) IN {en}) AS stop_hits "
        "  FROM (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word "
        "        FROM documents WHERE trim(text) <> '') GROUP BY doc_id), "
        "g AS ( "
        "  SELECT f.doc_id, "
        "    CASE WHEN n_words < 5 THEN 2 WHEN n_words < 20 THEN 7 ELSE 10 END AS f1, "
        "    CASE WHEN n_words = 0 OR NOT (ROUND(sum_wlen / n_words::DOUBLE, 6) "
        "         BETWEEN 2.0 AND 12.0) THEN 5 ELSE 10 END AS f2, "
        "    CASE WHEN ROUND(n_punct / greatest(1, n_chars)::DOUBLE, 6) > 0.2 THEN 4 ELSE 10 END AS f3, "
        "    CASE WHEN ROUND(coalesce(stop_hits, 0) / greatest(1, n_words)::DOUBLE, 6) < 0.01 "
        "         THEN 8 ELSE 10 END AS f4 "
        "  FROM f LEFT JOIN sw ON sw.doc_id = f.doc_id) "
        "SELECT doc_id, (1000000::BIGINT * f1 * f2 * f3 * f4 // 10000)::BIGINT AS quality_e6 FROM g"
    )


def _classify_sql(src: str = "documents") -> str:
    """Mirror stages/classify.py::HashClassifier over ``src``."""
    return (
        "WITH RECURSIVE "
        "toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        f"         FROM {src} WHERE trim(text) <> ''), "
        "cnt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2), "
        f"{_FNV_TOK}, "
        "cc AS (SELECT cl FROM unnest(generate_series(0, 3)) t(cl)), "
        "w AS (SELECT tokh.tok, cc.cl, xor(tokh.h, cl::UBIGINT) AS x, "
        f"      {_splitmix_cols('x', 'hw')}, (hw % 1001)::BIGINT - 500 AS wt "
        "      FROM tokh CROSS JOIN cc), "
        "sc AS (SELECT cnt.doc_id, w.cl, sum(cnt.c * w.wt) AS s "
        "       FROM cnt JOIN w ON w.tok = cnt.tok GROUP BY 1, 2) "
        "SELECT doc_id, cl::BIGINT AS label, s::BIGINT AS score FROM sc "
        "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, cl) = 1"
    )


def _corpus_curation_sql(thr: int = 700_000, cap: int = 512) -> str:
    """Composed end-to-end oracle: quality filter -> md5 keep-min
    dedup -> classifier -> prefix-sum packing, mirroring
    pipelines/testdata.q_corpus_curation stage for stage."""
    return (
        f"WITH q AS ({_quality_sql()}), "
        "ded AS ( "
        "  SELECT d.doc_id, d.text FROM documents d JOIN q ON q.doc_id = d.doc_id "
        f"  WHERE q.quality_e6 >= {thr} "
        "  QUALIFY row_number() OVER (PARTITION BY md5(d.text) ORDER BY d.doc_id) = 1), "
        f"cls AS ({_classify_sql('ded')}), "
        "tk AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 "
        "       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ntok FROM ded), "
        "s AS (SELECT doc_id, COALESCE(SUM(ntok) OVER (ORDER BY doc_id "
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st FROM tk) "
        "SELECT s.doc_id, cls.label, s.st::BIGINT AS start_tok, "
        f"(s.st // {cap})::BIGINT AS bin_id "
        "FROM s JOIN cls ON cls.doc_id = s.doc_id"
    )


def _random_walks_sql(num_steps: int = 8, walker_mod: int = 5) -> str:
    """Replay stages/walks.py exactly: step choice =
    splitmix64(((walker*FNV)^step)*FNV ^ cur) % deg(cur), neighbor
    rank in ascending-id order (utils.mix64 reproduced with the same
    HUGEINT split multiplies verified bit-equal for the generator)."""
    return (
        f"WITH RECURSIVE {_U_ORDERS}, "
        "es2 AS (SELECT a AS src, b AS dst FROM u UNION ALL SELECT b, a FROM u), "
        "adj AS (SELECT src, dst, "
        "        row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk FROM es2), "
        "deg AS (SELECT src AS id, count(*) AS d FROM es2 GROUP BY src), "
        "walk AS ( "
        f"  SELECT 0 AS step, id AS walker, id AS cur FROM deg WHERE id % {walker_mod} = 0 "
        "  UNION ALL "
        "  SELECT t.step + 1, t.walker, a.dst "
        f"  FROM (SELECT step, walker, cur, {_wrap_mul('walker::HUGEINT', _FNV64)} AS m1, "
        "          xor((m1)::UBIGINT, step::UBIGINT) AS m2, "
        f"         {_wrap_mul('(m2)::HUGEINT', _FNV64)} AS m3, "
        "          xor((m3)::UBIGINT, cur::UBIGINT) AS m4, "
        f"         {_splitmix_cols('m4', 'h')} "
        f"        FROM walk WHERE step < {num_steps}) t "
        "  JOIN deg d ON d.id = t.cur "
        "  JOIN adj a ON a.src = t.cur AND a.rnk = (t.h % d.d::UBIGINT)::BIGINT) "
        "SELECT walker::BIGINT AS walker, step::BIGINT AS step, cur::BIGINT AS vertex FROM walk"
    )


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale synthetic pages: generate
    Common-Crawl-style pages -> extract links -> dictionary-encoded CSR
    graph -> 30-iteration PageRank -> (vertex url, score)."""
    from distributed_graph_computing_platform_ray.pipelines.graph import run_algorithm
    from distributed_graph_computing_platform_ray.pipelines.pages import build_link_graph
    from distributed_graph_computing_platform_ray.sources.pages import generate_pages

    root = "/tmp/graft_entry"
    shutil.rmtree(root, ignore_errors=True)
    build_link_graph(generate_pages(300), f"{root}/graph", n_parts=8, n_buckets=16)
    return run_algorithm(f"{root}/graph", f"{root}/pr", "pagerank")


def queries() -> dict[str, Callable[[str], Any]]:
    from distributed_graph_computing_platform_ray.pipelines import testdata as T

    def pages_linkgraph_pagerank(sf_dir: str):
        # the url-keyed flagship; SQL-checked: _pages_pr_sql reproduces
        # the generator + extractor + PR recurrence end-to-end. n is
        # PINNED to the oracle's 2000 (the query generates its own
        # pages and reads nothing from sf_dir, and oracle_sql() is one
        # fixed string — an sf-dependent n would desync them at
        # sf0.001). Ranked on the integer-scaled score so tie-breaks
        # are hash-exact.
        import pyarrow as pa
        import pyarrow.compute as pc

        from distributed_graph_computing_platform_ray.pipelines.graph import run_algorithm
        from distributed_graph_computing_platform_ray.pipelines.pages import (
            build_link_graph,
        )
        from distributed_graph_computing_platform_ray.sources.pages import generate_pages

        n = 2000
        root = f"/tmp/graft_pages_{n}"
        shutil.rmtree(root, ignore_errors=True)
        build_link_graph(generate_pages(n), f"{root}/graph", n_parts=8, n_buckets=16)
        res = run_algorithm(f"{root}/graph", f"{root}/pr", "pagerank")

        def conv(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vertex": t["vertex"],
                    "score_e8": pc.round(pc.multiply(t["value"], 1e8)).cast(pa.int64()),
                }
            )

        ds = res.map_batches(conv, batch_format="pyarrow")
        return ds.sort(["score_e8", "vertex"], descending=[True, False]).limit(25)

    reg = {
        # -- graph engine over derived edge tables (SQL-checked) --------
        "edges_lineitem": T.q_edges_lineitem,
        "degrees": T.q_degrees,
        "pagerank": T.q_pagerank,
        "pagerank_trace": T.q_pagerank_trace,
        "absorption": T.q_absorption,
        "pagerank_directed": T.q_pagerank_directed,
        "hits": T.q_hits,
        "pagerank_top25": T.q_pagerank_top25,
        "sssp": T.q_sssp,
        "sssp_weighted": T.q_sssp_weighted,
        "earliest_arrival": T.q_earliest_arrival,
        "anf": T.q_anf,
        "sssp_multi": T.q_sssp_multi,
        "scc": T.q_scc,
        "bowtie": T.q_bowtie,
        "graph_diameter": T.q_graph_diameter,
        "reciprocity": T.q_reciprocity,
        "degree_assortativity": T.q_degree_assortativity,
        "community_stats": T.q_community_stats,
        "closeness_sampled": T.q_closeness_sampled,
        "pagerank_weighted": T.q_pagerank_weighted,
        "pagerank_personalized": T.q_pagerank_personalized,
        "connected_components": T.q_connected_components,
        "cc_incremental": T.q_cc_incremental,
        "entity_resolution": T.q_entity_resolution,
        "mis": T.q_mis,
        "kcore": T.q_kcore,
        "kcore_rounds": T.q_kcore_rounds,
        "coreness": T.q_coreness,
        "onion_layers": T.q_onion_layers,
        "web_coreness": T.q_web_coreness,
        "web_onion_layers": T.q_web_onion_layers,
        "densest_subgraph": T.q_densest_subgraph,
        "user_distinct_hll": T.q_user_hll,
        "label_propagation": T.q_label_propagation,
        "triangle_count": T.q_triangle_count,
        "triangles_per_vertex": T.q_triangles_per_vertex,
        # -- documents: text analysis / dedup ---------------------------
        "doc_stats": T.q_doc_stats,
        "doc_exact_dedup": T.q_doc_exact_dedup,
        "doc_fingerprint": T.q_doc_fingerprint,
        "top_terms": T.q_top_terms,
        "inverted_index": T.q_inverted_index,
        "inverted_index_blocked": T.q_inverted_index_blocked,
        "mixture_weights": T.q_mixture_weights,
        "filter_funnel": T.q_filter_funnel,
        "mixture_sample": T.q_mixture_sample,
        "span_corruption": T.q_span_corruption,
        "dict_frontcoding": T.q_dict_frontcoding,
        "dataset_card": T.q_dataset_card,
        "ngram_novelty_curve": T.q_ngram_novelty_curve,
        "term_branching": T.q_term_branching,
        "textrank_terms": T.q_textrank_terms,
        "term_and_query": T.q_term_and_query,
        "doc_repetition": T.q_doc_repetition,
        "dedup_report": T.q_dedup_report,
        "source_overlap": T.q_source_overlap,
        "bpe_merges": T.q_bpe_merges,
        "lang_term_jaccard": T.q_lang_term_jaccard,
        "bpe_apply": T.q_bpe_apply,
        "term_burstiness": T.q_term_burstiness,
        "zipf_heaps": T.q_zipf_heaps,
        "skipgram_counts": T.q_skipgram_counts,
        "charclass_stats": T.q_charclass_stats,
        "collocation_lift": T.q_collocation_lift,
        "nation_momentum": T.q_nation_momentum,
        "knn_graph": T.q_knn_graph,
        "page_degree_profile": T.q_page_degree_profile,
        "audience_overlap": T.q_audience_overlap,
        "leadtime_quantiles": T.q_leadtime_quantiles,
        "two_hop_size": T.q_two_hop_size,
        "top_terms_per_lang": T.q_top_terms_per_lang,
        "revenue_by_nation": T.q_revenue_by_nation,
        "revenue_rollup": T.q_revenue_rollup,
        "lineitem_semijoin": T.q_lineitem_semijoin,
        "doc_split": T.q_doc_split,
        # -- events / embeddings ----------------------------------------
        "events_hourly": T.q_events_hourly,
        "events_jsonl_hourly": T.q_events_jsonl_hourly,
        "events_late": T.q_events_late,
        "events_cohort_value": T.q_events_cohort_value,
        "events_sessionize": T.q_events_sessionize,
        "events_latest": T.q_events_latest,
        "events_deltas": T.q_events_deltas,
        "orders_left_join": T.q_orders_left_join,
        "lineitem_antijoin": T.q_lineitem_antijoin,
        "antijoin_bloom": T.q_antijoin_bloom,
        "doc_sample_stratified": T.q_doc_sample_stratified,
        "clustering_coeff": T.q_clustering_coeff,
        "events_pivot": T.q_events_pivot,
        "orders_full_join": T.q_orders_full_join,
        "vocab_build": T.q_vocab_build,
        "doc_bigram_lm": T.q_doc_bigram_lm,
        "link_prediction": T.q_link_prediction,
        "bipartite_check": T.q_bipartite_check,
        "stress_centrality": T.q_stress_centrality,
        "events_funnel": T.q_events_funnel,
        "events_outliers": T.q_events_outliers,
        "sssp_parents": T.q_sssp_parents,
        "maximal_matching": T.q_maximal_matching,
        "graph_coarsen": T.q_graph_coarsen,
        "anchor_stats": T.q_anchor_stats,
        "ecc_bounds": T.q_ecc_bounds,
        "graph_robustness": T.q_graph_robustness,
        "random_failure": T.q_random_failure,
        "block_conductance": T.q_block_conductance,
        "events_transitions": T.q_events_transitions,
        "markov_stationary": T.q_markov_stationary,
        "sssp_paths": T.q_sssp_paths,
        "square_count": T.q_square_count,
        "events_running_total": T.q_events_running_total,
        "edge_jaccard": T.q_edge_jaccard,
        "knn_degree": T.q_knn_degree,
        "katz": T.q_katz,
        "doc_bm25": T.q_doc_bm25,
        "ktruss": T.q_ktruss,
        "msf_boruvka": T.q_msf_boruvka,
        "fuzzy_name_pairs": T.q_fuzzy_name_pairs,
        "table_profile": T.q_table_profile,
        "doc_oov": T.q_doc_oov,
        "coloring": T.q_coloring,
        "dag_longest": T.q_dag_longest,
        "lineitem_median": T.q_lineitem_median,
        "quantiles_sketch": T.q_quantiles_sketch,
        "sorted_export": T.q_sorted_export,
        "lineitem_weighted_median": T.q_lineitem_weighted_median,
        "nation_share": T.q_nation_share,
        "orders_zorder": T.q_orders_zorder,
        "events_bounce": T.q_events_bounce,
        "orders_rank": T.q_orders_rank,
        "events_user_mode": T.q_events_user_mode,
        "customer_pareto": T.q_customer_pareto,
        "orders_cube": T.q_orders_cube,
        "orders_diff": T.q_orders_diff,
        "events_new_users": T.q_events_new_users,
        "lineitem_pruned": T.q_lineitem_pruned,
        "embedding_gram": T.q_embedding_gram,
        "embedding_quantize": T.q_embedding_quantize,
        "embedding_grid": T.q_embedding_grid,
        "data_quality": T.q_data_quality,
        "events_regression": T.q_events_regression,
        "events_ewma": T.q_events_ewma,
        "events_retention": T.q_events_retention,
        "events_chi2": T.q_events_chi2,
        "events_burst": T.q_events_burst,
        "dict_upsert": T.q_dict_upsert,
        "events_props_agg": T.q_events_props_agg,
        "motif_census": T.q_motif_census,
        "rich_club": T.q_rich_club,
        "events_quantiles": T.q_events_quantiles,
        "events_sliding": T.q_events_sliding,
        "ann_topk": T.q_ann_topk,
        "kmeans_embeddings": T.q_kmeans,
        "pq_codebook": T.q_pq_codebook,
        "kcenter_seeds": T.q_kcenter_seeds,
        "ann_recall": T.q_ann_recall,
        "events_asof_orders": T.q_events_asof_orders,
        "doc_pii_scrub": T.q_doc_pii_scrub,
        "doc_dup_ngrams": T.q_doc_dup_ngrams,
        "doc_strip_spans": T.q_doc_strip_spans,
        "doc_classify": T.q_doc_classify,
        "part_cooccurrence": T.q_part_cooccurrence,
        "events_hourly_users": T.q_events_hourly_users,
        "events_range_join": T.q_events_range_join,
        "order_quartiles": T.q_order_quartiles,
        "doc_pack": T.q_doc_pack,
        "corpus_curation": T.q_corpus_curation,
        "cms_user_counts": T.q_cms_user_counts,
        "bloom_doc_positions": T.q_bloom_doc_positions,
        "events_sample": T.q_events_sample,
        "degree_histogram": T.q_degree_histogram,
        "degree_gini": T.q_degree_gini,
        "doc_tfidf_top": T.q_doc_tfidf_top,
        "doc_decontaminate": T.q_doc_decontaminate,
        "domain_pagerank": T.q_domain_pagerank,
        "domain_top_pages": T.q_domain_top_pages,
        "random_walks": T.q_random_walks,
        "walk_skipgrams": T.q_walk_skipgrams,
        "local_clustering": T.q_local_clustering,
        "cocitation": T.q_cocitation,
        "bibcoupling": T.q_bibcoupling,
        "domain_link_locality": T.q_domain_link_locality,
        "trustrank_domains": T.q_trustrank_domains,
        "pagerank_warm": T.q_pagerank_warm,
        "redirect_resolve": T.q_redirect_resolve,
        "frontier_candidates": T.q_frontier_candidates,
        "crawl_budget": T.q_crawl_budget,
        "site_depth": T.q_site_depth,
        "modularity": T.q_modularity,
        "salsa": T.q_salsa,
        "simrank": T.q_simrank,
        "crawl_delta": T.q_crawl_delta,
        "site_centrality": T.q_site_centrality,
        "spam_mass": T.q_spam_mass,
        "doc_readability": T.q_doc_readability,
        "page_outlink_profile": T.q_page_outlink_profile,
        "linkgraph_compress": T.q_linkgraph_compress,
        "site_bridges": T.q_site_bridges,
        "site_articulation": T.q_site_articulation,
        "site_effective_diameter": T.q_site_effective_diameter,
        "widest_path": T.q_widest_path,
        "coverage_greedy": T.q_coverage_greedy,
        "feature_propagation": T.q_feature_propagation,
        "domain_inlink_hll": T.q_domain_inlink_hll,
        "anchor_majority": T.q_anchor_majority,
        "domain_mutual_links": T.q_domain_mutual_links,
        "site_edge_stress": T.q_site_edge_stress,
        "pagerank_dangling": T.q_pagerank_dangling,
        "orphan_pages": T.q_orphan_pages,
        "host_lang_mix": T.q_host_lang_mix,
        "stale_link_rate": T.q_stale_link_rate,
        "host_butterflies": T.q_host_butterflies,
        "bfs_layers": T.q_bfs_layers,
        "page_text_stats": T.q_page_text_stats,
        "page_boilerplate": T.q_page_boilerplate,
        "page_shingle_novelty": T.q_page_shingle_novelty,
        "crawl_recency": T.q_crawl_recency,
        "pagerank_mass_by_depth": T.q_pagerank_mass_by_depth,
        "events_mad": T.q_events_mad,
        "web_bowtie": T.q_web_bowtie,
        "site_local_pagerank": T.q_site_local_pagerank,
        "degree_ccdf": T.q_degree_ccdf,
        "rank_churn": T.q_rank_churn,
        "pagerank_topic": T.q_pagerank_topic,
        "site_entry_pages": T.q_site_entry_pages,
        "host_pr_concentration": T.q_host_pr_concentration,
        "rank_by_lang": T.q_rank_by_lang,
        "inout_degree_corr": T.q_inout_degree_corr,
        "host_spam_heuristic": T.q_host_spam_heuristic,
        "lang_link_matrix": T.q_lang_link_matrix,
        "crawl_scheduler": T.q_crawl_scheduler,
        "rank_gini": T.q_rank_gini,
        "host_rank_flow": T.q_host_rank_flow,
        "host_outlink_diversity": T.q_host_outlink_diversity,
        "link_crawl_lag": T.q_link_crawl_lag,
        "term_heavy_hitters": T.q_term_heavy_hitters,
        "cheirank": T.q_cheirank,
        "anchor_bm25": T.q_anchor_bm25,
        "graph_patch_pr": T.q_graph_patch_pr,
        "graph_delete_degrees": T.q_graph_delete_degrees,
        "domain_hits": T.q_domain_hits,
        "graph_patch_chain": T.q_graph_patch_chain,
        "events_autocorr": T.q_events_autocorr,
        "index_shard_plan": T.q_index_shard_plan,
        "rendezvous_shards": T.q_rendezvous_shards,
        "molloy_reed": T.q_molloy_reed,
        "eigen_centrality": T.q_eigen_centrality,
        "corpus_mix_weights": T.q_corpus_mix_weights,
        "condensation_stats": T.q_condensation_stats,
        "shipping_priority": T.q_shipping_priority,
        "shard_balance": T.q_shard_balance,
        "lang_assortativity": T.q_lang_assortativity,
        "web_triangle_locality": T.q_web_triangle_locality,
        "avg_neighbor_degree": T.q_avg_neighbor_degree,
        "damping_sensitivity": T.q_damping_sensitivity,
        "pagerank_tol": T.q_pagerank_tol,
        "patch_warm_pagerank": T.q_patch_warm_pagerank,
        "doulion_triangles": T.q_doulion_triangles,
        "promo_revenue": T.q_promo_revenue,
        "returned_item_report": T.q_returned_item_report,
        "volume_shipping": T.q_volume_shipping,
        "opic_cash": T.q_opic_cash,
        "url_canonicalize": T.q_url_canonicalize,
        "cascade_ic": T.q_cascade_ic,
        "host_hopplot": T.q_host_hopplot,
        "host_harmonic": T.q_host_harmonic,
        "host_closed_walks": T.q_host_closed_walks,
        "lang_kmv": T.q_lang_kmv,
        "events_attribution": T.q_events_attribution,
        "events_top_paths": T.q_events_top_paths,
        "graph_sparsify_pr": T.q_graph_sparsify_pr,
        "doc_containment": T.q_doc_containment,
        "host_neighbor_jaccard": T.q_host_neighbor_jaccard,
        "posting_list_bytes": T.q_posting_list_bytes,
        "host_betweenness": T.q_host_betweenness,
        "host_pagerank_push": T.q_host_pagerank_push,
        "host_ppr_sweepcut": T.q_host_ppr_sweepcut,
        "host_edge_betweenness": T.q_host_edge_betweenness,
        "events_dedup_replay": T.q_events_dedup_replay,
        "term_position_stats": T.q_term_position_stats,
        "lang_confusion": T.q_lang_confusion,
        "cms_error": T.q_cms_error,
        "customer_rfm": T.q_customer_rfm,
        "gn_communities": T.q_gn_communities,
        "events_hll_error": T.q_events_hll_error,
        "page_host_rank_corr": T.q_page_host_rank_corr,
        "langid_calibration": T.q_langid_calibration,
        "quality_deciles": T.q_quality_deciles,
        "market_hhi": T.q_market_hhi,
        "supplier_ship_lag": T.q_supplier_ship_lag,
        "embedding_drift": T.q_embedding_drift,
        "events_error_trend": T.q_events_error_trend,
        "spam_exposure": T.q_spam_exposure,
        "host_spectral_radius": T.q_host_spectral_radius,
        "events_weekday_profile": T.q_events_weekday_profile,
        "ab_test_lift": T.q_ab_test_lift,
        "nation_top_customers": T.q_nation_top_customers,
        "events_user_lifespan": T.q_events_user_lifespan,
        "host_resource_allocation": T.q_host_resource_allocation,
        "user_concentration": T.q_user_concentration,
        "orders_yoy": T.q_orders_yoy,
        "host_sim_topk": T.q_host_sim_topk,
        "shingle_df_curve": T.q_shingle_df_curve,
        "events_state_violations": T.q_events_state_violations,
        "events_window_hll": T.q_events_window_hll,
        "rank_spearman": T.q_rank_spearman,
        # -- rows-only (no SQL oracle; pytest verifies vs oracles) ------
        "pages_linkgraph_pagerank": pages_linkgraph_pagerank,
        "doc_langid": T.q_doc_langid,
        "doc_quality": T.q_doc_quality,
        "doc_token_bpe": T.q_doc_token_bpe,
        "doc_rolling_fingerprint": T.q_doc_rolling_fingerprint,
        "doc_minhash_dedup": T.q_doc_minhash_dedup,
        "neardup_cluster_sizes": T.q_neardup_cluster_sizes,
        "neardup_retention_by_source": T.q_neardup_retention_by_source,
        "incremental_neardup": T.q_incremental_neardup,
        "neardup_threshold_curve": T.q_neardup_threshold_curve,
        "lsh_bucket_stats": T.q_lsh_bucket_stats,
        "page_analyze_rollup": T.q_page_analyze_rollup,
        "page_simhash_bands": T.q_page_simhash_bands,
        "page_minhash_bands": T.q_page_minhash_bands,
        "doc_ngram_jaccard": T.q_doc_ngram_jaccard,
        "media_features": T.q_media_features,
        "media_framesample": T.q_media_framesample,
        "doc_simhash_pairs": T.q_doc_simhash_pairs,
        "embedding_neardup": T.q_embedding_neardup,
        "ann_ivf": T.q_ann_ivf,
        "multimodal_decode": T.q_multimodal_decode,
    }

    # Driver-gate ordering (VERDICT r4 item #2): CORRECTNESS_rNN.json
    # checks the FIRST 50 registry entries, so make them a
    # representative cross-family sample — engine/graph, graph
    # analytics, text, dedup, ANN/embeddings, windows/sessionize,
    # incremental/patch, relational, sketches, tokenizer/curation,
    # web/host — instead of the static round-2 prefix. Relative order
    # within the remainder is unchanged.
    gate_first = [
        # engine ingest + BSP algorithms
        "edges_lineitem", "degrees", "pagerank", "pagerank_top25",
        "sssp", "connected_components", "label_propagation",
        # graph analytics
        "triangle_count", "kcore_rounds", "coreness", "msf_boruvka",
        "scc", "stress_centrality", "two_hop_size",
        # text analysis
        "doc_stats", "top_terms", "page_text_stats", "doc_readability",
        "zipf_heaps",
        # dedup family
        "doc_exact_dedup", "doc_minhash_dedup", "doc_ngram_jaccard",
        "doc_simhash_pairs", "doc_dup_ngrams",
        # ANN / embeddings
        "ann_topk", "ann_recall", "kmeans_embeddings", "pq_codebook",
        "embedding_neardup",
        # windows / sessionize / as-of
        "events_sessionize", "events_asof_orders", "events_funnel",
        "events_retention", "events_sliding",
        # incremental / patch
        "graph_patch_pr", "cc_incremental", "dict_upsert",
        "patch_warm_pagerank",
        # relational
        "revenue_by_nation", "orders_left_join", "lineitem_antijoin",
        # sketches
        "user_distinct_hll", "cms_user_counts", "quantiles_sketch",
        # tokenizer / curation ops
        "bpe_merges", "term_heavy_hitters", "doc_decontaminate",
        # web / host graph
        "domain_pagerank",
        # fused analyze flagship (round-5 session-2 end-to-end gates)
        "page_analyze_rollup", "page_minhash_bands",
    ]
    assert len(gate_first) == 50, len(gate_first)
    missing = [k for k in gate_first if k not in reg]
    assert not missing, f"gate_first names not in registry: {missing}"
    ordered = {k: reg[k] for k in gate_first}
    ordered.update((k, v) for k, v in reg.items() if k not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    sql = {
        "edges_lineitem": f"WITH {_EB_LINEITEM} SELECT src, dst FROM eb",
        "degrees": (
            f"WITH {_EB_LINEITEM}, {_ES} "
            "SELECT src AS vertex, count(*)::BIGINT AS degree FROM es GROUP BY src"
        ),
        "absorption": (
            # harmonic measure: h_{t+1}(v) = 1 on the 3 lowest-id
            # seeds, else SUM(neighbor h_t)/deg(v) — receiver-side
            # degree division (the engine's wants_degrees apply)
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "seeds AS (SELECT id FROM deg ORDER BY id LIMIT 3), "
            "h AS ( "
            "  SELECT 0 AS it, deg.id, "
            "    (CASE WHEN s.id IS NULL THEN 0.0 ELSE 1.0 END)::DOUBLE AS val "
            "  FROM deg LEFT JOIN seeds s USING (id) "
            "  UNION ALL "
            "  SELECT x.it + 1, x.id, "
            "    CASE WHEN x.is_seed THEN 1.0 ELSE x.s / x.d END "
            "  FROM ( "
            "    SELECT h.it, e.dst AS id, dd.d, SUM(h.val) AS s, "
            "      (sd.id IS NOT NULL) AS is_seed "
            "    FROM h JOIN es e ON e.src = h.id JOIN deg dd ON dd.id = e.dst "
            "    LEFT JOIN seeds sd ON sd.id = e.dst "
            "    WHERE h.it < 20 GROUP BY h.it, e.dst, dd.d, sd.id) x) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS absorb_e8 "
            "FROM h WHERE it = 20"
        ),
        "pagerank": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, 0.15/nn.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN nn JOIN es e ON e.src = p.id "
            "       JOIN deg dd ON dd.id = e.dst "
            "  WHERE p.it < 30 GROUP BY p.it, e.dst, dd.d, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30"
        ),
        "pagerank_warm": (
            # chained recurrences: 30 cold iterations on the sub5
            # snapshot seed 10 warm iterations on the full graph
            # (new-vertex init 0 via the COALESCE left join)
            f"WITH RECURSIVE {_EB_LINEITEM}, "
            "eb0 AS (SELECT src, dst FROM eb WHERE (src + dst) % 5 <> 0), "
            "es0 AS (SELECT src, dst FROM eb0 UNION ALL SELECT dst, src FROM eb0), "
            "deg0 AS (SELECT src AS id, count(*) AS d FROM es0 GROUP BY src), "
            "nn0 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg0), "
            "pr0 AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg0 "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, 0.15/nn0.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr0 p CROSS JOIN nn0 JOIN es0 e ON e.src = p.id "
            "       JOIN deg0 dd ON dd.id = e.dst "
            "  WHERE p.it < 30 GROUP BY p.it, e.dst, dd.d, nn0.n), "
            f"{_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "init AS (SELECT deg.id, COALESCE(p.val, 0.0) AS val, deg.d FROM deg "
            "         LEFT JOIN (SELECT id, val FROM pr0 WHERE it = 30) p "
            "         ON p.id = deg.id), "
            "pr AS ( "
            "  SELECT 0 AS it, id, val, d FROM init "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, 0.15/nn.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN nn JOIN es e ON e.src = p.id "
            "       JOIN deg dd ON dd.id = e.dst "
            "  WHERE p.it < 10 GROUP BY p.it, e.dst, dd.d, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 10"
        ),
        "pagerank_trace": (
            # per-checkpoint L1 movement of the SAME recurrence — the
            # engine's checkpoint at iter k is per-vertex e8-exact vs
            # CTE iteration k (verified), so the trace is hash-exact
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, 0.15/nn.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN nn JOIN es e ON e.src = p.id "
            "       JOIN deg dd ON dd.id = e.dst "
            "  WHERE p.it < 30 GROUP BY p.it, e.dst, dd.d, nn.n), "
            "sc AS (SELECT it, id, CAST(ROUND(val * 1e8) AS BIGINT) AS e8 "
            "       FROM pr WHERE it % 5 = 0) "
            "SELECT cur.it::BIGINT AS it, "
            "  sum(abs(cur.e8 - prev.e8))::BIGINT AS l1_e8 "
            "FROM sc cur JOIN sc prev ON prev.id = cur.id AND prev.it = cur.it - 5 "
            "WHERE cur.it > 0 GROUP BY cur.it"
        ),
        "pagerank_personalized": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM deg WHERE id < 10), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, "
            "    CASE WHEN e.dst < 10 THEN 0.15/ns.s ELSE 0.0 END + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN ns JOIN es e ON e.src = p.id "
            "       JOIN deg dd ON dd.id = e.dst "
            "  WHERE p.it < 30 GROUP BY p.it, e.dst, dd.d, ns.s) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30"
        ),
        "pagerank_directed": (
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_orderkey % 200 AS src, l_partkey % 200 AS dst "
            "       FROM lineitem WHERE l_orderkey % 200 <> l_partkey % 200), "
            "deg AS (SELECT src AS id, count(*) AS d FROM eb GROUP BY src), "
            "v AS (SELECT DISTINCT id FROM "
            "      (SELECT src AS id FROM eb UNION ALL SELECT dst FROM eb)), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, p.id, "
            "         0.15/nn.n + 0.85 * COALESCE(SUM(q.val / dd.d), 0.0) "
            "  FROM pr p CROSS JOIN nn "
            "  LEFT JOIN eb e ON e.dst = p.id "
            "  LEFT JOIN pr q ON q.id = e.src AND q.it = p.it "
            "  LEFT JOIN deg dd ON dd.id = e.src "
            "  WHERE p.it < 30 GROUP BY p.it, p.id, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30"
        ),
        "cheirank": (
            # pagerank_directed with the edge derivation transposed
            # (mirrors testdata.q_cheirank)
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_partkey % 200 AS src, l_orderkey % 200 AS dst "
            "       FROM lineitem WHERE l_orderkey % 200 <> l_partkey % 200), "
            "deg AS (SELECT src AS id, count(*) AS d FROM eb GROUP BY src), "
            "v AS (SELECT DISTINCT id FROM "
            "      (SELECT src AS id FROM eb UNION ALL SELECT dst FROM eb)), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, p.id, "
            "         0.15/nn.n + 0.85 * COALESCE(SUM(q.val / dd.d), 0.0) "
            "  FROM pr p CROSS JOIN nn "
            "  LEFT JOIN eb e ON e.dst = p.id "
            "  LEFT JOIN pr q ON q.id = e.src AND q.it = p.it "
            "  LEFT JOIN deg dd ON dd.id = e.src "
            "  WHERE p.it < 30 GROUP BY p.it, p.id, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30"
        ),
        "hits": (
            # HITS via the doubled bipartite graph (exactly the engine's
            # construction): 6 supersteps of integer-exact sum
            # propagation, then one half-up integer-scaled normalization
            # per score family (HUGEINT keeps 2*val*1e8 exact).
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_orderkey % 200 AS src, l_partkey % 200 AS dst "
            "       FROM lineitem WHERE l_orderkey % 200 <> l_partkey % 200), "
            "d AS (SELECT 2*src AS s, 2*dst+1 AS t FROM eb "
            "      UNION ALL SELECT 2*dst+1, 2*src FROM eb), "
            "it AS ( "
            "  SELECT 0 AS i, v, CAST(1 AS DOUBLE) AS val "
            "  FROM (SELECT DISTINCT s AS v FROM d) "
            "  UNION ALL "
            "  SELECT p.i + 1, d.t, SUM(p.val) FROM it p JOIN d ON d.s = p.v "
            "  WHERE p.i < 6 GROUP BY p.i, d.t), "
            "fin AS (SELECT v, CAST(val AS HUGEINT) AS val FROM it WHERE i = 6), "
            "hub AS (SELECT v // 2 AS vertex, val AS h FROM fin WHERE v % 2 = 0), "
            "aut AS (SELECT v // 2 AS vertex, val AS a FROM fin WHERE v % 2 = 1), "
            # NOT `x UNION y` at CTE top level: inside WITH RECURSIVE,
            # DuckDB 1.0 gives any UNION-shaped CTE recursive-CTE
            # evaluation (no cross-term dedup) — wrap in a subquery.
            "verts AS (SELECT DISTINCT vertex FROM "
            "          (SELECT src AS vertex FROM eb "
            "           UNION ALL SELECT dst FROM eb)), "
            "tot AS (SELECT (SELECT SUM(h) FROM hub) AS ht, "
            "               (SELECT SUM(a) FROM aut) AS at2) "
            "SELECT verts.vertex, "
            "  CAST((2 * COALESCE(h, 0) * 100000000 + ht) // (2 * ht) AS BIGINT) AS hub_e8, "
            "  CAST((2 * COALESCE(a, 0) * 100000000 + at2) // (2 * at2) AS BIGINT) AS auth_e8 "
            "FROM verts LEFT JOIN hub USING (vertex) LEFT JOIN aut USING (vertex) "
            "CROSS JOIN tot"
        ),
        "pagerank_top25": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, 0.15/nn.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN nn JOIN es e ON e.src = p.id "
            "       JOIN deg dd ON dd.id = e.dst "
            "  WHERE p.it < 30 GROUP BY p.it, e.dst, dd.d, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30 "
            "ORDER BY score_e8 DESC, vertex LIMIT 25"
        ),
        "sssp": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "srcv AS (SELECT min(id) AS s FROM v), "
            "relax AS (SELECT src, dst, 1 AS w FROM es "
            "          UNION ALL SELECT id, id, 0 FROM v), "
            "d AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id = (SELECT s FROM srcv) "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst) "
            "SELECT id AS vertex, CASE WHEN dist >= 1e17 THEN NULL "
            "ELSE CAST(dist AS BIGINT) END AS dist FROM d WHERE it = 60"
        ),
        "closeness_sampled": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "srcv AS (SELECT id AS s FROM v ORDER BY id LIMIT 4), "
            "relax AS (SELECT src, dst, 1 AS w FROM es "
            "          UNION ALL SELECT id, id, 0 FROM v), "
            "d AS ( "
            "  SELECT 0 AS it, sv.s AS seed, v.id, "
            "    CASE WHEN v.id = sv.s THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist "
            "  FROM v CROSS JOIN srcv sv "
            "  UNION ALL "
            "  SELECT p.it + 1, p.seed, r.dst, MIN(p.dist + r.w) FROM d p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, p.seed, r.dst) "
            "SELECT id AS vertex, "
            "  sum(CASE WHEN dist >= 1e17 THEN 0 "
            "      ELSE 1000000 // (1 + CAST(dist AS BIGINT)) END)::BIGINT AS closeness_e6 "
            "FROM d WHERE it = 60 GROUP BY 1"
        ),
        "sssp_multi": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "srcv AS (SELECT id AS s FROM v ORDER BY id LIMIT 3), "
            "relax AS (SELECT src, dst, 1 AS w FROM es "
            "          UNION ALL SELECT id, id, 0 FROM v), "
            "d AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id IN (SELECT s FROM srcv) "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst) "
            "SELECT id AS vertex, CASE WHEN dist >= 1e17 THEN NULL "
            "ELSE CAST(dist AS BIGINT) END AS dist FROM d WHERE it = 60"
        ),
        "scc": (
            # algorithm-independent SCC semantics: scc_id(v) = min w with
            # v ~> w and w ~> v (mutual reachability via transitive
            # closure; UNION-recursion dedups, so it reaches fixpoint)
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst "
            "       FROM lineitem WHERE l_orderkey % 2000 <> l_partkey % 2000 "
            "       AND (l_orderkey // 2000) % 29 = 0), "
            "v AS (SELECT DISTINCT id FROM "
            "      (SELECT src AS id FROM eb UNION ALL SELECT dst FROM eb)), "
            "r AS ( "
            "  SELECT id AS s, id AS d FROM v "
            "  UNION "
            "  SELECT r.s, e.dst FROM r JOIN eb e ON e.src = r.d) "
            "SELECT a.s::BIGINT AS vertex, min(a.d)::BIGINT AS scc_id "
            "FROM r a JOIN r b ON b.s = a.d AND b.d = a.s "
            "GROUP BY a.s"
        ),
        "bowtie": (
            # Broder bow-tie from the reachability closure: core =
            # largest SCC (ties -> min id); IN reaches core member c
            # (= core scc_id, itself in the core); OUT reached from c
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst "
            "       FROM lineitem WHERE l_orderkey % 2000 <> l_partkey % 2000 "
            "       AND (l_orderkey // 2000) % 29 = 0), "
            "v AS (SELECT DISTINCT id FROM "
            "      (SELECT src AS id FROM eb UNION ALL SELECT dst FROM eb)), "
            "r AS ( "
            "  SELECT id AS s, id AS d FROM v "
            "  UNION "
            "  SELECT r.s, e.dst FROM r JOIN eb e ON e.src = r.d), "
            "scc AS (SELECT a.s AS vertex, min(a.d) AS scc_id "
            "        FROM r a JOIN r b ON b.s = a.d AND b.d = a.s GROUP BY a.s), "
            "core AS (SELECT scc_id FROM (SELECT scc_id, count(*) AS n FROM scc "
            "         GROUP BY 1) ORDER BY n DESC, scc_id ASC LIMIT 1) "
            "SELECT s.vertex::BIGINT AS vertex, "
            "  (CASE WHEN s.scc_id = (SELECT scc_id FROM core) THEN 0 "
            "        WHEN EXISTS (SELECT 1 FROM r WHERE r.s = s.vertex "
            "             AND r.d = (SELECT scc_id FROM core)) THEN 1 "
            "        WHEN EXISTS (SELECT 1 FROM r WHERE r.d = s.vertex "
            "             AND r.s = (SELECT scc_id FROM core)) THEN 2 "
            "        ELSE 3 END)::BIGINT AS cls "
            "FROM scc s"
        ),
        "graph_diameter": (
            # double-sweep BFS: two chained recursive BFS CTEs; sweep-2
            # source = min id among sweep-1's farthest finite vertices
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "srcv AS (SELECT min(id) AS s FROM v), "
            "relax AS (SELECT src, dst, 1 AS w FROM es "
            "          UNION ALL SELECT id, id, 0 FROM v), "
            "d1 AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id = (SELECT s FROM srcv) "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d1 p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst), "
            "e1 AS (SELECT id, CAST(dist AS BIGINT) AS dist FROM d1 "
            "       WHERE it = 60 AND dist < 1e17), "
            "f1 AS (SELECT min(id) AS s2 FROM e1 "
            "       WHERE dist = (SELECT max(dist) FROM e1)), "
            "d2 AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id = (SELECT s2 FROM f1) "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d2 p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst), "
            "e2 AS (SELECT id, CAST(dist AS BIGINT) AS dist FROM d2 "
            "       WHERE it = 60 AND dist < 1e17), "
            "f2 AS (SELECT min(id) AS s3 FROM e2 "
            "       WHERE dist = (SELECT max(dist) FROM e2)) "
            "SELECT (SELECT s FROM srcv)::BIGINT AS start_vertex, "
            "  (SELECT s2 FROM f1)::BIGINT AS sweep1_vertex, "
            "  (SELECT s3 FROM f2)::BIGINT AS sweep2_vertex, "
            "  (SELECT max(dist) FROM e1)::BIGINT AS ecc1, "
            "  (SELECT max(dist) FROM e2)::BIGINT AS diameter_lb"
        ),
        "reciprocity": (
            "WITH ed AS (SELECT DISTINCT l_orderkey % 200 AS src, "
            "            l_partkey % 200 AS dst FROM lineitem "
            "            WHERE l_orderkey % 200 <> l_partkey % 200), "
            "m AS (SELECT count(*) AS n, "
            "      sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS nm "
            "      FROM ed LEFT JOIN ed r ON r.src = ed.dst AND r.dst = ed.src) "
            "SELECT n::BIGINT AS n_edges, nm::BIGINT AS n_mutual, "
            "  ((2 * nm * 1000000 + n) // (2 * n))::BIGINT AS reciprocity_e6 FROM m"
        ),
        "degree_assortativity": (
            # symmetrized edge list => x/y moments coincide, so Pearson
            # r is the exact rational (n*Sxy - Sx^2)/(n*Sxx - Sx^2);
            # HUGEINT products, signed half-up e6 via sign*abs (DuckDB
            # // truncates toward zero, Python floors — CLAUDE.md rule)
            f"WITH {_U_ORDERS}, "
            "es AS (SELECT a AS s, b AS d FROM u UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT s AS v, count(*) AS dg FROM es GROUP BY 1), "
            "j AS (SELECT ds.dg AS x, dd.dg AS y FROM es "
            "      JOIN deg ds ON ds.v = es.s JOIN deg dd ON dd.v = es.d), "
            "m AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx, "
            "      sum(x*x)::HUGEINT AS sxx, sum(x*y)::HUGEINT AS sxy FROM j) "
            "SELECT n::BIGINT AS n_pairs, sx::BIGINT AS sum_deg, "
            "  sxx::BIGINT AS sum_deg2, sxy::BIGINT AS sum_xy, "
            "  (CASE WHEN n*sxx - sx*sx = 0 THEN 0 ELSE "
            "    (CASE WHEN n*sxy - sx*sx >= 0 THEN 1 ELSE -1 END) * "
            "    ((2 * abs(n*sxy - sx*sx) * 1000000 + (n*sxx - sx*sx)) "
            "     // (2 * (n*sxx - sx*sx))) END)::BIGINT AS r_e6 "
            "FROM m"
        ),
        "community_stats": (
            # LP labels (same 10-iteration recurrence as the
            # label_propagation oracle) -> per-community size, degree
            # mass, internal edges, exact integer modularity numerator
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "l AS ( "
            "  SELECT 0 AS it, id, id AS lab FROM v "
            "  UNION ALL "
            "  SELECT it + 1, id, lab FROM ( "
            "    SELECT p.it AS it, e.dst AS id, p.lab AS lab, count(*) AS c "
            "    FROM l p JOIN es e ON e.src = p.id WHERE p.it < 10 "
            "    GROUP BY p.it, e.dst, p.lab "
            "    QUALIFY row_number() OVER (PARTITION BY p.it, e.dst "
            "            ORDER BY count(*) DESC, p.lab ASC) = 1)), "
            "labs AS (SELECT id, lab FROM l WHERE it = 10), "
            "mm AS (SELECT count(*) AS m FROM eb), "
            "deg AS (SELECT la.lab AS label, count(*) AS degree_sum "
            "        FROM es JOIN labs la ON la.id = es.src GROUP BY 1), "
            "intr AS (SELECT la.lab AS label, count(*) AS internal_edges "
            "         FROM eb JOIN labs la ON la.id = eb.src "
            "         JOIN labs lb ON lb.id = eb.dst "
            "         WHERE la.lab = lb.lab GROUP BY 1), "
            "sz AS (SELECT lab AS label, count(*) AS n_members FROM labs GROUP BY 1) "
            "SELECT sz.label::BIGINT AS label, sz.n_members::BIGINT AS n_members, "
            "  deg.degree_sum::BIGINT AS degree_sum, "
            "  COALESCE(intr.internal_edges, 0)::BIGINT AS internal_edges, "
            "  (2 * (SELECT m FROM mm) * 2 * COALESCE(intr.internal_edges, 0) "
            "   - deg.degree_sum * deg.degree_sum)::BIGINT AS q_num "
            "FROM sz JOIN deg ON deg.label = sz.label "
            "LEFT JOIN intr ON intr.label = sz.label"
        ),
        "connected_components": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "relax AS (SELECT src, dst FROM es UNION ALL SELECT id, id FROM v), "
            "c AS ( "
            "  SELECT 0 AS it, id, id AS lab FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.lab) FROM c p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst) "
            "SELECT id AS vertex, CAST(lab AS BIGINT) AS component FROM c WHERE it = 60"
        ),
        "entity_resolution": (
            # frontier-style min-STRING-label propagation over the
            # levenshtein-1 pair graph; singletons canonicalize to self
            "WITH RECURSIVE names AS (SELECT DISTINCT p_name || ' ' || "
            "(p_partkey % 100) AS s FROM part), "
            "pairs AS (SELECT a.s AS a, b.s AS b FROM names a JOIN names b "
            "ON a.s < b.s AND levenshtein(a.s, b.s) = 1), "
            "sym AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs), "
            "d AS ( "
            "  SELECT s AS id, s AS lab FROM names "
            "  UNION "
            "  SELECT sym.b AS id, MIN(p.lab) AS lab FROM d p "
            "  JOIN sym ON sym.a = p.id GROUP BY sym.b) "
            "SELECT id AS name, MIN(lab) AS canonical FROM d GROUP BY id"
        ),
        "cc_incremental": (
            # the warm-started engine run must equal full cold CC on the
            # full graph (see ConnectedComponentsWarmStart's proof note)
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "relax AS (SELECT src, dst FROM es UNION ALL SELECT id, id FROM v), "
            "c AS ( "
            "  SELECT 0 AS it, id, id AS lab FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.lab) FROM c p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst) "
            "SELECT id AS vertex, CAST(lab AS BIGINT) AS component FROM c WHERE it = 60"
        ),
        "label_propagation": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "l AS ( "
            "  SELECT 0 AS it, id, id AS lab FROM v "
            "  UNION ALL "
            "  SELECT it + 1, id, lab FROM ( "
            "    SELECT p.it AS it, e.dst AS id, p.lab AS lab, count(*) AS c "
            "    FROM l p JOIN es e ON e.src = p.id WHERE p.it < 10 "
            "    GROUP BY p.it, e.dst, p.lab "
            "    QUALIFY row_number() OVER (PARTITION BY p.it, e.dst "
            "            ORDER BY count(*) DESC, p.lab ASC) = 1)) "
            "SELECT id AS vertex, CAST(lab AS BIGINT) AS label FROM l WHERE it = 10"
        ),
        "triangle_count": (
            f"WITH {_U_ORDERS} "
            "SELECT count(*)::BIGINT AS n_triangles "
            "FROM u e1 JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b"
        ),
        "triangles_per_vertex": (
            f"WITH {_U_ORDERS}, "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "        FROM u e1 JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b "
            "        JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b) "
            "SELECT vertex, count(*)::BIGINT AS triangles FROM ( "
            "  SELECT x AS vertex FROM tri UNION ALL SELECT y FROM tri "
            "  UNION ALL SELECT z FROM tri) GROUP BY vertex"
        ),
        "doc_stats": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars_text, "
            "CASE WHEN trim(text) = '' THEN 0 ELSE "
            "length(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens, "
            "(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::BIGINT AS n_upper, "
            "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS n_digits "
            "FROM documents"
        ),
        "doc_exact_dedup": (
            "SELECT min(doc_id)::BIGINT AS doc_id, count(*)::BIGINT AS n_copies "
            "FROM documents GROUP BY text"
        ),
        "doc_fingerprint": "SELECT doc_id, md5(text) AS fp FROM documents",
        "doc_token_bpe": (
            "SELECT doc_id, length(regexp_extract_all(text, "
            "'[A-Za-z]+(?:''[a-z]+)?|[0-9]{1,3}|[^\\sA-Za-z0-9]'))::BIGINT "
            "AS n_bpe_tokens FROM documents"
        ),
        "nation_momentum": (
            "WITH m AS (SELECT n.n_name AS nation, "
            "CASE WHEN year(o_orderdate) >= 1995 THEN 1 ELSE 0 END AS late, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey GROUP BY 1, 2), "
            "w AS (SELECT nation, "
            "COALESCE(sum(CASE WHEN late = 0 THEN rev END), 0)::BIGINT AS rev_early, "
            "COALESCE(sum(CASE WHEN late = 1 THEN rev END), 0)::BIGINT AS rev_late "
            "FROM m GROUP BY nation), "
            "r AS (SELECT nation, rev_early, rev_late, "
            "row_number() OVER (ORDER BY rev_early DESC, nation) AS rank_early, "
            "row_number() OVER (ORDER BY rev_late DESC, nation) AS rank_late FROM w) "
            "SELECT nation, rev_early, rev_late, rank_early, rank_late, "
            "(rank_early - rank_late)::BIGINT AS rank_delta FROM r"
        ),
        "knn_graph": (
            # floor(x*1024) quantization: dot products are integer-valued
            # doubles < 2^53, so list_dot_product is exact cross-engine
            "WITH q AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]), "
            "x -> floor(x * 1024)) AS e FROM embeddings), "
            "p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr, "
            "CAST(list_dot_product(a.e, b.e) AS BIGINT) AS dot_q "
            "FROM q a JOIN q b ON b.vec_id <> a.vec_id WHERE a.vec_id < 500), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dot_q DESC, nbr) AS rnk FROM p) "
            "SELECT vec_id, nbr, rnk::BIGINT AS rnk, dot_q FROM r WHERE rnk <= 3"
        ),
        "collocation_lift": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "WHERE trim(text) <> ''), "
            "pos AS (SELECT doc_id, i, t[i] AS w FROM toks, "
            "unnest(range(1, len(t) + 1)) AS r(i)), "
            "p AS (SELECT a.w AS center, b.w AS context, count(*)::HUGEINT AS cnt "
            "FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.i <> a.i "
            "AND abs(b.i - a.i) <= 2 GROUP BY center, context), "
            "u AS (SELECT w AS term, count(*)::HUGEINT AS n FROM pos GROUP BY w), "
            "nn AS (SELECT sum(n) AS N FROM u) "
            "SELECT p.center, p.context, p.cnt::BIGINT AS cnt, "
            "CAST(p.cnt * nn.N * 1000000 // (ua.n * ub.n) AS BIGINT) AS lift_e6 "
            "FROM p JOIN u ua ON ua.term = p.center "
            "JOIN u ub ON ub.term = p.context CROSS JOIN nn"
        ),
        "charclass_stats": (
            # strlen == byte length for this ASCII corpus; class counts
            # via length minus length-after-removal
            "WITH c AS (SELECT lang, strlen(text) AS nb, "
            "strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g')) AS lt, "
            "strlen(text) - strlen(regexp_replace(text, '[0-9]', '', 'g')) AS dg, "
            "strlen(text) - strlen(regexp_replace(text, '[ \\t\\n\\r]', '', 'g')) AS sp "
            "FROM documents) "
            "SELECT lang, sum(nb)::BIGINT AS n_bytes, sum(lt)::BIGINT AS letters, "
            "sum(dg)::BIGINT AS digits, sum(sp)::BIGINT AS spaces, "
            "(sum(nb) - sum(lt) - sum(dg) - sum(sp))::BIGINT AS other "
            "FROM c GROUP BY lang"
        ),
        "skipgram_counts": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "WHERE trim(text) <> ''), "
            "pos AS (SELECT doc_id, i, t[i] AS w FROM toks, "
            "unnest(range(1, len(t) + 1)) AS r(i)), "
            "p AS (SELECT a.w AS center, b.w AS context FROM pos a "
            "JOIN pos b ON b.doc_id = a.doc_id AND b.i <> a.i "
            "AND abs(b.i - a.i) <= 2) "
            "SELECT center, context, count(*)::BIGINT AS cnt "
            "FROM p GROUP BY center, context"
        ),
        "dedup_report": (
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "count(DISTINCT md5(text))::BIGINT AS n_unique, "
            "((count(*) - count(DISTINCT md5(text))) * 1000000 // count(*))"
            "::BIGINT AS dup_rate_e6 FROM documents GROUP BY source"
        ),
        "doc_repetition": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "WHERE trim(text) <> ''), "
            "tri AS (SELECT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS g "
            "FROM toks, unnest(range(1, len(t) - 1)) AS r(i) WHERE len(t) >= 3) "
            "SELECT doc_id, count(*)::BIGINT AS n_trigrams, "
            "(count(*) - count(DISTINCT g))::BIGINT AS dup_trigrams "
            "FROM tri GROUP BY doc_id"
        ),
        "inverted_index": (
            "WITH pairs AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "FROM documents WHERE trim(text) <> '') "
            "SELECT term, count(*)::BIGINT AS df, "
            "string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings "
            "FROM pairs GROUP BY term"
        ),
        "textrank_terms": (
            # all-integer synchronized push over the distinct
            # within-window-2 term pair graph, uniform e12 init, 12
            # rounds (testdata.q_textrank_terms; arithmetic identical
            # to host_pagerank_push)
            "WITH RECURSIVE toks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "WHERE trim(text) <> ''), "
            "pos AS (SELECT doc_id, i, t[i] AS w FROM toks, "
            "unnest(range(1, len(t) + 1)) AS r(i)), "
            "pr AS (SELECT DISTINCT a.w AS s, b.w AS d FROM pos a "
            "JOIN pos b ON b.doc_id = a.doc_id AND b.i <> a.i "
            "AND abs(b.i - a.i) <= 2 AND a.w <> b.w), "
            "vs AS (SELECT DISTINCT s AS h FROM pr), "
            "deg AS (SELECT s AS h, count(*)::BIGINT AS dd FROM pr GROUP BY s), "
            "relax AS (SELECT s, d, 1 AS w FROM pr "
            "          UNION ALL SELECT h, h, 0 FROM vs), "
            "nv AS (SELECT count(*)::BIGINT AS c FROM vs), "
            "st AS ( "
            "  SELECT 0 AS it, v.h AS v, "
            "    (1000000000000 // nv.c)::BIGINT AS r, 0::BIGINT AS p "
            "  FROM vs v CROSS JOIN nv "
            "  UNION ALL "
            "  SELECT s2.it + 1, r2.d, "
            "    COALESCE(SUM(CASE WHEN r2.w = 1 THEN "
            "      (85 * s2.r) // (100 * dg.dd) END), 0)::BIGINT, "
            "    SUM(CASE WHEN r2.w = 0 THEN s2.p + (15 * s2.r) // 100 END)"
            "::BIGINT "
            "  FROM st s2 JOIN relax r2 ON r2.s = s2.v "
            "  LEFT JOIN deg dg ON dg.h = s2.v "
            "  WHERE s2.it < 12 GROUP BY s2.it, r2.d) "
            "SELECT v AS term, p AS p_e12, r AS r_e12 FROM st WHERE it = 12"
        ),
        "term_branching": (
            # per term: occurrences + distinct left/right neighbors
            # over adjacent in-document pairs
            # (testdata.q_term_branching)
            "WITH btoks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "WHERE trim(text) <> ''), "
            "occ AS (SELECT t[i] AS term, count(*)::BIGINT AS n_occur "
            "  FROM btoks, unnest(range(1, len(t) + 1)) AS r(i) GROUP BY t[i]), "
            "bp AS (SELECT DISTINCT t[i] AS l, t[i + 1] AS r FROM btoks, "
            "  unnest(range(1, len(t))) AS g(i) WHERE len(t) >= 2), "
            "nright AS (SELECT l AS term, count(*)::BIGINT AS n_right "
            "  FROM bp GROUP BY l), "
            "nleft AS (SELECT r AS term, count(*)::BIGINT AS n_left "
            "  FROM bp GROUP BY r) "
            "SELECT occ.term, occ.n_occur, "
            "COALESCE(nleft.n_left, 0)::BIGINT AS n_left, "
            "COALESCE(nright.n_right, 0)::BIGINT AS n_right "
            "FROM occ LEFT JOIN nleft ON nleft.term = occ.term "
            "LEFT JOIN nright ON nright.term = occ.term"
        ),
        "ngram_novelty_curve": (
            # per n in 1..5: total vs distinct word n-grams corpus-wide
            # (testdata.q_ngram_novelty_curve)
            "WITH ntoks AS (SELECT doc_id, "
            "regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "WHERE trim(text) <> ''), "
            "g AS (SELECT 1 AS n, t[i] AS gram FROM ntoks, unnest(range(1, len(t) - 1 + 2)) AS r(i) WHERE len(t) >= 1 UNION ALL SELECT 2 AS n, t[i + 0] || ' ' || t[i + 1] AS gram FROM ntoks, unnest(range(1, len(t) - 2 + 2)) AS r(i) WHERE len(t) >= 2 UNION ALL SELECT 3 AS n, t[i + 0] || ' ' || t[i + 1] || ' ' || t[i + 2] AS gram FROM ntoks, unnest(range(1, len(t) - 3 + 2)) AS r(i) WHERE len(t) >= 3 UNION ALL SELECT 4 AS n, t[i + 0] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] AS gram FROM ntoks, unnest(range(1, len(t) - 4 + 2)) AS r(i) WHERE len(t) >= 4 UNION ALL SELECT 5 AS n, t[i + 0] || ' ' || t[i + 1] || ' ' || t[i + 2] || ' ' || t[i + 3] || ' ' || t[i + 4] AS gram FROM ntoks, unnest(range(1, len(t) - 5 + 2)) AS r(i) WHERE len(t) >= 5) "
            "SELECT n::BIGINT AS n, count(*)::BIGINT AS total, "
            "count(DISTINCT gram)::BIGINT AS n_distinct, "
            "((2 * (count(*) - count(DISTINCT gram)) * 1000000 + count(*)) "
            " // (2 * count(*)))::BIGINT AS dup_share_e6 "
            "FROM g GROUP BY n"
        ),
        "dataset_card": (
            # per-source datasheet; dominant lang = mode with lexical
            # tie-break; quality via the exact _quality_sql mirror
            # (testdata.q_dataset_card)
            "WITH q AS (" + _quality_sql() + "), "
            "base AS (SELECT d.source, d.lang, "
            "  (CASE WHEN trim(d.text) = '' THEN 0 ELSE "
            "   length(regexp_split_to_array(trim(d.text), '\\s+')) END)"
            "::BIGINT AS toks, q.quality_e6 "
            "  FROM documents d JOIN q ON q.doc_id = d.doc_id), "
            "per AS (SELECT source, count(*)::BIGINT AS n_docs, "
            "  SUM(toks)::BIGINT AS n_tokens, "
            "  count(DISTINCT lang)::BIGINT AS n_langs, "
            "  SUM(quality_e6)::BIGINT AS q_sum FROM base GROUP BY source), "
            "lc AS (SELECT source, lang, count(*)::BIGINT AS c FROM base "
            "  GROUP BY source, lang), "
            "top AS (SELECT source, lang AS top_lang, c FROM lc "
            "  QUALIFY row_number() OVER (PARTITION BY source "
            "  ORDER BY c DESC, lang) = 1) "
            "SELECT per.source, per.n_docs, per.n_tokens, per.n_langs, "
            "top.top_lang, "
            "((2 * top.c * 1000000 + per.n_docs) // (2 * per.n_docs))"
            "::BIGINT AS top_lang_share_e6, "
            "((2 * per.q_sum + per.n_docs) // (2 * per.n_docs))"
            "::BIGINT AS mean_quality_e6 "
            "FROM per JOIN top ON top.source = per.source"
        ),
        "dict_frontcoding": (
            # sorted distinct p_name strings; per entry the longest
            # common prefix with its lag() predecessor via the
            # substr-equality range scan (testdata.q_dict_frontcoding;
            # p_name is ASCII so bytes == chars)
            "WITH t AS (SELECT DISTINCT p_name AS s FROM part), "
            "o AS (SELECT s, lag(s) OVER (ORDER BY s) AS prev FROM t), "
            "cp AS (SELECT s, prev, CASE WHEN prev IS NULL THEN 0 ELSE "
            "  COALESCE((SELECT max(r.i) FROM "
            "    unnest(range(1, least(length(o.s), length(o.prev)) + 1)) "
            "    AS r(i) "
            "    WHERE substr(o.s, 1, r.i) = substr(o.prev, 1, r.i)), 0) "
            "  END::BIGINT AS c FROM o) "
            "SELECT count(*)::BIGINT AS n_terms, "
            "SUM(length(s))::BIGINT AS raw_bytes, "
            "SUM(c)::BIGINT AS prefix_saved, "
            "(SUM(length(s)) - SUM(c))::BIGINT AS fc_bytes, "
            "((2 * SUM(c) * 1000000 + SUM(length(s))) "
            " // (2 * SUM(length(s))))::BIGINT AS savings_e6 "
            "FROM cp"
        ),
        "span_corruption": (
            # token i masked iff mix64(29, doc_id, i) % 100 < 15;
            # spans = contiguous masked runs found via window lag
            # (testdata.q_span_corruption; 29 * FNVprime = 31885837218119)
            "WITH stoks AS (SELECT doc_id, "
            "  regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "  WHERE trim(text) <> ''), "
            "pos AS (SELECT doc_id, r.i - 1 AS i FROM stoks, "
            "  unnest(range(1, len(t) + 1)) AS r(i)), "
            "hx AS (SELECT doc_id, i, "
            + _wrap_mul(
                "xor(31885837218119::UBIGINT, doc_id::UBIGINT)::HUGEINT",
                1099511628211,
            )
            + " AS a2 FROM pos), "
            "h3 AS (SELECT doc_id, i, "
            + _splitmix_cols("xor((a2)::UBIGINT, i::UBIGINT)", "h")
            + " FROM hx), "
            "m AS (SELECT doc_id, i, ((h % 100)::BIGINT < 15) AS mk FROM h3), "
            "sp AS (SELECT doc_id, mk, (mk AND NOT coalesce("
            "  lag(mk) OVER (PARTITION BY doc_id ORDER BY i), FALSE)) AS st "
            "  FROM m) "
            "SELECT doc_id, count(*)::BIGINT AS n_tokens, "
            "count(*) FILTER (mk)::BIGINT AS n_masked, "
            "count(*) FILTER (st)::BIGINT AS n_spans "
            "FROM sp GROUP BY doc_id"
        ),
        "mixture_sample": (
            # execute the capped-proportional plan: keep doc iff
            # mix64(71, doc_id) % 1e6 < its source's epochs_e6
            # (testdata.q_mixture_sample; 71 * FNVprime = 78065325602981)
            "WITH per AS (SELECT source, SUM(CASE WHEN trim(text) = '' THEN 0 "
            "  ELSE length(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT "
            "  AS tokens FROM documents GROUP BY source), "
            "tot AS (SELECT SUM(tokens)::BIGINT AS total, COUNT(*)::BIGINT AS n "
            "  FROM per), "
            "cp AS (SELECT source, tokens, "
            "  LEAST(tokens, 2 * total // (3 * n))::BIGINT AS capped_tokens "
            "  FROM per, tot), "
            "mw AS (SELECT source, "
            "  ((2 * capped_tokens * 1000000 + tokens) // (2 * tokens))::BIGINT "
            "  AS epochs_e6 FROM cp), "
            "s AS (SELECT d.doc_id, d.source, "
            + _splitmix_cols(
                "xor(78065325602981::UBIGINT, d.doc_id::UBIGINT)", "h"
            )
            + " FROM documents d) "
            "SELECT s.doc_id, s.source FROM s JOIN mw ON mw.source = s.source "
            "WHERE (s.h % 1000000)::BIGINT < mw.epochs_e6"
        ),
        "filter_funnel": (
            # cumulative C4-style cleaning funnel; stages mirror
            # testdata.q_filter_funnel (>=20 words -> lang='en' ->
            # trigram-dup share <= 0.2 -> quality >= 0.7); quality_e6
            # reuses the exact _quality_sql mirror
            "WITH q AS (" + _quality_sql() + "), "
            "dw AS (SELECT doc_id, lang, (CASE WHEN trim(text) = '' THEN 0 "
            "  ELSE length(regexp_split_to_array(trim(text), '\\s+')) END)"
            "::BIGINT AS n_words FROM documents), "
            "dtoks AS (SELECT doc_id, "
            "  regexp_split_to_array(trim(text), '\\s+') AS t FROM documents "
            "  WHERE trim(text) <> ''), "
            "tri AS (SELECT doc_id, count(*)::BIGINT AS n_tri, "
            "  (count(*) - count(DISTINCT g))::BIGINT AS dup FROM "
            "  (SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g "
            "   FROM dtoks, unnest(range(1, len(t) - 1)) AS r(i) "
            "   WHERE len(t) >= 3) GROUP BY doc_id), "
            "fl AS (SELECT dw.doc_id, "
            "  (dw.n_words >= 20) AS s1, "
            "  (dw.n_words >= 20 AND dw.lang = 'en') AS s2, "
            "  (dw.n_words >= 20 AND dw.lang = 'en' AND "
            "   (COALESCE(tri.n_tri, 0) <= 0 OR "
            "    (2 * COALESCE(tri.dup, 0) * 1000000 + tri.n_tri) "
            "    // (2 * tri.n_tri) <= 200000)) AS s3, "
            "  q.quality_e6 "
            "  FROM dw LEFT JOIN tri ON tri.doc_id = dw.doc_id "
            "  JOIN q ON q.doc_id = dw.doc_id), "
            "tot AS (SELECT count(*)::BIGINT AS n, "
            "  count(*) FILTER (s1)::BIGINT AS p1, "
            "  count(*) FILTER (s2)::BIGINT AS p2, "
            "  count(*) FILTER (s3)::BIGINT AS p3, "
            "  count(*) FILTER (s3 AND quality_e6 >= 700000)::BIGINT AS p4 "
            "  FROM fl) "
            "SELECT stage, name, n_pass, "
            "((2 * n_pass * 1000000 + n) // (2 * n))::BIGINT AS yield_e6 "
            "FROM (SELECT 0::BIGINT AS stage, 'all' AS name, n AS n_pass, n "
            "        FROM tot "
            "      UNION ALL SELECT 1, 'min_words', p1, n FROM tot "
            "      UNION ALL SELECT 2, 'lang', p2, n FROM tot "
            "      UNION ALL SELECT 3, 'low_repetition', p3, n FROM tot "
            "      UNION ALL SELECT 4, 'quality', p4, n FROM tot)"
        ),
        "mixture_weights": (
            # capped-proportional mixture rule, cap = 2*total//n_src;
            # half-up e6 divisions (testdata.q_mixture_weights)
            "WITH per AS (SELECT source, SUM(CASE WHEN trim(text) = '' THEN 0 "
            "  ELSE length(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT "
            "  AS tokens FROM documents GROUP BY source), "
            "tot AS (SELECT SUM(tokens)::BIGINT AS total, COUNT(*)::BIGINT AS n "
            "  FROM per), "
            "cp AS (SELECT source, tokens, "
            "  LEAST(tokens, 2 * total // n)::BIGINT AS capped_tokens "
            "  FROM per, tot), "
            "ct AS (SELECT SUM(capped_tokens)::BIGINT AS cap_total FROM cp) "
            "SELECT source, tokens, capped_tokens, "
            "((2 * capped_tokens * 1000000 + cap_total) // (2 * cap_total))"
            "::BIGINT AS weight_e6, "
            "((2 * capped_tokens * 1000000 + tokens) // (2 * tokens))::BIGINT "
            "AS epochs_e6 FROM cp, ct"
        ),
        "term_and_query": (
            # query = two lexicographically smallest terms with df >= 10;
            # hits = docs containing both (testdata.q_term_and_query)
            "WITH pairs AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "FROM documents WHERE trim(text) <> ''), "
            "q AS (SELECT term FROM pairs GROUP BY term "
            "  HAVING count(*) >= 10 ORDER BY term LIMIT 2), "
            "qq AS (SELECT min(term) AS ta, max(term) AS tb FROM q) "
            "SELECT p.doc_id, qq.ta AS term_a, qq.tb AS term_b "
            "FROM pairs p, qq WHERE p.term IN (qq.ta, qq.tb) "
            "GROUP BY p.doc_id, qq.ta, qq.tb HAVING count(*) = 2"
        ),
        "inverted_index_blocked": (
            # hot-term split: fixed 8-posting blocks per term, df = the
            # term's TOTAL df on every block row (skip metadata); block
            # concatenation in block_id order == the unblocked postings
            # (testdata.q_inverted_index_blocked)
            "WITH pairs AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "FROM documents WHERE trim(text) <> ''), "
            "rn AS (SELECT term, doc_id, "
            "  (row_number() OVER (PARTITION BY term ORDER BY doc_id) - 1) // 8 "
            "    AS block_id, "
            "  count(*) OVER (PARTITION BY term)::BIGINT AS df FROM pairs) "
            "SELECT term, block_id::BIGINT AS block_id, any_value(df) AS df, "
            "string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings "
            "FROM rn GROUP BY term, block_id"
        ),
        "source_overlap": (
            "WITH toks AS (SELECT source, trim(text) AS tx FROM documents WHERE trim(text) <> ''), "
            "pre AS (SELECT DISTINCT source, "
            "  array_to_string(regexp_split_to_array(tx, '\\s+')[1:8], ' ') AS fp FROM toks), "
            "con AS (SELECT DISTINCT source, md5(tx) AS fp FROM toks), "
            "p2 AS (SELECT x.source AS a, y.source AS b, count(*)::BIGINT AS c "
            "  FROM pre x JOIN pre y ON x.fp = y.fp AND x.source < y.source GROUP BY 1, 2), "
            "c2 AS (SELECT x.source AS a, y.source AS b, count(*)::BIGINT AS c "
            "  FROM con x JOIN con y ON x.fp = y.fp AND x.source < y.source GROUP BY 1, 2) "
            # identical content implies identical prefix, so c2 ⊆ p2
            "SELECT p2.a AS source_a, p2.b AS source_b, p2.c AS shared_prefixes, "
            "  COALESCE(c2.c, 0)::BIGINT AS shared_contents "
            "FROM p2 LEFT JOIN c2 ON c2.a = p2.a AND c2.b = p2.b"
        ),
        "term_burstiness": (
            "WITH dt AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "  FROM documents WHERE trim(text) <> ''), "
            "c AS (SELECT doc_id, term, count(*)::BIGINT AS c FROM dt GROUP BY 1, 2), "
            "t AS (SELECT term, sum(c)::BIGINT AS total_cnt, count(*)::BIGINT AS doc_freq, "
            "      sum(c * c)::BIGINT AS sumsq_cnt FROM c GROUP BY term) "
            "SELECT term, total_cnt, doc_freq, sumsq_cnt, "
            "  (total_cnt * 1000000 // doc_freq)::BIGINT AS burst_e6 "
            "FROM t ORDER BY total_cnt DESC, term LIMIT 50"
        ),
        "zipf_heaps": (
            "WITH dt AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "  FROM documents WHERE trim(text) <> ''), "
            "c AS (SELECT source, term, count(*)::BIGINT AS c FROM dt GROUP BY 1, 2) "
            "SELECT source, sum(c)::BIGINT AS total_tokens, "
            "  count(*)::BIGINT AS distinct_terms, "
            "  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_terms, "
            "  max(c)::BIGINT AS top_term_cnt "
            "FROM c GROUP BY source"
        ),
        "top_terms": (
            "SELECT term, count(*)::BIGINT AS cnt FROM ( "
            "  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "  FROM documents WHERE trim(text) <> '') "
            "GROUP BY term ORDER BY cnt DESC, term LIMIT 100"
        ),
        "events_hourly": (
            "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, "
            "event_type, count(*)::BIGINT AS n_events, "
            "CAST(ROUND(sum(value) * 1e6) AS BIGINT) AS sum_value_e6 "
            "FROM events GROUP BY 1, 2"
        ),
        "events_sliding": (
            "SELECT (epoch_us(ts) // 900000000 - k) * 900 AS win_start_epoch, "
            "event_type, count(*)::BIGINT AS n_events "
            "FROM events CROSS JOIN (VALUES (0),(1),(2),(3)) t(k) "
            "GROUP BY 1, 2"
        ),
        "events_cohort_value": (
            "WITH e AS (SELECT user_id, epoch_us(ts) // (7*86400000000) AS w, "
            "  CAST(ROUND(value * 100) AS BIGINT) AS c FROM events), "
            "f AS (SELECT user_id, min(w) AS cw FROM e GROUP BY 1) "
            "SELECT f.cw::BIGINT AS cohort_week, (e.w - f.cw)::BIGINT AS age_week, "
            "  count(DISTINCT e.user_id)::BIGINT AS n_users, sum(e.c)::BIGINT AS value_e2 "
            "FROM e JOIN f USING (user_id) GROUP BY 1, 2"
        ),
        "events_jsonl_hourly": (
            # oracle reads the ORIGINAL parquet; the query reads its
            # own JSONL export — format-roundtrip drift breaks the hash
            "SELECT epoch_us(ts) // 3600000000 AS hour_idx, event_type, "
            "count(*)::BIGINT AS n, "
            "sum(CAST(ROUND(value * 100) AS BIGINT))::BIGINT AS value_e2 "
            "FROM events GROUP BY 1, 2"
        ),
        "events_late": (
            # arrival order = splitmix64(event_id) (planted disorder);
            # watermark = running max event time over arrival order
            "WITH ak AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, "
            f"{_splitmix_cols('event_id', 'ak')} FROM events), "
            "w AS (SELECT event_type, ts_us, "
            "  max(ts_us) OVER (PARTITION BY user_id ORDER BY ak, event_id "
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm FROM ak) "
            "SELECT event_type, count(*)::BIGINT AS n_events, "
            "  sum(CASE WHEN wm IS NOT NULL AND wm - ts_us > 1800000000 THEN 1 ELSE 0 END)::BIGINT AS n_late, "
            "  COALESCE(max(CASE WHEN wm IS NOT NULL AND wm - ts_us > 1800000000 "
            "    THEN wm - ts_us END), 0)::BIGINT AS max_late_us "
            "FROM w GROUP BY 1"
        ),
        "events_sessionize": (
            "WITH g AS ( "
            "  SELECT user_id, event_id, ts, CASE WHEN lag(ts) OVER w IS NULL OR "
            "         epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000 "
            "         THEN 1 ELSE 0 END AS new_s "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT user_id, ts, sum(new_s) OVER "
            "      (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
            "SELECT user_id, epoch_us(min(ts)) // 1000000 AS session_start_epoch, "
            "count(*)::BIGINT AS n_events, "
            "(epoch_us(max(ts)) // 1000000 - epoch_us(min(ts)) // 1000000) AS duration_s "
            "FROM s GROUP BY user_id, sid"
        ),
        "doc_langid": _langid_sql(),
        "doc_rolling_fingerprint": _rolling_fp_sql(),
        "multimodal_decode": _multimodal_sql(),
        "doc_simhash_pairs": _simhash_sql(),
        "doc_minhash_dedup": _minhash_dedup_sql(),
        "incremental_neardup": (
            # exact-Jaccard >= 0.8 pairs touching a "new" doc
            # (doc_id % 5 == 0) — the incremental-probe subset of the
            # minhash oracle's pair CTEs (testdata.q_incremental_neardup)
            _minhash_dedup_sql().split("verts AS")[0]
            + "sel AS (SELECT a, b FROM pairs "
            "WHERE a % 5 = 0 OR b % 5 = 0) "
            "SELECT a, b, (a % 5 = 0)::BIGINT AS a_is_new, "
            "(b % 5 = 0)::BIGINT AS b_is_new FROM sel"
        ),
        "neardup_threshold_curve": (
            # exact-Jaccard pair CTEs (through inter/sizes) from the
            # minhash oracle, re-thresholded at {0.80,0.85,0.90}; CC
            # per threshold via min-label propagation keyed by (thr,v)
            _minhash_dedup_sql().split("pairs AS")[0]
            + "scored AS ( "
            "  SELECT a, b, CAST(ROUND(i * 1000000.0 / (sa.n + sb.n - i)) AS BIGINT) AS je "
            "  FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b), "
            "thr AS (SELECT unnest([800000, 850000, 900000]) AS t), "
            "tpairs AS (SELECT thr.t AS thr, s.a, s.b FROM scored s, thr WHERE s.je >= thr.t), "
            "verts AS (SELECT DISTINCT thr, v FROM "
            "  (SELECT thr, a AS v FROM tpairs UNION ALL SELECT thr, b AS v FROM tpairs)), "
            "relax AS (SELECT thr, a AS s, b AS d FROM tpairs "
            "  UNION ALL SELECT thr, b, a FROM tpairs "
            "  UNION ALL SELECT thr, v, v FROM verts), "
            "c AS ( "
            "  SELECT 0 AS it, thr, v AS id, v AS lab FROM verts "
            "  UNION ALL "
            "  SELECT c.it + 1, c.thr, r.d, MIN(c.lab) FROM c "
            "  JOIN relax r ON r.thr = c.thr AND r.s = c.id "
            "  WHERE c.it < 60 GROUP BY c.it, c.thr, r.d), "
            "fin AS (SELECT thr, id, lab FROM c WHERE it = 60), "
            "tot AS (SELECT count(*)::BIGINT AS n FROM documents), "
            "ps AS (SELECT thr, count(*)::BIGINT AS n_pairs FROM tpairs GROUP BY thr), "
            "cs AS (SELECT thr, count(*)::BIGINT AS n_docs, "
            "       count(DISTINCT lab)::BIGINT AS n_cl FROM fin GROUP BY thr) "
            "SELECT thr.t::BIGINT AS threshold_e6, "
            "  COALESCE(ps.n_pairs, 0)::BIGINT AS n_pairs, "
            "  COALESCE(cs.n_docs, 0)::BIGINT AS n_docs_in_pairs, "
            "  COALESCE(cs.n_cl, 0)::BIGINT AS n_clusters, "
            "  ((SELECT n FROM tot) - COALESCE(cs.n_docs, 0) + COALESCE(cs.n_cl, 0))::BIGINT AS n_retained "
            "FROM thr LEFT JOIN ps ON ps.thr = thr.t LEFT JOIN cs ON cs.thr = thr.t "
            "ORDER BY threshold_e6"
        ),
        "lsh_bucket_stats": (
            # simhash chain (docs -> token FNV -> signed bit sums -> u)
            # from the simhash oracle, then EVERY document bucketed —
            # token-less docs (null/whitespace-only text) get u=0 via
            # the base LEFT JOIN, matching the engine's empty-doc
            # simhash of 0 (the engine histograms every row; the
            # inherited trim-filter would silently drop such docs from
            # the oracle only)
            _simhash_sql().split("SELECT x.doc_id")[0]
            + ", base AS (SELECT doc_id FROM documents), "
            "shu AS (SELECT b.doc_id, COALESCE(sh.u, 0::HUGEINT) AS u "
            "  FROM base b LEFT JOIN sh ON sh.doc_id = b.doc_id), "
            "bnd AS (SELECT b.b AS band, "
            "    ((u::UBIGINT >> (16 * b.b)) & 65535)::BIGINT AS key, doc_id "
            "  FROM shu, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) b), "
            "sizes AS (SELECT band, key, count(*)::BIGINT AS bucket_size "
            "  FROM bnd GROUP BY band, key) "
            "SELECT band::BIGINT AS band, bucket_size, "
            "  count(*)::BIGINT AS n_buckets, "
            "  (count(*) * (bucket_size * (bucket_size - 1) // 2))::BIGINT AS n_cand_pairs "
            "FROM sizes GROUP BY band, bucket_size"
        ),
        "page_analyze_rollup": _page_analyze_rollup_sql(),
        "page_simhash_bands": _page_simhash_bands_sql(),
        "page_minhash_bands": _page_minhash_bands_sql(),
        "neardup_cluster_sizes": _minhash_clusters_wrap(
            "SELECT cluster_size, count(*)::BIGINT AS n_clusters FROM "
            "(SELECT cluster_id, count(*)::BIGINT AS cluster_size "
            "FROM dd GROUP BY cluster_id) GROUP BY cluster_size"
        ),
        "neardup_retention_by_source": _minhash_clusters_wrap(
            "SELECT d.source, count(*)::BIGINT AS n_docs, "
            "COALESCE(SUM(CASE WHEN dd.doc_id IS NOT NULL "
            "AND dd.doc_id <> dd.cluster_id THEN 1 END), 0)::BIGINT "
            "AS n_dropped, "
            "((2 * (count(*) - COALESCE(SUM(CASE WHEN dd.doc_id IS NOT "
            "NULL AND dd.doc_id <> dd.cluster_id THEN 1 END), 0)) "
            "* 1000000 + count(*)) // (2 * count(*)))::BIGINT "
            "AS retained_e6 "
            "FROM documents d LEFT JOIN dd ON dd.doc_id = d.doc_id "
            "GROUP BY d.source"
        ),
        "doc_ngram_jaccard": _ngram_jaccard_sql(),
        "doc_split": _doc_split_sql(),
        "mis": _mis_sql(),
        "kcore": _kcore_sql(),
        "kcore_rounds": (
            # same recursive peel as _kcore_sql; per-vertex last
            # surviving round -> peel_round (0 = in core at fixpoint,
            # which replicates rows through the 60-round cap)
            f"WITH RECURSIVE {_EB_LINEITEM}, "
            "r AS ( "
            "  SELECT 0 AS it, u, v FROM "
            "    (SELECT src AS u, dst AS v FROM eb UNION ALL SELECT dst, src FROM eb) "
            "  UNION ALL "
            "  SELECT it + 1, u, v FROM ( "
            "    SELECT it, u, v, "
            "      min(du) OVER (PARTITION BY it, least(u, v), greatest(u, v)) AS mindeg "
            "    FROM (SELECT it, u, v, count(*) OVER (PARTITION BY it, u) AS du FROM r "
            "          WHERE it < 60)) "
            "  WHERE mindeg >= 20), "
            "pres AS (SELECT u AS vertex, max(it) AS last_it FROM r GROUP BY u) "
            "SELECT vertex::BIGINT AS vertex, "
            "  (CASE WHEN last_it = 60 THEN 0 ELSE last_it + 1 END)::BIGINT AS peel_round, "
            "  (CASE WHEN last_it = 60 THEN 1 ELSE 0 END)::BIGINT AS in_core "
            "FROM pres"
        ),
        "onion_layers": (
            # onion decomposition: each wave strips the current
            # min-degree class; layer = last wave with an incident
            # edge, +1; survivors at the 200-wave cap report cap+1
            # (mirrored by the query's kernel)
            f"WITH RECURSIVE {_U_ORDERS}, "
            "es AS (SELECT a AS src, b AS dst FROM u UNION ALL SELECT b, a FROM u), "
            "r AS ( "
            "  SELECT 0 AS it, src AS u, dst AS v FROM es "
            "  UNION ALL "
            "  SELECT it + 1, u, v FROM ( "
            "    SELECT it, u, v, "
            "      min(du) OVER (PARTITION BY it, least(u, v), greatest(u, v)) AS minend, "
            "      min(du) OVER (PARTITION BY it) AS kmin "
            "    FROM (SELECT it, u, v, count(*) OVER (PARTITION BY it, u) AS du "
            "          FROM r WHERE it < 200) "
            "  ) WHERE minend > kmin), "
            "pres AS (SELECT u AS vertex, max(it) AS last_it FROM r GROUP BY u) "
            "SELECT vertex::BIGINT AS vertex, (last_it + 1)::BIGINT AS layer FROM pres"
        ),
        "web_onion_layers": (
            # onion peel over distinct undirected onsite page pairs
            # (self-links excluded), same wave recurrence and cap as
            # "onion_layers"
            f"WITH RECURSIVE {_pages_edges_cte(2000, 42)}, "
            "ei AS (SELECT "
            "  CAST(split_part(split_part(src, 'site-', 2), '.', 1) AS BIGINT) * 16 "
            "    + CAST(split_part(src, '/', 5) AS BIGINT) AS u, "
            "  CAST(split_part(split_part(dst, 'site-', 2), '.', 1) AS BIGINT) * 16 "
            "    + CAST(split_part(dst, '/', 5) AS BIGINT) AS v "
            "  FROM e WHERE dst LIKE 'https://site-%'), "
            "pairs AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b "
            "  FROM ei WHERE u <> v), "
            "es2 AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs), "
            "r AS ( "
            "  SELECT 0 AS it, src AS u, dst AS v FROM es2 "
            "  UNION ALL "
            "  SELECT it + 1, u, v FROM ( "
            "    SELECT it, u, v, "
            "      min(du) OVER (PARTITION BY it, least(u, v), greatest(u, v)) AS minend, "
            "      min(du) OVER (PARTITION BY it) AS kmin "
            "    FROM (SELECT it, u, v, count(*) OVER (PARTITION BY it, u) AS du "
            "          FROM r WHERE it < 200) "
            "  ) WHERE minend > kmin), "
            "pres AS (SELECT u AS vertex, max(it) AS last_it FROM r GROUP BY u) "
            "SELECT vertex::BIGINT AS vertex, (last_it + 1)::BIGINT AS layer FROM pres"
        ),
        "web_coreness": (
            # h-index coreness fixpoint over the generator's distinct
            # onsite page links (i = site*16 + page); same recurrence
            # and 40-round cap as the "coreness" oracle
            f"WITH RECURSIVE {_pages_edges_cte(2000, 42)}, "
            "ei AS (SELECT "
            "  CAST(split_part(split_part(src, 'site-', 2), '.', 1) AS BIGINT) * 16 "
            "    + CAST(split_part(src, '/', 5) AS BIGINT) AS u, "
            "  CAST(split_part(split_part(dst, 'site-', 2), '.', 1) AS BIGINT) * 16 "
            "    + CAST(split_part(dst, '/', 5) AS BIGINT) AS v "
            "  FROM e WHERE dst LIKE 'https://site-%'), "
            "es2 AS (SELECT u AS src, v AS dst FROM ei UNION ALL SELECT v, u FROM ei), "
            "deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM es2 GROUP BY src), "
            "hv AS ( "
            "  SELECT 0 AS it, id, d AS val FROM deg "
            "  UNION ALL "
            "  SELECT it + 1, id, max(least(nval, rn)) AS val FROM ( "
            "    SELECT p.it AS it, e2.src AS id, p.val AS nval, "
            "           row_number() OVER (PARTITION BY e2.src ORDER BY p.val DESC) AS rn "
            "    FROM hv p JOIN es2 e2 ON e2.dst = p.id "
            "    WHERE p.it < 40 "
            "  ) GROUP BY it, id) "
            "SELECT id::BIGINT AS vertex, val::BIGINT AS coreness "
            "FROM hv WHERE it = 40"
        ),
        "coreness": (
            # iterated neighborhood h-index to the coreness fixpoint
            # (Lü et al. 2016); h-index per vertex per round =
            # max(least(neighbor value, desc rank)) — fixed 40 rounds,
            # invariant once converged (sf0.01 converges in 8)
            f"WITH RECURSIVE {_U_ORDERS}, "
            "es AS (SELECT a AS src, b AS dst FROM u UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM es GROUP BY src), "
            "hv AS ( "
            "  SELECT 0 AS it, id, d AS val FROM deg "
            "  UNION ALL "
            "  SELECT it + 1, id, max(least(nval, rn)) AS val FROM ( "
            "    SELECT p.it AS it, e.src AS id, p.val AS nval, "
            "           row_number() OVER (PARTITION BY e.src ORDER BY p.val DESC) AS rn "
            "    FROM hv p JOIN es e ON e.dst = p.id "
            "    WHERE p.it < 40 "
            "  ) GROUP BY it, id) "
            "SELECT id::BIGINT AS vertex, val::BIGINT AS coreness "
            "FROM hv WHERE it = 40"
        ),
        "densest_subgraph": _densest_sql(),
        "user_distinct_hll": _user_hll_sql(),
        "revenue_by_nation": (
            "SELECT n.n_name AS nation, count(*)::BIGINT AS n_orders, "
            "CAST(ROUND(sum(o.o_totalprice) * 100) AS BIGINT) AS revenue_e2 "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey GROUP BY 1"
        ),
        "corpus_curation": _corpus_curation_sql(),
        "doc_pack": (
            "WITH t AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 "
            "  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ntok "
            "  FROM documents), "
            "s AS (SELECT doc_id, COALESCE(SUM(ntok) OVER "
            "  (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st "
            "  FROM t) "
            "SELECT doc_id, st::BIGINT AS start_tok, (st // 512)::BIGINT AS bin_id FROM s"
        ),
        "order_quartiles": (
            "WITH j AS (SELECT o.o_orderkey, n.n_name AS nation, "
            "  CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS pc "
            "  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "  JOIN nation n ON n.n_nationkey = c.c_nationkey) "
            "SELECT o_orderkey, "
            "  NTILE(4) OVER (PARTITION BY nation ORDER BY pc, o_orderkey)::BIGINT AS quartile "
            "FROM j"
        ),
        "events_range_join": (
            "SELECT e1.user_id, count(*)::BIGINT AS n_pairs "
            "FROM events e1 JOIN events e2 "
            "  ON e1.user_id = e2.user_id AND e1.event_id < e2.event_id "
            " AND abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= 300000000 "
            "GROUP BY 1"
        ),
        "events_hourly_users": (
            "SELECT (epoch_us(date_trunc('hour', ts)))::BIGINT AS hour_e, "
            "count(DISTINCT user_id)::BIGINT AS n_users FROM events GROUP BY 1"
        ),
        "part_cooccurrence": (
            f"WITH {_EB_LINEITEM}, "
            "p AS (SELECT e1.dst AS a, e2.dst AS b FROM eb e1 "
            "      JOIN eb e2 ON e1.src = e2.src AND e1.dst < e2.dst), "
            "c AS (SELECT a, b, count(*) AS cnt FROM p GROUP BY 1, 2) "
            "SELECT a AS part_a, b AS part_b, cnt::BIGINT AS cnt FROM c "
            "ORDER BY cnt DESC, a, b LIMIT 100"
        ),
        "doc_classify": _classify_sql(),
        "cms_user_counts": (
            "WITH rr AS (SELECT r FROM unnest(generate_series(0, 3)) t(r)), "
            f"hh AS (SELECT {_wrap_mul('user_id::HUGEINT', _FNV64)} AS base, "
            "        xor((base)::UBIGINT, r::UBIGINT) AS x, "
            f"       {_splitmix_cols('x', 'h')}, r "
            "        FROM events CROSS JOIN rr) "
            "SELECT r::BIGINT AS r, (h % 1024)::BIGINT AS reg, count(*)::BIGINT AS cnt "
            "FROM hh GROUP BY 1, 2"
        ),
        "bloom_doc_positions": (
            "WITH it AS (SELECT ('0x' || substr(md5(text), 1, 16))::UBIGINT AS item "
            "            FROM documents), "
            "jj AS (SELECT j FROM unnest(generate_series(0, 2)) t(j)), "
            f"hh AS (SELECT xor(item, j::UBIGINT) AS x, {_splitmix_cols('x', 'h')} "
            "        FROM it CROSS JOIN jj) "
            "SELECT DISTINCT (h % 4096)::BIGINT AS pos FROM hh"
        ),
        "events_latest": (
            "SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type "
            "FROM events "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "        ORDER BY ts DESC, event_id DESC) = 1"
        ),
        "events_deltas": (
            "WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events) "
            "SELECT event_id, user_id, "
            "COALESCE(ts_us - LAG(ts_us) OVER (PARTITION BY user_id "
            "         ORDER BY ts_us, event_id), -1) AS delta_us FROM t"
        ),
        "orders_left_join": (
            "SELECT o.o_orderkey, o.o_custkey, "
            "COALESCE(c.c_nationkey, -1)::BIGINT AS nation "
            "FROM orders o LEFT JOIN "
            "(SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 5000) c "
            "ON c.c_custkey = o.o_custkey"
        ),
        "lineitem_antijoin": (
            "SELECT l_orderkey, count(*)::BIGINT AS n_items FROM lineitem "
            "WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders "
            "                         WHERE o_orderpriority = '1-URGENT') "
            "GROUP BY 1"
        ),
        "doc_sample_stratified": (
            f"WITH ss AS (SELECT lang, n_chars, {_splitmix_cols('doc_id::UBIGINT', 'h')} "
            "            FROM documents), "
            "f AS (SELECT lang, n_chars FROM ss WHERE h % 1000 < "
            "      CASE lang WHEN 'en' THEN 500 WHEN 'fr' THEN 250 "
            "           WHEN 'es' THEN 250 WHEN 'zh' THEN 125 ELSE 125 END) "
            "SELECT lang, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS sum_chars "
            "FROM f GROUP BY 1"
        ),
        "clustering_coeff": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT src AS vertex, count(*) AS d FROM es2 GROUP BY 1), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "        FROM u e1 JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b "
            "        JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "tv AS (SELECT vertex, count(*) AS t FROM ( "
            "       SELECT x AS vertex FROM tri UNION ALL SELECT y FROM tri "
            "       UNION ALL SELECT z FROM tri) GROUP BY vertex) "
            "SELECT deg.vertex::BIGINT AS vertex, deg.d::BIGINT AS degree, "
            "COALESCE(tv.t, 0)::BIGINT AS triangles, "
            "(CASE WHEN deg.d >= 2 THEN "
            " (4 * COALESCE(tv.t, 0) * 1000000 + deg.d * (deg.d - 1)) "
            " // (2 * deg.d * (deg.d - 1)) ELSE 0 END)::BIGINT AS cc_e6 "
            "FROM deg LEFT JOIN tv ON tv.vertex = deg.vertex"
        ),
        "maximal_matching": _matching_sql(),
        "graph_robustness": _robustness_sql(),
        "random_failure": _random_failure_sql(),
        "block_conductance": (
            f"WITH {_EB_CLIQUEY}, "
            "e2 AS (SELECT a // 8 AS ba, b // 8 AS bb FROM ebq), "
            "pb AS (SELECT ba AS block, 1 AS vol, "
            "       CASE WHEN ba <> bb THEN 1 ELSE 0 END AS cut, "
            "       CASE WHEN ba = bb THEN 1 ELSE 0 END AS internal FROM e2 "
            "       UNION ALL SELECT bb, 1, "
            "       CASE WHEN ba <> bb THEN 1 ELSE 0 END, 0 FROM e2), "
            "s AS (SELECT block, sum(vol)::BIGINT AS vol, sum(cut)::BIGINT AS cut, "
            "      sum(internal)::BIGINT AS internal FROM pb GROUP BY block), "
            "t AS (SELECT sum(vol) AS tv FROM s) "
            "SELECT block::BIGINT AS block, internal AS internal_edges, "
            "cut AS cut_edges, vol AS volume, "
            "CASE WHEN least(vol, t.tv - vol) > 0 "
            "THEN cut * 1000000 // least(vol, t.tv - vol) ELSE -1 END::BIGINT "
            "AS phi_e6 FROM s CROSS JOIN t"
        ),
        "markov_stationary": (
            # power iteration on the row-normalized clickstream chain;
            # uniform start, 25 applications, e8 like the PR family
            "WITH RECURSIVE c AS ( "
            "  SELECT f, event_type AS t, count(*)::BIGINT AS cnt FROM ( "
            "    SELECT user_id, event_type, "
            "      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f "
            "    FROM events) WHERE f IS NOT NULL GROUP BY 1, 2), "
            "types AS (SELECT DISTINCT event_type AS ty FROM events), "
            "rs AS (SELECT f, sum(cnt)::DOUBLE AS s FROM c GROUP BY f), "
            "nn AS (SELECT count(*)::DOUBLE AS k FROM types), "
            "pi AS ( "
            "  SELECT 0 AS it, ty, 1.0 / nn.k AS v FROM types, nn "
            "  UNION ALL "
            "  SELECT p.it + 1, c.t AS ty, SUM(p.v * c.cnt / rs.s) AS v "
            "  FROM pi p JOIN c ON c.f = p.ty JOIN rs ON rs.f = p.ty "
            "  WHERE p.it < 25 GROUP BY p.it, c.t) "
            "SELECT ty AS event_type, CAST(ROUND(v * 1e8) AS BIGINT) AS pi_e8 "
            "FROM pi WHERE it = 25"
        ),
        "events_transitions": (
            "WITH p AS (SELECT user_id, event_type, LAG(event_type) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events), "
            "c AS (SELECT prev AS from_type, event_type AS to_type, "
            "count(*)::BIGINT AS cnt FROM p WHERE prev IS NOT NULL GROUP BY 1, 2) "
            "SELECT from_type, to_type, cnt, "
            "(cnt * 1000000 // sum(cnt) OVER (PARTITION BY from_type))::BIGINT "
            "AS p_e6 FROM c"
        ),
        "ecc_bounds": (
            # two BFS recursions (s0 = min id, far1 = argmax dist of the
            # first sweep, tie -> lowest id) + per-vertex GREATEST
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "srcv AS (SELECT min(id) AS s FROM v), "
            "relax AS (SELECT src, dst, 1 AS w FROM es "
            "          UNION ALL SELECT id, id, 0 FROM v), "
            "d1 AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id = (SELECT s FROM srcv) "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d1 p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst), "
            "f1 AS (SELECT id FROM d1 WHERE it = 60 AND dist < 1e17 "
            "       ORDER BY dist DESC, id LIMIT 1), "
            "d2 AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id = (SELECT id FROM f1) "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d2 p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst) "
            "SELECT a.id AS vertex, "
            "CAST(GREATEST(a.dist, b.dist) AS BIGINT) AS ecc_lb "
            "FROM d1 a JOIN d2 b ON b.id = a.id AND b.it = 60 "
            "WHERE a.it = 60 AND a.dist < 1e17 AND b.dist < 1e17"
        ),
        "sssp_paths": (
            # HUGEINT walk-count recursion: walks of length dist(v) ARE
            # the shortest paths (stress-centrality oracle pattern)
            f"WITH RECURSIVE {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u UNION ALL SELECT b, a FROM u), "
            "vv AS (SELECT DISTINCT src AS id FROM es2), "
            "srcv AS (SELECT min(id) AS s FROM vv), "
            "w AS ( "
            "  SELECT 0 AS it, (SELECT s FROM srcv) AS id, 1::HUGEINT AS sig "
            "  UNION ALL "
            "  SELECT p.it + 1, e.dst, sum(p.sig) FROM w p "
            "  JOIN es2 e ON e.src = p.id WHERE p.it < 8 GROUP BY p.it, e.dst), "
            "dm AS (SELECT id, min(it) AS dist FROM w GROUP BY id) "
            "SELECT w.id AS vertex, dm.dist::BIGINT AS dist, w.sig::BIGINT AS n_paths "
            "FROM w JOIN dm ON dm.id = w.id AND dm.dist = w.it"
        ),
        "two_hop_size": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u UNION ALL SELECT b, a FROM u), "
            "n2 AS (SELECT a.src AS v, b.dst AS w FROM es2 a "
            "       JOIN es2 b ON b.src = a.dst "
            "       UNION ALL SELECT src, dst FROM es2) "
            "SELECT v AS vertex, count(DISTINCT w)::BIGINT AS n_two_hop "
            "FROM n2 WHERE w <> v GROUP BY v"
        ),
        "leadtime_quantiles": (
            "WITH t AS (SELECT o.o_orderpriority AS priority, "
            "(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 AS day "
            "FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey), "
            "w AS (SELECT priority, day, "
            "row_number() OVER (PARTITION BY priority ORDER BY day) AS r, "
            "count(*) OVER (PARTITION BY priority) AS n FROM t) "
            "SELECT priority, max(n)::BIGINT AS n, "
            "max(CASE WHEN r = (n + 1) // 2 THEN day END)::BIGINT AS p50_days, "
            "max(CASE WHEN r = (9 * n + 9) // 10 THEN day END)::BIGINT AS p90_days "
            "FROM w GROUP BY priority"
        ),
        "audience_overlap": (
            "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events), "
            "sz AS (SELECT event_type, count(*)::BIGINT AS n FROM ut GROUP BY 1), "
            "p AS (SELECT a.event_type AS type_a, b.event_type AS type_b, "
            "count(*)::BIGINT AS n_both FROM ut a JOIN ut b "
            "ON b.user_id = a.user_id AND b.event_type > a.event_type "
            "GROUP BY 1, 2) "
            "SELECT p.type_a, p.type_b, p.n_both, "
            "(sa.n + sb.n - p.n_both)::BIGINT AS n_either, "
            "(p.n_both * 1000000 // (sa.n + sb.n - p.n_both))::BIGINT AS jaccard_e6 "
            "FROM p JOIN sz sa ON sa.event_type = p.type_a "
            "JOIN sz sb ON sb.event_type = p.type_b"
        ),
        "page_degree_profile": (
            # per-instance out/in rows from the shared generator CTE,
            # full-outer merged per url
            f"WITH {_pages_edges_cte(2000, 42)}, "
            "src AS (SELECT printf('https://site-%05d.example/p/%04d', "
            "i // 16, i % 16) AS url, count(*)::BIGINT AS out_links "
            "FROM res GROUP BY 1), "
            "dst AS (SELECT href AS url, count(*)::BIGINT AS in_links "
            "FROM res GROUP BY 1) "
            "SELECT COALESCE(s.url, d.url) AS url, "
            "COALESCE(s.out_links, 0)::BIGINT AS out_links, "
            "COALESCE(d.in_links, 0)::BIGINT AS in_links "
            "FROM src s FULL OUTER JOIN dst d ON d.url = s.url"
        ),
        "domain_top_pages": (
            # per-instance in-link counts from the shared generator CTE,
            # row_number per target domain (ties broken by url)
            f"WITH {_pages_edges_cte(2000, 42)}, "
            "d AS (SELECT href AS url, count(*)::BIGINT AS n_inlinks "
            "      FROM res GROUP BY href), "
            "t AS (SELECT split_part(url, '/', 3) AS domain, url, n_inlinks, "
            "      row_number() OVER (PARTITION BY split_part(url, '/', 3) "
            "        ORDER BY n_inlinks DESC, url) AS rk FROM d) "
            "SELECT domain, url, n_inlinks, rk::BIGINT AS rk FROM t WHERE rk <= 3"
        ),
        "anchor_stats": (
            # per-instance links from the shared generator CTE (res keeps
            # i, k per <a> tag); anchor text is 'link ' || k by generator
            # construction — mirrored from the engine's real extraction
            f"WITH {_pages_edges_cte(2000, 42)} "
            "SELECT href AS dst, count(*)::BIGINT AS n_inlinks, "
            "count(DISTINCT i)::BIGINT AS n_src_pages, "
            "count(DISTINCT 'link ' || k)::BIGINT AS n_anchors "
            "FROM res GROUP BY href"
        ),
        "graph_coarsen": (
            # one multilevel-coarsening step: contract each matched pair
            # to its min endpoint, re-aggregate parallel edges as weight
            f"WITH mm AS ({_matching_sql()}), {_U_ORDERS}, "
            "sup AS (SELECT a AS v, least(a, b) AS s FROM mm "
            "        UNION ALL SELECT b, least(a, b) FROM mm), "
            "m AS (SELECT COALESCE(sa.s, u.a) AS x, COALESCE(sb.s, u.b) AS y "
            "      FROM u LEFT JOIN sup sa ON sa.v = u.a "
            "      LEFT JOIN sup sb ON sb.v = u.b) "
            "SELECT least(x, y)::BIGINT AS u, greatest(x, y)::BIGINT AS v, "
            "count(*)::BIGINT AS weight FROM m WHERE x <> y GROUP BY 1, 2"
        ),
        "square_count": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "w AS (SELECT e1.dst AS a, e2.dst AS b FROM es2 e1 "
            "      JOIN es2 e2 ON e2.src = e1.src AND e2.dst > e1.dst), "
            "sc AS (SELECT a, b, count(*) AS cn FROM w GROUP BY 1, 2) "
            "SELECT COALESCE(SUM(cn * (cn - 1) // 2) // 2, 0)::BIGINT "
            "AS n_squares FROM sc"
        ),
        "coloring": _coloring_sql(),
        "events_props_agg": (
            "WITH t AS (SELECT event_type, "
            "  CAST(regexp_extract(props, '\"k\":\\s*(-?\\d+)', 1) AS BIGINT) AS k "
            "  FROM events WHERE regexp_matches(props, '\"k\":\\s*-?\\d+')) "
            "SELECT event_type, count(*)::BIGINT AS n, sum(k)::BIGINT AS sum_k, "
            "min(k)::BIGINT AS min_k, max(k)::BIGINT AS max_k "
            "FROM t GROUP BY event_type"
        ),
        "lineitem_median": (
            # exact k-th smallest (k = ceil(n/2)); prices are 2-decimal
            # so *100 never lands on a representable half — numpy
            # half-even vs DuckDB half-away cannot diverge here
            "WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v "
            "           FROM lineitem), "
            "s AS (SELECT count(*) AS n, (count(*) + 1) // 2 AS k FROM c) "
            "SELECT s.n::BIGINT AS n, s.k::BIGINT AS k, "
            "(SELECT v FROM c ORDER BY v LIMIT 1 OFFSET (SELECT k - 1 FROM s)"
            ")::BIGINT AS median_cents FROM s"
        ),
        "quantiles_sketch": (
            # rank-bracket assertion for the KLL sketch: the oracle
            # emits the EXACT order statistics at rank +- 2% (integer
            # slack arithmetic identical to the query's) and a literal
            # in_bracket = 1; the Ray side sets in_bracket from the
            # sketch estimate, so an out-of-tolerance sketch
            # hash-fails here. Estimates are not hashed (see
            # q_quantiles_sketch docstring).
            "WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c "
            "           FROM lineitem), "
            "cnt AS (SELECT count(*)::BIGINT AS n FROM v), "
            "qs(q_pct) AS (VALUES (10), (25), (50), (75), (90), (99)), "
            "rk AS (SELECT q_pct::BIGINT AS q_pct, "
            "  GREATEST(1, GREATEST(1, (q_pct * n) // 100) - "
            "              (20000 * n + 999999) // 1000000)::BIGINT AS rank_lo, "
            "  LEAST(n, GREATEST(1, (q_pct * n) // 100) + "
            "           (20000 * n + 999999) // 1000000)::BIGINT AS rank_hi "
            "  FROM qs, cnt), "
            "ordered AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v) "
            "SELECT r.q_pct AS q_pct, r.rank_lo AS rank_lo, r.rank_hi AS rank_hi, "
            "o1.c AS lo_cents, o2.c AS hi_cents, 1::BIGINT AS in_bracket "
            "FROM rk r JOIN ordered o1 ON o1.rn = r.rank_lo "
            "JOIN ordered o2 ON o2.rn = r.rank_hi ORDER BY q_pct"
        ),
        "sorted_export": (
            # range-partitioned global sort: exact splitters at ranks
            # i*n/8, part(x) = #(splitters < x) (boundary duplicates
            # -> lower part on both sides); empty ranges (duplicate
            # splitters) emit no row in either engine.
            "WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c "
            "           FROM lineitem), "
            "cnt AS (SELECT count(*)::BIGINT AS n FROM v), "
            "vc AS (SELECT c, count(*)::BIGINT AS m FROM v GROUP BY c), "
            "idx(i) AS (VALUES (1), (2), (3), (4), (5), (6), (7)), "
            "ordered AS (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM v), "
            "spl AS (SELECT o.c AS b FROM idx CROSS JOIN cnt CROSS JOIN ordered o "
            "        WHERE o.rn = GREATEST(1, (idx.i * cnt.n) // 8)), "
            "pc AS (SELECT vc.c, vc.m, "
            "       count(*) FILTER (WHERE spl.b < vc.c)::BIGINT AS part "
            "       FROM vc CROSS JOIN spl GROUP BY vc.c, vc.m) "
            "SELECT part, sum(m)::BIGINT AS n_rows, min(c)::BIGINT AS min_cents, "
            "max(c)::BIGINT AS max_cents FROM pc GROUP BY part ORDER BY part"
        ),
        "events_user_mode": (
            "WITH c AS (SELECT user_id, event_type, count(*)::BIGINT AS n "
            "FROM events GROUP BY user_id, event_type) "
            "SELECT user_id, event_type AS mode_type, n FROM c "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY n DESC, event_type) = 1"
        ),
        "customer_pareto": (
            "WITH rev AS (SELECT o_custkey, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_cents "
            "FROM orders GROUP BY o_custkey), "
            "t AS (SELECT o_custkey, revenue_cents, "
            "row_number() OVER (ORDER BY revenue_cents DESC, o_custkey) AS rnk, "
            "sum(revenue_cents) OVER (ORDER BY revenue_cents DESC, o_custkey "
            "ROWS UNBOUNDED PRECEDING) AS cum, "
            "(SELECT sum(revenue_cents) FROM rev) AS tot FROM rev) "
            "SELECT o_custkey, revenue_cents, rnk, "
            "CASE WHEN cum * 100 <= 80 * tot THEN 'A' "
            "WHEN cum * 100 <= 95 * tot THEN 'B' ELSE 'C' END AS abc FROM t"
        ),
        "nation_share": (
            "WITH nr AS (SELECT r.r_name AS region, n.n_name AS nation, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey GROUP BY 1, 2) "
            "SELECT region, nation, rev AS revenue_cents, "
            "(rev * 1000000 // sum(rev) OVER (PARTITION BY region))::BIGINT "
            "AS share_e6 FROM nr"
        ),
        "orders_zorder": (
            "WITH q AS (SELECT "
            "CAST(round(o_totalprice * 100) AS BIGINT) * 256 // 50000001 AS px, "
            "least(greatest((epoch_us(o_orderdate) // 86400000000 - 8035) // 16, 0), 255) AS dy "
            "FROM orders), "
            "z AS (SELECT px, dy, ("
            + " + ".join(
                f"(((px >> {i}) & 1) << {2 * i}) + (((dy >> {i}) & 1) << {2 * i + 1})"
                for i in range(8)
            )
            + ") AS zi FROM q) "
            "SELECT (zi >> 12)::BIGINT AS part, count(*)::BIGINT AS n, "
            "min(px)::BIGINT AS pmin, max(px)::BIGINT AS pmax, "
            "min(dy)::BIGINT AS dmin, max(dy)::BIGINT AS dmax "
            "FROM z GROUP BY part"
        ),
        "events_bounce": (
            "WITH e AS (SELECT user_id, event_type, ts, event_id, "
            "CASE WHEN LAG(ts) OVER w IS NULL OR "
            "epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000 "
            "THEN 1 ELSE 0 END AS new_s FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM e), "
            "g AS (SELECT event_type, "
            "count(*) OVER (PARTITION BY user_id, sid) AS n, "
            "row_number() OVER (PARTITION BY user_id, sid ORDER BY ts, event_id) "
            "AS rn FROM s) "
            "SELECT event_type AS entry_type, count(*)::BIGINT AS sessions, "
            "sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS bounces, "
            "(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000 // count(*))"
            "::BIGINT AS bounce_rate_e6 FROM g WHERE rn = 1 GROUP BY event_type"
        ),
        "lineitem_weighted_median": (
            "WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
            "CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem), "
            "s AS (SELECT sum(w)::BIGINT AS W, (sum(w) + 1) // 2 AS k FROM c), "
            "o AS (SELECT v, sum(w) OVER (ORDER BY v "
            "      ROWS UNBOUNDED PRECEDING) AS cw "
            "      FROM (SELECT v, sum(w) AS w FROM c GROUP BY v)) "
            "SELECT s.W AS total_w, s.k::BIGINT AS k, "
            "(SELECT min(v) FROM o WHERE cw >= s.k)::BIGINT AS wmedian_cents "
            "FROM s"
        ),
        "orders_rank": (
            # global row_number by (price desc, orderkey) — engine does it
            # via range-bucket histogram offsets, never a global sort
            "SELECT o_orderkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents, "
            "row_number() OVER (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) "
            "DESC, o_orderkey) AS rnk FROM orders"
        ),
        "dict_upsert": (
            "WITH old AS (SELECT DISTINCT c_custkey AS k FROM customer "
            "             WHERE c_custkey % 3 <> 0), "
            "newk AS (SELECT DISTINCT o_custkey AS k FROM orders "
            "         WHERE o_custkey NOT IN (SELECT k FROM old)), "
            "o AS (SELECT k, row_number() OVER (ORDER BY k) AS id, "
            "      'old' AS status FROM old), "
            "n AS (SELECT k, (SELECT count(*) FROM old) + "
            "      row_number() OVER (ORDER BY k) AS id, 'new' AS status FROM newk) "
            "SELECT k AS key, id, status FROM o "
            "UNION ALL SELECT k AS key, id, status FROM n"
        ),
        "events_burst": (
            "WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour, "
            "count(*)::BIGINT AS n FROM events GROUP BY event_type, hour), "
            "w AS (SELECT event_type, hour, n, "
            "COALESCE(sum(n) OVER (PARTITION BY event_type ORDER BY hour "
            "RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING), 0)::BIGINT AS trailing24 "
            "FROM c) "
            "SELECT event_type, hour::BIGINT AS hour, n, trailing24, "
            "CASE WHEN n * 24 > 2 * trailing24 THEN 1 ELSE 0 END::BIGINT AS burst "
            "FROM w WHERE trailing24 > 0"
        ),
        "events_chi2": (
            "WITH d AS (SELECT event_type, "
            "(epoch_us(ts) // 86400000000 + 4) % 7 AS dow FROM events), "
            "o AS (SELECT event_type, dow, count(*)::HUGEINT AS o "
            "      FROM d GROUP BY event_type, dow), "
            "rt AS (SELECT event_type, sum(o) AS rt FROM o GROUP BY event_type), "
            "ct AS (SELECT dow, sum(o) AS ct FROM o GROUP BY dow), "
            "nn AS (SELECT sum(o) AS n FROM o) "
            "SELECT o.event_type, o.dow::BIGINT AS dow, o.o::BIGINT AS n_events, "
            "CAST(((o.o * nn.n - rt.rt * ct.ct) * (o.o * nn.n - rt.rt * ct.ct) "
            "* 1000000) // (rt.rt * ct.ct * nn.n) AS BIGINT) AS chi2_e6 "
            "FROM o JOIN rt USING (event_type) JOIN ct USING (dow) CROSS JOIN nn"
        ),
        "events_retention": (
            "WITH d AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day "
            "FROM events), "
            "c AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id), "
            "u AS (SELECT DISTINCT d.user_id, c.cohort, d.day - c.cohort AS off "
            "FROM d JOIN c USING (user_id)) "
            "SELECT cohort AS cohort_day, off AS day_offset, "
            "count(*)::BIGINT AS n_users FROM u GROUP BY cohort, off"
        ),
        "events_ewma": (
            # per-user ordered scan as a recursive CTE over sequence
            # position; x > 0 so trunc (//) == floor on both sides
            "WITH RECURSIVE e AS (SELECT event_id, user_id, "
            "CAST(round(value * 100) AS BIGINT) AS x, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k "
            "FROM events), "
            "w AS ( "
            "  SELECT event_id, user_id, k, x AS y FROM e WHERE k = 1 "
            "  UNION ALL "
            "  SELECT e.event_id, e.user_id, e.k, (e.x + 3 * w.y) // 4 "
            "  FROM w JOIN e ON e.user_id = w.user_id AND e.k = w.k + 1) "
            "SELECT event_id, y AS ewma_c FROM w"
        ),
        "events_regression": (
            # HUGEINT sums; DuckDB // truncates toward zero — the engine
            # mirrors that (sign * (abs // den))
            "WITH t AS (SELECT event_type, "
            "CAST(epoch_us(ts) // 3600000000 - 473352 AS HUGEINT) AS x, "
            "CAST(round(value * 100) AS HUGEINT) AS y FROM events), "
            "s AS (SELECT event_type, count(*)::HUGEINT AS n, sum(x) AS sx, "
            "sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx "
            "FROM t GROUP BY event_type) "
            "SELECT event_type, n::BIGINT AS n, "
            "CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx) "
            "AS BIGINT) AS slope_e6 FROM s"
        ),
        "index_shard_plan": (
            # LPT greedy replayed as a recursive CTE carrying the
            # shard-load LIST as state: one host per step, least-loaded
            # shard wins (list_position returns the FIRST min = lowest
            # shard id, matching the engine's tie-break) — mirrors
            # testdata.q_index_shard_plan
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "hw AS (SELECT split_part(dst, '/', 3) AS host, count(*)::BIGINT AS w "
            "       FROM e GROUP BY 1), "
            "ord AS (SELECT host, w, row_number() OVER (ORDER BY w DESC, host) AS rn "
            "        FROM hw), "
            "rec AS ( "
            "  SELECT 0::BIGINT AS i, [0, 0, 0, 0, 0, 0, 0, 0]::BIGINT[] AS loads, "
            "         NULL::VARCHAR AS host, 0::BIGINT AS shard "
            "  UNION ALL "
            "  SELECT r.i + 1, "
            "         list_concat(list_concat(r.loads[1:k-1], [r.loads[k] + o.w]), "
            "                     r.loads[k+1:]), "
            "         o.host, k - 1 "
            "  FROM (SELECT *, list_position(loads, list_min(loads)) AS k FROM rec) r "
            "  JOIN ord o ON o.rn = r.i + 1) "
            "SELECT host, shard FROM rec WHERE i > 0"
        ),
        "rendezvous_shards": (
            # HRW: 8 splitmix scores per host, argmax with first-max
            # tie-break = lowest shard id (mirrors
            # testdata.q_rendezvous_shards)
            f"WITH {_pages_edges_cte()}, "
            "hh AS (SELECT DISTINCT split_part(dst, '/', 3) AS host FROM e), "
            "hid AS (SELECT host, CASE WHEN host LIKE 'site-%' "
            "        THEN CAST(substr(host, 6, 5) AS BIGINT) "
            "        ELSE 100000 + CAST(substr(host, 9, 4) AS BIGINT) END AS hid "
            "        FROM hh), "
            "sc AS (SELECT host, s::BIGINT AS s, "
            f"  xor({(77 * _FNV64) % _M64}::UBIGINT, (hid * 8 + s)::UBIGINT) AS acc0, "
            f"  {_splitmix_cols('acc0', 'm')} "
            "  FROM hid, LATERAL unnest(generate_series(0, 7)) t(s)) "
            "SELECT host, s AS shard FROM sc "
            "QUALIFY row_number() OVER (PARTITION BY host ORDER BY m DESC, s) = 1"
        ),
        "molloy_reed": (
            # <k^2>/<k> over symmetrized page-graph degrees, half-up e6
            # (mirrors testdata.q_molloy_reed)
            f"WITH {_pages_edges_cte()}, "
            "es2 AS (SELECT src AS v FROM e UNION ALL SELECT dst FROM e), "
            "deg AS (SELECT v, count(*)::BIGINT AS d FROM es2 GROUP BY v), "
            "mo AS (SELECT count(*)::BIGINT AS nv, sum(d)::BIGINT AS sd, "
            "       sum(d * d)::BIGINT AS sd2 FROM deg) "
            "SELECT nv AS n_vertices, sd AS sum_deg, sd2 AS sum_deg2, "
            "  ((2 * sd2::HUGEINT * 1000000 + sd) // (2 * sd))::BIGINT AS kappa_e6 "
            "FROM mo"
        ),
        "eigen_centrality": (
            # 4-step integer-exact power iteration + one half-up e8
            # normalization (mirrors testdata.q_eigen_centrality)
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "it AS ( "
            "  SELECT 0 AS i, src AS v, CAST(1 AS DOUBLE) AS val "
            "  FROM (SELECT DISTINCT src FROM es) "
            "  UNION ALL "
            "  SELECT p.i + 1, es.dst, SUM(p.val) FROM it p "
            "  JOIN es ON es.src = p.v WHERE p.i < 4 GROUP BY p.i, es.dst), "
            "fin AS (SELECT v, CAST(val AS HUGEINT) AS val FROM it WHERE i = 4), "
            "uni AS (SELECT DISTINCT src AS v FROM es), "
            "al AS (SELECT uni.v, COALESCE(fin.val, 0) AS val "
            "       FROM uni LEFT JOIN fin ON fin.v = uni.v), "
            "tot AS (SELECT sum(val) AS t FROM al) "
            "SELECT v AS vertex, "
            "  ((2 * val * 100000000 + t) // (2 * t))::BIGINT AS eig_e8 "
            "FROM al CROSS JOIN tot"
        ),
        "corpus_mix_weights": (
            # alpha=1/2 temperature weights: isqrt(count) exact (floor
            # sqrt, counts << 2^52), share floored vs the weight total
            # (mirrors testdata.q_corpus_mix_weights)
            "WITH c AS (SELECT lang, count(*)::BIGINT AS n FROM documents "
            "           GROUP BY lang), "
            "w AS (SELECT lang, n, CAST(floor(sqrt(n)) AS BIGINT) AS wi FROM c), "
            "t AS (SELECT sum(wi)::BIGINT AS tw FROM w) "
            "SELECT lang, n AS n_docs, wi AS w_isqrt, "
            "  ((1000000 * wi) // tw)::BIGINT AS share_e6 "
            "FROM w CROSS JOIN t"
        ),
        "condensation_stats": (
            # SCC labels from the mutual-reachability closure (same CTE
            # as the scc oracle), then the condensation DAG's vertex/
            # edge counts and largest component (mirrors
            # testdata.q_condensation_stats)
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_orderkey % 2000 AS src, l_partkey % 2000 AS dst "
            "       FROM lineitem WHERE l_orderkey % 2000 <> l_partkey % 2000 "
            "       AND (l_orderkey // 2000) % 29 = 0), "
            "v AS (SELECT DISTINCT id FROM "
            "      (SELECT src AS id FROM eb UNION ALL SELECT dst FROM eb)), "
            "r AS ( "
            "  SELECT id AS s, id AS d FROM v "
            "  UNION "
            "  SELECT r.s, e.dst FROM r JOIN eb e ON e.src = r.d), "
            "sid AS (SELECT a.s AS vtx, min(a.d) AS c FROM r a "
            "        JOIN r b ON b.s = a.d AND b.d = a.s GROUP BY a.s), "
            "ce AS (SELECT DISTINCT cs.c AS cu, cd.c AS cv FROM eb "
            "       JOIN sid cs ON cs.vtx = eb.src "
            "       JOIN sid cd ON cd.vtx = eb.dst WHERE cs.c <> cd.c), "
            "sz AS (SELECT c, count(*) AS n FROM sid GROUP BY c) "
            "SELECT (SELECT count(*) FROM sid)::BIGINT AS n_vertices, "
            "  (SELECT count(DISTINCT c) FROM sid)::BIGINT AS n_sccs, "
            "  (SELECT count(*) FROM ce)::BIGINT AS n_cond_edges, "
            "  (SELECT max(n) FROM sz)::BIGINT AS max_scc_size"
        ),
        "shipping_priority": (
            # TPC-H Q3 shape at the fixed cutoff; revenue integerized
            # per row before summing; ties (revenue DESC, orderkey)
            # (mirrors testdata.q_shipping_priority)
            "WITH li AS (SELECT l_orderkey, "
            "  CAST(round(l_extendedprice * 100) AS BIGINT) "
            "  * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev "
            "  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'), "
            "o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS o_date_us, "
            "      o_orderpriority FROM orders "
            "      WHERE o_orderdate < TIMESTAMP '1998-06-01') "
            "SELECT l_orderkey, o_date_us, o_orderpriority, "
            "  sum(rev)::BIGINT AS revenue_e4 "
            "FROM li JOIN o ON o.o_orderkey = li.l_orderkey "
            "GROUP BY 1, 2, 3 "
            "ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10"
        ),
        "shard_balance": (
            # both plans from one weight table: the LPT recursive CTE
            # (list state) + the HRW argmax, folded per shard (mirrors
            # testdata.q_shard_balance)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "hw AS (SELECT split_part(dst, '/', 3) AS host, count(*)::BIGINT AS w "
            "       FROM e GROUP BY 1), "
            "ord AS (SELECT host, w, row_number() OVER (ORDER BY w DESC, host) AS rn "
            "        FROM hw), "
            "rec AS ( "
            "  SELECT 0::BIGINT AS i, [0, 0, 0, 0, 0, 0, 0, 0]::BIGINT[] AS loads, "
            "         NULL::VARCHAR AS host, 0::BIGINT AS shard "
            "  UNION ALL "
            "  SELECT r.i + 1, "
            "         list_concat(list_concat(r.loads[1:k-1], [r.loads[k] + o.w]), "
            "                     r.loads[k+1:]), "
            "         o.host, k - 1 "
            "  FROM (SELECT *, list_position(loads, list_min(loads)) AS k FROM rec) r "
            "  JOIN ord o ON o.rn = r.i + 1), "
            "lpt AS (SELECT host, shard FROM rec WHERE i > 0), "
            "hid AS (SELECT host, CASE WHEN host LIKE 'site-%' "
            "        THEN CAST(substr(host, 6, 5) AS BIGINT) "
            "        ELSE 100000 + CAST(substr(host, 9, 4) AS BIGINT) END AS hid "
            "        FROM hw), "
            "sc AS (SELECT host, s::BIGINT AS s, "
            f"  xor({(77 * _FNV64) % _M64}::UBIGINT, (hid * 8 + s)::UBIGINT) AS acc0, "
            f"  {_splitmix_cols('acc0', 'm')} "
            "  FROM hid, LATERAL unnest(generate_series(0, 7)) t(s)), "
            "hrw AS (SELECT host, s AS shard FROM sc "
            "        QUALIFY row_number() OVER (PARTITION BY host ORDER BY m DESC, s) = 1), "
            "sh AS (SELECT s::BIGINT AS shard FROM "
            "       (SELECT unnest(generate_series(0, 7)) AS s)) "
            "SELECT sh.shard, "
            "  COALESCE((SELECT sum(w) FROM lpt JOIN hw USING (host) "
            "            WHERE lpt.shard = sh.shard), 0)::BIGINT AS lpt_load, "
            "  COALESCE((SELECT count(*) FROM lpt "
            "            WHERE lpt.shard = sh.shard), 0)::BIGINT AS lpt_hosts, "
            "  COALESCE((SELECT sum(w) FROM hrw JOIN hw USING (host) "
            "            WHERE hrw.shard = sh.shard), 0)::BIGINT AS hrw_load, "
            "  COALESCE((SELECT count(*) FROM hrw "
            "            WHERE hrw.shard = sh.shard), 0)::BIGINT AS hrw_hosts "
            "FROM sh"
        ),
        "lang_assortativity": (
            # Newman attribute mixing over the rebuilt lang matrix:
            # r = (m*tr - sum(row*col)) / (m*m - sum(row*col)), trunc
            # e6 (mirrors testdata.q_lang_assortativity)
            f"WITH {_pages_edges_cte()}, "
            f"lbase AS (SELECT i::UBIGINT AS i FROM range(0, 2000) t(i)), "
            f"lh AS (SELECT i, xor({(44 * _FNV64) % _M64}::UBIGINT, i) AS acc0, "
            f"       {_splitmix_cols('acc0', 'hl')} FROM lbase), "
            "pl AS (SELECT printf('https://site-%05d.example/p/%04d', "
            "       (i::BIGINT) // 16, (i::BIGINT) % 16) AS url, "
            "  CASE (hl % 8)::BIGINT WHEN 4 THEN 'de' WHEN 5 THEN 'fr' "
            "       WHEN 6 THEN 'es' WHEN 7 THEN 'zh' ELSE 'en' END AS lang "
            "  FROM lh), "
            "cm AS (SELECT ps.lang AS sl, pd.lang AS dl, count(*)::HUGEINT AS c "
            "  FROM e JOIN pl ps ON ps.url = e.src JOIN pl pd ON pd.url = e.dst "
            "  GROUP BY 1, 2), "
            "mo AS (SELECT sum(c) AS m, "
            "  sum(c) FILTER (sl = dl) AS tr FROM cm), "
            "rc AS (SELECT l, sum(r) * sum(co) AS p FROM ( "
            "   SELECT sl AS l, sum(c) AS r, 0::HUGEINT AS co FROM cm GROUP BY 1 "
            "   UNION ALL "
            "   SELECT dl, 0::HUGEINT, sum(c) FROM cm GROUP BY 1) GROUP BY l), "
            "ab AS (SELECT sum(p) AS ab FROM rc) "
            "SELECT m::BIGINT AS n_links, tr::BIGINT AS n_same_lang, "
            "  (CASE WHEN m * tr - ab < 0 "
            "   THEN -((ab - m * tr) * 1000000 // (m * m - ab)) "
            "   ELSE (m * tr - ab) * 1000000 // (m * m - ab) END)::BIGINT AS r_e6 "
            "FROM mo CROSS JOIN ab"
        ),
        "web_triangle_locality": (
            # oriented a<b<c 3-join over the simple canonical page
            # edges (int ids rebuilt from the urls); intra = all three
            # corners one host (mirrors testdata.q_web_triangle_locality)
            f"WITH {_pages_edges_cte()}, "
            "ids AS (SELECT "
            "  CASE WHEN src LIKE 'https://site-%' "
            "   THEN CAST(substr(split_part(src, '/', 3), 6, 5) AS BIGINT) * 16 "
            "        + CAST(split_part(src, '/', 5) AS BIGINT) "
            "   ELSE 10000000 + CAST(substr(split_part(src, '/', 3), 9, 4) AS BIGINT) END AS sid, "
            "  CASE WHEN dst LIKE 'https://site-%' "
            "   THEN CAST(substr(split_part(dst, '/', 3), 6, 5) AS BIGINT) * 16 "
            "        + CAST(split_part(dst, '/', 5) AS BIGINT) "
            "   ELSE 10000000 + CAST(substr(split_part(dst, '/', 3), 9, 4) AS BIGINT) END AS did "
            "  FROM e), "
            "ce AS (SELECT DISTINCT least(sid, did) AS a, greatest(sid, did) AS b "
            "       FROM ids WHERE sid <> did), "
            "tri AS (SELECT count(*)::BIGINT AS n FROM ce e1 "
            "  JOIN ce e2 ON e2.a = e1.a AND e2.b > e1.b "
            "  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "cei AS (SELECT a, b FROM ce "
            "        WHERE a // 16 = b // 16 AND a < 10000000 AND b < 10000000), "
            "trii AS (SELECT count(*)::BIGINT AS n FROM cei e1 "
            "  JOIN cei e2 ON e2.a = e1.a AND e2.b > e1.b "
            "  JOIN cei e3 ON e3.a = e1.b AND e3.b = e2.b) "
            "SELECT tri.n AS n_triangles, trii.n AS n_intra, "
            "  (CASE WHEN tri.n = 0 THEN 0 "
            "   ELSE (1000000 * trii.n) // tri.n END)::BIGINT AS intra_share_e6 "
            "FROM tri CROSS JOIN trii"
        ),
        "avg_neighbor_degree": (
            # knn(d), degree-weighted: one rational per degree class
            # (mirrors testdata.q_avg_neighbor_degree)
            f"WITH {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS u, count(*)::BIGINT AS d FROM es GROUP BY 1), "
            "pu AS (SELECT es.src AS u, count(*)::BIGINT AS m, "
            "       sum(dv.d)::BIGINT AS s "
            "       FROM es JOIN deg dv ON dv.u = es.dst GROUP BY 1) "
            "SELECT m AS degree, count(*)::BIGINT AS n_vertices, "
            "  ((1000000 * sum(s)) // sum(m))::BIGINT AS knn_e6 "
            "FROM pu GROUP BY m"
        ),
        "damping_sensitivity": (
            # two 30-iter chains (0.85 and 0.70) over the shared edge
            # CTE; top-25 ranks by (e8 DESC, id); overlap + total rank
            # displacement (mirrors testdata.q_damping_sensitivity)
            f"WITH RECURSIVE {_pages_edges_cte()}, {_pr_chain('')}, "
            "pr2 AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT q.it + 1, ee.dst, 0.30/nn.n + 0.70 * SUM(q.val / q.d), dd.d "
            "  FROM pr2 q CROSS JOIN nn JOIN es ee ON ee.src = q.id "
            "       JOIN deg dd ON dd.id = ee.dst "
            "  WHERE q.it < 30 GROUP BY q.it, ee.dst, dd.d, nn.n), "
            "fin2 AS (SELECT id, CAST(ROUND(val * 1e8) AS BIGINT) AS e8 "
            "         FROM pr2 WHERE it = 30), "
            "ta AS (SELECT id, row_number() OVER (ORDER BY e8 DESC, id) AS rk "
            "       FROM fin QUALIFY rk <= 25), "
            "tb AS (SELECT id, row_number() OVER (ORDER BY e8 DESC, id) AS rk "
            "       FROM fin2 QUALIFY rk <= 25) "
            "SELECT count(*)::BIGINT AS n_common, "
            "  COALESCE(sum(abs(ta.rk - tb.rk)), 0)::BIGINT AS sum_rank_disp "
            "FROM ta JOIN tb USING (id)"
        ),
        "pagerank_tol": (
            # recurrence to the 60-cap; stop = first multiple-of-5
            # boundary whose last step moved no vertex > 3e-7; scores
            # read AT that boundary — pins values AND stopping rule
            # (mirrors testdata.q_pagerank_tol / algorithms.PageRankTol)
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT q.it + 1, ee.dst, 0.15/nn.n + 0.85 * SUM(q.val / q.d), dd.d "
            "  FROM pr q CROSS JOIN nn JOIN es ee ON ee.src = q.id "
            "       JOIN deg dd ON dd.id = ee.dst "
            "  WHERE q.it < 60 GROUP BY q.it, ee.dst, dd.d, nn.n), "
            "mv AS (SELECT b.it AS it, max(abs(b.val - a.val)) AS mx "
            "       FROM pr a JOIN pr b ON b.id = a.id AND b.it = a.it + 1 "
            "       GROUP BY b.it), "
            "stop AS (SELECT COALESCE(min(it), 60) AS s FROM mv "
            "         WHERE it % 5 = 0 AND mx <= 3e-7) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr JOIN stop ON pr.it = stop.s"
        ),
        "patch_warm_pagerank": (
            # base-PR-30 over the pre-wave subgraph, then 10 warm
            # iterations over the FULL edge set seeded from it (new
            # urls 0), top-25 (mirrors testdata.q_patch_warm_pagerank)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "be AS (SELECT src, dst FROM e WHERE "
            "  CAST(substr(split_part(src, '/', 3), 6, 5) AS BIGINT) * 16 "
            "  + CAST(split_part(src, '/', 5) AS BIGINT) < 1600), "
            "bes AS (SELECT src, dst FROM be UNION ALL SELECT dst, src FROM be), "
            "bdeg AS (SELECT src AS id, count(*) AS d FROM bes GROUP BY src), "
            "bnn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM bdeg), "
            "bpr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM bdeg "
            "  UNION ALL "
            "  SELECT q.it + 1, ee.dst, 0.15/bnn.n + 0.85 * SUM(q.val / q.d), dd.d "
            "  FROM bpr q CROSS JOIN bnn JOIN bes ee ON ee.src = q.id "
            "       JOIN bdeg dd ON dd.id = ee.dst "
            "  WHERE q.it < 30 GROUP BY q.it, ee.dst, dd.d, bnn.n), "
            "bfin AS (SELECT id, val FROM bpr WHERE it = 30), "
            "es AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e), "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "w AS ( "
            "  SELECT 0 AS it, deg.id, COALESCE(bfin.val, 0.0) AS val, deg.d "
            "  FROM deg LEFT JOIN bfin ON bfin.id = deg.id "
            "  UNION ALL "
            "  SELECT q.it + 1, ee.dst, 0.15/nn.n + 0.85 * SUM(q.val / q.d), dd.d "
            "  FROM w q CROSS JOIN nn JOIN es ee ON ee.src = q.id "
            "       JOIN deg dd ON dd.id = ee.dst "
            "  WHERE q.it < 10 GROUP BY q.it, ee.dst, dd.d, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM w WHERE it = 10 "
            "ORDER BY score_e8 DESC, vertex LIMIT 25"
        ),
        "doulion_triangles": (
            # p=1/2 edge sampling by splitmix64 of the packed (a,b)
            # key, exact triangle count on the sample, 1/p^3 scale
            f"WITH {_U_ORDERS}, "
            f"s0 AS (SELECT a, b, {_splitmix_cols('(a*4294967296 + b)', 'h')} FROM u), "
            "s AS (SELECT a, b FROM s0 WHERE h % 2 = 0) "
            "SELECT (SELECT count(*) FROM s)::BIGINT AS n_sampled_edges, "
            "count(*)::BIGINT AS n_sampled_triangles, "
            "(count(*) * 8)::BIGINT AS est_triangles "
            "FROM s e1 JOIN s e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN s e3 ON e3.a = e1.b AND e3.b = e2.b"
        ),
        "promo_revenue": (
            # exact integer revenue: cents*(100-pct); floor(x*100+0.5)
            # is the same double expression numpy evaluates (_rev_e4)
            "WITH l AS (SELECT l_partkey, "
            "  year(l_shipdate) * 100 + month(l_shipdate) AS ym, "
            "  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * "
            "  (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem), "
            "j AS (SELECT ym, rev, (p_type = 'PROMO') AS promo FROM l "
            "      JOIN part ON p_partkey = l_partkey) "
            "SELECT ym::BIGINT AS ym, "
            "COALESCE(sum(rev) FILTER (promo), 0)::BIGINT AS promo_rev_e4, "
            "sum(rev)::BIGINT AS total_rev_e4, "
            "(COALESCE(sum(rev) FILTER (promo), 0) * 1000000 // sum(rev))"
            "::BIGINT AS promo_share_e6 "
            "FROM j GROUP BY ym"
        ),
        "returned_item_report": (
            # top-20 customers by returned revenue; custkey tie-break
            # makes the LIMIT deterministic for the hash gate
            "WITH l AS (SELECT l_orderkey, "
            "  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * "
            "  (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem WHERE l_returnflag = 'R'), "
            "a AS (SELECT o_custkey, sum(rev)::BIGINT AS revenue_e4 FROM l "
            "      JOIN orders ON o_orderkey = l_orderkey GROUP BY 1) "
            "SELECT c_custkey, c_name, n_name, revenue_e4 "
            "FROM a JOIN customer ON c_custkey = o_custkey "
            "JOIN nation ON n_nationkey = c_nationkey "
            "ORDER BY revenue_e4 DESC, c_custkey LIMIT 20"
        ),
        "volume_shipping": (
            # cross-nation (supplier, customer) trade volume per ship
            # year, domestic pairs excluded
            "WITH l AS (SELECT l_orderkey, l_suppkey, "
            "  year(l_shipdate)::BIGINT AS l_year, "
            "  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * "
            "  (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS rev "
            "FROM lineitem) "
            "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "l_year, sum(rev)::BIGINT AS volume_e4 "
            "FROM l JOIN orders ON o_orderkey = l_orderkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation sn ON sn.n_nationkey = s_nationkey "
            "JOIN nation cn ON cn.n_nationkey = c_nationkey "
            "WHERE s_nationkey <> c_nationkey "
            "GROUP BY 1, 2, 3"
        ),
        "events_autocorr": (
            # lag-1 pairs via lead() per type; Box-Jenkins single-
            # denominator rho1; HUGEINT sums; DuckDB // truncates
            # toward zero — engine mirrors (mirrors
            # testdata.q_events_autocorr)
            "WITH s AS (SELECT event_type, "
            "  CAST(round(value * 100) AS BIGINT) AS y, "
            "  lead(CAST(round(value * 100) AS BIGINT)) OVER "
            "    (PARTITION BY event_type ORDER BY ts, event_id) AS y2 "
            "  FROM events), "
            "p AS (SELECT event_type, y::HUGEINT AS y, y2::HUGEINT AS y2 "
            "      FROM s WHERE y2 IS NOT NULL), "
            "m AS (SELECT event_type, count(*)::HUGEINT AS m, sum(y) AS sx, "
            "      sum(y2) AS sy, sum(y * y2) AS sxy, sum(y * y) AS sxx "
            "      FROM p GROUP BY 1) "
            "SELECT event_type, m::BIGINT AS n_pairs, "
            "  (CASE WHEN m * sxx - sx * sx = 0 THEN 0 ELSE "
            "   ((m * sxy - sx * sy) * 1000000) // (m * sxx - sx * sx) "
            "   END)::BIGINT AS autocorr_e6 "
            "FROM m"
        ),
        "embedding_grid": (
            "WITH pts AS (SELECT CAST(floor(e[1] * 8) AS BIGINT) AS gx, "
            "CAST(floor(e[2] * 8) AS BIGINT) AS gy "
            "FROM (SELECT CAST(embedding AS DOUBLE[]) AS e FROM embeddings)), "
            "c AS (SELECT gx, gy, count(*)::BIGINT AS n FROM pts GROUP BY gx, gy) "
            "SELECT a.gx, a.gy, a.n, sum(b.n)::BIGINT AS n_nbr FROM c a "
            "JOIN c b ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1 "
            "GROUP BY a.gx, a.gy, a.n"
        ),
        "embedding_quantize": (
            "SELECT vec_id, sum(q)::BIGINT AS q_sum, sum(q * q)::BIGINT AS q_sumsq, "
            "min(q)::BIGINT AS q_min, max(q)::BIGINT AS q_max FROM ( "
            "  SELECT vec_id, CAST(floor(CAST(x AS DOUBLE) * 127) AS BIGINT) AS q "
            "  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)) "
            "GROUP BY vec_id"
        ),
        "data_quality": (
            "SELECT 'c_acctbal_nonneg' AS rule, "
            "count(*) FILTER (c_acctbal < 0)::BIGINT AS violations FROM customer "
            "UNION ALL SELECT 'o_custkey_fk', count(*)::BIGINT FROM orders "
            "WHERE o_custkey NOT IN (SELECT c_custkey FROM customer) "
            "UNION ALL SELECT 'o_orderkey_unique', "
            "(count(*) - count(DISTINCT o_orderkey))::BIGINT FROM orders "
            "UNION ALL SELECT 'o_totalprice_positive', "
            "count(*) FILTER (o_totalprice <= 0)::BIGINT FROM orders"
        ),
        "embedding_gram": (
            # floor(x*1024): float32->double is exact, double*1024 and
            # FLOOR are IEEE-identical between numpy and DuckDB
            "WITH q AS (SELECT vec_id, i, "
            "CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT) AS v FROM ("
            "  SELECT vec_id, unnest(embedding) AS x, "
            "  generate_subscripts(embedding, 1) AS i FROM embeddings)) "
            "SELECT a.i AS i, b.i AS j, sum(a.v * b.v)::BIGINT AS s "
            "FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i "
            "GROUP BY a.i, b.i"
        ),
        "orders_diff": (
            "WITH v1 AS (SELECT o_orderkey AS key, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS p FROM orders), "
            "v2 AS ( "
            "  SELECT key, p + CASE WHEN key % 97 = 0 THEN 1 ELSE 0 END AS p "
            "  FROM v1 WHERE key % 101 <> 0 "
            "  UNION ALL SELECT key + 100000000, p FROM v1 WHERE key % 103 = 0), "
            "j AS (SELECT COALESCE(v1.key, v2.key) AS key, v1.p AS p1, v2.p AS p2 "
            "      FROM v1 FULL OUTER JOIN v2 ON v1.key = v2.key) "
            "SELECT key, CASE WHEN p1 IS NULL THEN 'added' "
            "WHEN p2 IS NULL THEN 'removed' ELSE 'changed' END AS status, "
            "COALESCE(p1, -1) AS price_v1, COALESCE(p2, -1) AS price_v2 "
            "FROM j WHERE p1 IS NULL OR p2 IS NULL OR p1 <> p2"
        ),
        "events_new_users": (
            "WITH f AS (SELECT user_id, event_type, "
            "min(epoch_us(ts) // 86400000000) AS day FROM events "
            "GROUP BY user_id, event_type), "
            "d AS (SELECT event_type, day, count(*)::BIGINT AS new_users "
            "      FROM f GROUP BY event_type, day) "
            "SELECT event_type, day::BIGINT AS day, new_users, "
            "sum(new_users) OVER (PARTITION BY event_type ORDER BY day)::BIGINT "
            "AS cum_users FROM d"
        ),
        "lineitem_pruned": (
            "SELECT count(*)::BIGINT AS n, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(10000 - CAST(round(l_discount * 10000) AS BIGINT)))::BIGINT AS revenue_e6 "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-03-01' "
            "AND l_shipdate < TIMESTAMP '1995-04-01'"
        ),
        "orders_cube": (
            "SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n_orders, "
            "sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_cents "
            "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)"
        ),
        "dag_longest": (
            "WITH RECURSIVE ebs AS ( "
            "  SELECT DISTINCT least(x, y) AS u, greatest(x, y) AS v FROM ( "
            "    SELECT (l_orderkey % 2000) AS x, (l_partkey % 2000) AS y, "
            "           l_orderkey AS ok FROM lineitem) "
            "  WHERE x <> y AND (ok // 2000) % 29 = 0), "
            "d AS ( "
            "  SELECT u AS v, 0 AS depth FROM "
            "    (SELECT DISTINCT u FROM ebs WHERE u NOT IN (SELECT v FROM ebs)) "
            "  UNION ALL "
            "  SELECT ebs.v, max(d.depth + 1) FROM d JOIN ebs ON ebs.u = d.v "
            "  GROUP BY ebs.v) "
            "SELECT v::BIGINT AS vertex, max(depth)::BIGINT AS depth "
            "FROM d GROUP BY v"
        ),
        "motif_census": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT src AS v, count(*) AS d FROM es2 GROUP BY 1), "
            "tri AS (SELECT count(*) AS t FROM u e1 "
            "        JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b "
            "        JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "w AS (SELECT COALESCE(sum(d * (d - 1) // 2), 0) AS w FROM deg), "
            "ep AS (SELECT COALESCE(sum((da.d - 1) * (db.d - 1)), 0) AS s FROM u "
            "       JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b), "
            "ne AS (SELECT count(*) AS n FROM u) "
            "SELECT ne.n::BIGINT AS n_edges, w.w::BIGINT AS n_wedges, "
            "(ep.s - 3 * tri.t)::BIGINT AS n_p3, tri.t::BIGINT AS n_triangles "
            "FROM ne, w, ep, tri"
        ),
        "rich_club": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT src AS v, count(*) AS d FROM es2 GROUP BY 1), "
            "ks AS (SELECT unnest(generate_series(0, "
            "       (SELECT max(d) FROM deg) - 1)) AS k), "
            "nk AS (SELECT k, count(*) AS n_k FROM ks "
            "       JOIN deg ON deg.d > ks.k GROUP BY k), "
            "me AS (SELECT least(da.d, db.d) AS m FROM u "
            "       JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b), "
            "ek AS (SELECT k, count(*) AS e_k FROM ks JOIN me ON me.m > ks.k "
            "       GROUP BY k) "
            "SELECT nk.k::BIGINT AS k, n_k::BIGINT AS n_k, "
            "COALESCE(e_k, 0)::BIGINT AS e_k, "
            "((4 * COALESCE(e_k, 0) * 1000000 + n_k * (n_k - 1)) "
            " // (2 * n_k * (n_k - 1)))::BIGINT AS phi_e6 "
            "FROM nk LEFT JOIN ek USING (k) WHERE n_k >= 2"
        ),
        "doc_oov": (
            "WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') "
            "              AS toks FROM documents WHERE trim(text) <> ''), "
            "tok AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
            "vocab AS (SELECT term FROM tok GROUP BY term "
            "          ORDER BY count(*) DESC, term LIMIT 100), "
            "st AS (SELECT t.doc_id, count(*) AS n_tokens, "
            "       count(*) FILTER (v.term IS NULL) AS n_oov "
            "       FROM tok t LEFT JOIN vocab v ON v.term = t.term GROUP BY 1) "
            "SELECT doc_id::BIGINT AS doc_id, n_tokens::BIGINT AS n_tokens, "
            "n_oov::BIGINT AS n_oov, "
            "((2 * n_oov * 1000000 + n_tokens) // (2 * n_tokens))::BIGINT AS oov_e6 "
            "FROM st"
        ),
        "ktruss": (
            # 4-truss peel: per round, per-row adjacency comes from a
            # window LIST over the endpoint, the pair's two lists meet
            # on the mirror row via a window over (least, greatest),
            # and support = len(list_intersect) — ONE reference to the
            # recursive working table per round (kcore mirror-window
            # style, lifted from degrees to neighbor LISTS).
            "WITH RECURSIVE eb AS ( "
            "  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM ( "
            "    SELECT (o_orderkey % 1000) AS x, "
            "           (o_orderkey % 1000) - ((o_orderkey % 1000) % 8) "
            "             + (o_custkey % 8) AS y FROM orders "
            "    UNION ALL "
            "    SELECT (o_orderkey % 1000), (o_custkey % 1000) FROM orders "
            "    WHERE (o_orderkey // 1000) % 7 = 0 "
            "  ) WHERE x <> y), "
            "r AS ( "
            "  SELECT 0 AS it, a AS x, b AS y FROM "
            "    (SELECT a, b FROM eb UNION ALL SELECT b, a FROM eb) "
            "  UNION ALL "
            "  SELECT it + 1, x, y FROM ( "
            "    SELECT it, x, y, len(list_intersect(pl[1], pl[2])) AS s "
            "    FROM (SELECT it, x, y, list(nu) OVER "
            "            (PARTITION BY it, least(x, y), greatest(x, y)) AS pl "
            "          FROM (SELECT it, x, y, list(y) OVER "
            "                  (PARTITION BY it, x) AS nu "
            "                FROM r WHERE it < 40)) "
            "  ) WHERE s >= 2) "
            "SELECT DISTINCT least(x, y)::BIGINT AS a, greatest(x, y)::BIGINT AS b "
            "FROM r WHERE it = 40"
        ),
        "msf_boruvka": (
            # Relaxed Boruvka MSF: doubled edge rows carry BOTH
            # endpoint component labels (coloring-oracle pattern);
            # per round each label group marks its min crossing edge
            # by the strict (w, a, b) total order (taken edges are
            # MSF edges by the cut property for ANY label grouping
            # that is a union along taken edges), then labels
            # propagate one min-hop along all taken edges. Merge
            # schedule differs from the engine's union-find
            # contraction, but uniqueness of the MSF under a strict
            # total order makes the converged taken-set identical.
            f"WITH RECURSIVE {_EB_CLIQUEY}, "
            "we AS (SELECT a, b, "
            "  (1 + (37*a + 61*b) % 97) * 1048576 + a * 1024 + b AS k FROM ebq), "
            "r AS ( "
            "  SELECT 0 AS it, x, y, k, cx, cy, FALSE AS tk FROM ( "
            "    SELECT a AS x, b AS y, k, a AS cx, b AS cy FROM we "
            "    UNION ALL SELECT b, a, k, b, a FROM we) "
            "  UNION ALL "
            "  SELECT it + 1, x, y, k, "
            "    least(cx, coalesce(min(CASE WHEN tk2 THEN cy END) "
            "                       OVER (PARTITION BY cx), cx)), "
            "    least(cy, coalesce(min(CASE WHEN tk2 THEN cx END) "
            "                       OVER (PARTITION BY cy), cy)), "
            "    tk2 "
            "  FROM ( "
            "    SELECT it, x, y, k, cx, cy, tk OR "
            "      (max(CASE WHEN is_sel THEN 1 ELSE 0 END) OVER "
            "        (PARTITION BY least(x, y), greatest(x, y)) = 1) AS tk2 "
            "    FROM ( "
            "      SELECT it, x, y, k, cx, cy, tk, "
            "        (cx <> cy AND k = min(CASE WHEN cx <> cy THEN k END) "
            "                       OVER (PARTITION BY cx)) AS is_sel "
            "      FROM r WHERE it < 96))) "
            "SELECT DISTINCT least(x, y)::BIGINT AS a, "
            "  greatest(x, y)::BIGINT AS b, (k // 1048576)::BIGINT AS w "
            "FROM r WHERE it = 96 AND tk"
        ),
        "table_profile": (
            # per-element e2 rounding BEFORE the sum mirrors the
            # engine's integer-scaled partials exactly
            " UNION ALL ".join(
                f"SELECT '{c}' AS col, count(*)::BIGINT AS n_rows, "
                f"(count(*) - count({c}))::BIGINT AS n_null, "
                f"min(round({c} * 100))::BIGINT AS min_e2, "
                f"max(round({c} * 100))::BIGINT AS max_e2, "
                f"sum(round({c} * 100))::BIGINT AS sum_e2 FROM lineitem"
                for c in (
                    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                )
            )
        ),
        "fuzzy_name_pairs": (
            # brute-force levenshtein cross join (with the lossless
            # |Δlen| <= 1 prefilter) — the engine's FastSS blocking is
            # exact for d <= 1, so the sets must be identical
            "WITH u AS (SELECT DISTINCT p_name || ' ' || "
            "           (p_partkey % 100)::VARCHAR AS s FROM part) "
            "SELECT a.s AS name_a, b.s AS name_b, 1::BIGINT AS dist "
            "FROM u a JOIN u b ON a.s < b.s "
            "  AND abs(length(a.s) - length(b.s)) <= 1 "
            "WHERE levenshtein(a.s, b.s) = 1"
        ),
        "doc_bm25": (
            # integer BM25 (k1=1.2, b=0.75 multiplied through by
            # 10*avgdl; rational idf (N-df+1)/(df+1)), half-up e6 —
            # mirrors q_doc_bm25's arithmetic exactly
            "WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') "
            "              AS toks FROM documents WHERE trim(text) <> ''), "
            "dl AS (SELECT doc_id, len(toks) AS dl FROM docs), "
            "a AS (SELECT count(*) AS n, sum(len(toks)) // count(*) AS ad FROM docs), "
            "tok AS (SELECT doc_id, unnest(toks) AS term FROM docs), "
            "dfx AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok "
            "        WHERE term IN ('hash', 'join', 'vector') GROUP BY 1), "
            "idf AS (SELECT term, ((a.n - df + 1) * 2000000 + (df + 1)) "
            "        // (2 * (df + 1)) AS idf6 FROM dfx CROSS JOIN a), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok "
            "       WHERE term IN ('hash', 'join', 'vector') GROUP BY 1, 2), "
            "sc AS (SELECT tf.doc_id, "
            "       (2 * idf.idf6 * 22 * tf.tf * a.ad "
            "        + (10 * tf.tf * a.ad + 3 * a.ad + 9 * dl.dl)) "
            "       // (2 * (10 * tf.tf * a.ad + 3 * a.ad + 9 * dl.dl)) AS s6 "
            "       FROM tf JOIN idf USING (term) JOIN dl USING (doc_id) "
            "       CROSS JOIN a) "
            "SELECT doc_id::BIGINT AS doc_id, sum(s6)::BIGINT AS bm25_e6 "
            "FROM sc GROUP BY 1"
        ),
        "katz": (
            # Katz (beta=1/8) as 8^T-scaled integer recursion; the
            # virtual source -1 (self-loop w=8, fan-out w=8) delivers
            # the 8^k term through the SAME join+sum as real messages,
            # so vertices without in-edges stay in the working table.
            "WITH RECURSIVE "
            "eb AS (SELECT DISTINCT l_orderkey % 200 AS src, l_partkey % 200 AS dst "
            "       FROM lineitem WHERE l_orderkey % 200 <> l_partkey % 200), "
            "verts AS (SELECT DISTINCT v FROM "
            "          (SELECT src AS v FROM eb UNION ALL SELECT dst FROM eb)), "
            "d2 AS (SELECT src AS s, dst AS t, CAST(1 AS DOUBLE) AS w FROM eb "
            "       UNION ALL SELECT -1, v, CAST(8 AS DOUBLE) FROM verts "
            "       UNION ALL SELECT -1, -1, CAST(8 AS DOUBLE)), "
            "it AS ( "
            "  SELECT 0 AS i, v, CAST(1 AS DOUBLE) AS val FROM "
            "  (SELECT v FROM verts UNION ALL SELECT -1 AS v) "
            "  UNION ALL "
            "  SELECT p.i + 1, d2.t, SUM(p.val * d2.w) FROM it p "
            "  JOIN d2 ON d2.s = p.v WHERE p.i < 6 GROUP BY p.i, d2.t) "
            "SELECT v::BIGINT AS vertex, CAST(val AS BIGINT) AS katz_s6 "
            "FROM it WHERE i = 6 AND v >= 0"
        ),
        "knn_degree": (
            f"WITH {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS v, count(*) AS d FROM es GROUP BY 1), "
            "snd AS (SELECT e.src AS v, sum(dd.d) AS s FROM es e "
            "        JOIN deg dd ON dd.v = e.dst GROUP BY 1) "
            "SELECT deg.d::BIGINT AS degree, count(*)::BIGINT AS n_vertices, "
            "sum(snd.s)::BIGINT AS sum_nbr_deg, "
            "((2 * sum(snd.s) * 1000000 + deg.d * count(*)) "
            " // (2 * deg.d * count(*)))::BIGINT AS knn_e6 "
            "FROM deg JOIN snd ON snd.v = deg.v GROUP BY deg.d"
        ),
        "events_running_total": (
            "WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CAST(floor(value * 1e6) AS BIGINT) AS v6 FROM events) "
            "SELECT event_id, user_id, "
            "COUNT(*) OVER w AS run_n, SUM(v6) OVER w AS run_sum_e6 FROM t "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id "
            "ROWS UNBOUNDED PRECEDING)"
        ),
        "edge_jaccard": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT src AS v, count(*) AS d FROM es2 GROUP BY 1), "
            "cnb AS (SELECT e1.dst AS a, e2.dst AS b, count(*) AS cn FROM es2 e1 "
            "        JOIN es2 e2 ON e2.src = e1.src AND e2.dst > e1.dst "
            "        GROUP BY 1, 2) "
            "SELECT u.a::BIGINT AS a, u.b::BIGINT AS b, "
            "COALESCE(cnb.cn, 0)::BIGINT AS cn, "
            "((2 * COALESCE(cnb.cn, 0) * 1000000 "
            "  + (da.d + db.d - COALESCE(cnb.cn, 0))) "
            " // (2 * (da.d + db.d - COALESCE(cnb.cn, 0))))::BIGINT AS jaccard_e6 "
            "FROM u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b "
            "LEFT JOIN cnb ON cnb.a = u.a AND cnb.b = u.b"
        ),
        "events_funnel": (
            "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events), "
            "uu AS (SELECT DISTINCT user_id FROM e), "
            "s1 AS (SELECT user_id, min(t) AS t1 FROM e "
            "       WHERE event_type = 'view' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, min(e.t) AS t2 FROM e "
            "       JOIN s1 ON s1.user_id = e.user_id "
            "       WHERE e.event_type = 'click' AND e.t > s1.t1 GROUP BY 1), "
            "s3 AS (SELECT e.user_id, min(e.t) AS t3 FROM e "
            "       JOIN s2 ON s2.user_id = e.user_id "
            "       WHERE e.event_type = 'purchase' AND e.t > s2.t2 GROUP BY 1) "
            "SELECT uu.user_id, "
            "((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT "
            " + (t3 IS NOT NULL)::INT)::BIGINT AS stage, "
            "COALESCE(t1, -1)::BIGINT AS t1_us, COALESCE(t2, -1)::BIGINT AS t2_us, "
            "COALESCE(t3, -1)::BIGINT AS t3_us "
            "FROM uu LEFT JOIN s1 USING(user_id) LEFT JOIN s2 USING(user_id) "
            "LEFT JOIN s3 USING(user_id)"
        ),
        "events_outliers": (
            "WITH e AS (SELECT event_id, event_type, "
            "           CAST(FLOOR(value * 1e6) AS BIGINT) AS v6 FROM events), "
            "m AS (SELECT event_type, v6 AS med FROM "
            "      (SELECT event_type, v6, "
            "       row_number() OVER (PARTITION BY event_type ORDER BY v6) AS rn, "
            "       count(*) OVER (PARTITION BY event_type) AS n FROM e) "
            "      WHERE rn = (n - 1) // 2 + 1), "
            "d AS (SELECT e.event_id, e.event_type, e.v6, "
            "      abs(e.v6 - m.med) AS dev6 FROM e JOIN m USING(event_type)), "
            "md AS (SELECT event_type, dev6 AS mad FROM "
            "       (SELECT event_type, dev6, "
            "        row_number() OVER (PARTITION BY event_type ORDER BY dev6) AS rn, "
            "        count(*) OVER (PARTITION BY event_type) AS n FROM d) "
            "       WHERE rn = (n - 1) // 2 + 1) "
            "SELECT d.event_id, d.event_type, d.v6, d.dev6 FROM d "
            "JOIN md USING(event_type) WHERE d.dev6 > 3 * md.mad"
        ),
        "sssp_parents": (
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "v AS (SELECT DISTINCT src AS id FROM es), "
            "srcv AS (SELECT min(id) AS s FROM v), "
            "relax AS (SELECT src, dst, 1 AS w FROM es "
            "          UNION ALL SELECT id, id, 0 FROM v), "
            "d AS (SELECT 0 AS it, id, CASE WHEN id = (SELECT s FROM srcv) "
            "      THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "      UNION ALL SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d p "
            "      JOIN relax r ON r.src = p.id WHERE p.it < 60 "
            "      GROUP BY p.it, r.dst), "
            "dist AS (SELECT id, CAST(dist AS BIGINT) AS dist FROM d "
            "         WHERE it = 60 AND dist < 1e17), "
            "par AS (SELECT e.dst AS vertex, min(e.src)::BIGINT AS parent, "
            "        min(d2.dist)::BIGINT AS dist FROM es e "
            "        JOIN dist d1 ON d1.id = e.src "
            "        JOIN dist d2 ON d2.id = e.dst AND d1.dist = d2.dist - 1 "
            "        GROUP BY 1) "
            "SELECT vertex::BIGINT AS vertex, parent, dist FROM par "
            "UNION ALL SELECT s::BIGINT, CAST(-1 AS BIGINT), "
            "CAST(0 AS BIGINT) FROM srcv"
        ),
        "stress_centrality": (
            # walk-count recursion: HUGEINT counts stay exact for walk
            # length <= 8 on this degree scale; the query asserts its
            # BFS depth <= 8 so min-length walks == shortest paths here
            f"WITH RECURSIVE {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "v AS (SELECT DISTINCT src AS id FROM es2), "
            "seeds AS (SELECT id AS s FROM v ORDER BY id LIMIT 4), "
            "pw AS (SELECT s, s AS vv, CAST(1 AS HUGEINT) AS cnt, 0 AS it FROM seeds "
            "       UNION ALL SELECT pw.s, e.dst, SUM(pw.cnt), pw.it + 1 FROM pw "
            "       JOIN es2 e ON e.src = pw.vv WHERE pw.it < 8 "
            "       GROUP BY pw.s, e.dst, pw.it + 1), "
            "dmin AS (SELECT s, vv, MIN(it) AS dist FROM pw GROUP BY 1, 2), "
            "sig AS (SELECT pw.s, pw.vv, pw.cnt AS sigma FROM pw "
            "        JOIN dmin ON dmin.s = pw.s AND dmin.vv = pw.vv "
            "        AND dmin.dist = pw.it), "
            "dag AS (SELECT d1.s, e.src AS uu, e.dst AS ww FROM es2 e "
            "        JOIN dmin d1 ON d1.vv = e.src "
            "        JOIN dmin d2 ON d2.s = d1.s AND d2.vv = e.dst "
            "        AND d2.dist = d1.dist + 1), "
            "pc AS (SELECT s, uu AS v0, ww FROM dag "
            "       UNION ALL SELECT pc.s, pc.v0, e.ww FROM pc "
            "       JOIN dag e ON e.s = pc.s AND e.uu = pc.ww), "
            "tt AS (SELECT s, v0, count(*) AS t FROM pc GROUP BY 1, 2) "
            "SELECT sig.vv::BIGINT AS vertex, "
            "SUM(sig.sigma * COALESCE(tt.t, 0))::BIGINT AS stress "
            "FROM sig LEFT JOIN tt ON tt.s = sig.s AND tt.v0 = sig.vv "
            "WHERE sig.vv <> sig.s GROUP BY 1"
        ),
        "bipartite_check": (
            f"WITH RECURSIVE {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "v AS (SELECT DISTINCT src AS id FROM es2), "
            "relax AS (SELECT src, dst FROM es2 UNION ALL SELECT id, id FROM v), "
            "c AS (SELECT 0 AS it, id, id AS lab FROM v "
            "      UNION ALL SELECT p.it + 1, r.dst, MIN(p.lab) FROM c p "
            "      JOIN relax r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst), "
            "m AS (SELECT DISTINCT lab AS s FROM c WHERE it = 60), "
            "relaxw AS (SELECT src, dst, 1 AS w FROM es2 "
            "           UNION ALL SELECT id, id, 0 FROM v), "
            "d AS (SELECT 0 AS it, id, CASE WHEN id IN (SELECT s FROM m) "
            "      THEN 0 ELSE 1000000 END AS dist FROM v "
            "      UNION ALL SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d p "
            "      JOIN relaxw r ON r.src = p.id WHERE p.it < 60 GROUP BY p.it, r.dst), "
            "par AS (SELECT id, dist, dist % 2 AS parity FROM d WHERE it = 60), "
            "conf AS (SELECT e.src AS id, count(*) AS k FROM es2 e "
            "         JOIN par p1 ON p1.id = e.src JOIN par p2 ON p2.id = e.dst "
            "         WHERE p1.parity = p2.parity GROUP BY 1) "
            "SELECT par.id::BIGINT AS vertex, par.dist::BIGINT AS dist, "
            "par.parity::BIGINT AS parity, COALESCE(conf.k, 0)::BIGINT AS conflicts "
            "FROM par LEFT JOIN conf ON conf.id = par.id"
        ),
        "link_prediction": (
            f"WITH {_U_ORDERS}, "
            "es2 AS (SELECT a AS src, b AS dst FROM u "
            "        UNION ALL SELECT b, a FROM u), "
            "deg AS (SELECT src AS v, count(*) AS d FROM es2 GROUP BY 1), "
            "w AS (SELECT e1.dst AS a, e2.dst AS b, e1.src AS c FROM es2 e1 "
            "      JOIN es2 e2 ON e2.src = e1.src AND e2.dst > e1.dst), "
            "sc AS (SELECT w.a, w.b, count(*) AS cn, "
            "       sum(1000000 // deg.d) AS ra_e6 FROM w "
            "       JOIN deg ON deg.v = w.c GROUP BY 1, 2), "
            "na AS (SELECT sc.* FROM sc LEFT JOIN u "
            "       ON u.a = sc.a AND u.b = sc.b WHERE u.a IS NULL) "
            "SELECT a::BIGINT AS a, b::BIGINT AS b, cn::BIGINT AS cn, "
            "ra_e6::BIGINT AS ra_e6 FROM na "
            "ORDER BY ra_e6 DESC, cn DESC, a, b LIMIT 100"
        ),
        "events_pivot": (
            "SELECT user_id, "
            "count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click, "
            "count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error, "
            "count(*) FILTER (WHERE event_type = 'purchase')::BIGINT AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup')::BIGINT AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "orders_full_join": (
            "SELECT COALESCE(o.o_custkey, c.c_custkey)::BIGINT AS custkey, "
            "COALESCE(o.o_orderkey, -1)::BIGINT AS o_orderkey, "
            "COALESCE(CAST(ROUND(c.c_acctbal * 100) AS BIGINT), -1) AS acctbal_e2 "
            "FROM (SELECT o_orderkey, o_custkey FROM orders "
            "      WHERE o_orderpriority = '1-URGENT') o "
            "FULL OUTER JOIN "
            "(SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c "
            "ON c.c_custkey = o.o_custkey"
        ),
        "vocab_build": (
            "WITH tok AS (SELECT DISTINCT doc_id, "
            "             unnest(string_split(text, ' ')) AS term FROM documents), "
            "dfs AS (SELECT term, count(*) AS df FROM tok "
            "        WHERE term <> '' GROUP BY 1) "
            "SELECT term, df::BIGINT AS df, "
            "row_number() OVER (ORDER BY df DESC, term)::BIGINT AS id FROM dfs"
        ),
        "doc_bigram_lm": (
            "WITH tok AS (SELECT doc_id, "
            "             unnest(string_split(text, ' ')) AS term, "
            "             generate_subscripts(string_split(text, ' '), 1) AS pos "
            "             FROM documents), "
            "bg AS (SELECT a.doc_id, a.term AS x, b.term AS y FROM tok a "
            "       JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1), "
            "c2 AS (SELECT x, y, count(*) AS c2 FROM bg GROUP BY 1, 2), "
            "c1 AS (SELECT x, sum(c2) AS c1 FROM c2 GROUP BY 1), "
            "p AS (SELECT c2.x, c2.y, (c2.c2 * 1000000) // c1.c1 AS p_e6 "
            "      FROM c2 JOIN c1 ON c1.x = c2.x) "
            "SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams, "
            "sum(p.p_e6)::BIGINT AS lm_e6 "
            "FROM bg JOIN p ON p.x = bg.x AND p.y = bg.y "
            "GROUP BY bg.doc_id"
        ),
        "events_sample": (
            f"WITH ss AS (SELECT event_type, value, {_splitmix_cols('event_id::UBIGINT', 'h')} "
            "            FROM events), "
            "f AS (SELECT event_type, CAST(FLOOR(value * 1e6) AS BIGINT) AS v6 "
            "      FROM ss WHERE h % 100 < 5) "
            "SELECT event_type, count(*)::BIGINT AS n, sum(v6)::BIGINT AS sum_value_e6 "
            "FROM f GROUP BY 1"
        ),
        "degree_histogram": (
            f"WITH {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src) "
            "SELECT d::BIGINT AS degree, count(*)::BIGINT AS n FROM deg GROUP BY 1"
        ),
        "degree_gini": (
            # exact rank-weighted sum over the sorted degree histogram;
            # HUGEINT products, integer // (c*(c+1) is even, so //2 is
            # exact; DuckDB / would go float)
            f"WITH {_EB_LINEITEM}, {_ES}, "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "h AS (SELECT d, count(*) AS c FROM deg GROUP BY d), "
            "o AS (SELECT d::HUGEINT AS d, c::HUGEINT AS c, "
            "      COALESCE(SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED "
            "      PRECEDING AND 1 PRECEDING), 0)::HUGEINT AS off_ FROM h), "
            "m AS (SELECT (SELECT count(*) FROM deg)::HUGEINT AS n, "
            "      (SELECT sum(d) FROM deg)::HUGEINT AS sd, "
            "      SUM(d * (c * off_ + (c * (c + 1)) // 2))::HUGEINT AS s FROM o) "
            "SELECT n::BIGINT AS n_vertices, sd::BIGINT AS sum_deg, "
            "  (CASE WHEN n * sd = 0 THEN 0 ELSE "
            "   (2 * (2*s - (n+1)*sd) * 1000000 + n*sd) // (2 * n * sd) "
            "  END)::BIGINT AS gini_e6 FROM m"
        ),
        "local_clustering": (
            # lcc = 2*tri/(deg*(deg-1)) exact-integer half-up at e6:
            # (2*X + Y) // (2*Y) with X = 2*tri*1e6, Y = deg*(deg-1)
            f"WITH {_U_ORDERS}, "
            "ep AS (SELECT a AS c FROM u UNION ALL SELECT b FROM u), "
            "deg AS (SELECT c AS vertex, count(*)::BIGINT AS degree FROM ep GROUP BY c), "
            "tri0 AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "         FROM u e1 JOIN u e2 ON e2.a = e1.a AND e2.b > e1.b "
            "         JOIN u e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "tri AS (SELECT vertex, count(*)::BIGINT AS t FROM ( "
            "  SELECT x AS vertex FROM tri0 UNION ALL SELECT y FROM tri0 "
            "  UNION ALL SELECT z FROM tri0) GROUP BY vertex) "
            "SELECT d.vertex::BIGINT AS vertex, d.degree, "
            "  COALESCE(t.t, 0)::BIGINT AS triangles, "
            "  (CASE WHEN d.degree < 2 THEN 0 ELSE "
            "   (4 * COALESCE(t.t, 0) * 1000000 + d.degree * (d.degree - 1)) "
            "   // (2 * d.degree * (d.degree - 1)) END)::BIGINT AS lcc_e6 "
            "FROM deg d LEFT JOIN tri t ON t.vertex = d.vertex"
        ),
        "cocitation": (
            # top co-cited url pairs: citer-side self-join on the
            # generator's distinct link edges (mirrors _pages_links)
            f"WITH {_pages_edges_cte()}, "
            "p AS (SELECT e1.dst AS a, e2.dst AS b, count(*)::BIGINT AS n_common "
            "      FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst "
            "      GROUP BY 1, 2) "
            "SELECT a, b, n_common FROM p ORDER BY n_common DESC, a, b LIMIT 100"
        ),
        "bibcoupling": (
            # top coupled citer pairs; cited urls with global in-degree
            # > 400 excluded (stop-hub removal, mirrored in the engine)
            f"WITH {_pages_edges_cte()}, "
            "ind AS (SELECT dst, count(*)::BIGINT AS c FROM e GROUP BY dst), "
            "kept AS (SELECT e.src, e.dst FROM e JOIN ind ON ind.dst = e.dst "
            "         WHERE ind.c <= 400), "
            "p AS (SELECT e1.src AS a, e2.src AS b, count(*)::BIGINT AS n_common "
            "      FROM kept e1 JOIN kept e2 ON e1.dst = e2.dst AND e1.src < e2.src "
            "      GROUP BY 1, 2) "
            "SELECT a, b, n_common FROM p ORDER BY n_common DESC, a, b LIMIT 100"
        ),
        "domain_link_locality": (
            f"WITH {_pages_edges_cte()}, "
            "h AS (SELECT split_part(src, '/', 3) AS src_host, "
            "             split_part(dst, '/', 3) AS dst_host FROM e) "
            "SELECT src_host, count(*)::BIGINT AS n_links, "
            "  count(*) FILTER (dst_host = src_host)::BIGINT AS n_intra, "
            "  ((2 * count(*) FILTER (dst_host = src_host) * 1000000 + count(*)) "
            "   // (2 * count(*)))::BIGINT AS share_e6 "
            "FROM h GROUP BY src_host"
        ),
        "redirect_resolve": (
            # redirect chains: page i redirects to i//3 iff
            # mix64(seed+7, i) % 3 == 0 (testdata._is_redirect_ids);
            # follow to the first non-redirect url. Chains are acyclic
            # (target id strictly decreases), so the plain recursion
            # terminates at the chain ends.
            "WITH RECURSIVE "
            "base AS (SELECT i::UBIGINT AS i FROM range(0, 2000) t(i)), "
            f"hrc AS (SELECT i, xor({53876069782339}::UBIGINT, i) AS acc0, "
            f"        {_splitmix_cols('acc0', 'hr')} FROM base), "
            "r AS (SELECT i::BIGINT AS u, (i::BIGINT // 3)::BIGINT AS tgt "
            "      FROM hrc WHERE i > 0 AND hr % 3 = 0), "
            "chain AS ( "
            "  SELECT u AS src, tgt AS cur, 1::BIGINT AS hops FROM r "
            "  UNION ALL "
            "  SELECT c.src, r.tgt, c.hops + 1 FROM chain c JOIN r ON r.u = c.cur), "
            "fin AS (SELECT src, cur, hops FROM chain "
            "        WHERE cur NOT IN (SELECT u FROM r)) "
            f"SELECT {_PAGE_URL('src')} AS src_url, {_PAGE_URL('cur')} AS final_url, "
            "  hops FROM fin"
        ),
        "frontier_candidates": (
            # linked-but-uncrawled urls ranked by inlink evidence; the
            # engine side is Bloom-prefiltered + verify (exact), so it
            # shares this plain anti-join oracle
            f"WITH {_pages_edges_cte()}, "
            f"crawled AS (SELECT {_PAGE_URL('i')} AS url FROM range(0, 2000) t(i)), "
            "f AS (SELECT e.dst, e.src FROM e "
            "      WHERE e.dst NOT IN (SELECT url FROM crawled)) "
            "SELECT dst AS frontier_url, count(*)::BIGINT AS n_inlinks, "
            "  count(DISTINCT split_part(src, '/', 3))::BIGINT AS n_src_sites "
            "FROM f GROUP BY dst ORDER BY n_inlinks DESC, frontier_url LIMIT 100"
        ),
        "crawl_budget": (
            # Hamilton largest-remainder apportionment of 10000 fetch
            # slots across dst hosts, weights = distinct-link inlinks
            f"WITH {_pages_edges_cte()}, "
            "hw AS (SELECT split_part(dst, '/', 3) AS host, "
            "       count(*)::BIGINT AS w FROM e GROUP BY host), "
            "t AS (SELECT sum(w)::BIGINT AS tw FROM hw), "
            "b AS (SELECT host, w, (10000 * w) // t.tw AS base, "
            "      (10000 * w) % t.tw AS rem FROM hw, t), "
            "x AS (SELECT (10000 - sum(base))::BIGINT AS ne FROM b), "
            "r AS (SELECT host, w, base, rem, "
            "      row_number() OVER (ORDER BY rem DESC, host) AS rn FROM b) "
            "SELECT host, w AS n_inlinks, "
            "  (base + CASE WHEN rn <= x.ne THEN 1 ELSE 0 END)::BIGINT AS slots "
            "FROM r, x"
        ),
        "site_depth": (
            # multi-source BFS from every site root over intra-site
            # directed links; Bellman-Ford style iteration-indexed
            # recursion (self-loop relax keeps settled vertices), cap
            # 30 >> max intra-site diameter (sites have 16 pages)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "v AS (SELECT DISTINCT u FROM "
            "      (SELECT src AS u FROM ie UNION ALL SELECT dst FROM ie)), "
            "relax AS (SELECT src, dst, 1 AS w FROM ie "
            "          UNION ALL SELECT u, u, 0 FROM v), "
            "d AS ( "
            "  SELECT 0 AS it, u AS id, CASE WHEN u LIKE '%/p/0000' "
            "         THEN CAST(0 AS DOUBLE) ELSE 1e18 END AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM d p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 30 GROUP BY p.it, r.dst) "
            "SELECT id AS url, CAST(dist AS BIGINT) AS depth "
            "FROM d WHERE it = 30 AND dist < 1e17"
        ),
        "modularity": (
            # exact-integer Newman modularity of the 10-round LP
            # communities: contrib = 4*m*e_c - d_c^2 per community
            # (Q = sum(contrib) / (4 m^2)); LP recursion identical to
            # the label_propagation oracle
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, {_V}, "
            "l AS ( "
            "  SELECT 0 AS it, id, id AS lab FROM v "
            "  UNION ALL "
            "  SELECT it + 1, id, lab FROM ( "
            "    SELECT p.it AS it, e.dst AS id, p.lab AS lab, count(*) AS c "
            "    FROM l p JOIN es e ON e.src = p.id WHERE p.it < 10 "
            "    GROUP BY p.it, e.dst, p.lab "
            "    QUALIFY row_number() OVER (PARTITION BY p.it, e.dst "
            "            ORDER BY count(*) DESC, p.lab ASC) = 1)), "
            "lab AS (SELECT id, CAST(lab AS BIGINT) AS lab FROM l WHERE it = 10), "
            "mm AS (SELECT count(*)::BIGINT AS m FROM eb), "
            "deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM es GROUP BY src), "
            "ec AS (SELECT la.lab AS label, count(*)::BIGINT AS e_in "
            "       FROM eb JOIN lab la ON la.id = eb.src "
            "       JOIN lab lb ON lb.id = eb.dst "
            "       WHERE la.lab = lb.lab GROUP BY la.lab), "
            "dc AS (SELECT l2.lab AS label, count(*)::BIGINT AS n_vertices, "
            "       sum(deg.d)::BIGINT AS d_sum "
            "       FROM lab l2 JOIN deg ON deg.id = l2.id GROUP BY l2.lab) "
            "SELECT dc.label, dc.n_vertices, COALESCE(ec.e_in, 0)::BIGINT AS e_in, "
            "  dc.d_sum, (4 * mm.m * COALESCE(ec.e_in, 0) "
            "             - dc.d_sum * dc.d_sum)::BIGINT AS contrib "
            "FROM dc LEFT JOIN ec ON ec.label = dc.label, mm"
        ),
        "salsa": (
            # closed-form SALSA authority weights: component-relative
            # in-degree; components of the co-hub pair graph via
            # min-label propagation (60 rounds, self-loop relax)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ind AS (SELECT dst, count(*)::BIGINT AS ind FROM e GROUP BY dst), "
            "auth AS (SELECT dst FROM ind), "
            "pr AS (SELECT DISTINCT e1.dst AS a, e2.dst AS b "
            "       FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst), "
            "relax AS (SELECT a AS src, b AS dst FROM pr "
            "          UNION ALL SELECT b, a FROM pr "
            "          UNION ALL SELECT dst, dst FROM auth), "
            "c AS ( "
            "  SELECT 0 AS it, dst AS id, dst AS lab FROM auth "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.lab) FROM c p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 60 "
            "  GROUP BY p.it, r.dst), "
            "comp AS (SELECT id, lab FROM c WHERE it = 60), "
            "cs AS (SELECT lab, count(*)::BIGINT AS na, "
            "       sum(ind.ind)::BIGINT AS dsum "
            "       FROM comp JOIN ind ON ind.dst = comp.id GROUP BY lab), "
            "tot AS (SELECT count(*)::BIGINT AS n_auth FROM auth) "
            "SELECT comp.id AS url, ind.ind AS n_inlinks, "
            "  ((2 * cs.na * ind.ind * 100000000 + tot.n_auth * cs.dsum) "
            "   // (2 * tot.n_auth * cs.dsum))::BIGINT AS score_e8 "
            "FROM comp JOIN ind ON ind.dst = comp.id "
            "JOIN cs ON cs.lab = comp.lab, tot"
        ),
        "simrank": (
            # SimRank C=4/5, 3 unrolled exact-integer iterations over
            # the intra-site graph (floor division at every step
            # mirrors the engine); diagonal pinned at SCALE each round
            f"WITH {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "ind AS (SELECT dst AS u, count(*)::BIGINT AS ind FROM ie GROUP BY dst), "
            "v AS (SELECT DISTINCT u FROM "
            "      (SELECT src AS u FROM ie UNION ALL SELECT dst FROM ie)), "
            "s0 AS (SELECT u AS a, u AS b, 100000000::BIGINT AS s FROM v), "
            "t1 AS (SELECT ea.dst AS a, eb.dst AS b, (4 * sum(p.s)) // (5 * ia.ind * ib.ind) AS s FROM s0 p JOIN ie ea ON ea.src = p.a JOIN ie eb ON eb.src = p.b JOIN ind ia ON ia.u = ea.dst JOIN ind ib ON ib.u = eb.dst WHERE ea.dst <> eb.dst GROUP BY ea.dst, eb.dst, ia.ind, ib.ind), "
            "s1 AS (SELECT * FROM s0 UNION ALL SELECT a, b, s FROM t1 WHERE s > 0), "
            "t2 AS (SELECT ea.dst AS a, eb.dst AS b, (4 * sum(p.s)) // (5 * ia.ind * ib.ind) AS s FROM s1 p JOIN ie ea ON ea.src = p.a JOIN ie eb ON eb.src = p.b JOIN ind ia ON ia.u = ea.dst JOIN ind ib ON ib.u = eb.dst WHERE ea.dst <> eb.dst GROUP BY ea.dst, eb.dst, ia.ind, ib.ind), "
            "s2 AS (SELECT * FROM s0 UNION ALL SELECT a, b, s FROM t2 WHERE s > 0), "
            "t3 AS (SELECT ea.dst AS a, eb.dst AS b, (4 * sum(p.s)) // (5 * ia.ind * ib.ind) AS s FROM s2 p JOIN ie ea ON ea.src = p.a JOIN ie eb ON eb.src = p.b JOIN ind ia ON ia.u = ea.dst JOIN ind ib ON ib.u = eb.dst WHERE ea.dst <> eb.dst GROUP BY ea.dst, eb.dst, ia.ind, ib.ind), "
            "s3 AS (SELECT * FROM s0 UNION ALL SELECT a, b, s FROM t3 WHERE s > 0) "
            "SELECT a, b, s AS sim_e8 FROM s3 WHERE a < b "
            "ORDER BY sim_e8 DESC, a, b LIMIT 100"
        ),
        "crawl_delta": (
            # per-host added/removed/kept link edges between the
            # n=2000 and n=2200 crawl snapshots (prefixed CTE chains)
            f"WITH {_pages_edges_cte(2000)}, "
            f"{_pages_edges_cte(2200, 42, 'n_')}, "
            "a AS (SELECT src, dst FROM n_e EXCEPT SELECT src, dst FROM e), "
            "r AS (SELECT src, dst FROM e EXCEPT SELECT src, dst FROM n_e), "
            "c AS (SELECT src, dst FROM e INTERSECT SELECT src, dst FROM n_e), "
            "u AS (SELECT src, 1 AS ad, 0 AS rm, 0 AS cm FROM a "
            "      UNION ALL SELECT src, 0, 1, 0 FROM r "
            "      UNION ALL SELECT src, 0, 0, 1 FROM c) "
            "SELECT split_part(src, '/', 3) AS host, sum(ad)::BIGINT AS n_added, "
            "  sum(rm)::BIGINT AS n_removed, sum(cm)::BIGINT AS n_common "
            "FROM u GROUP BY host"
        ),
        "site_centrality": (
            # exact intra-site all-pairs BFS: OUT-harmonic centrality
            # scaled by lcm(1..15)=360360 (every 1/d term exact),
            # eccentricity, reachable count; Bellman-Ford style
            # iteration-indexed recursion with self-loop relax
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "v AS (SELECT DISTINCT u FROM "
            "      (SELECT src AS u FROM ie UNION ALL SELECT dst FROM ie)), "
            "relax AS (SELECT src, dst, 1 AS w FROM ie "
            "          UNION ALL SELECT u, u, 0 FROM v), "
            "d AS ( "
            "  SELECT 0 AS it, u AS root, u AS id, 0 AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, p.root, r.dst, MIN(p.dist + r.w) FROM d p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 16 "
            "  GROUP BY p.it, p.root, r.dst), "
            "dm AS (SELECT root, id, dist FROM d WHERE it = 16) "
            "SELECT root AS url, "
            "  sum(CASE WHEN dist > 0 THEN 360360 // dist ELSE 0 END)::BIGINT "
            "    AS harmonic_x, "
            "  max(dist)::BIGINT AS ecc, "
            "  (count(*) FILTER (dist > 0))::BIGINT AS n_reach "
            "FROM dm GROUP BY root"
        ),
        "doc_dup_ngrams": (
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts "
            "              FROM documents WHERE trim(text) <> ''), "
            "g AS (SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS gram "
            "      FROM toks, LATERAL unnest(generate_series(1, len(ts)-4)) t(i) "
            "      WHERE len(ts) >= 5), "
            "d AS (SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram), "
            "per AS (SELECT g.doc_id, count(*) AS n_grams, "
            "        sum(CASE WHEN d.nd >= 2 THEN 1 ELSE 0 END) AS n_dup "
            "        FROM g JOIN d USING (gram) GROUP BY 1) "
            "SELECT doc_id, n_grams::BIGINT AS n_grams, n_dup::BIGINT AS n_dup FROM per"
        ),
        "doc_strip_spans": (
            # duplicate-span removal: same gram universe as
            # doc_dup_ngrams, but positions covered by a >=2-distinct-
            # doc gram are dropped and the text rebuilt verbatim
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts "
            "              FROM documents WHERE trim(text) <> ''), "
            "tok AS (SELECT doc_id, i::BIGINT AS pos, ts[i] AS tok, len(ts)::BIGINT AS ntok "
            "        FROM toks, LATERAL unnest(generate_series(1, len(ts))) t(i)), "
            "g AS (SELECT doc_id, i::BIGINT AS pos, array_to_string(ts[i:i+4], ' ') AS gram "
            "      FROM toks, LATERAL unnest(generate_series(1, len(ts)-4)) t(i) "
            "      WHERE len(ts) >= 5), "
            "dupg AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2), "
            "cov AS (SELECT DISTINCT g.doc_id, g.pos + o AS pos "
            "        FROM g JOIN dupg USING (gram), LATERAL unnest(generate_series(0, 4)) s(o)), "
            "kept AS (SELECT t.doc_id, t.pos, t.tok FROM tok t "
            "         LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos "
            "         WHERE c.pos IS NULL), "
            "stats AS (SELECT doc_id, max(ntok) AS n_tokens FROM tok GROUP BY doc_id), "
            "rem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id), "
            "cl AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text "
            "       FROM kept GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(s.n_tokens, 0)::BIGINT AS n_tokens, "
            "  COALESCE(r.n_removed, 0)::BIGINT AS n_removed, "
            "  COALESCE(cl.clean_text, '') AS clean_text "
            "FROM documents d LEFT JOIN stats s USING (doc_id) "
            "LEFT JOIN rem r USING (doc_id) LEFT JOIN cl USING (doc_id)"
        ),
        "doc_decontaminate": (
            # benchmark = docs with doc_id % 7 == 0; word 4-grams
            "WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts "
            "              FROM documents WHERE trim(text) <> ''), "
            "g AS (SELECT doc_id, array_to_string(ts[i:i+3], ' ') AS gram "
            "      FROM toks, LATERAL unnest(generate_series(1, len(ts)-3)) t(i) "
            "      WHERE len(ts) >= 4), "
            "bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0), "
            "per AS (SELECT g.doc_id, count(*) AS n_grams, "
            "        sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits "
            "        FROM g LEFT JOIN bench b USING (gram) "
            "        WHERE g.doc_id % 7 <> 0 GROUP BY 1) "
            "SELECT doc_id, n_grams::BIGINT AS n_grams, n_hits::BIGINT AS n_hits "
            "FROM per WHERE n_hits > 0"
        ),
        "doc_tfidf_top": (
            "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "              FROM documents WHERE trim(text) <> ''), "
            "tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2), "
            "df AS (SELECT term, count(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT count(*) AS n FROM documents) "
            "SELECT doc_id, term, (tf.c * ((n.n * 1000000) // df.df))::BIGINT AS score "
            "FROM tf JOIN df USING (term) CROSS JOIN n "
            "QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 3"
        ),
        "random_walks": _random_walks_sql(),
        "walk_skipgrams": (
            # replay the identical deterministic walks, then self-join
            # within the skip-gram window (unordered pair, distance<=2)
            f"WITH w AS ({_random_walks_sql()}) "
            "SELECT least(w1.vertex, w2.vertex)::BIGINT AS ctx_a, "
            "  greatest(w1.vertex, w2.vertex)::BIGINT AS ctx_b, "
            "  count(*)::BIGINT AS cnt "
            "FROM w w1 JOIN w w2 ON w2.walker = w1.walker "
            "  AND w2.step > w1.step AND w2.step <= w1.step + 2 "
            "GROUP BY 1, 2"
        ),
        "doc_pii_scrub": (
            # patterns must stay in sync with functions/pii.py
            "WITH aug AS (SELECT doc_id, text || ' Contact: user' || doc_id || "
            "  '@mail.example or call 555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || "
            "  ', ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 7) % 256) || ' end.' AS t "
            "  FROM documents), "
            "red AS (SELECT doc_id, "
            "  length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT AS n_emails, "
            "  length(regexp_extract_all(t, '\\b555-[0-9]{4}\\b'))::BIGINT AS n_phones, "
            "  length(regexp_extract_all(t, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b'))::BIGINT AS n_ips, "
            "  regexp_replace(regexp_replace(regexp_replace(t, "
            "    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "    '\\b555-[0-9]{4}\\b', '<PHONE>', 'g'), "
            "    '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS rt "
            "  FROM aug) "
            "SELECT doc_id, n_emails, n_phones, n_ips, sha256(rt) AS digest FROM red"
        ),
        "events_asof_orders": (
            "WITH ord AS ( "
            "  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM orders "
            "  QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderdate "
            "                             ORDER BY o_orderkey) = 1) "
            "SELECT e.event_id, o.o_orderkey, "
            "  CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_e2 "
            "FROM events e ASOF JOIN ord o "
            "  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
        ),
        "kmeans_embeddings": (
            # Integer-quantized Lloyd recursion: q = FLOOR(1e6*x), exact
            # int64 distances, trunc-div centroid means (DuckDB `//`),
            # ties -> lowest cluster. Mirrors stages/kmeans.py exactly.
            "WITH RECURSIVE "
            "vexp AS ( "
            "  SELECT vec_id, d AS dim, "
            "    CAST(FLOOR(CAST(embedding[d+1] AS DOUBLE) * 1e6) AS BIGINT) AS q "
            "  FROM embeddings, LATERAL unnest(generate_series(0, 63)) t(d)), "
            "r AS ( "
            "  SELECT 0 AS it, vec_id, cluster, dd FROM ( "
            "    SELECT v.vec_id, c.vec_id AS cluster, "
            "      SUM((v.q - c.q)*(v.q - c.q)) AS dd "
            "    FROM vexp v JOIN vexp c ON c.dim = v.dim AND c.vec_id < 8 "
            "    GROUP BY 1, 2 "
            "    QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY dd, cluster) = 1) "
            "  UNION ALL "
            "  SELECT it, vec_id, cluster, dd FROM ( "
            "    SELECT c.it + 1 AS it, v.vec_id, c.cluster, "
            "      SUM((v.q - c.cq)*(v.q - c.cq)) AS dd "
            "    FROM (SELECT r.it, r.cluster, v2.dim, SUM(v2.q) // COUNT(*) AS cq "
            "          FROM r JOIN vexp v2 USING (vec_id) "
            "          WHERE r.it < 4 "
            "          GROUP BY r.it, r.cluster, v2.dim) c "
            "    JOIN vexp v ON v.dim = c.dim "
            "    GROUP BY 1, 2, 3 "
            "    QUALIFY row_number() OVER (PARTITION BY v.vec_id ORDER BY dd, c.cluster) = 1)) "
            "SELECT vec_id, cluster::BIGINT AS cluster, dd::BIGINT AS dist "
            "FROM r WHERE it = 4"
        ),
        "pq_codebook": _pq_sql(),
        "kcenter_seeds": _kcenter_sql(),
        "ann_recall": _ann_recall_sql(),
        "bpe_merges": _bpe_sql(),
        "bpe_apply": _bpe_sql(output="tokens"),
        "lang_term_jaccard": (
            "WITH dt AS (SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "  FROM documents WHERE trim(text) <> ''), "
            "c AS (SELECT lang, term, count(*)::BIGINT AS c FROM dt GROUP BY 1, 2), "
            "tops AS (SELECT lang, term FROM c "
            "  QUALIFY row_number() OVER (PARTITION BY lang ORDER BY c DESC, term) <= 100), "
            "na AS (SELECT lang, count(*)::BIGINT AS n FROM tops GROUP BY 1), "
            "inter AS (SELECT a.lang AS lang_a, b.lang AS lang_b, count(*)::BIGINT AS i "
            "  FROM tops a JOIN tops b ON a.term = b.term AND a.lang < b.lang GROUP BY 1, 2) "
            "SELECT x.lang AS lang_a, y.lang AS lang_b, "
            "  COALESCE(i.i, 0)::BIGINT AS shared_terms, "
            "  (x.n + y.n - COALESCE(i.i, 0))::BIGINT AS union_terms "
            "FROM na x JOIN na y ON x.lang < y.lang "
            "LEFT JOIN inter i ON i.lang_a = x.lang AND i.lang_b = y.lang"
        ),
        "revenue_rollup": (
            "WITH nat AS ( "
            "  SELECT r.r_name AS region_name, n.n_name AS nation_name, "
            "    count(*)::BIGINT AS n_orders, "
            "    CAST(ROUND(sum(o.o_totalprice) * 100) AS BIGINT) AS revenue_e2 "
            "  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "  JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "  JOIN region r ON r.r_regionkey = n.n_regionkey GROUP BY 1, 2) "
            "SELECT COALESCE(region_name, '') AS region_name, "
            "  COALESCE(nation_name, '') AS nation_name, "
            "  sum(n_orders)::BIGINT AS n_orders, sum(revenue_e2)::BIGINT AS revenue_e2 "
            "FROM nat GROUP BY ROLLUP(region_name, nation_name)"
        ),
        "lineitem_semijoin": (
            "SELECT l_returnflag, count(*)::BIGINT AS n_items, "
            "sum(CAST(ROUND(l_quantity) AS BIGINT))::BIGINT AS sum_qty, "
            "sum(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "    (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))::BIGINT AS revenue_e4 "
            "FROM lineitem WHERE l_suppkey IN "
            "  (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000) GROUP BY 1"
        ),
        "top_terms_per_lang": (
            "SELECT lang, term, cnt FROM ( "
            "  SELECT lang, term, count(*)::BIGINT AS cnt, "
            "    row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, term) AS rn "
            "  FROM (SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term "
            "        FROM documents WHERE trim(text) <> '') "
            "  GROUP BY lang, term) WHERE rn <= 10"
        ),
        "sssp_weighted": _sssp_weighted_sql(),
        "earliest_arrival": _earliest_arrival_sql(),
        "anf": _anf_sql(),
        "pagerank_weighted": _pagerank_weighted_sql(),
        "media_features": _media_features_sql(),
        "media_framesample": _frame_sample_sql(),
        "embedding_neardup": _embedding_neardup_sql(),
        "pages_linkgraph_pagerank": _pages_pr_sql(),
        # incremental build == full rebuild: the patched graph must
        # reproduce the from-scratch flagship's oracle bit-for-bit
        "graph_patch_pr": _pages_pr_sql(),
        # patch COMPOSITION == full rebuild (three chained waves)
        "graph_patch_chain": _pages_pr_sql(),
        "graph_delete_degrees": (
            # vertex universe stays after deletion; degrees count only
            # directed edges whose source page survived (mirrors
            # testdata.q_graph_delete_degrees)
            f"WITH {_pages_edges_cte()}, "
            "vid AS (SELECT CAST(substr(split_part(src, '/', 3), 6, 5) AS BIGINT) * 16 "
            "        + CAST(split_part(src, '/', 5) AS BIGINT) AS i, src, dst FROM e), "
            "keep AS (SELECT src, dst FROM vid WHERE i < 1600), "
            "verts AS (SELECT DISTINCT v FROM "
            "          (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)), "
            "sl AS (SELECT src AS v FROM keep UNION ALL SELECT dst FROM keep), "
            "dg AS (SELECT v, count(*)::BIGINT AS degree FROM sl GROUP BY v) "
            "SELECT verts.v AS vertex, COALESCE(dg.degree, 0)::BIGINT AS degree "
            "FROM verts LEFT JOIN dg ON dg.v = verts.v"
        ),
        "domain_pagerank": _domain_pr_sql(),
        "domain_hits": (
            # weighted HITS on the contracted host graph via the
            # doubled bipartite recursion: 4 supersteps of integer-
            # exact weighted sum propagation, one half-up e8
            # normalization per family (mirrors testdata.q_domain_hits)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
            "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
            "dd AS (SELECT 'h:' || s AS sv, 'a:' || d AS tv, w FROM de "
            "       UNION ALL SELECT 'a:' || d, 'h:' || s, w FROM de), "
            "it AS ( "
            "  SELECT 0 AS i, v, CAST(1 AS DOUBLE) AS val "
            "  FROM (SELECT DISTINCT sv AS v FROM dd) "
            "  UNION ALL "
            "  SELECT p.i + 1, dd.tv, SUM(p.val * dd.w) FROM it p "
            "  JOIN dd ON dd.sv = p.v WHERE p.i < 4 GROUP BY p.i, dd.tv), "
            "fin AS (SELECT v, val FROM it WHERE i = 4), "
            "uni AS (SELECT DISTINCT sv AS v FROM dd), "
            "hv AS (SELECT substr(uni.v, 3) AS host, "
            "  CASE WHEN uni.v LIKE 'h:%' THEN COALESCE(fin.val, 0) ELSE 0 END AS hub, "
            "  CASE WHEN uni.v LIKE 'a:%' THEN COALESCE(fin.val, 0) ELSE 0 END AS auth "
            "  FROM uni LEFT JOIN fin ON fin.v = uni.v), "
            "pv AS (SELECT host, CAST(sum(hub) AS HUGEINT) AS hub, "
            "       CAST(sum(auth) AS HUGEINT) AS auth FROM hv GROUP BY host), "
            "tot AS (SELECT sum(hub) AS th, sum(auth) AS ta FROM pv) "
            "SELECT host, "
            "  ((2 * hub * 100000000 + th) // (2 * th))::BIGINT AS hub_e8, "
            "  ((2 * auth * 100000000 + ta) // (2 * ta))::BIGINT AS auth_e8 "
            "FROM pv CROSS JOIN tot"
        ),
        "trustrank_domains": _trustrank_sql(),
        "spam_mass": _spam_mass_sql(),
        "doc_readability": (
            # ARI with floor-1 sentence count + long-word share, all
            # integer floor divisions (mirrors testdata.q_doc_readability)
            "WITH f AS (SELECT doc_id, "
            "  length(regexp_replace(text, '\\W', '', 'g'))::BIGINT AS chars, "
            "  greatest(1, len(regexp_extract_all(text, '\\S+')))::BIGINT AS words, "
            "  greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT AS sents, "
            "  len(regexp_extract_all(text, '\\b\\w{6,}\\b'))::BIGINT AS nlong "
            "  FROM documents WHERE trim(text) <> '') "
            "SELECT doc_id, words AS n_words, sents AS n_sents, "
            "  ((4710000 * chars) // words + (500000 * words) // sents "
            "   - 21430000)::BIGINT AS ari_e6, "
            "  ((1000000 * nlong) // words)::BIGINT AS pct_long_e6 FROM f"
        ),
        "doc_quality": _quality_sql(),
        "coverage_greedy": _coverage_greedy_sql(),
        "page_text_stats": _page_text_sql(),
        "rank_gini": (
            # S = sum(mass * rank) over hosts sorted by mass (tie order
            # irrelevant: tied rows share the value); half-up e6 Gini
            # (mirrors testdata.q_rank_gini)
            f"WITH RECURSIVE {_pages_edges_cte()}, {_pr_chain('')}, "
            "hm AS (SELECT split_part(id, '/', 3) AS host, sum(e8)::HUGEINT AS m "
            "       FROM fin GROUP BY 1), "
            "rk AS (SELECT m, row_number() OVER (ORDER BY m, host) AS rn FROM hm), "
            "mo AS (SELECT count(*)::HUGEINT AS n, sum(m)::HUGEINT AS sm, "
            "       sum(m * rn)::HUGEINT AS s FROM rk) "
            "SELECT n::BIGINT AS n_hosts, sm::BIGINT AS sum_mass_e8, "
            "  (CASE WHEN n * sm = 0 THEN 0 ELSE "
            "   (2 * (2 * s - (n + 1) * sm) * 1000000 + n * sm) // (2 * n * sm) "
            "   END)::BIGINT AS gini_e6 "
            "FROM mo"
        ),
        "crawl_scheduler": (
            # host PR mass (shared _pr_chain) x stale share, exact
            # integer priority, top 25 (mirrors testdata.q_crawl_scheduler)
            f"WITH RECURSIVE {_pages_edges_cte()}, {_pr_chain('')}, "
            "hm AS (SELECT split_part(id, '/', 3) AS host, sum(e8) AS m FROM fin "
            "       GROUP BY 1), "
            "st AS (SELECT split_part(src, '/', 3) AS host, count(*) AS nl, "
            "       count(*) FILTER (dst < src) AS ns FROM e "
            "       WHERE dst LIKE 'https://site-%' GROUP BY 1) "
            "SELECT hm.host, hm.m::BIGINT AS mass_e8, "
            "  ((1000000 * st.ns) // st.nl)::BIGINT AS stale_share_e6, "
            "  ((hm.m * ((1000000 * st.ns) // st.nl)) // 1000000)::BIGINT AS priority_x "
            "FROM hm JOIN st USING (host) "
            "ORDER BY priority_x DESC, host LIMIT 25"
        ),
        "lang_link_matrix": (
            # both endpoint langs from the rebuilt lang table; inner
            # join drops offsite targets (mirrors
            # testdata.q_lang_link_matrix)
            f"WITH {_pages_edges_cte()}, "
            f"lbase AS (SELECT i::UBIGINT AS i FROM range(0, 2000) t(i)), "
            f"lh AS (SELECT i, xor({(44 * _FNV64) % _M64}::UBIGINT, i) AS acc0, "
            f"       {_splitmix_cols('acc0', 'hl')} FROM lbase), "
            "pl AS (SELECT printf('https://site-%05d.example/p/%04d', "
            "       (i::BIGINT) // 16, (i::BIGINT) % 16) AS url, "
            "  CASE (hl % 8)::BIGINT WHEN 4 THEN 'de' WHEN 5 THEN 'fr' "
            "       WHEN 6 THEN 'es' WHEN 7 THEN 'zh' ELSE 'en' END AS lang "
            "  FROM lh) "
            "SELECT ps.lang AS src_lang, pd.lang AS dst_lang, "
            "  count(*)::BIGINT AS n_links "
            "FROM e JOIN pl ps ON ps.url = e.src JOIN pl pd ON pd.url = e.dst "
            "GROUP BY 1, 2"
        ),
        "host_spam_heuristic": (
            # pre-dedup instances from res; dup = total - distinct
            # (src,dst); e6-floor shares + equal-weight composite
            # (mirrors testdata.q_host_spam_heuristic)
            f"WITH {_pages_edges_cte()}, "
            f"inst AS (SELECT {_PAGE_URL('i')} AS src, href AS dst FROM res), "
            "hh AS (SELECT split_part(src, '/', 3) AS host, "
            "  count(*) AS n, "
            "  count(*) - count(DISTINCT src || ' ' || dst) AS d, "
            "  count(*) FILTER (src = dst) AS s, "
            "  count(*) FILTER (split_part(dst, '/', 3) <> split_part(src, '/', 3)) AS o "
            "  FROM inst GROUP BY 1) "
            "SELECT host, n::BIGINT AS n_hrefs, "
            "  ((1000000 * d) // n)::BIGINT AS dup_share_e6, "
            "  ((1000000 * s) // n)::BIGINT AS self_share_e6, "
            "  ((1000000 * o) // n)::BIGINT AS offsite_share_e6, "
            "  (((1000000 * d) // n + (1000000 * s) // n + (1000000 * o) // n) "
            "   // 3)::BIGINT AS spam_score_e6 "
            "FROM hh"
        ),
        "host_rank_flow": (
            # per-vertex leak floor (m*cross)//deg over the symmetrized
            # distinct edges, summed per host (mirrors
            # testdata.q_host_rank_flow)
            f"WITH RECURSIVE {_pages_edges_cte()}, {_pr_chain('')}, "
            "dd AS (SELECT src AS id, count(*) AS d, "
            "  count(*) FILTER (split_part(dst, '/', 3) <> split_part(src, '/', 3)) AS x "
            "  FROM es GROUP BY 1), "
            "pv AS (SELECT split_part(f.id, '/', 3) AS host, f.e8 AS m, "
            "  (f.e8 * dd.x) // dd.d AS leak "
            "  FROM fin f JOIN dd ON dd.id = f.id) "
            "SELECT host, sum(m)::BIGINT AS mass_e8, sum(leak)::BIGINT AS leak_e8, "
            "  ((1000000 * sum(leak)) // sum(m))::BIGINT AS leak_share_e6 "
            "FROM pv GROUP BY host"
        ),
        "host_outlink_diversity": (
            # inverse-Simpson effective partner count, exact integers
            # (mirrors testdata.q_host_outlink_diversity)
            f"WITH {_pages_edges_cte()}, "
            "hc AS (SELECT split_part(src, '/', 3) AS host, "
            "       split_part(dst, '/', 3) AS dh, count(*)::BIGINT AS c "
            "       FROM e GROUP BY 1, 2) "
            "SELECT host, count(*)::BIGINT AS n_partners, sum(c)::BIGINT AS n_links, "
            "  ((1000000 * sum(c) * sum(c)) // sum(c * c))::BIGINT AS inv_simpson_e6 "
            "FROM hc GROUP BY host"
        ),
        "link_crawl_lag": (
            # crawl-order lag = page-id delta in seconds (warc_ts =
            # EPOCH + id sec); ids rebuilt from the url printf; onsite
            # targets only; pure integer sums (mirrors
            # testdata.q_link_crawl_lag)
            f"WITH {_pages_edges_cte()}, "
            "ids AS (SELECT split_part(src, '/', 3) AS host, "
            "  CAST(substr(split_part(dst, '/', 3), 6, 5) AS BIGINT) * 16 "
            "    + CAST(split_part(dst, '/', 5) AS BIGINT) "
            "  - CAST(substr(split_part(src, '/', 3), 6, 5) AS BIGINT) * 16 "
            "    - CAST(split_part(src, '/', 5) AS BIGINT) AS lag "
            "  FROM e WHERE dst LIKE 'https://site-%') "
            "SELECT host, count(*)::BIGINT AS n_links, "
            "  sum(lag)::BIGINT AS sum_lag_sec, "
            "  count(*) FILTER (lag > 0)::BIGINT AS n_fwd, "
            "  max(lag)::BIGINT AS max_lag_sec, min(lag)::BIGINT AS min_lag_sec "
            "FROM ids GROUP BY host"
        ),
        "term_heavy_hitters": (
            # exact {t : f(t) > n//40} — the MG two-pass output is
            # provably this set (mirrors testdata.q_term_heavy_hitters)
            "WITH tok AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) "
            "             AS term FROM documents WHERE trim(text) <> ''), "
            "tot AS (SELECT count(*)::BIGINT AS n FROM tok) "
            "SELECT term, count(*)::BIGINT AS cnt "
            "FROM tok CROSS JOIN tot GROUP BY term, tot.n "
            "HAVING count(*) > tot.n // 40"
        ),
        "anchor_bm25": (
            # anchor doc per target from pre-dedup instances (res):
            # tokens ['link', k] so dl = 2*inlinks and tf(term d) =
            # #instances with k = d; same exact-integer BM25 rational
            # as doc_bm25 (mirrors testdata.q_anchor_bm25)
            f"WITH {_pages_edges_cte()}, "
            "inst AS (SELECT href AS dst, k FROM res), "
            "doc AS (SELECT dst, 2 * count(*) AS dl, "
            "  count(*) FILTER (k = 3) AS t0, count(*) FILTER (k = 7) AS t1, "
            "  count(*) FILTER (k = 12) AS t2 FROM inst GROUP BY dst), "
            "st AS (SELECT count(*)::HUGEINT AS n, sum(dl)::HUGEINT AS tot, "
            "  (count(*) FILTER (t0 > 0))::HUGEINT AS d0, "
            "  (count(*) FILTER (t1 > 0))::HUGEINT AS d1, "
            "  (count(*) FILTER (t2 > 0))::HUGEINT AS d2 FROM doc), "
            "pr AS (SELECT tot // n AS a, "
            "  ((n - d0 + 1) * 2000000 + (d0 + 1)) // (2 * (d0 + 1)) AS i0, "
            "  ((n - d1 + 1) * 2000000 + (d1 + 1)) // (2 * (d1 + 1)) AS i1, "
            "  ((n - d2 + 1) * 2000000 + (d2 + 1)) // (2 * (d2 + 1)) AS i2 FROM st) "
            "SELECT dst AS url, ( "
            "  CASE WHEN t0 > 0 THEN (2 * i0 * 22 * t0 * a + (10*t0*a + 3*a + 9*dl)) "
            "       // (2 * (10*t0*a + 3*a + 9*dl)) ELSE 0 END "
            "  + CASE WHEN t1 > 0 THEN (2 * i1 * 22 * t1 * a + (10*t1*a + 3*a + 9*dl)) "
            "       // (2 * (10*t1*a + 3*a + 9*dl)) ELSE 0 END "
            "  + CASE WHEN t2 > 0 THEN (2 * i2 * 22 * t2 * a + (10*t2*a + 3*a + 9*dl)) "
            "       // (2 * (10*t2*a + 3*a + 9*dl)) ELSE 0 END)::BIGINT AS bm25_e6 "
            "FROM doc CROSS JOIN pr WHERE t0 > 0 OR t1 > 0 OR t2 > 0"
        ),
        "rank_by_lang": (
            # flagship PR (shared _pr_chain) joined onto the rebuilt
            # lang column; offsite urls drop (no lang) — mirrors
            # testdata.q_rank_by_lang
            f"WITH RECURSIVE {_pages_edges_cte()}, {_pr_chain('')}, "
            f"lbase AS (SELECT i::UBIGINT AS i FROM range(0, 2000) t(i)), "
            f"lh AS (SELECT i, xor({(44 * _FNV64) % _M64}::UBIGINT, i) AS acc0, "
            f"       {_splitmix_cols('acc0', 'hl')} FROM lbase), "
            "pl AS (SELECT printf('https://site-%05d.example/p/%04d', "
            "       (i::BIGINT) // 16, (i::BIGINT) % 16) AS url, "
            "  CASE (hl % 8)::BIGINT WHEN 4 THEN 'de' WHEN 5 THEN 'fr' "
            "       WHEN 6 THEN 'es' WHEN 7 THEN 'zh' ELSE 'en' END AS lang "
            "  FROM lh) "
            "SELECT pl.lang, count(*)::BIGINT AS n_pages, "
            "  sum(f.e8)::BIGINT AS mass_e8, "
            "  (sum(f.e8) // count(*))::BIGINT AS mean_e8 "
            "FROM fin f JOIN pl ON pl.url = f.id GROUP BY pl.lang"
        ),
        "inout_degree_corr": (
            # integer moments over per-vertex (out, in) degrees of the
            # distinct directed edges; signed exact-rational r^2 in
            # HUGEINT (mirrors testdata.q_inout_degree_corr)
            f"WITH {_pages_edges_cte()}, "
            "dv AS (SELECT url, sum(o)::BIGINT AS x, sum(i)::BIGINT AS y FROM ( "
            "   SELECT src AS url, 1 AS o, 0 AS i FROM e "
            "   UNION ALL SELECT dst, 0, 1 FROM e) GROUP BY url), "
            "m AS (SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx, "
            "      sum(y)::HUGEINT AS sy, sum(x*y)::HUGEINT AS sxy, "
            "      sum(x*x)::HUGEINT AS sxx, sum(y*y)::HUGEINT AS syy FROM dv) "
            "SELECT n::BIGINT AS n, sx::BIGINT AS sx, sy::BIGINT AS sy, "
            "  sxy::BIGINT AS sxy, sxx::BIGINT AS sxx, syy::BIGINT AS syy, "
            "  (CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN 0 "
            "   ELSE (CASE WHEN n*sxy - sx*sy >= 0 THEN 1 ELSE -1 END) "
            "     * (1000000 * (n*sxy - sx*sy) * (n*sxy - sx*sy)) "
            "       // ((n*sxx - sx*sx) * (n*syy - sy*sy)) END)::BIGINT "
            "   AS r2_signed_e6 "
            "FROM m"
        ),
        "site_entry_pages": (
            # cross-host edges onto site pages; counts are distinct
            # citing pages (e is the distinct edge set); mirrors
            # testdata.q_site_entry_pages
            f"WITH {_pages_edges_cte()}, "
            "ee AS (SELECT split_part(dst, '/', 3) AS host, dst AS url FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3) "
            "         AND dst LIKE 'https://site-%'), "
            "cnt AS (SELECT host, url, count(*) AS c FROM ee GROUP BY 1, 2), "
            "tot AS (SELECT host, sum(c) AS t, count(*) AS ne FROM cnt GROUP BY host), "
            "tp AS (SELECT host, url, c FROM cnt "
            "       QUALIFY row_number() OVER (PARTITION BY host ORDER BY c DESC, url) = 1) "
            "SELECT tp.host, tot.ne::BIGINT AS n_entry, tot.t::BIGINT AS ext_inlinks, "
            "  tp.url AS top_url, tp.c::BIGINT AS top_inlinks "
            "FROM tp JOIN tot USING (host)"
        ),
        "host_pr_concentration": (
            # flagship PR recursion (shared _pr_chain) folded per host;
            # e6-floor top-page share (mirrors
            # testdata.q_host_pr_concentration)
            f"WITH RECURSIVE {_pages_edges_cte()}, {_pr_chain('')}, "
            "sc AS (SELECT split_part(id, '/', 3) AS host, id AS url, e8 FROM fin), "
            "tot AS (SELECT host, sum(e8) AS t, count(*) AS np FROM sc GROUP BY host), "
            "tp AS (SELECT host, url, e8 FROM sc "
            "       QUALIFY row_number() OVER (PARTITION BY host ORDER BY e8 DESC, url) = 1) "
            "SELECT tp.host, tot.np::BIGINT AS n_pages, tot.t::BIGINT AS mass_e8, "
            "  tp.url AS top_url, "
            "  ((1000000 * tp.e8) // greatest(tot.t, 1))::BIGINT AS top_share_e6 "
            "FROM tp JOIN tot USING (host)"
        ),
        "pagerank_topic": (
            # personalized PR with the teleport on lang='de' pages
            # (lang rebuilt from mix64(seed+2, i) like host_lang_mix);
            # mirrors testdata.q_pagerank_topic
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            f"lbase AS (SELECT i::UBIGINT AS i FROM range(0, 2000) t(i)), "
            f"lh AS (SELECT i, xor({(44 * _FNV64) % _M64}::UBIGINT, i) AS acc0, "
            f"       {_splitmix_cols('acc0', 'hl')} FROM lbase), "
            "sd AS (SELECT printf('https://site-%05d.example/p/%04d', "
            "       (i::BIGINT) // 16, (i::BIGINT) % 16) AS url "
            "       FROM lh WHERE (hl % 8)::BIGINT = 4), "
            "es AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e), "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "sn AS (SELECT count(*)::DOUBLE AS ns FROM sd), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, ee.dst, "
            "    (CASE WHEN ee.dst IN (SELECT url FROM sd) THEN 0.15/sn.ns "
            "          ELSE 0.0 END) + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN sn JOIN es ee ON ee.src = p.id "
            "       JOIN deg dd ON dd.id = ee.dst "
            "  WHERE p.it < 30 GROUP BY p.it, ee.dst, dd.d, sn.ns) "
            "SELECT id AS url, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30 ORDER BY score_e8 DESC, url LIMIT 50"
        ),
        "rank_churn": (
            # two full PR recursions over the crawl_delta snapshot pair
            # (o_/n_ prefixed generator chains), joined at iteration 30
            # (mirrors testdata.q_rank_churn)
            f"WITH RECURSIVE {_pages_edges_cte(2000, 42, 'o_')}, "
            f"{_pages_edges_cte(2200, 42, 'n_')}, "
            f"{_pr_chain('o_')}, {_pr_chain('n_')} "
            "SELECT o_fin.id AS url, o_fin.e8 AS old_e8, n_fin.e8 AS new_e8, "
            "  (n_fin.e8 - o_fin.e8)::BIGINT AS delta_e8, "
            "  abs(n_fin.e8 - o_fin.e8)::BIGINT AS abs_delta_e8 "
            "FROM o_fin JOIN n_fin ON n_fin.id = o_fin.id "
            "ORDER BY abs_delta_e8 DESC, url LIMIT 50"
        ),
        "degree_ccdf": (
            # in-degree per target, CCDF at 2^k thresholds (mirrors
            # testdata.q_degree_ccdf)
            f"WITH {_pages_edges_cte()}, "
            "deg AS (SELECT dst, count(*) AS d FROM e GROUP BY dst), "
            "ks AS (SELECT k FROM range(0, 22) t(k)) "
            "SELECT k::BIGINT AS k, (1::BIGINT << k)::BIGINT AS threshold, "
            "  count(*)::BIGINT AS n_vertices "
            "FROM ks JOIN deg ON deg.d >= (1::BIGINT << k) GROUP BY k"
        ),
        "site_local_pagerank": (
            # house PR recurrence per site over the symmetrized
            # intra-site multigraph; teleport 0.15/n_site via a
            # per-host vertex count join (mirrors
            # testdata.q_site_local_pagerank)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "esw AS (SELECT src, dst FROM ie UNION ALL SELECT dst, src FROM ie), "
            "deg AS (SELECT src AS id, count(*) AS d FROM esw GROUP BY src), "
            "hn AS (SELECT split_part(id, '/', 3) AS host, count(*)::DOUBLE AS n "
            "       FROM deg GROUP BY 1), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, e2.dst, 0.15/hn.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p JOIN esw e2 ON e2.src = p.id "
            "       JOIN deg dd ON dd.id = e2.dst "
            "       JOIN hn ON hn.host = split_part(e2.dst, '/', 3) "
            "  WHERE p.it < 30 GROUP BY p.it, e2.dst, dd.d, hn.n) "
            "SELECT id AS url, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30"
        ),
        "web_bowtie": (
            # two BFS closures (forward edges / swapped edges) from the
            # root, classes from the finite-distance flags (mirrors
            # testdata.q_web_bowtie)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "vset AS (SELECT DISTINCT u AS id FROM "
            "         (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)), "
            "frelax AS (SELECT src, dst, 1 AS w FROM e "
            "           UNION ALL SELECT id, id, 0 FROM vset), "
            "rrelax AS (SELECT dst AS src, src AS dst, 1 AS w FROM e "
            "           UNION ALL SELECT id, id, 0 FROM vset), "
            "bff AS ( "
            "  SELECT 0 AS it, 'https://site-00000.example/p/0000' AS id, 0 AS dist "
            "  UNION ALL SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM bff p "
            "  JOIN frelax r ON r.src = p.id WHERE p.it < 40 GROUP BY p.it, r.dst), "
            "bfr AS ( "
            "  SELECT 0 AS it, 'https://site-00000.example/p/0000' AS id, 0 AS dist "
            "  UNION ALL SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM bfr p "
            "  JOIN rrelax r ON r.src = p.id WHERE p.it < 40 GROUP BY p.it, r.dst), "
            "ff AS (SELECT DISTINCT id FROM bff WHERE it = 40), "
            "rr AS (SELECT DISTINCT id FROM bfr WHERE it = 40) "
            "SELECT v.id AS url, "
            "  (CASE WHEN ff.id IS NOT NULL AND rr.id IS NOT NULL THEN 0 "
            "        WHEN rr.id IS NOT NULL THEN 1 "
            "        WHEN ff.id IS NOT NULL THEN 2 ELSE 3 END)::BIGINT AS cls "
            "FROM vset v LEFT JOIN ff ON ff.id = v.id LEFT JOIN rr ON rr.id = v.id"
        ),
        "events_mad": (
            # lower-median k = (n+1)//2 on cents; MAD by ranking the
            # folded |c - med| distribution (mirrors testdata.q_events_mad)
            "WITH h AS (SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c "
            "           FROM events), "
            "hc AS (SELECT event_type, c, count(*) AS n FROM h GROUP BY 1, 2), "
            "cm AS (SELECT event_type, c, "
            "       sum(n) OVER (PARTITION BY event_type ORDER BY c) AS cum, "
            "       sum(n) OVER (PARTITION BY event_type) AS tot FROM hc), "
            "md AS (SELECT event_type, min(c) AS med, max(tot) AS tot FROM cm "
            "       WHERE 2 * cum >= tot + (tot % 2) GROUP BY event_type), "
            "fd AS (SELECT hc.event_type, abs(hc.c - md.med) AS d, sum(hc.n) AS n, "
            "       max(md.med) AS med, max(md.tot) AS tot "
            "       FROM hc JOIN md USING (event_type) GROUP BY 1, 2), "
            "dm AS (SELECT event_type, d, "
            "       sum(n) OVER (PARTITION BY event_type ORDER BY d) AS cum, "
            "       max(tot) OVER (PARTITION BY event_type) AS tot, "
            "       max(med) OVER (PARTITION BY event_type) AS med FROM fd) "
            "SELECT event_type, max(tot)::BIGINT AS n_events, "
            "  max(med)::BIGINT AS median_e2, min(d)::BIGINT AS mad_e2 "
            "FROM dm WHERE 2 * cum >= tot + (tot % 2) GROUP BY event_type"
        ),
        "pagerank_mass_by_depth": (
            # the pagerank_dangling and bfs_layers recursions over ONE
            # shared edge chain, joined at their final iterations
            # (mirrors testdata.q_pagerank_mass_by_depth)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "vset AS (SELECT DISTINCT u AS id FROM "
            "         (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)), "
            "deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM e GROUP BY src), "
            "nn AS (SELECT count(*)::DOUBLE AS n FROM vset), "
            "dang AS (SELECT v.id FROM vset v LEFT JOIN deg ON deg.id = v.id "
            "         WHERE deg.id IS NULL), "
            "prelax AS ( "
            "  SELECT e.src AS s, e.dst AS t, 1.0 / deg.d AS w FROM e "
            "  JOIN deg ON deg.id = e.src "
            "  UNION ALL SELECT d.id, v.id, (SELECT 1.0 / n FROM nn) "
            "    FROM dang d CROSS JOIN vset v "
            "  UNION ALL SELECT id, id, 0.0 FROM vset), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM vset "
            "  UNION ALL "
            "  SELECT p.it + 1, r.t, 0.15/nn.n + 0.85 * SUM(p.val * r.w) "
            "  FROM pr p CROSS JOIN nn JOIN prelax r ON r.s = p.id "
            "  WHERE p.it < 30 GROUP BY p.it, r.t, nn.n), "
            "brelax AS (SELECT src, dst, 1 AS w FROM e "
            "           UNION ALL SELECT id, id, 0 FROM vset), "
            "bf AS ( "
            "  SELECT 0 AS it, 'https://site-00000.example/p/0000' AS id, 0 AS dist "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM bf p "
            "  JOIN brelax r ON r.src = p.id WHERE p.it < 40 "
            "  GROUP BY p.it, r.dst) "
            "SELECT bf.dist::BIGINT AS dist, count(*)::BIGINT AS n_pages, "
            "  sum(CAST(ROUND(pr.val * 1e8) AS BIGINT))::BIGINT AS mass_e8 "
            "FROM pr JOIN bf ON bf.id = pr.id AND bf.it = 40 "
            "WHERE pr.it = 30 GROUP BY 1"
        ),
        "crawl_recency": (
            # warc_ts = EPOCH_US + i*1e6 (sources/pages.py:41), so the
            # oracle rebuilds ts arithmetic directly (mirrors
            # testdata.q_crawl_recency)
            "WITH pg AS (SELECT i, "
            "  printf('https://site-%05d.example/p/%04d', i // 16, i % 16) AS url, "
            "  1700000000000000 + i * 1000000 AS ts_us "
            "  FROM range(0, 2000) t(i)) "
            "SELECT split_part(url, '/', 3) AS host, "
            "  min(ts_us)::BIGINT AS first_us, max(ts_us)::BIGINT AS last_us, "
            "  ((max(ts_us) - min(ts_us)) // 1000000)::BIGINT AS span_sec, "
            "  count(*)::BIGINT AS n_pages "
            "FROM pg GROUP BY 1"
        ),
        "page_shingle_novelty": (
            # novel instance = its gram's min page id equals this page's
            # id (mirrors testdata.q_page_shingle_novelty)
            f"WITH {_page_text_cte()}, "
            "ptk AS (SELECT printf('https://site-%05d.example/p/%04d', i // 16, i % 16) AS url, "
            "        i AS pid, regexp_split_to_array(text, ' ') AS ts FROM txt), "
            "pg AS (SELECT url, pid, array_to_string(ts[j:j+3], ' ') AS gram "
            "       FROM ptk, LATERAL unnest(generate_series(1, len(ts) - 3)) t(j)), "
            "fs AS (SELECT gram, min(pid) AS first_pid FROM pg GROUP BY gram), "
            "tg AS (SELECT pg.url, CASE WHEN pg.pid = fs.first_pid THEN 1 ELSE 0 END AS v "
            "       FROM pg JOIN fs USING (gram)) "
            "SELECT url, count(*)::BIGINT AS n_grams, sum(v)::BIGINT AS n_novel, "
            "  ((1000000 * sum(v)) // count(*))::BIGINT AS novelty_e6 "
            "FROM tg GROUP BY url"
        ),
        "page_boilerplate": (
            # token 4-grams over the rebuilt text; boilerplate = gram
            # in >= 8 of the site's 16 pages; per-page instance share
            # (mirrors testdata.q_page_boilerplate)
            f"WITH {_page_text_cte()}, "
            "ptk AS (SELECT printf('https://site-%05d.example/p/%04d', i // 16, i % 16) AS url, "
            "        i // 16 AS site, regexp_split_to_array(text, ' ') AS ts FROM txt), "
            "pg AS (SELECT url, site, array_to_string(ts[j:j+3], ' ') AS gram "
            "       FROM ptk, LATERAL unnest(generate_series(1, len(ts) - 3)) t(j)), "
            "bl AS (SELECT site, gram FROM pg GROUP BY site, gram "
            "       HAVING count(DISTINCT url) >= 8), "
            "tagged AS (SELECT pg.url, "
            "  CASE WHEN bl.gram IS NOT NULL THEN 1 ELSE 0 END AS b "
            "  FROM pg LEFT JOIN bl ON bl.site = pg.site AND bl.gram = pg.gram) "
            "SELECT url, count(*)::BIGINT AS n_grams, sum(b)::BIGINT AS n_boiler, "
            "  ((1000000 * sum(b)) // count(*))::BIGINT AS boiler_share_e6 "
            "FROM tagged GROUP BY url"
        ),
        "bfs_layers": (
            # Bellman-Ford-style iteration-indexed recursion with
            # self-loop relax (the site_centrality pattern) from the
            # pinned seed over the directed page graph; 40 rounds >=
            # fixpoint depth (mirrors testdata.q_bfs_layers)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "vset AS (SELECT DISTINCT u AS id FROM "
            "         (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)), "
            "relax AS (SELECT src, dst, 1 AS w FROM e "
            "          UNION ALL SELECT id, id, 0 FROM vset), "
            "bf AS ( "
            "  SELECT 0 AS it, 'https://site-00000.example/p/0000' AS id, 0 AS dist "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM bf p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 40 "
            "  GROUP BY p.it, r.dst) "
            "SELECT dist::BIGINT AS dist, count(*)::BIGINT AS n_pages "
            "FROM bf WHERE it = 40 GROUP BY dist"
        ),
        "host_butterflies": (
            # per-page distinct cross-host citations, self-joined into
            # ordered pairs, butterfly count C(c,2) per pair (mirrors
            # testdata.q_host_butterflies)
            f"WITH {_pages_edges_cte()}, "
            "ph AS (SELECT DISTINCT src, split_part(dst, '/', 3) AS h FROM e "
            "       WHERE split_part(dst, '/', 3) <> split_part(src, '/', 3)), "
            "pr AS (SELECT x.src, x.h AS ha, y.h AS hb FROM ph x "
            "       JOIN ph y ON y.src = x.src AND x.h < y.h), "
            "c AS (SELECT ha AS a, hb AS b, count(*) AS n_pages FROM pr GROUP BY 1, 2) "
            "SELECT a, b, n_pages::BIGINT AS n_pages, "
            "  (n_pages * (n_pages - 1) // 2)::BIGINT AS n_butterflies "
            "FROM c WHERE n_pages >= 2"
        ),
        "stale_link_rate": (
            # 'older target' = dst < src exactly (warc_ts monotone in
            # page id, urls zero-padded) — mirrors
            # testdata.q_stale_link_rate
            f"WITH {_pages_edges_cte()}, "
            "ol AS (SELECT split_part(src, '/', 3) AS host, "
            "       count(*) AS n_links, "
            "       count(*) FILTER (dst < src) AS n_stale "
            "       FROM e WHERE dst LIKE 'https://site-%' GROUP BY 1) "
            "SELECT host, n_links::BIGINT AS n_links, n_stale::BIGINT AS n_stale, "
            "  ((1000000 * n_stale) // n_links)::BIGINT AS stale_share_e6 FROM ol"
        ),
        "host_lang_mix": (
            # page lang rebuilt in SQL: lang = LANGS[mix64(seed+2, i) % 8]
            # (sources/pages.py:_gen_batch), same splitmix reproduction
            # as the edge CTE (mirrors testdata.q_host_lang_mix)
            f"WITH lbase AS (SELECT i::UBIGINT AS i FROM range(0, 2000) t(i)), "
            f"lh AS (SELECT i, xor({(44 * _FNV64) % _M64}::UBIGINT, i) AS acc0, "
            f"       {_splitmix_cols('acc0', 'hl')} FROM lbase), "
            "pl AS (SELECT "
            f"  printf('https://site-%05d.example/p/%04d', (i::BIGINT) // 16, (i::BIGINT) % 16) AS url, "
            "  CASE (hl % 8)::BIGINT WHEN 4 THEN 'de' WHEN 5 THEN 'fr' "
            "       WHEN 6 THEN 'es' WHEN 7 THEN 'zh' ELSE 'en' END AS lang "
            "  FROM lh), "
            "cnt AS (SELECT split_part(url, '/', 3) AS host, lang, count(*) AS c "
            "        FROM pl GROUP BY 1, 2), "
            "tot AS (SELECT host, sum(c) AS t, count(*) AS n_langs FROM cnt GROUP BY host), "
            "top AS (SELECT host, lang, c FROM cnt "
            "        QUALIFY row_number() OVER (PARTITION BY host ORDER BY c DESC, lang) = 1) "
            "SELECT p.host, tot.t::BIGINT AS n_pages, tot.n_langs::BIGINT AS n_langs, "
            "  p.lang AS top_lang, ((1000000 * p.c) // tot.t)::BIGINT AS top_share_e6 "
            "FROM top p JOIN tot USING (host)"
        ),
        "orphan_pages": (
            # Bloom + verify is exact, so the plain anti-join oracle
            # applies (mirrors testdata.q_orphan_pages)
            f"WITH {_pages_edges_cte()}, "
            "tgt AS (SELECT DISTINCT dst AS url FROM e WHERE src <> dst), "
            f"pg AS (SELECT {_PAGE_URL('i::BIGINT')} AS url FROM base), "
            "orph AS (SELECT pg.url FROM pg LEFT JOIN tgt USING (url) "
            "         WHERE tgt.url IS NULL) "
            "SELECT split_part(url, '/', 3) AS host, count(*)::BIGINT AS n_orphans "
            "FROM orph GROUP BY host"
        ),
        "pagerank_dangling": (
            # dangling mass modeled as explicit pseudo-edges (each
            # zero-outdegree url -> every vertex at weight 1/N) plus a
            # zero-weight self-relax so rankless vertices keep their
            # teleport row (mirrors testdata.q_pagerank_dangling)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "vset AS (SELECT DISTINCT u AS id FROM "
            "         (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)), "
            "deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM e GROUP BY src), "
            "nn AS (SELECT count(*)::DOUBLE AS n FROM vset), "
            "dang AS (SELECT v.id FROM vset v LEFT JOIN deg ON deg.id = v.id "
            "         WHERE deg.id IS NULL), "
            "relax AS ( "
            "  SELECT e.src AS s, e.dst AS t, 1.0 / deg.d AS w FROM e "
            "  JOIN deg ON deg.id = e.src "
            "  UNION ALL SELECT d.id, v.id, (SELECT 1.0 / n FROM nn) "
            "    FROM dang d CROSS JOIN vset v "
            "  UNION ALL SELECT id, id, 0.0 FROM vset), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM vset "
            "  UNION ALL "
            "  SELECT p.it + 1, r.t, 0.15/nn.n + 0.85 * SUM(p.val * r.w) "
            "  FROM pr p CROSS JOIN nn JOIN relax r ON r.s = p.id "
            "  WHERE p.it < 30 GROUP BY p.it, r.t, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30 ORDER BY score_e8 DESC, vertex LIMIT 25"
        ),
        "opic_cash": (
            # OPIC cash history H_K = sum_{t<=K} M^t (1/N): the
            # dangling-PageRank recurrence with teleport 1/N and
            # damping 1, zero init, K+1 = 11 iterations (mirrors
            # algorithms.OPIC / testdata.q_opic_cash)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "vset AS (SELECT DISTINCT u AS id FROM "
            "         (SELECT src AS u FROM e UNION ALL SELECT dst FROM e)), "
            "deg AS (SELECT src AS id, count(*)::BIGINT AS d FROM e GROUP BY src), "
            "nn AS (SELECT count(*)::DOUBLE AS n FROM vset), "
            "dang AS (SELECT v.id FROM vset v LEFT JOIN deg ON deg.id = v.id "
            "         WHERE deg.id IS NULL), "
            "relax AS ( "
            "  SELECT e.src AS s, e.dst AS t, 1.0 / deg.d AS w FROM e "
            "  JOIN deg ON deg.id = e.src "
            "  UNION ALL SELECT d.id, v.id, (SELECT 1.0 / n FROM nn) "
            "    FROM dang d CROSS JOIN vset v "
            "  UNION ALL SELECT id, id, 0.0 FROM vset), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM vset "
            "  UNION ALL "
            "  SELECT p.it + 1, r.t, 1.0/nn.n + 1.0 * SUM(p.val * r.w) "
            "  FROM pr p CROSS JOIN nn JOIN relax r ON r.s = p.id "
            "  WHERE p.it < 11 GROUP BY p.it, r.t, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS cash_e8 "
            "FROM pr WHERE it = 11"
        ),
        "site_edge_stress": (
            # sigma via level-synchronous walk counts (cnt at MIN it =
            # #shortest paths; longer walks are discarded by the dmin
            # join), then stress(u,v) = sum sigma(s,u)*sigma(v,t) over
            # pairs with dist(s,u)+1+dist(v,t) = dist(s,t) (mirrors
            # testdata.q_site_edge_stress)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "v AS (SELECT DISTINCT u FROM "
            "      (SELECT src AS u FROM ie UNION ALL SELECT dst FROM ie)), "
            "pw AS ( "
            "  SELECT u AS s, u AS vv, CAST(1 AS HUGEINT) AS cnt, 0 AS it FROM v "
            "  UNION ALL "
            "  SELECT pw.s, e2.dst, SUM(pw.cnt), pw.it + 1 FROM pw "
            "  JOIN ie e2 ON e2.src = pw.vv WHERE pw.it < 16 "
            "  GROUP BY pw.s, e2.dst, pw.it + 1), "
            "dmin AS (SELECT s, vv, MIN(it) AS dist FROM pw GROUP BY 1, 2), "
            "sig AS (SELECT pw.s, pw.vv, pw.cnt AS sigma FROM pw "
            "        JOIN dmin ON dmin.s = pw.s AND dmin.vv = pw.vv "
            "        AND dmin.dist = pw.it), "
            "est AS (SELECT e3.src AS u, e3.dst AS vd, s1.sigma * s2.sigma AS w "
            "  FROM ie e3 "
            "  JOIN dmin d1 ON d1.vv = e3.src "
            "  JOIN sig s1 ON s1.s = d1.s AND s1.vv = e3.src "
            "  JOIN sig s2 ON s2.s = e3.dst "
            "  JOIN dmin d2 ON d2.s = e3.dst AND d2.vv = s2.vv "
            "  JOIN dmin d3 ON d3.s = d1.s AND d3.vv = s2.vv "
            "   AND d3.dist = d1.dist + 1 + d2.dist "
            "  WHERE e3.src <> e3.dst) "
            "SELECT u AS src, vd AS dst, SUM(w)::BIGINT AS stress "
            "FROM est GROUP BY 1, 2"
        ),
        "domain_mutual_links": (
            # directions folded onto the canonical pair in one GROUP BY
            # (mirrors testdata.q_domain_mutual_links)
            f"WITH {_pages_edges_cte()}, "
            "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
            "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
            "cd AS (SELECT least(s, d) AS a, greatest(s, d) AS b, "
            "       sum(CASE WHEN s < d THEN w ELSE 0 END) AS w_ab, "
            "       sum(CASE WHEN s > d THEN w ELSE 0 END) AS w_ba "
            "       FROM de WHERE s <> d GROUP BY 1, 2) "
            "SELECT a, b, w_ab::BIGINT AS w_ab, w_ba::BIGINT AS w_ba, "
            "  least(w_ab, w_ba)::BIGINT AS w_min FROM cd "
            "WHERE w_ab > 0 AND w_ba > 0"
        ),
        "anchor_majority": (
            # anchor instances rebuilt from the generator chain
            # ('link ' || k per resolved href); mode per target with
            # (count DESC, anchor ASC) tie-break and e6-floor share
            # (mirrors testdata.q_anchor_majority)
            f"WITH {_pages_edges_cte()}, "
            "inst AS (SELECT href AS url, 'link ' || k AS anchor FROM res), "
            "cnt AS (SELECT url, anchor, count(*) AS c FROM inst GROUP BY url, anchor), "
            "tot AS (SELECT url, sum(c) AS t FROM cnt GROUP BY url), "
            "top AS (SELECT url, anchor, c FROM cnt "
            "        QUALIFY row_number() OVER (PARTITION BY url ORDER BY c DESC, anchor) = 1) "
            "SELECT p.url, tot.t::BIGINT AS n_inst, p.anchor AS top_anchor, "
            "  ((1000000 * p.c) // tot.t)::BIGINT AS top_share_e6 "
            "FROM top p JOIN tot USING (url)"
        ),
        "domain_inlink_hll": (
            # per-destination-host HLL registers over distinct
            # in-linking hosts (self-host excluded); same FNV-1a +
            # splitmix64 register recipe as _user_hll_sql (mirrors
            # testdata.q_domain_inlink_hll)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "pairs AS (SELECT DISTINCT split_part(dst, '/', 3) AS host, "
            "          split_part(src, '/', 3) AS tok FROM e "
            "          WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "toks AS (SELECT tok FROM pairs), "
            f"{_FNV_TOK}, "
            f"mixed AS (SELECT tok, {_splitmix_cols('h', 'hs')} FROM tokh), "
            "regs AS (SELECT p.host, (hs >> 56)::BIGINT AS reg, "
            "  (CASE WHEN (hs & ((1::UBIGINT << 56) - 1)) = 0 THEN 57 "
            "   ELSE 56 - length(bin(hs & ((1::UBIGINT << 56) - 1))) + 1 END)::BIGINT AS rho "
            "  FROM pairs p JOIN mixed m ON m.tok = p.tok) "
            "SELECT host, reg, max(rho)::BIGINT AS rho FROM regs GROUP BY host, reg"
        ),
        "feature_propagation": (
            # closed kNN graph over vec_id < 500 (same quantized dot as
            # knn_graph), two floor-mean layers + label agreement
            # (mirrors testdata.q_feature_propagation)
            "WITH q AS (SELECT vec_id, label::BIGINT AS label, "
            "  list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 1024)) AS e "
            "  FROM embeddings WHERE vec_id < 500), "
            "p AS (SELECT a.vec_id AS src, a.label AS src_label, b.vec_id AS nbr, "
            "      CAST(list_dot_product(a.e, b.e) AS BIGINT) AS dq "
            "      FROM q a JOIN q b ON b.vec_id <> a.vec_id), "
            "ed AS (SELECT src, src_label, nbr FROM p "
            "       QUALIFY row_number() OVER (PARTITION BY src ORDER BY dq DESC, nbr) <= 3), "
            "h1 AS (SELECT e.src AS vec_id, max(e.src_label) AS label, "
            "       (1000000 * sum(n.label)) // count(*) AS h, "
            "       sum(CASE WHEN n.label = e.src_label THEN 1 ELSE 0 END) AS n_agree "
            "       FROM ed e JOIN q n ON n.vec_id = e.nbr GROUP BY e.src), "
            "h2 AS (SELECT e.src AS vec_id, sum(n.h) // count(*) AS h "
            "       FROM ed e JOIN h1 n ON n.vec_id = e.nbr GROUP BY e.src) "
            "SELECT h1.vec_id, h1.label, h1.h::BIGINT AS h1_e6, "
            "  h2.h::BIGINT AS h2_e6, h1.n_agree::BIGINT AS n_agree "
            "FROM h1 JOIN h2 USING (vec_id)"
        ),
        "widest_path": (
            # maximin fixpoint in the width domain directly (the engine
            # negates instead): W' (v) = max over relax in-edges of
            # least(W(u), w), self-relax capacity HUGE carries state;
            # 40 rounds >= fixpoint depth (mirrors testdata.q_widest_path)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
            "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
            "esw AS (SELECT s AS src, d AS dst, w FROM de UNION ALL SELECT d, s, w FROM de), "
            "v AS (SELECT DISTINCT src AS id FROM esw), "
            "relax AS (SELECT src, dst, w FROM esw "
            "          UNION ALL SELECT id, id, 1000000000000000::BIGINT FROM v), "
            "wp AS ( "
            "  SELECT 0 AS it, id, CASE WHEN id = 'site-00000.example' "
            "    THEN 1000000000000000::BIGINT ELSE 0::BIGINT END AS wd FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MAX(least(p.wd, r.w)) FROM wp p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 40 "
            "  GROUP BY p.it, r.dst) "
            "SELECT id AS host, CASE WHEN wd > 0 THEN wd END AS width "
            "FROM wp WHERE it = 40 AND id <> 'site-00000.example'"
        ),
        "site_effective_diameter": (
            # exact 50th/90th-percentile intra-site distance: the
            # site_centrality BFS closure reduced to ONE histogram row
            # (integer rank tests, e6-floor mean) — mirrors
            # testdata.q_site_effective_diameter
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "v AS (SELECT DISTINCT u FROM "
            "      (SELECT src AS u FROM ie UNION ALL SELECT dst FROM ie)), "
            "relax AS (SELECT src, dst, 1 AS w FROM ie "
            "          UNION ALL SELECT u, u, 0 FROM v), "
            "dcl AS ( "
            "  SELECT 0 AS it, u AS root, u AS id, 0 AS dist FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, p.root, r.dst, MIN(p.dist + r.w) FROM dcl p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 16 "
            "  GROUP BY p.it, p.root, r.dst), "
            "h AS (SELECT dist AS d, count(*) AS c FROM dcl "
            "      WHERE it = 16 AND dist > 0 GROUP BY dist), "
            "t AS (SELECT sum(c) AS total, sum(d * c) AS sd FROM h), "
            "cum AS (SELECT d, sum(c) OVER (ORDER BY d) AS cc FROM h) "
            "SELECT t.total::BIGINT AS n_pairs, "
            "  (SELECT min(d) FROM cum WHERE 2 * cc >= t.total)::BIGINT AS d50, "
            "  (SELECT min(d) FROM cum WHERE 10 * cc >= 9 * t.total)::BIGINT AS d90, "
            "  (SELECT max(d) FROM h)::BIGINT AS diameter, "
            "  ((1000000 * t.sd) // t.total)::BIGINT AS mean_e6 FROM t"
        ),
        "site_articulation": (
            # w is an articulation point iff its neighbors are not all
            # mutually reachable in G - w: closure keyed by the removed
            # vertex, seeded at w's min neighbor (mirrors
            # testdata.q_site_articulation)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
            "      FROM ie WHERE src <> dst), "
            "adj AS (SELECT a AS x, b AS y FROM u UNION ALL SELECT b, a FROM u), "
            "nb AS (SELECT x AS w, y AS nbr FROM adj), "
            "dg AS (SELECT w, min(nbr) AS s, count(*) AS d FROM nb GROUP BY w), "
            "reach AS ( "
            "  SELECT w, s AS id FROM dg WHERE d >= 2 "
            "  UNION "
            "  SELECT r.w, ad.y FROM reach r JOIN adj ad ON ad.x = r.id "
            "  WHERE ad.y <> r.w) "
            "SELECT DISTINCT n.w AS url FROM nb n "
            "JOIN dg ON dg.w = n.w AND dg.d >= 2 "
            "WHERE NOT EXISTS (SELECT 1 FROM reach r "
            "                  WHERE r.w = n.w AND r.id = n.nbr)"
        ),
        "site_bridges": (
            # bridge test by definition: for every undirected simple
            # intra-site edge (a,b), BFS from a with that edge removed
            # (closure keyed by the removed edge); bridge iff b is not
            # reached (mirrors testdata.q_site_bridges)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
            "      FROM ie WHERE src <> dst), "
            "adj AS (SELECT a AS x, b AS y FROM u UNION ALL SELECT b, a FROM u), "
            "reach AS ( "
            "  SELECT a AS ea, b AS eb, a AS id FROM u "
            "  UNION "
            "  SELECT r.ea, r.eb, ad.y FROM reach r JOIN adj ad ON ad.x = r.id "
            "  WHERE NOT (least(ad.x, ad.y) = r.ea AND greatest(ad.x, ad.y) = r.eb)) "
            "SELECT a AS src, b AS dst FROM u "
            "WHERE NOT EXISTS (SELECT 1 FROM reach r "
            "                  WHERE r.ea = u.a AND r.eb = u.b AND r.id = u.b)"
        ),
        "linkgraph_compress": (
            # Elias-gamma gap-encoded adjacency size per host: labels =
            # URL rank within host, first gap zigzag vs own label + 1,
            # later gaps strict diffs; gamma(c) = 2*floor(log2 c)+1 =
            # 2*(length(bin(c))-1)+1 (mirrors testdata.q_linkgraph_compress)
            f"WITH {_pages_edges_cte()}, "
            "ie AS (SELECT src, dst FROM e "
            "       WHERE split_part(src, '/', 3) = split_part(dst, '/', 3)), "
            "v AS (SELECT DISTINCT split_part(u, '/', 3) AS host, u FROM "
            "      (SELECT src AS u FROM ie UNION ALL SELECT dst FROM ie)), "
            "lab AS (SELECT host, u, "
            "        row_number() OVER (PARTITION BY host ORDER BY u) - 1 AS lbl FROM v), "
            "np AS (SELECT host, count(*) AS n_pages FROM lab GROUP BY host), "
            "el AS (SELECT split_part(src, '/', 3) AS host, ls.lbl AS sl, ld.lbl AS dl "
            "       FROM ie JOIN lab ls ON ls.u = src JOIN lab ld ON ld.u = dst), "
            "gp AS (SELECT host, sl, dl, lag(dl) OVER "
            "         (PARTITION BY host, sl ORDER BY dl) AS pv FROM el), "
            "cd AS (SELECT host, CASE WHEN pv IS NULL THEN "
            "         (CASE WHEN dl >= sl THEN 2 * (dl - sl) "
            "               ELSE -2 * (dl - sl) - 1 END) + 1 "
            "         ELSE dl - pv END AS c FROM gp), "
            "bi AS (SELECT host, count(*) AS n_edges, "
            "       sum(2 * (length(bin(c)) - 1) + 1) AS bits FROM cd GROUP BY host) "
            "SELECT b.host, np.n_pages::BIGINT AS n_pages, "
            "  b.n_edges::BIGINT AS n_edges, b.bits::BIGINT AS bits, "
            "  ((1000000 * b.bits) // b.n_edges)::BIGINT AS bpe_e6 "
            "FROM bi b JOIN np USING (host)"
        ),
        "page_outlink_profile": (
            # pre-dedup resolved-href multiset straight from the
            # generator CTE chain (res = per-(page,k) href after
            # relative/duplicate resolution, fragments never added) —
            # mirrors testdata.q_page_outlink_profile over extract_links
            f"WITH {_pages_edges_cte()}, "
            f"r AS (SELECT {_PAGE_URL('i')} AS url, href FROM res), "
            "p AS (SELECT url, count(*) AS n_hrefs, "
            "  count(DISTINCT href) AS n_distinct, "
            "  count(DISTINCT split_part(href, '/', 3)) AS n_hosts, "
            "  count(*) FILTER (href = url) AS n_self, "
            "  count(*) FILTER (split_part(href, '/', 3) <> split_part(url, '/', 3)) AS n_offsite "
            "  FROM r GROUP BY url) "
            "SELECT url, n_hrefs::BIGINT AS n_hrefs, "
            "  n_distinct::BIGINT AS n_distinct, "
            "  (n_hrefs - n_distinct)::BIGINT AS n_dup, "
            "  n_self::BIGINT AS n_self, n_offsite::BIGINT AS n_offsite, "
            "  (n_hrefs - n_self - n_offsite)::BIGINT AS n_intra, "
            "  n_hosts::BIGINT AS n_hosts FROM p"
        ),
        "url_canonicalize": (
            # raw (pre-normalization) href surface rebuilt from the
            # generator recurrence: braw keeps the RELATIVE form and
            # NULL-at-duplicate (last_value window = Python's
            # prev_target copy, which copies the pre-fragment href),
            # fragment appended per hk % 19, canonical = resolve + defrag
            # (mirrors testdata.q_url_canonicalize over extract_hrefs_raw)
            f"WITH {_pages_edges_cte()}, "
            "rb AS (SELECT i, k, hk, "
            f"  CASE WHEN hk % 13 = 0 THEN {_PAGE_URL('i')} "
            "       WHEN hk % 11 = 5 THEN printf('https://offsite-%04d.example/x', (hk % 997)::BIGINT) "
            "       WHEN hk % 7 = 3 AND tgt // 16 = i // 16 THEN printf('/p/%04d', tgt % 16) "
            "       WHEN hk % 5 = 2 AND k > 0 THEN NULL "
            f"       ELSE {_PAGE_URL('tgt % 2000')} END AS braw "
            "  FROM tc), "
            "rr AS (SELECT i, hk, last_value(braw IGNORE NULLS) OVER "
            "       (PARTITION BY i ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rb0 FROM rb), "
            "rc AS (SELECT printf('site-%05d.example', (i::BIGINT) // 16) AS host, "
            "       rb0 || (CASE WHEN hk % 19 = 0 THEN '#sec1' ELSE '' END) AS raw, "
            "       CASE WHEN rb0 LIKE '/%' THEN printf('https://site-%05d.example', (i::BIGINT) // 16) || rb0 "
            "            ELSE rb0 END AS canon, "
            "       CASE WHEN hk % 19 = 0 THEN 1 ELSE 0 END AS isf, "
            "       CASE WHEN rb0 LIKE '/%' THEN 1 ELSE 0 END AS isr FROM rr) "
            "SELECT host, count(*)::BIGINT AS n_hrefs, "
            "  count(DISTINCT raw)::BIGINT AS n_raw, "
            "  count(DISTINCT canon)::BIGINT AS n_canon, "
            "  sum(isf)::BIGINT AS n_frag, sum(isr)::BIGINT AS n_rel "
            "FROM rc GROUP BY host"
        ),
        "cascade_ic": (
            # live-edge reduction of independent cascade: per-direction
            # splitmix64 coin (mix64(1234, u, v) % 100 < 10), then the
            # Bellman-Ford-style iteration-indexed BFS recursion with
            # self-loop relax from the 3 seeds (mirrors
            # testdata.q_cascade_ic; 40 rounds >= fixpoint depth)
            f"WITH RECURSIVE {_EB_LINEITEM}, {_ES}, "
            "lv AS (SELECT src, dst FROM ( "
            f"  SELECT src, dst, xor({(1234 * _FNV64) % _M64}::UBIGINT, src::UBIGINT) AS a1, "
            f"  xor(((a1::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT, dst::UBIGINT) AS a2, "
            f"  {_splitmix_cols('a2', 'hc')} FROM es) WHERE hc % 100 < 10), "
            "sd AS (SELECT * FROM (VALUES (0), (1), (2)) t(id)), "
            "vv AS (SELECT DISTINCT id FROM (SELECT src AS id FROM lv "
            "       UNION ALL SELECT dst FROM lv UNION ALL SELECT id FROM sd)), "
            "relax AS (SELECT src, dst, 1 AS w FROM lv "
            "          UNION ALL SELECT id, id, 0 FROM vv), "
            "bf AS ( "
            "  SELECT 0 AS it, id, 0 AS dist FROM sd "
            "  UNION ALL "
            "  SELECT p.it + 1, r.dst, MIN(p.dist + r.w) FROM bf p "
            "  JOIN relax r ON r.src = p.id WHERE p.it < 40 "
            "  GROUP BY p.it, r.dst) "
            "SELECT id::BIGINT AS vertex, dist::BIGINT AS round "
            "FROM bf WHERE it = 40"
        ),
        "host_hopplot": (
            # all-source Bellman-Ford on the contracted host graph
            # (self-loop relax, iteration-indexed, capped at the same
            # 20 rounds the engine sweeps) — mirrors testdata.q_host_hopplot
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "hs AS (SELECT DISTINCT sh AS h FROM he), "
            "vs AS (SELECT DISTINCT h FROM (SELECT sh AS h FROM he "
            "       UNION ALL SELECT dh FROM he)), "
            "relax AS (SELECT sh, dh, 1 AS w FROM he "
            "          UNION ALL SELECT h, h, 0 FROM vs), "
            "bf AS ( "
            "  SELECT 0 AS it, h AS s, h AS v, 0 AS dist FROM hs "
            "  UNION ALL "
            "  SELECT p.it + 1, p.s, r.dh, MIN(p.dist + r.w) FROM bf p "
            "  JOIN relax r ON r.sh = p.v WHERE p.it < 20 "
            "  GROUP BY p.it, p.s, r.dh) "
            "SELECT dist::BIGINT AS dist, count(*)::BIGINT AS n_pairs "
            "FROM bf WHERE it = 20 AND dist > 0 GROUP BY dist"
        ),
        "host_harmonic": (
            # per-source harmonic centrality over the same contracted
            # host graph / capped Bellman-Ford as host_hopplot; the
            # 1/dist terms are integer half-up e6 PER TERM on both
            # sides, so the sum is exact (testdata.q_host_harmonic)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "vs AS (SELECT DISTINCT h FROM (SELECT sh AS h FROM he "
            "       UNION ALL SELECT dh FROM he)), "
            "relax AS (SELECT sh, dh, 1 AS w FROM he "
            "          UNION ALL SELECT h, h, 0 FROM vs), "
            "bf AS ( "
            "  SELECT 0 AS it, h AS s, h AS v, 0 AS dist FROM vs "
            "  UNION ALL "
            "  SELECT p.it + 1, p.s, r.dh, MIN(p.dist + r.w) FROM bf p "
            "  JOIN relax r ON r.sh = p.v WHERE p.it < 20 "
            "  GROUP BY p.it, p.s, r.dh), "
            "agg AS (SELECT s, "
            "  SUM((2 * 1000000 + dist) // (2 * dist))::BIGINT AS harmonic_e6, "
            "  count(*)::BIGINT AS n_reached "
            "  FROM bf WHERE it = 20 AND dist > 0 GROUP BY s) "
            "SELECT v.h AS host, COALESCE(a.harmonic_e6, 0)::BIGINT AS harmonic_e6, "
            "COALESCE(a.n_reached, 0)::BIGINT AS n_reached "
            "FROM vs v LEFT JOIN agg a ON a.s = v.h"
        ),
        "host_closed_walks": (
            # trace(A^k), k = 2..4, as k-fold self-joins of the
            # distinct host-edge table closed back to the start
            # (testdata.q_host_closed_walks)
            f"WITH {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "w2 AS (SELECT count(*)::BIGINT AS c FROM he a "
            "       JOIN he b ON b.sh = a.dh AND b.dh = a.sh), "
            "w3 AS (SELECT count(*)::BIGINT AS c FROM he a "
            "       JOIN he b ON b.sh = a.dh "
            "       JOIN he c ON c.sh = b.dh AND c.dh = a.sh), "
            "w4 AS (SELECT count(*)::BIGINT AS c FROM he a "
            "       JOIN he b ON b.sh = a.dh "
            "       JOIN he c ON c.sh = b.dh "
            "       JOIN he d ON d.sh = c.dh AND d.dh = a.sh) "
            "SELECT * FROM ( "
            "  SELECT 2::BIGINT AS k, c AS n_walks FROM w2 "
            "  UNION ALL SELECT 3::BIGINT, c FROM w3 "
            "  UNION ALL SELECT 4::BIGINT, c FROM w4)"
        ),
        "lang_kmv": (
            # KMV bottom-64 sketch per lang over raw token TRIGRAMS
            # (space-joined, empties kept): kth smallest
            # splitmix64(fnv1a64(shingle)), estimate (k-1)*2^64 // h_k
            # in HUGEINT; exact distinct via the same (lang, shingle)
            # pairs (testdata.q_lang_kmv; langs with < 64 shingles
            # drop out)
            "WITH RECURSIVE "
            "lists AS (SELECT lang, string_split(text, ' ') AS l FROM documents), "
            "toks AS (SELECT lang, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS tok "
            "         FROM lists, LATERAL unnest(generate_series(1, "
            "         greatest(len(l) - 2, 0))) t(i)), "
            "tokp AS (SELECT DISTINCT lang, tok FROM toks), "
            f"{_FNV_TOK}, "
            f"mixed AS (SELECT tok, {_splitmix_cols('h', 'hs')} FROM tokh), "
            "ranked AS (SELECT p.lang, m.hs, "
            "  row_number() OVER (PARTITION BY p.lang ORDER BY m.hs) AS rn, "
            "  count(*) OVER (PARTITION BY p.lang) AS nd "
            "  FROM tokp p JOIN mixed m USING (tok)) "
            "SELECT lang, ((63::HUGEINT * 18446744073709551616::HUGEINT) "
            "  // hs::HUGEINT)::BIGINT AS kmv_est, nd::BIGINT AS n_exact "
            "FROM ranked WHERE rn = 64"
        ),
        "page_host_rank_corr": (
            # page PR recursion (flagship's) + weighted domain PR
            # recursion (domain_pagerank's) joined page -> host,
            # row_number ranks tie-broken on the page url, integer
            # Spearman via (2D - 6S) (testdata.q_page_host_rank_corr)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "es AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e), "
            "deg AS (SELECT src AS id, count(*) AS d FROM es GROUP BY src), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, d FROM deg "
            "  UNION ALL "
            "  SELECT p.it + 1, ee.dst, 0.15/nn.n + 0.85 * SUM(p.val / p.d), dd.d "
            "  FROM pr p CROSS JOIN nn JOIN es ee ON ee.src = p.id "
            "       JOIN deg dd ON dd.id = ee.dst "
            "  WHERE p.it < 30 GROUP BY p.it, ee.dst, dd.d, nn.n), "
            "psc AS (SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS ps "
            "  FROM pr WHERE it = 30), "
            "de AS (SELECT split_part(src, '/', 3) AS s, split_part(dst, '/', 3) AS d, "
            "       count(*)::BIGINT AS w FROM e GROUP BY 1, 2), "
            "esw AS (SELECT s AS src, d AS dst, w FROM de "
            "  UNION ALL SELECT d, s, w FROM de), "
            "dg2 AS (SELECT src AS id, sum(w) AS wd FROM esw GROUP BY src), "
            "nn2 AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM dg2), "
            "prd AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val, wd FROM dg2 "
            "  UNION ALL "
            "  SELECT p.it + 1, e2.dst, 0.15/nn2.n + 0.85 * SUM(p.val * e2.w / p.wd), "
            "         dd.wd "
            "  FROM prd p CROSS JOIN nn2 JOIN esw e2 ON e2.src = p.id "
            "       JOIN dg2 dd ON dd.id = e2.dst "
            "  WHERE p.it < 30 GROUP BY p.it, e2.dst, dd.wd, nn2.n), "
            "dsc AS (SELECT id AS host, CAST(ROUND(val * 1e8) AS BIGINT) AS hs "
            "  FROM prd WHERE it = 30), "
            "j AS (SELECT p.vertex, p.ps, d2.hs FROM psc p "
            "  JOIN dsc d2 ON d2.host = split_part(p.vertex, '/', 3)), "
            "rk AS (SELECT vertex, "
            "  row_number() OVER (ORDER BY ps DESC, vertex) AS r1, "
            "  row_number() OVER (ORDER BY hs DESC, vertex) AS r2 FROM j), "
            "st AS (SELECT count(*)::BIGINT AS n, "
            "  SUM((r1 - r2) * (r1 - r2))::BIGINT AS s FROM rk) "
            "SELECT n, s AS sum_d2, "
            "((2 * (2 * n * (n*n - 1) - 6 * s) * 1000000 + n * (n*n - 1)) "
            " // (2 * n * (n*n - 1)) - 1000000)::BIGINT AS rho_e6 FROM st"
        ),
        "orders_yoy": (
            # YoY self-join on (year-1, month); -1 when no prior year
            # (testdata.q_orders_yoy)
            "WITH s AS (SELECT EXTRACT(year FROM o_orderdate)::BIGINT AS y, "
            "  EXTRACT(month FROM o_orderdate)::BIGINT AS m, "
            "  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_cents "
            "  FROM orders GROUP BY 1, 2) "
            "SELECT s.y, s.m, s.rev_cents, "
            "COALESCE((2 * s.rev_cents * 1000000 + p.rev_cents) "
            "  // (2 * p.rev_cents), -1)::BIGINT AS yoy_e6 "
            "FROM s LEFT JOIN s p ON p.y = s.y - 1 AND p.m = s.m"
        ),
        "host_sim_topk": (
            # per-host argmax of exact out-neighbor Jaccard over
            # candidate pairs (ties j DESC, partner ASC)
            # (testdata.q_host_sim_topk)
            f"WITH {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "sizes AS (SELECT sh, count(*) AS n FROM he GROUP BY sh), "
            "inter AS (SELECT x.sh AS a, y.sh AS b, count(*) AS i "
            "  FROM he x JOIN he y ON x.dh = y.dh AND x.sh < y.sh GROUP BY 1, 2), "
            "pj AS (SELECT a, b, "
            "  (2*i*1000000 + (sa.n + sb.n - i)) // (2*(sa.n + sb.n - i)) AS j "
            "  FROM inter JOIN sizes sa ON sa.sh = a JOIN sizes sb ON sb.sh = b), "
            "sym AS (SELECT a AS host, b AS other, j FROM pj "
            "  UNION ALL SELECT b, a, j FROM pj) "
            "SELECT host, other AS best_match, j::BIGINT AS jaccard_e6 FROM sym "
            "QUALIFY row_number() OVER (PARTITION BY host ORDER BY j DESC, other) = 1"
        ),
        "customer_rfm": (
            # per-nation NTILE(4) over (recency, frequency, monetary);
            # R ordered ASC, F/M DESC, ties on custkey
            # (testdata.q_customer_rfm)
            "WITH mx AS (SELECT max(o_orderdate) AS m FROM orders), "
            "agg AS (SELECT o_custkey, count(*)::BIGINT AS freq, "
            "  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS monet_cents, "
            "  ((epoch_us((SELECT m FROM mx)) - epoch_us(max(o_orderdate))) "
            "   // 86400000000)::BIGINT AS r_days "
            "  FROM orders GROUP BY 1), "
            "j AS (SELECT a.o_custkey, a.r_days, a.freq, a.monet_cents, "
            "  n.n_name AS nation FROM agg a "
            "  JOIN customer c ON c.c_custkey = a.o_custkey "
            "  JOIN nation n ON n.n_nationkey = c.c_nationkey) "
            "SELECT o_custkey AS c_custkey, nation, r_days, freq, monet_cents, "
            "(NTILE(4) OVER (PARTITION BY nation ORDER BY r_days, o_custkey) * 100 "
            " + NTILE(4) OVER (PARTITION BY nation ORDER BY freq DESC, o_custkey) * 10 "
            " + NTILE(4) OVER (PARTITION BY nation ORDER BY monet_cents DESC, o_custkey)"
            ")::BIGINT AS rfm_code FROM j"
        ),
        "shingle_df_curve": (
            # df histogram over trigram STRINGS (engine groups by
            # 64-bit shingle hash) (testdata.q_shingle_df_curve)
            "WITH lists AS (SELECT doc_id, "
            r"  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l "
            "  FROM documents), "
            "tri0 AS (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g "
            "  FROM lists, LATERAL unnest(generate_series(1, "
            "  greatest(len(l) - 2, 0))) t(i)), "
            "tri AS (SELECT DISTINCT doc_id, g FROM tri0), "
            "dfs AS (SELECT g, count(*)::BIGINT AS df FROM tri GROUP BY g) "
            "SELECT df, count(*)::BIGINT AS n_shingles FROM dfs GROUP BY df"
        ),
        "events_state_violations": (
            # first purchase strictly before first signup, both firsts
            # by (ts, event_id) (testdata.q_events_state_violations)
            "WITH p AS (SELECT user_id, event_id, ts FROM events "
            "  WHERE event_type = 'purchase' "
            "  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1), "
            "s AS (SELECT user_id, event_id, ts FROM events "
            "  WHERE event_type = 'signup' "
            "  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1) "
            "SELECT p.user_id, p.event_id AS first_purchase_id, "
            "COALESCE(s.event_id, -1)::BIGINT AS first_signup_id "
            "FROM p LEFT JOIN s USING (user_id) "
            "WHERE s.user_id IS NULL OR p.ts < s.ts "
            "   OR (p.ts = s.ts AND p.event_id < s.event_id)"
        ),
        "host_spectral_radius": (
            # trace(A^4)/trace(A^5) via aggregated matrix-product
            # CTEs (m2 = A^2 as a sparse count table)
            # (testdata.q_host_spectral_radius)
            f"WITH {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "m2 AS (SELECT a.sh AS s, b.dh AS d, count(*)::BIGINT AS c "
            "  FROM he a JOIN he b ON b.sh = a.dh GROUP BY 1, 2), "
            "m4 AS (SELECT x.s, y.d, SUM(x.c * y.c)::BIGINT AS c "
            "  FROM m2 x JOIN m2 y ON y.s = x.d GROUP BY 1, 2), "
            "w4 AS (SELECT SUM(c)::BIGINT AS c FROM m4 WHERE s = d), "
            "w5 AS (SELECT SUM(m4.c)::BIGINT AS c FROM m4 "
            "  JOIN he e5 ON e5.sh = m4.d AND e5.dh = m4.s) "
            "SELECT w4.c AS w4, w5.c AS w5, "
            "((2 * w5.c * 1000000 + w4.c) // (2 * w4.c))::BIGINT AS radius_e6 "
            "FROM w4, w5"
        ),
        "host_resource_allocation": (
            # RA index: per common out-neighbor z, term half-up
            # 1e6/indeg(z); top-50 by (ra DESC, a, b)
            # (testdata.q_host_resource_allocation)
            f"WITH {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "ind AS (SELECT dh, count(*)::BIGINT AS d FROM he GROUP BY dh), "
            "tm AS (SELECT x.sh AS a, y.sh AS b, "
            "  SUM((2 * 1000000 + i.d) // (2 * i.d))::BIGINT AS ra_e6, "
            "  count(*)::BIGINT AS n_common "
            "  FROM he x JOIN he y ON x.dh = y.dh AND x.sh < y.sh "
            "  JOIN ind i ON i.dh = x.dh GROUP BY 1, 2) "
            "SELECT a, b, ra_e6, n_common FROM tm "
            "QUALIFY row_number() OVER (ORDER BY ra_e6 DESC, a, b) <= 50"
        ),
        "user_concentration": (
            # top-ceil(10%) users' share of all events
            # (testdata.q_user_concentration)
            "WITH cnt AS (SELECT user_id, count(*)::BIGINT AS c "
            "  FROM events GROUP BY 1), "
            "tot AS (SELECT count(*)::BIGINT AS n_users, "
            "  SUM(c)::BIGINT AS n_events FROM cnt), "
            "rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, user_id) AS rn "
            "  FROM cnt), "
            "tv AS (SELECT SUM(c)::BIGINT AS top_events FROM rk, tot "
            "  WHERE rn <= (n_users * 10 + 99) // 100) "
            "SELECT t.n_users, ((t.n_users * 10 + 99) // 100)::BIGINT AS n_top, "
            "t.n_events, tv.top_events, "
            "((2 * tv.top_events * 1000000 + t.n_events) "
            " // (2 * t.n_events))::BIGINT AS share_e6 "
            "FROM tot t CROSS JOIN tv"
        ),
        "nation_top_customers": (
            # grouped top-k after join: per nation top-3 customers by
            # order revenue (ties custkey)
            # (testdata.q_nation_top_customers)
            "WITH rev AS (SELECT o_custkey AS c, "
            "  SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS rev_cents "
            "  FROM orders GROUP BY 1), "
            "j AS (SELECT n.n_name AS nation, rev.c, rev.rev_cents FROM rev "
            "  JOIN customer cu ON cu.c_custkey = rev.c "
            "  JOIN nation n ON n.n_nationkey = cu.c_nationkey) "
            "SELECT nation, "
            "row_number() OVER (PARTITION BY nation "
            "  ORDER BY rev_cents DESC, c)::BIGINT AS rk, "
            "c AS c_custkey, rev_cents FROM j "
            "QUALIFY rk <= 3"
        ),
        "events_user_lifespan": (
            # (testdata.q_events_user_lifespan)
            "WITH mm AS (SELECT user_id, "
            "  ((max(epoch_us(ts)) - min(epoch_us(ts))) // 86400000000)::BIGINT "
            "  AS span_days FROM events GROUP BY 1) "
            "SELECT span_days, count(*)::BIGINT AS n_users FROM mm GROUP BY 1"
        ),
        "ab_test_lift": (
            # arm = user_id parity; conversion = any purchase; lift =
            # rate_b / rate_a half-up e6 on both rows
            # (testdata.q_ab_test_lift)
            "WITH conv AS (SELECT user_id, (user_id % 2)::BIGINT AS arm, "
            "  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p "
            "  FROM events GROUP BY 1), "
            "s AS (SELECT arm, count(*)::BIGINT AS n_users, "
            "  SUM(p)::BIGINT AS n_converted FROM conv GROUP BY 1), "
            "r AS (SELECT arm, n_users, n_converted, "
            "  ((2 * n_converted * 1000000 + n_users) // (2 * n_users))::BIGINT "
            "  AS rate_e6 FROM s), "
            "l AS (SELECT (2 * (SELECT rate_e6 FROM r WHERE arm = 1) * 1000000 "
            "  + (SELECT rate_e6 FROM r WHERE arm = 0)) "
            "  // (2 * (SELECT rate_e6 FROM r WHERE arm = 0)) AS lift) "
            "SELECT r.arm, r.n_users, r.n_converted, r.rate_e6, "
            "l.lift::BIGINT AS lift_e6 FROM r CROSS JOIN l"
        ),
        "events_weekday_profile": (
            # ISO weekday from epoch day (+3: 1970-01-01 = Thursday)
            # (testdata.q_events_weekday_profile)
            "WITH s AS (SELECT ((epoch_us(ts) // 86400000000 + 3) % 7)::BIGINT "
            "  AS weekday, event_type, count(*)::BIGINT AS n "
            "  FROM events GROUP BY 1, 2) "
            "SELECT weekday, event_type, n, "
            "((2 * n * 1000000 + t) // (2 * t))::BIGINT AS share_e6 "
            "FROM (SELECT *, SUM(n) OVER (PARTITION BY weekday) AS t FROM s)"
        ),
        "supplier_ship_lag": (
            # lower-median ship lag via row_number over the bounded
            # lag domain; late share half-up e6
            # (testdata.q_supplier_ship_lag)
            "WITH lg AS (SELECT l_suppkey AS s, "
            "  ((epoch_us(l_shipdate) - epoch_us(o_orderdate)) "
            "   // 86400000000)::BIGINT AS lag "
            "  FROM lineitem JOIN orders ON o_orderkey = l_orderkey), "
            "st AS (SELECT s, count(*)::BIGINT AS n_lines, "
            "  SUM(CASE WHEN lag > 60 THEN 1 ELSE 0 END)::BIGINT AS late "
            "  FROM lg GROUP BY s), "
            "md AS (SELECT s, lag FROM ( "
            "  SELECT s, lag, row_number() OVER (PARTITION BY s ORDER BY lag) AS rn, "
            "  count(*) OVER (PARTITION BY s) AS n FROM lg) "
            "  WHERE rn = (n + 1) // 2) "
            "SELECT st.s AS s_suppkey, st.n_lines, md.lag AS median_lag_days, "
            "((2 * late * 1000000 + n_lines) // (2 * n_lines))::BIGINT "
            "AS late_share_e6 "
            "FROM st JOIN md USING (s)"
        ),
        "embedding_drift": (
            # cohort = vec_id parity; drift_num = sum_d of
            # (sa_d*nb - sb_d*na)^2 over e3-floor-quantized sums
            # (testdata.q_embedding_drift)
            "WITH vexp AS (SELECT vec_id, label, d AS dim, "
            "  CAST(FLOOR(CAST(embedding[d+1] AS DOUBLE) * 1000) AS BIGINT) AS q "
            "  FROM embeddings, LATERAL unnest(generate_series(0, 63)) t(d)), "
            "cnt AS (SELECT label::BIGINT AS label, (vec_id % 2)::BIGINT AS coh, "
            "  count(*)::BIGINT AS n FROM embeddings GROUP BY 1, 2), "
            "cs AS (SELECT label::BIGINT AS label, (vec_id % 2)::BIGINT AS coh, "
            "  dim, SUM(q)::BIGINT AS sq FROM vexp GROUP BY 1, 2, 3) "
            "SELECT a.label, ca.n AS n_even, cb.n AS n_odd, "
            "SUM((a.sq * cb.n - b.sq * ca.n) * (a.sq * cb.n - b.sq * ca.n))::BIGINT "
            "AS drift_num "
            "FROM cs a JOIN cs b ON b.label = a.label AND b.dim = a.dim "
            "  AND a.coh = 0 AND b.coh = 1 "
            "JOIN cnt ca ON ca.label = a.label AND ca.coh = 0 "
            "JOIN cnt cb ON cb.label = a.label AND cb.coh = 1 "
            "GROUP BY 1, 2, 3"
        ),
        "events_error_trend": (
            # (testdata.q_events_error_trend)
            "WITH s AS (SELECT (epoch_us(ts) // 86400000000)::BIGINT AS win, "
            "  count(*)::BIGINT AS n_events, "
            "  count(*) FILTER (event_type = 'error')::BIGINT AS n_errors "
            "  FROM events GROUP BY 1) "
            "SELECT win, n_events, n_errors, "
            "((2 * n_errors * 1000000 + n_events) // (2 * n_events))::BIGINT "
            "AS err_share_e6 FROM s"
        ),
        "market_hhi": (
            # per-nation Herfindahl over supplier revenue shares,
            # each squared share half-up e6 in HUGEINT before the sum
            # (testdata.q_market_hhi)
            "WITH rev AS (SELECT l_suppkey AS s, "
            "  SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))::BIGINT AS r "
            "  FROM lineitem GROUP BY 1), "
            "j AS (SELECT n.n_name AS nation, rev.r FROM rev "
            "  JOIN supplier su ON su.s_suppkey = rev.s "
            "  JOIN nation n ON n.n_nationkey = su.s_nationkey), "
            "tot AS (SELECT nation, count(*)::BIGINT AS n_suppliers, "
            "  SUM(r)::BIGINT AS rev_cents FROM j GROUP BY 1) "
            "SELECT t.nation, t.n_suppliers, t.rev_cents, "
            "SUM((2000000::HUGEINT * j.r::HUGEINT * j.r::HUGEINT "
            "  + t.rev_cents::HUGEINT * t.rev_cents::HUGEINT) "
            "  // (2::HUGEINT * t.rev_cents::HUGEINT * t.rev_cents::HUGEINT)"
            ")::BIGINT AS hhi_e6 "
            "FROM j JOIN tot t USING (nation) "
            "GROUP BY t.nation, t.n_suppliers, t.rev_cents"
        ),
        "langid_calibration": (
            # fixed-width confidence deciles over the doc_langid
            # oracle, accuracy half-up e6
            # (testdata.q_langid_calibration)
            f"WITH p AS (SELECT * FROM ({_langid_sql()})), "
            "b AS (SELECT least(p.conf_e6 // 100000, 9)::BIGINT AS decile, "
            "  count(*)::BIGINT AS n_docs, "
            "  count(*) FILTER (WHERE p.lang_pred = d2.lang)::BIGINT AS n_correct "
            "  FROM p JOIN documents d2 USING (doc_id) GROUP BY 1) "
            "SELECT decile, n_docs, n_correct, "
            "((2 * n_correct * 1000000 + n_docs) // (2 * n_docs))::BIGINT AS acc_e6 "
            "FROM b"
        ),
        "quality_deciles": (
            # fixed-width score deciles over the doc_quality oracle
            # (testdata.q_quality_deciles)
            f"WITH p AS (SELECT * FROM ({_quality_sql()})), "
            "b AS (SELECT least(p.quality_e6 // 100000, 9)::BIGINT AS decile, "
            "  count(*)::BIGINT AS n_docs, "
            "  SUM(d2.n_chars)::BIGINT AS sum_chars "
            "  FROM p JOIN documents d2 USING (doc_id) GROUP BY 1) "
            "SELECT decile, n_docs, sum_chars, "
            "((2 * sum_chars * 100 + n_docs) // (2 * n_docs))::BIGINT AS avg_chars_e2 "
            "FROM b"
        ),
        "lang_confusion": (
            # the doc_langid oracle re-grouped against the true label
            # (testdata.q_lang_confusion)
            "SELECT d2.lang AS true_lang, p.lang_pred AS pred_lang, "
            "count(*)::BIGINT AS n_docs "
            f"FROM ({_langid_sql()}) p JOIN documents d2 USING (doc_id) "
            "GROUP BY 1, 2"
        ),
        "events_dedup_replay": (
            # planted retries (mix64(99, eid) % 10 == 0; mix64 ends
            # in one splitmix64), arrival keys ak1 = splitmix64(eid),
            # ak2 = mix64(98, eid); keep-first = min arrival
            # key; survivor_sum pins which copy won
            # (testdata.q_events_dedup_replay)
            "WITH base AS (SELECT event_type, event_id::UBIGINT AS eid, "
            f"  {_splitmix_cols('event_id::UBIGINT', 'ak1')}, "
            f"  xor({(99 * _FNV64) % _M64}::UBIGINT, event_id::UBIGINT) AS a99, "
            f"  {_splitmix_cols('a99', 'h99')}, "
            f"  xor({(98 * _FNV64) % _M64}::UBIGINT, event_id::UBIGINT) AS a98, "
            f"  {_splitmix_cols('a98', 'h98')} "
            "  FROM events), "
            "sv AS (SELECT event_type, "
            "  CASE WHEN h99 % 10 = 0 THEN 2 ELSE 1 END AS ndel, "
            "  CASE WHEN h99 % 10 = 0 THEN least(ak1, h98) ELSE ak1 END AS mak "
            "  FROM base), "
            "g AS (SELECT event_type, SUM(ndel)::BIGINT AS n_deliveries, "
            "  count(*)::BIGINT AS n_unique, "
            "  SUM((mak >> 32)::BIGINT)::BIGINT AS survivor_sum "
            "  FROM sv GROUP BY 1) "
            "SELECT event_type, n_deliveries, n_unique, survivor_sum, "
            "((2 * (n_deliveries - n_unique) * 1000000 + n_deliveries) "
            " // (2 * n_deliveries))::BIGINT AS dup_e6 FROM g"
        ),
        "term_position_stats": (
            # 1-based first-occurrence positions via list_position
            # (testdata.q_term_position_stats)
            r"WITH lists AS (SELECT regexp_split_to_array(trim(text), '\s+') AS l "
            "  FROM documents WHERE trim(text) <> ''), "
            "t AS (SELECT * FROM (VALUES ('hash'), ('join'), ('vector')) tt(term)), "
            "hits AS (SELECT t.term, list_position(l, t.term) AS p "
            "  FROM lists CROSS JOIN t WHERE list_position(l, t.term) > 0), "
            "g AS (SELECT term, count(*)::BIGINT AS n_docs, "
            "  SUM(p)::BIGINT AS sum_pos FROM hits GROUP BY term) "
            "SELECT term, n_docs, sum_pos, "
            "((2 * sum_pos * 1000000 + n_docs) // (2 * n_docs))::BIGINT AS avg_pos_e6 "
            "FROM g"
        ),
        "host_edge_betweenness": (
            # sampled Girvan-Newman: per edge (u, w) and sampled s,
            # sum over t of per-term half-up e6 of
            # sigma_su * sigma_wt / sigma_st with
            # dist(s,u) + 1 + dist(w,t) = dist(s,t); sinks contribute
            # self targets via svx (testdata.q_host_edge_betweenness)
            f"WITH RECURSIVE {_host_ebt_ctes()} "
            "SELECT e4.sh AS src_host, e4.dh AS dst_host, "
            "COALESCE(a.bc_e6, 0)::BIGINT AS bc_e6 "
            "FROM he e4 LEFT JOIN agg a ON a.u = e4.sh AND a.w = e4.dh"
        ),
        "gn_communities": (
            # one GN step: cut the 20 highest-bc edges (ties bc DESC,
            # src, dst), then 20 fixed rounds of undirected min-label
            # propagation. The recursive term re-evaluates every CTE
            # it references each round, so it touches ONLY the cheap
            # generator chain (he/vs, ~0.1 s) — the expensive
            # betweenness chain runs once in the ANCHOR, serialized
            # into a carried `cut` string (testdata.q_gn_communities)
            f"WITH RECURSIVE {_host_ebt_ctes()}, "
            "ebt AS (SELECT e4.sh, e4.dh, COALESCE(a.bc_e6, 0) AS bc "
            "  FROM he e4 LEFT JOIN agg a ON a.u = e4.sh AND a.w = e4.dh), "
            "dropd AS (SELECT sh, dh FROM ebt "
            "  QUALIFY row_number() OVER (ORDER BY bc DESC, sh, dh) <= 20), "
            "lp AS ( "
            "  SELECT 0 AS it, h AS v, h AS lab, "
            "    (SELECT string_agg(';' || sh || '|' || dh || ';', '') "
            "     FROM dropd) AS cut "
            "  FROM vs "
            "  UNION ALL "
            "  SELECT p.it + 1, r2.b, MIN(p.lab), MAX(p.cut) "
            "  FROM lp p JOIN ( "
            "    SELECT sh AS a, dh AS b, sh || '|' || dh AS k FROM he "
            "    UNION ALL SELECT dh, sh, sh || '|' || dh FROM he "
            "    UNION ALL SELECT h, h, '' FROM vs) r2 ON r2.a = p.v "
            "  WHERE p.it < 20 "
            "    AND (r2.k = '' OR strpos(p.cut, ';' || r2.k || ';') = 0) "
            "  GROUP BY p.it, r2.b) "
            "SELECT v AS host, lab AS community FROM lp WHERE it = 20"
        ),
        "host_ppr_sweepcut": (
            # push-PR ranking (identical recursion to
            # host_pagerank_push) -> prefix conductance curve via the
            # +1/-1 rank-event running sum
            # (testdata.q_host_ppr_sweepcut)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "vs AS (SELECT DISTINCT h FROM (SELECT sh AS h FROM he "
            "       UNION ALL SELECT dh FROM he)), "
            "deg AS (SELECT sh AS h, count(*)::BIGINT AS d FROM he GROUP BY sh), "
            "relax AS (SELECT sh, dh, 1 AS w FROM he "
            "          UNION ALL SELECT h, h, 0 FROM vs), "
            "sd AS (SELECT min(sh) AS h FROM he), "
            "st AS ( "
            "  SELECT 0 AS it, v.h AS v, "
            "    (CASE WHEN v.h = sd.h THEN 1000000000000 ELSE 0 END)::BIGINT AS r, "
            "    0::BIGINT AS p "
            "  FROM vs v CROSS JOIN sd "
            "  UNION ALL "
            "  SELECT s.it + 1, r2.dh, "
            "    COALESCE(SUM(CASE WHEN r2.w = 1 THEN "
            "      (85 * s.r) // (100 * dg.d) END), 0)::BIGINT, "
            "    SUM(CASE WHEN r2.w = 0 THEN s.p + (15 * s.r) // 100 END)::BIGINT "
            "  FROM st s JOIN relax r2 ON r2.sh = s.v "
            "  LEFT JOIN deg dg ON dg.h = s.v "
            "  WHERE s.it < 12 GROUP BY s.it, r2.dh), "
            "rk AS (SELECT v AS host, "
            "  row_number() OVER (ORDER BY p DESC, v) AS r "
            "  FROM st WHERE it = 12), "
            "und AS (SELECT DISTINCT least(sh, dh) AS a, "
            "  greatest(sh, dh) AS b FROM he), "
            "ud AS (SELECT h, count(*)::BIGINT AS d FROM "
            "  (SELECT a AS h FROM und UNION ALL SELECT b FROM und) "
            "  GROUP BY h), "
            "ev AS (SELECT least(ra.r, rb.r) AS lo, "
            "  greatest(ra.r, rb.r) AS hi FROM und "
            "  JOIN rk ra ON ra.host = und.a "
            "  JOIN rk rb ON rb.host = und.b), "
            "evagg AS (SELECT r, SUM(x)::BIGINT AS dx FROM "
            "  (SELECT lo AS r, 1 AS x FROM ev "
            "   UNION ALL SELECT hi, -1 FROM ev) GROUP BY r), "
            "grid AS (SELECT rk.r, rk.host, ud.d FROM rk "
            "  JOIN ud ON ud.h = rk.host), "
            "curve AS (SELECT g.r, g.host, "
            "  SUM(g.d) OVER (ORDER BY g.r)::BIGINT AS vol, "
            "  SUM(COALESCE(e.dx, 0)) OVER (ORDER BY g.r)::BIGINT AS cut "
            "  FROM grid g LEFT JOIN evagg e ON e.r = g.r), "
            "tot AS (SELECT SUM(d)::BIGINT AS te FROM ud) "
            "SELECT r, host, cut, vol, "
            "((2 * cut * 1000000 + least(vol, te - vol)) "
            " // (2 * least(vol, te - vol)))::BIGINT AS conductance_e6 "
            "FROM curve, tot "
            "WHERE least(vol, te - vol) > 0"
        ),
        "host_pagerank_push": (
            # synchronized integer forward push: self-loop rows carry
            # the banked p, edge rows carry floor shares; sinks send
            # nothing and drop their residual
            # (testdata.q_host_pagerank_push)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "vs AS (SELECT DISTINCT h FROM (SELECT sh AS h FROM he "
            "       UNION ALL SELECT dh FROM he)), "
            "deg AS (SELECT sh AS h, count(*)::BIGINT AS d FROM he GROUP BY sh), "
            "relax AS (SELECT sh, dh, 1 AS w FROM he "
            "          UNION ALL SELECT h, h, 0 FROM vs), "
            "sd AS (SELECT min(sh) AS h FROM he), "
            "st AS ( "
            "  SELECT 0 AS it, v.h AS v, "
            "    (CASE WHEN v.h = sd.h THEN 1000000000000 ELSE 0 END)::BIGINT AS r, "
            "    0::BIGINT AS p "
            "  FROM vs v CROSS JOIN sd "
            "  UNION ALL "
            "  SELECT s.it + 1, r2.dh, "
            "    COALESCE(SUM(CASE WHEN r2.w = 1 THEN "
            "      (85 * s.r) // (100 * dg.d) END), 0)::BIGINT, "
            "    SUM(CASE WHEN r2.w = 0 THEN s.p + (15 * s.r) // 100 END)::BIGINT "
            "  FROM st s JOIN relax r2 ON r2.sh = s.v "
            "  LEFT JOIN deg dg ON dg.h = s.v "
            "  WHERE s.it < 12 GROUP BY s.it, r2.dh) "
            "SELECT v AS host, p AS p_e12, r AS r_e12 FROM st WHERE it = 12"
        ),
        "host_betweenness": (
            # all-pairs dist + path counts via the single walk-count
            # recursion (_host_sv_ctes), then the pair-dependency sum
            # with PER-TERM half-up e6 (testdata.q_host_betweenness)
            f"WITH RECURSIVE {_host_sv_ctes()}, "
            "tm AS ( "
            "  SELECT d1.v AS v, "
            "    (2 * d1.sigma * d2.sigma * 1000000 + d3.sigma) "
            "    // (2 * d3.sigma) AS term "
            "  FROM sv d1 "
            "  JOIN sv d2 ON d2.s = d1.v "
            "  JOIN sv d3 ON d3.s = d1.s AND d3.v = d2.v "
            "  WHERE d1.dist > 0 AND d2.dist > 0 AND d3.dist > 0 "
            "    AND d1.dist + d2.dist = d3.dist), "
            "agg AS (SELECT v, SUM(term)::BIGINT AS bc_e6, "
            "        count(*)::BIGINT AS n_terms FROM tm GROUP BY v) "
            "SELECT h.h AS host, COALESCE(a.bc_e6, 0)::BIGINT AS bc_e6, "
            "COALESCE(a.n_terms, 0)::BIGINT AS n_terms "
            "FROM hs h LEFT JOIN agg a ON a.v = h.h"
        ),
        "posting_list_bytes": (
            # varint gap encoding: first gap = doc_id + 1, then sorted
            # deltas; bytes = (bitlength + 6) // 7 with bitlength =
            # length(bin(gap)) (testdata.q_posting_list_bytes)
            "WITH pairs AS (SELECT DISTINCT doc_id, "
            r"  unnest(regexp_split_to_array(trim(text), '\s+')) AS term "
            "  FROM documents WHERE trim(text) <> ''), "
            "g AS (SELECT term, doc_id, "
            "  COALESCE(doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), "
            "           doc_id + 1) AS gap FROM pairs) "
            "SELECT term, count(*)::BIGINT AS df, "
            "SUM((length(bin(gap::UBIGINT)) + 6) // 7)::BIGINT AS bytes "
            "FROM g GROUP BY term"
        ),
        "events_window_hll": (
            # per-epoch-day HLL register table; register max is
            # duplicate-insensitive so no DISTINCT on (win, user)
            # (testdata.q_events_window_hll)
            "WITH RECURSIVE "
            "toks AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS tok FROM events), "
            f"{_FNV_TOK}, "
            f"mixed AS (SELECT tok, {_splitmix_cols('h', 'hs')} FROM tokh), "
            "ev AS (SELECT (epoch_us(ts) // 86400000000)::BIGINT AS win, "
            "  CAST(user_id AS VARCHAR) AS tok FROM events), "
            "regs AS (SELECT ev.win, (hs >> 56)::BIGINT AS reg, "
            "  (CASE WHEN (hs & ((1::UBIGINT << 56) - 1)) = 0 THEN 57 "
            "   ELSE 56 - length(bin(hs & ((1::UBIGINT << 56) - 1))) + 1 "
            "   END)::BIGINT AS rho "
            "  FROM ev JOIN mixed USING (tok)) "
            "SELECT win, reg, max(rho)::BIGINT AS rho FROM regs GROUP BY 1, 2"
        ),
        "rank_spearman": (
            # directed-PR recurrence (pagerank_directed's oracle) +
            # in-degree; row_number ranks tie-broken on vertex id;
            # rho via the nonnegative (2D - 6S) form
            # (testdata.q_rank_spearman)
            "WITH RECURSIVE ebd AS (SELECT DISTINCT l_orderkey % 200 AS src, "
            "  l_partkey % 200 AS dst FROM lineitem "
            "  WHERE l_orderkey % 200 <> l_partkey % 200), "
            "deg AS (SELECT src AS id, count(*) AS d FROM ebd GROUP BY src), "
            "v AS (SELECT DISTINCT id FROM "
            "  (SELECT src AS id FROM ebd UNION ALL SELECT dst FROM ebd)), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, p.id, "
            "         0.15/nn.n + 0.85 * COALESCE(SUM(q.val / dd.d), 0.0) "
            "  FROM pr p CROSS JOIN nn "
            "  LEFT JOIN ebd e ON e.dst = p.id "
            "  LEFT JOIN pr q ON q.id = e.src AND q.it = p.it "
            "  LEFT JOIN deg dd ON dd.id = e.src "
            "  WHERE p.it < 30 GROUP BY p.it, p.id, nn.n), "
            "sc AS (SELECT id, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "  FROM pr WHERE it = 30), "
            "indeg AS (SELECT dst AS id, count(*)::BIGINT AS dg FROM ebd GROUP BY dst), "
            "rk AS (SELECT sc.id, "
            "  row_number() OVER (ORDER BY sc.score_e8 DESC, sc.id) AS r_pr, "
            "  row_number() OVER (ORDER BY COALESCE(indeg.dg, 0) DESC, sc.id) AS r_dg "
            "  FROM sc LEFT JOIN indeg USING (id)), "
            "st AS (SELECT count(*)::BIGINT AS n, "
            "  SUM((r_pr - r_dg) * (r_pr - r_dg))::BIGINT AS s FROM rk) "
            "SELECT n, s AS sum_d2, "
            "((2 * (2 * n * (n*n - 1) - 6 * s) * 1000000 + n * (n*n - 1)) "
            " // (2 * n * (n*n - 1)) - 1000000)::BIGINT AS rho_e6 FROM st"
        ),
        "host_neighbor_jaccard": (
            # exact + minhash-estimated out-neighbor Jaccard per
            # candidate host pair; slot value = splitmix64 of
            # (i * FNVprime) xor fnv1a64(neighbor), min per (host,
            # slot) (testdata.q_host_neighbor_jaccard)
            f"WITH RECURSIVE {_pages_edges_cte()}, "
            "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
            "       split_part(dst, '/', 3) AS dh FROM e "
            "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
            "sizes AS (SELECT sh, count(*) AS n FROM he GROUP BY sh), "
            "inter AS (SELECT x.sh AS a, y.sh AS b, count(*) AS i "
            "  FROM he x JOIN he y ON x.dh = y.dh AND x.sh < y.sh GROUP BY 1, 2), "
            "toks AS (SELECT DISTINCT dh AS tok FROM he), "
            f"{_FNV_TOK}, "
            "perm AS (SELECT t.i, tokh.tok, "
            f"  xor(((t.i::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT, tokh.h) AS a1, "
            f"  {_splitmix_cols('a1', 'pv')} "
            "  FROM tokh, range(0, 16) t(i)), "
            "sig AS (SELECT e.sh, p.i, min(p.pv) AS mn "
            "  FROM he e JOIN perm p ON p.tok = e.dh GROUP BY 1, 2), "
            "mm AS (SELECT ia.a, ia.b, ia.i, "
            "  count(*) FILTER (WHERE sx.mn = sy.mn) AS eq "
            "  FROM inter ia JOIN sig sx ON sx.sh = ia.a "
            "  JOIN sig sy ON sy.sh = ia.b AND sy.i = sx.i GROUP BY 1, 2, 3) "
            "SELECT m.a, m.b, "
            "  ((2*m.i*1000000 + (sa.n + sb.n - m.i)) "
            "   // (2*(sa.n + sb.n - m.i)))::BIGINT AS jaccard_e6, "
            "  ((2*eq*1000000 + 16) // 32)::BIGINT AS minhash_e6 "
            "FROM mm m JOIN sizes sa ON sa.sh = m.a JOIN sizes sb ON sb.sh = m.b"
        ),
        "doc_containment": (
            # exhaustive trigram containment join over STRINGS (the
            # engine groups by 64-bit shingle hash — identical groups
            # barring collisions); same df window [2, 128], half-up
            # e6 both directions, keep if either >= 0.9
            # (testdata.q_doc_containment)
            "WITH lists AS (SELECT doc_id, "
            r"  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l "
            "  FROM documents), "
            "tri0 AS (SELECT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS g "
            "  FROM lists, LATERAL unnest(generate_series(1, "
            "  greatest(len(l) - 2, 0))) t(i)), "
            "tri AS (SELECT DISTINCT doc_id, g FROM tri0), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id), "
            "dfs AS (SELECT g AS gg FROM tri GROUP BY g "
            "  HAVING count(*) BETWEEN 2 AND 128), "
            "inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i "
            "  FROM tri x JOIN tri y ON x.g = y.g AND x.doc_id < y.doc_id "
            "  JOIN dfs ON gg = x.g GROUP BY 1, 2) "
            "SELECT a, b, "
            "  ((2*i*1000000 + sa.n) // (2*sa.n))::BIGINT AS cont_ab_e6, "
            "  ((2*i*1000000 + sb.n) // (2*sb.n))::BIGINT AS cont_ba_e6 "
            "FROM inter JOIN sizes sa ON sa.doc_id = a "
            "JOIN sizes sb ON sb.doc_id = b "
            "WHERE greatest((2*i*1000000 + sa.n) // (2*sa.n), "
            "               (2*i*1000000 + sb.n) // (2*sb.n)) >= 900000"
        ),
        "graph_sparsify_pr": (
            # replay the mix64(777, src, dst) edge-priority sparsifier
            # (QUALIFY per-src bottom-8, ties on dst), then the
            # directed LEFT-JOIN PageRank recurrence over the
            # sparsified graph (testdata.q_graph_sparsify_pr)
            "WITH RECURSIVE ebd AS (SELECT DISTINCT l_orderkey % 200 AS src, "
            "  l_partkey % 200 AS dst FROM lineitem "
            "  WHERE l_orderkey % 200 <> l_partkey % 200), "
            "sp0 AS (SELECT src, dst, "
            f"  xor({(777 * _FNV64) % _M64}::UBIGINT, src::UBIGINT) AS a1, "
            f"  xor(((a1::HUGEINT * {_FNV64}) % {_M64}::HUGEINT)::UBIGINT, "
            "      dst::UBIGINT) AS a2, "
            f"  {_splitmix_cols('a2', 'h')} FROM ebd), "
            "spa AS (SELECT src, dst FROM sp0 "
            "  QUALIFY row_number() OVER (PARTITION BY src ORDER BY h, dst) <= 8), "
            "deg AS (SELECT src AS id, count(*) AS d FROM spa GROUP BY src), "
            "v AS (SELECT DISTINCT id FROM "
            "  (SELECT src AS id FROM spa UNION ALL SELECT dst FROM spa)), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v), "
            "pr AS ( "
            "  SELECT 0 AS it, id, CAST(0.0 AS DOUBLE) AS val FROM v "
            "  UNION ALL "
            "  SELECT p.it + 1, p.id, "
            "         0.15/nn.n + 0.85 * COALESCE(SUM(q.val / dd.d), 0.0) "
            "  FROM pr p CROSS JOIN nn "
            "  LEFT JOIN spa e ON e.dst = p.id "
            "  LEFT JOIN pr q ON q.id = e.src AND q.it = p.it "
            "  LEFT JOIN deg dd ON dd.id = e.src "
            "  WHERE p.it < 30 GROUP BY p.it, p.id, nn.n) "
            "SELECT id AS vertex, CAST(ROUND(val * 1e8) AS BIGINT) AS score_e8 "
            "FROM pr WHERE it = 30"
        ),
        "events_attribution": (
            # last/first non-purchase touch strictly before each
            # purchase (frame ends at 1 PRECEDING); conversions with
            # no prior touch drop out (testdata.q_events_attribution)
            "WITH p AS (SELECT event_type, "
            "  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END "
            "    IGNORE NULLS) OVER w AS last_t, "
            "  first_value(CASE WHEN event_type <> 'purchase' THEN event_type END "
            "    IGNORE NULLS) OVER w AS first_t "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), "
            "conv AS (SELECT last_t, first_t FROM p "
            "  WHERE event_type = 'purchase' AND last_t IS NOT NULL), "
            "l AS (SELECT last_t AS channel, count(*)::BIGINT AS n_last "
            "  FROM conv GROUP BY 1), "
            "f AS (SELECT first_t AS channel, count(*)::BIGINT AS n_first "
            "  FROM conv GROUP BY 1) "
            "SELECT COALESCE(l.channel, f.channel) AS channel, "
            "COALESCE(n_last, 0)::BIGINT AS n_last, "
            "COALESCE(n_first, 0)::BIGINT AS n_first "
            "FROM l FULL OUTER JOIN f ON l.channel = f.channel"
        ),
        "events_top_paths": (
            # consecutive event-type trigrams per user timeline;
            # top-10 by (cnt DESC, path) (testdata.q_events_top_paths)
            "WITH p AS (SELECT event_type || '>' || "
            "  lead(event_type, 1) OVER w || '>' || "
            "  lead(event_type, 2) OVER w AS path "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "c AS (SELECT path, count(*)::BIGINT AS cnt FROM p "
            "  WHERE path IS NOT NULL GROUP BY 1) "
            "SELECT path, cnt FROM c "
            "QUALIFY row_number() OVER (ORDER BY cnt DESC, path) <= 10"
        ),
        "events_quantiles": (
            "WITH r AS (SELECT event_type, value, "
            "  row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn, "
            "  count(*) OVER (PARTITION BY event_type) AS n FROM events) "
            "SELECT event_type, max(n)::BIGINT AS n_events, "
            + ", ".join(
                f"CAST(ROUND(max(CASE WHEN rn = CAST(floor({q} * (n - 1)) AS BIGINT) "
                f"THEN value END) * 1e6) AS BIGINT) AS p{int(q * 100)}_e6"
                for q in (0.5, 0.9, 0.99)
            )
            + " FROM r GROUP BY event_type"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe "
            "           FROM embeddings WHERE vec_id < 5) "
            "SELECT query_id, vec_id, "
            "CAST(ROUND(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) * 1e6) AS BIGINT) AS score_e6 "
            "FROM q CROSS JOIN embeddings "
            "QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY "
            "CAST(ROUND(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) * 1e6) AS BIGINT) DESC, "
            "vec_id) <= 10"
        ),
    }
    # IVF at full probe is exact by construction, so the brute-force
    # cosine top-k oracle applies verbatim (see testdata.q_ann_ivf).
    sql["ann_ivf"] = sql["ann_topk"]
    # Bloom prefilter + verify is EXACT (fps removed, fns impossible):
    # the plain anti-join oracle applies verbatim (testdata.q_antijoin_bloom).
    sql["antijoin_bloom"] = sql["lineitem_antijoin"]
    # CMS point-estimate eval: probe the cms_user_counts register
    # table (reused verbatim as a subquery) at the top-10 exact-count
    # users' coordinates (testdata.q_cms_error)
    # spam flags from the host_spam_heuristic oracle (subquery),
    # exposure over the contracted distinct host edges
    # (testdata.q_spam_exposure)
    sql["spam_exposure"] = (
        "WITH sp AS (SELECT host FROM (" + sql["host_spam_heuristic"] + ") "
        "  WHERE spam_score_e6 >= 405000), "
        f"{_pages_edges_cte()}, "
        "he AS (SELECT DISTINCT split_part(src, '/', 3) AS sh, "
        "       split_part(dst, '/', 3) AS dh FROM e "
        "       WHERE split_part(src, '/', 3) <> split_part(dst, '/', 3)), "
        "cnt AS (SELECT e2.sh AS host, count(*)::BIGINT AS n_out, "
        "  count(*) FILTER (e2.dh IN (SELECT host FROM sp))::BIGINT AS n_to_spam "
        "  FROM he e2 GROUP BY 1) "
        "SELECT c.host, "
        "(CASE WHEN c.host IN (SELECT host FROM sp) THEN 1 ELSE 0 END)::BIGINT "
        "  AS is_spam, n_out, n_to_spam, "
        "((2 * n_to_spam * 1000000 + n_out) // (2 * n_out))::BIGINT AS exposure_e6 "
        "FROM cnt c"
    )
    # all-integer HLL estimate vs exact distinct per day; reuses the
    # events_window_hll register query verbatim as a subquery
    # (testdata.q_events_hll_error)
    _hll_a = 721_253 * 65_536 * (1 << 57)
    sql["events_hll_error"] = (
        "WITH regs AS (SELECT * FROM (" + sql["events_window_hll"] + ")), "
        "ss AS (SELECT win, "
        "  SUM((1::UBIGINT << (57 - rho))::HUGEINT)::HUGEINT "
        "  + (256 - count(*))::HUGEINT * 144115188075855872::HUGEINT AS s "
        "  FROM regs GROUP BY win), "
        "ex AS (SELECT (epoch_us(ts) // 86400000000)::BIGINT AS win, "
        "  count(DISTINCT user_id)::BIGINT AS exact_users FROM events GROUP BY 1), "
        "sel AS (SELECT e.win, e.exact_users, "
        f"  ({_hll_a}::HUGEINT // (1000000::HUGEINT * ss.s))::BIGINT AS hll_est "
        "  FROM ex e JOIN ss USING (win)) "
        "SELECT win, exact_users, hll_est, "
        "(hll_est - exact_users)::BIGINT AS err FROM sel"
    )
    sql["cms_error"] = (
        "WITH ex AS (SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1), "
        "top AS (SELECT user_id, c FROM ex "
        "  QUALIFY row_number() OVER (ORDER BY c DESC, user_id) <= 10), "
        "co AS (SELECT t.user_id, t.c, rr.r, "
        f"  {_wrap_mul('t.user_id::HUGEINT', _FNV64)} AS base, "
        "  xor((base)::UBIGINT, rr.r::UBIGINT) AS x, "
        f"  {_splitmix_cols('x', 'h')}, (h % 1024)::BIGINT AS reg "
        "  FROM top t CROSS JOIN "
        "  (SELECT r FROM unnest(generate_series(0, 3)) t2(r)) rr), "
        f"regs AS (SELECT * FROM ({sql['cms_user_counts']})), "
        "est AS (SELECT co.user_id, co.c, min(g.cnt) AS cms_est "
        "  FROM co JOIN regs g ON g.r = co.r AND g.reg = co.reg GROUP BY 1, 2) "
        "SELECT user_id::BIGINT AS user_id, c AS exact, cms_est::BIGINT AS cms_est, "
        "(cms_est - c)::BIGINT AS overcount FROM est"
    )
    return sql
