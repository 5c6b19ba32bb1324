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
        # rows-only check: the url-keyed flagship at a size tied to sf
        from distributed_graph_computing_platform_ray.pipelines.graph import (
            run_algorithm,
            top_k,
        )
        from distributed_graph_computing_platform_ray.pipelines.pages import (
            build_link_graph,
        )
        from distributed_graph_computing_platform_ray.sources.pages import generate_pages

        n = 2000 if "0.01" in sf_dir else 500
        root = f"/tmp/graft_pages_{n}"
        shutil.rmtree(root, ignore_errors=True)
        build_link_graph(generate_pages(n), f"{root}/graph", n_parts=8, n_buckets=16)
        return top_k(run_algorithm(f"{root}/graph", f"{root}/pr", "pagerank"), 25)

    return {
        # -- graph engine over derived edge tables (SQL-checked) --------
        "edges_lineitem": T.q_edges_lineitem,
        "degrees": T.q_degrees,
        "pagerank": T.q_pagerank,
        "pagerank_directed": T.q_pagerank_directed,
        "pagerank_top25": T.q_pagerank_top25,
        "sssp": T.q_sssp,
        "connected_components": T.q_connected_components,
        "label_propagation": T.q_label_propagation,
        "triangle_count": T.q_triangle_count,
        "triangles_per_vertex": T.q_triangles_per_vertex,
        # -- documents: text analysis / dedup ---------------------------
        "doc_stats": T.q_doc_stats,
        "doc_exact_dedup": T.q_doc_exact_dedup,
        "doc_fingerprint": T.q_doc_fingerprint,
        "top_terms": T.q_top_terms,
        # -- events / embeddings ----------------------------------------
        "events_hourly": T.q_events_hourly,
        "events_sessionize": T.q_events_sessionize,
        "events_sliding": T.q_events_sliding,
        "ann_topk": T.q_ann_topk,
        # -- rows-only (no SQL oracle; pytest verifies vs oracles) ------
        "pages_linkgraph_pagerank": pages_linkgraph_pagerank,
        "doc_langid": T.q_doc_langid,
        "doc_quality": T.q_doc_quality,
        "doc_token_bpe": T.q_doc_token_bpe,
        "doc_rolling_fingerprint": T.q_doc_rolling_fingerprint,
        "doc_minhash_dedup": T.q_doc_minhash_dedup,
        "doc_simhash_pairs": T.q_doc_simhash_pairs,
        "embedding_neardup": T.q_embedding_neardup,
        "ann_ivf": T.q_ann_ivf,
        "multimodal_decode": T.q_multimodal_decode,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "edges_lineitem": f"WITH {_EB_LINEITEM} SELECT src, dst FROM eb",
        "degrees": (
            f"WITH {_EB_LINEITEM}, {_ES} "
            "SELECT src AS vertex, count(*)::BIGINT AS degree FROM es GROUP BY src"
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
