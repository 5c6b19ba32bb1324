"""The flagship pipeline: pages table -> link graph -> analytics.

End-to-end (north_star): read Common-Crawl-style pages Parquet,
extract links per page, exact-dedup the (src_url, dst_url) pairs,
dictionary-encode urls to dense vertex ids, build CSR shards, then run
PageRank / SSSP / CC / LP on the BSP engine. Column pruning at the
read (only url+html leave storage for link extraction).
"""

from __future__ import annotations

import ray.data as rd

from ..stages.extract import extract_links, extract_text
from ..state.manifest import GraphManifest
from .ingest import build_graph


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(path, columns=columns)


def build_link_graph(
    pages: rd.Dataset | str,
    graph_dir: str,
    *,
    n_parts: int = 32,
    n_buckets: int = 64,
    dedup: bool = True,
) -> GraphManifest:
    """pages (Dataset or parquet path) -> on-disk CSR graph.

    Extracted links are exact-deduped before encoding (SURVEY.md §2.7);
    dangling targets (urls never seen as a page) still become vertices —
    vertices exist via edges, like the reference loader.
    """
    if isinstance(pages, str):
        pages = read_pages(pages, columns=["url", "html"])
    links = extract_links(pages)
    return build_graph(
        links,
        graph_dir,
        n_parts=n_parts,
        n_buckets=n_buckets,
        dedup=dedup,
        symmetrize_edges=True,
        source_info={"kind": "pages", "dedup": dedup},
    )


def contract_link_graph(links: rd.Dataset, n_buckets: int = 32) -> rd.Dataset:
    """Page-level links -> weighted domain-level edges.

    Globally exact-dedups (src_url, dst_url) pairs in hash buckets
    (same-pair rows always share a bucket, so per-bucket
    drop_duplicates is globally exact), contracts both endpoints to
    their host (third '/'-separated segment of the absolute url), and
    sums parallel page links into an integer ``weight`` with one
    domain-pair reduce. Returns (src_key, dst_key, weight). The 100 TB
    shape: two bucketed shuffles, partials computed in-bucket, and the
    output is domain-cardinality (tiny relative to the input)."""
    import pandas as pd

    from ..stages.join import _BUCKET, add_bucket, bucket_sum

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["src_key", "dst_key"])
        dom = pd.DataFrame(
            {
                "src_key": df["src_key"].str.split("/").str[2],
                "dst_key": df["dst_key"].str.split("/").str[2],
            }
        )
        return (
            dom.groupby(["src_key", "dst_key"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "weight"})
        )

    from ..stages.join import bucket_map_groups

    partial = bucket_map_groups(
        add_bucket(links, ["src_key", "dst_key"], n_buckets), n_buckets, per_bucket
    )
    return bucket_sum(partial, ["src_key", "dst_key"], ["weight"], 16)


def extract_text_table(pages: rd.Dataset | str, out_dir: str | None = None) -> rd.Dataset:
    """(url, text) with the byte-identical-per-url invariant."""
    if isinstance(pages, str):
        pages = read_pages(pages, columns=["url", "html"])
    ds = extract_text(pages)
    if out_dir is not None:
        ds.write_parquet(out_dir)
        ds = rd.read_parquet(out_dir)
    return ds
