"""Pages generation + extraction: determinism, goldens, link-graph build."""

import os
import shutil

from distributed_graph_computing_platform_ray.functions.html import (
    decode_html,
    extract_links,
    extract_text,
)
from distributed_graph_computing_platform_ray.pipelines.pages import (
    build_link_graph,
    extract_text_table,
)
from distributed_graph_computing_platform_ray.sources.pages import (
    _page_html,
    generate_pages,
    url_of,
)

TMP = "/tmp/graft_tests/pages"


def test_extract_links_normalization():
    html = """
    <html><body>
    <a href="https://a.example/x#frag">x</a>
    <a href='/rel/y'>y</a>
    <a href=bare>b</a>
    <a href="javascript:void(0)">no</a>
    <a href="mailto:x@y">no</a>
    <a href="https://a.example/x">dup</a>
    <A HREF="HTTPS://UP.example/Z">case</A>
    <a name="anchor-only">no href</a>
    <a href="a&amp;b">entity</a>
    </body></html>"""
    links = extract_links(html, "https://base.example/dir/page")
    assert links == [
        "https://a.example/x",
        "https://base.example/rel/y",
        "https://base.example/dir/bare",
        "https://a.example/x",
        "https://UP.example/Z",  # scheme lowercased by resolution
        "https://base.example/dir/a&b",
    ]


def test_extract_text_strips_invisible():
    html = (
        "<html><head><script>var x='NOT_TEXT';</script>"
        "<style>p{}</style></head>"
        "<body><!-- NOT_TEXT --><p>Hello   &amp;\n\nworld</p></body></html>"
    )
    assert extract_text(html) == "Hello & world"
    assert "NOT_TEXT" not in extract_text(html)


def test_generator_deterministic_across_parallelism():
    a = generate_pages(200, override_num_blocks=1).take(20)
    b = generate_pages(200, override_num_blocks=7).take(20)
    for x, y in zip(a, b):
        assert x["url"] == y["url"] and x["html"] == y["html"]


def test_extracted_text_matches_goldens():
    """Byte-identical extracted text per url vs pinned goldens
    (FIXTURES.md §1) — through the Ray pipeline, not just the pure fn."""
    gold_dir = os.path.join(os.path.dirname(__file__), "golden", "extracted_text")
    rows = extract_text_table(generate_pages(1000).limit(20)).take_all()
    by_url = {r["url"]: r["text"] for r in rows}
    for i in range(20):
        with open(os.path.join(gold_dir, f"page-{i:04d}.txt")) as f:
            expected = f.read()
        assert by_url[url_of(i)] == expected, f"text drift for page {i}"


def test_pure_fn_matches_pipeline():
    html = _page_html(7, 1000, 42).encode("utf-8")
    direct = extract_text(decode_html(html))
    row = [r for r in extract_text_table(generate_pages(1000).limit(10)).take_all() if r["url"] == url_of(7)]
    assert row[0]["text"] == direct


def test_build_link_graph_counts():
    shutil.rmtree(f"{TMP}/g", ignore_errors=True)
    man = build_link_graph(generate_pages(300), f"{TMP}/g", n_parts=4, n_buckets=16)
    # every page has >= 4 links, so every page url is a vertex; danglers add more
    assert man.n_vertices >= 300
    assert not man.keys_numeric
    assert man.n_edges_directed % 2 == 0  # symmetrized
    assert man.symmetrized


def test_contract_link_graph_weights():
    # Hand-computed contraction: duplicates dedup first, then parallel
    # page links between the same domain pair sum into the weight.
    import pandas as pd
    import ray.data as rd

    from distributed_graph_computing_platform_ray.pipelines.pages import contract_link_graph

    links = pd.DataFrame(
        {
            "src_key": [
                "https://a.example/p/1",
                "https://a.example/p/1",  # exact duplicate pair -> deduped
                "https://a.example/p/2",
                "https://b.example/p/1",
                "https://a.example/p/1",
            ],
            "dst_key": [
                "https://b.example/p/9",
                "https://b.example/p/9",
                "https://b.example/p/9",  # distinct page pair, same domains
                "https://a.example/p/1",
                "https://a.example/p/7",  # intra-domain -> self edge
            ],
        }
    )
    out = (
        contract_link_graph(rd.from_pandas(links), n_buckets=4)
        .to_pandas()
        .sort_values(["src_key", "dst_key"])
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {
            "src_key": ["a.example", "a.example", "b.example"],
            "dst_key": ["a.example", "b.example", "a.example"],
            "weight": [1, 2, 1],
        }
    )
    pd.testing.assert_frame_equal(out.astype({"weight": "int64"}), exp)
