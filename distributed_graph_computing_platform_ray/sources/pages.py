"""Deterministic synthetic Common-Crawl-style pages table.

Schema per BASELINE.json input_hint / FIXTURES.md §1:
    url: string, warc_ts: timestamp[us, UTC], html: binary,
    text: large_string (empty — the engine recomputes it), lang: string

All randomness is COUNTER-BASED (splitmix64 of the row id + seed), so
page i's bytes are identical for any batch size, block split or
parallelism level — the property the byte-identical-text golden tests
rely on. Link targets follow a Zipf-ish distribution (u^3 skew toward
low page ids) so hub-skew code paths are exercised; a deterministic
subset of hrefs are relative, duplicates, self-links, entity-escaped,
or dangling (outside the table) to exercise normalization and dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..utils import mix64, uniform01

PAGES_PER_SITE = 16
_WORDS = (
    "web crawl graph rank link data page site index query batch engine "
    "stream shard vertex edge node hub spider fetch parse token shuffle"
).split()
_LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]

_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

EPOCH_US = 1_700_000_000_000_000  # fixed epoch; warc_ts = epoch + i sec


def url_of(i: int) -> str:
    return f"https://site-{i // PAGES_PER_SITE:05d}.example/p/{i % PAGES_PER_SITE:04d}"


def _page_html(i: int, n_pages: int, seed: int) -> str:
    h0 = int(mix64(np.uint64(seed), np.uint64(i)))
    n_links = 4 + h0 % 12
    n_words = 20 + (h0 >> 8) % 60
    widx = mix64(
        np.uint64(seed + 3),
        np.full(n_words, i, dtype=np.uint64),
        np.arange(n_words, dtype=np.uint64),
    ) % np.uint64(len(_WORDS))
    words = [_WORDS[int(j)] for j in widx]
    parts = [
        f"<html><head><title>Page {i} &amp; friends</title>",
        "<style>body { color: #000; }</style>",
        "<script>var hidden = 'NOT_TEXT';</script></head><body>",
        f"<h1>Doc {i}</h1>",
        "<!-- comment NOT_TEXT -->",
        f"<p>{' '.join(words[: n_words // 2])}</p>",
        f"<p>{' '.join(words[n_words // 2 :])} &lt;escaped&gt;</p>",
    ]
    prev_target = None
    for k in range(n_links):
        hk = int(mix64(np.uint64(seed + 1), np.uint64(i), np.uint64(k)))
        u = (hk >> 11) / float(1 << 53)
        target = int(n_pages * (u**3))  # Zipf-ish: low ids are hubs
        if hk % 13 == 0:
            href = url_of(i)  # self-link
        elif hk % 11 == 5:
            href = f"https://offsite-{hk % 997:04d}.example/x"  # dangling
        elif hk % 7 == 3 and target // PAGES_PER_SITE == i // PAGES_PER_SITE:
            href = f"/p/{target % PAGES_PER_SITE:04d}"  # relative
        elif hk % 5 == 2 and prev_target is not None:
            href = prev_target  # duplicate
        else:
            href = url_of(target % n_pages)
        prev_target = href
        quote = "'" if hk % 17 == 0 else '"'
        frag = "#sec1" if hk % 19 == 0 else ""
        parts.append(f"<a href={quote}{href}{frag}{quote}>link {k}</a>")
    parts.append("</body></html>")
    return "\n".join(parts)


def _gen_batch(t: pa.Table, n_pages: int, seed: int) -> pa.Table:
    ids = t["id"].to_numpy()
    urls = [url_of(int(i)) for i in ids]
    htmls = [_page_html(int(i), n_pages, seed).encode("utf-8") for i in ids]
    langs = [_LANGS[int(mix64(np.uint64(seed + 2), np.uint64(i))) % len(_LANGS)] for i in ids]
    ts = (EPOCH_US + ids.astype(np.int64) * 1_000_000).astype("datetime64[us]")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts).cast(pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * len(ids), pa.large_string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=_SCHEMA,
    )


def generate_pages(n_pages: int, seed: int = 42, override_num_blocks: int | None = None) -> rd.Dataset:
    """Lazy Dataset of n_pages deterministic pages."""
    rng = rd.range(n_pages, override_num_blocks=override_num_blocks)
    return rng.map_batches(
        lambda t: _gen_batch(t, n_pages, seed), batch_format="pyarrow", batch_size=2048
    )


def write_pages(n_pages: int, out_dir: str, seed: int = 42) -> str:
    """Materialize a pages table to Parquet (bench/test inputs)."""
    generate_pages(n_pages, seed).write_parquet(out_dir)
    return out_dir
