"""Deterministic, dependency-free HTML link & text extraction.

The reference has NO html extractor — its only parser is the edge-list
loader (/root/reference/worker/worker.go:106-144). The north_star adds
one: link extraction from Common-Crawl-style pages with a
byte-identical-extracted-text-per-url invariant. These are pure
functions of the html bytes (+ base url), so the invariant holds at
any parallelism/partitioning; goldens are pinned in
tests/golden/extracted_text/ (FIXTURES.md §1).
"""

from __future__ import annotations

import html as _htmlmod
import re
from urllib.parse import urldefrag, urljoin, urlsplit

# <a ...> tags; href value quoted either way or bare
_A_TAG = re.compile(r"<a\b[^>]*>", re.IGNORECASE | re.DOTALL)
_HREF = re.compile(
    r"""href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_SCRIPT = re.compile(r"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_STYLE = re.compile(r"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]*>")

_KEEP_SCHEMES = ("http", "https")


def decode_html(html_bytes: bytes) -> str:
    """Pages are bytes on the wire (input_hint: html:binary); decode
    utf-8 with replacement so one bad byte can't poison a page."""
    return html_bytes.decode("utf-8", errors="replace")


def extract_links(html_text: str, base_url: str) -> list[str]:
    """All <a href> targets, resolved against base_url and normalized.

    Normalization: entity-unescape the attribute, resolve relative
    urls, drop the fragment, keep only http(s), drop self-links after
    normalization? NO — self-links are kept (the reference keeps
    self-loops in adjacency too); duplicates are kept here and deduped
    by the pipeline's exact-distinct stage (SURVEY.md §2.7).
    """
    out: list[str] = []
    for tag in _A_TAG.findall(html_text):
        m = _HREF.search(tag)
        if not m:
            continue
        raw = m.group(1) or m.group(2) or m.group(3) or ""
        raw = _htmlmod.unescape(raw).strip()
        if not raw:
            continue
        resolved = urljoin(base_url, raw)
        resolved, _frag = urldefrag(resolved)
        scheme = urlsplit(resolved).scheme.lower()
        if scheme not in _KEEP_SCHEMES:
            continue
        out.append(resolved)
    return out


def extract_hrefs_raw(html_text: str, base_url: str) -> list[tuple[str, str]]:
    """(raw attribute value, canonical url) per <a href> instance.

    raw = the href exactly as written (entity-unescaped, stripped) —
    fragment and relative form PRESERVED; canonical = the same
    normalization extract_links applies (resolve against base_url,
    drop fragment). Instances whose canonical form is non-http(s) are
    dropped on both columns so the two surfaces stay aligned. This is
    the canonicalization-audit surface: how many distinct raw strings
    collapse into each canonical url (dedup leverage of url
    normalization before any crawl/store happens)."""
    out: list[tuple[str, str]] = []
    for tag in _A_TAG.findall(html_text):
        m = _HREF.search(tag)
        if not m:
            continue
        raw = _htmlmod.unescape(m.group(1) or m.group(2) or m.group(3) or "").strip()
        if not raw:
            continue
        resolved, _frag = urldefrag(urljoin(base_url, raw))
        if urlsplit(resolved).scheme.lower() not in _KEEP_SCHEMES:
            continue
        out.append((raw, resolved))
    return out


_A_FULL = re.compile(r"(<a\b[^>]*>)(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)


def extract_links_with_anchors(html_text: str, base_url: str) -> list[tuple[str, str]]:
    """(resolved href, anchor text) per <a>...</a> instance — the
    web-search anchor signal. Same href normalization as
    extract_links; anchor = inner markup tag-stripped, entity-
    unescaped, whitespace-collapsed. Instances (duplicates,
    self-links) are KEPT — anchor aggregation wants them."""
    out: list[tuple[str, str]] = []
    for m in _A_FULL.finditer(html_text):
        hm = _HREF.search(m.group(1))
        if not hm:
            continue
        raw = _htmlmod.unescape(hm.group(1) or hm.group(2) or hm.group(3) or "").strip()
        if not raw:
            continue
        resolved, _frag = urldefrag(urljoin(base_url, raw))
        if urlsplit(resolved).scheme.lower() not in _KEEP_SCHEMES:
            continue
        anchor = " ".join(_htmlmod.unescape(_TAG.sub(" ", m.group(2))).split())
        out.append((resolved, anchor))
    return out


def extract_text(html_text: str) -> str:
    """Visible text: strip comments, script/style bodies, all tags;
    unescape entities; collapse all whitespace runs to single spaces.
    Pure function — THE byte-identical invariant surface."""
    s = _COMMENT.sub(" ", html_text)
    s = _SCRIPT.sub(" ", s)
    s = _STYLE.sub(" ", s)
    s = _TAG.sub(" ", s)
    s = _htmlmod.unescape(s)
    return " ".join(s.split())
