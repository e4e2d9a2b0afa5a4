"""FROZEN reference oracle — single-process BFS crawler (SURVEY.md section 5.2/5.3).

Implements the reference crawl kernel E2 (SURVEY.md section 3.1) exactly, over an
in-memory {url: html} corpus, with the section-2 semantics the Spark pipeline
must reproduce:

  O7  link extraction: <a href> values in document order
  O8  canonicalization: urljoin, strip #fragment, lowercase scheme/host,
      strip default port, '' path -> '/'
  O9  scope: host(link) == host(seed)
  O10 depth: pages fetched at depth <= max_link_level; links discovered from
      a depth-max page are still typechecked (boundary docs matched), html
      children beyond the boundary are pruned (but enter the seen-set)
  O11 junk: non-http(s) schemes dropped BEFORE the seen-set
  O12 seen-set: canonical URL enters at most once per seed; first wins;
      insertion happens at DISCOVERY time (reference appends to
      processed_links when a link is typechecked, before fetch)
  O15 matcher: content-type (parameters stripped at ';') equals doc_type, OR
      doc_type=='application/pdf' and url lowercased ends with '.pdf';
      missing page wins over extension match (reference: HTTP error ->
      badlink). Content-type of a corpus row: '%PDF' magic ->
      'application/pdf' else 'text/html'.
  O18 order: discovery_idx = parent_rank_in_level * 2**20 + in-document
      position (0-based); parent_rank is 1-based within the level;
      crawl_order = rank by (depth, discovery_idx) per seed.

This file is deliberately SELF-CONTAINED (its own regexes and
canonicalization — no imports from barkingowl_spark) so that oracle and
pipeline are independent encodings of the same spec. FROZEN once written:
sha256 recorded in tests/oracle/SHA256SUMS; do not edit to make tests pass —
fix the pipeline instead (SURVEY.md section 5.3).

RE-FREEZE LOG (crash fixes only — never semantics):
  2026-08-17: guard .hostname/.port ValueError in oracle_canonicalize
  (hypothesis example href='//0::'); identical guard applied to
  barkingowl_spark/functions/canon.py. A crash is not a semantics.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from urllib.parse import urljoin, urlsplit, urlunsplit

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_DEFAULT_PORT = {"http": "80", "https": "443"}

DISCOVERY_IDX_SHIFT = 2**20  # max links per page before collision (documented)


def oracle_extract_links(html: bytes | str) -> list[str]:
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    return [
        next(g for g in m.groups() if g is not None) for m in _HREF_RE.finditer(s)
    ]


def oracle_extract_text(html: bytes | str) -> str:
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    if s.startswith("%PDF"):
        return ""
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def oracle_canonicalize(base: str, href: str) -> str | None:
    href = (href or "").strip()
    if not href:
        return None
    try:
        parts = urlsplit(urljoin(base, href))
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    try:
        # Crash-fix re-freeze 2026-08-17: .hostname/.port raise ValueError on
        # malformed authorities (e.g. '//0::'); junk authority = O11 junk.
        # Semantics unchanged for every input that previously returned.
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return None
    if not host:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT[scheme]:
        netloc = f"{host}:{port}"
    return urlunsplit((scheme, netloc, parts.path or "/", parts.query, ""))


def oracle_host(url: str) -> str:
    return urlsplit(url).netloc


def oracle_content_type(html: bytes | str | None) -> str | None:
    if html is None:
        return None
    s = html[:4]
    if isinstance(s, bytes):
        s = s.decode("utf-8", errors="replace")
    return "application/pdf" if s.startswith("%PDF") else "text/html"


def oracle_match(content_type: str, url: str, doc_type: str) -> str | None:
    """Return matched_by ('content_type'|'extension') or None."""
    if content_type.split(";", 1)[0].strip() == doc_type:
        return "content_type"
    if doc_type == "application/pdf" and url.lower().endswith(".pdf"):
        return "extension"
    return None


@dataclass
class SeenEntry:
    url: str
    depth: int
    discovery_idx: int
    parent: str | None
    status: str  # 'fetched' | 'doc' | 'missing' | 'pruned' | 'queued'
    matched_by: str | None = None
    text_sha256: str | None = None


@dataclass
class OracleResult:
    seed_url: str
    seen: dict[str, SeenEntry] = field(default_factory=dict)

    def trace(self) -> list[tuple[int, str, int, int, str]]:
        """[(crawl_order, url, depth, discovery_idx, status)] per O18 order."""
        ordered = sorted(
            self.seen.values(), key=lambda e: (e.depth, e.discovery_idx)
        )
        return [
            (i + 1, e.url, e.depth, e.discovery_idx, e.status)
            for i, e in enumerate(ordered)
        ]

    def documents(self) -> list[tuple[str, int, str | None, str]]:
        return sorted(
            (e.url, e.depth, e.parent, e.matched_by)
            for e in self.seen.values()
            if e.status == "doc"
        )


def crawl(
    pages: dict[str, bytes | str],
    seed_url: str,
    max_link_level: int,
    doc_type: str = "application/pdf",
    robots_disallow: dict[str, list[str]] | None = None,
) -> OracleResult:
    """Level-synchronous BFS over the corpus — the E2 kernel."""
    robots_disallow = robots_disallow or {}
    canon_seed = oracle_canonicalize(seed_url, seed_url)
    assert canon_seed is not None, f"seed out of scope: {seed_url}"
    seed_host = oracle_host(canon_seed)
    res = OracleResult(seed_url=canon_seed)

    def typecheck(url: str, depth: int, didx: int, parent: str | None) -> bool:
        """Record status at discovery; return True if it should be fetched."""
        ct = oracle_content_type(pages.get(url))
        if ct is None:
            res.seen[url] = SeenEntry(url, depth, didx, parent, "missing")
            return False
        mb = oracle_match(ct, url, doc_type)
        if mb is not None:
            res.seen[url] = SeenEntry(url, depth, didx, parent, "doc", mb)
            return False
        if depth > max_link_level:
            res.seen[url] = SeenEntry(url, depth, didx, parent, "pruned")
            return False
        res.seen[url] = SeenEntry(url, depth, didx, parent, "queued")
        return True

    level: list[str] = [canon_seed] if typecheck(canon_seed, 0, 0, None) else []
    depth = 0
    while level and depth <= max_link_level:
        next_level: list[str] = []
        for parent_rank, u in enumerate(level, start=1):
            html = pages[u]
            entry = res.seen[u]
            entry.status = "fetched"
            entry.text_sha256 = hashlib.sha256(
                oracle_extract_text(html).encode("utf-8")
            ).hexdigest()
            for pos, href in enumerate(oracle_extract_links(html)):
                c = oracle_canonicalize(u, href)
                if c is None:
                    continue  # O11
                if oracle_host(c) != seed_host:
                    continue  # O9
                path = urlsplit(c).path
                if any(
                    path.startswith(p)
                    for p in robots_disallow.get(oracle_host(c), [])
                ):
                    continue  # robots (flag-off by default)
                if c in res.seen:
                    continue  # O12 first-discovery-wins
                didx = parent_rank * DISCOVERY_IDX_SHIFT + pos
                if typecheck(c, depth + 1, didx, u):
                    next_level.append(c)
        level = next_level
        depth += 1
    return res
