"""URL canonicalization — SURVEY.md O8/O23/O24.

The reference (``[GH] scraper.py``, C1/C2 — mount empty, SURVEY.md section 0)
resolves relative hrefs against the page URL (urljoin semantics), strips
``#fragment``, and compares hosts for the same-site filter. The whole
seen-set/ordering match depends on both sides (Spark pipeline and the frozen
oracle in tests/oracle/ref_crawler.py) agreeing byte-for-byte, so the rules
are pinned here explicitly:

  c(base, href):
    1. strip surrounding whitespace from href
    2. resolve against base with RFC-3986 join (urllib.parse.urljoin)
    3. drop anything that is not http/https after resolution (O11)
    4. strip the #fragment
    5. lowercase scheme and host; strip a default port (:80 http, :443 https)
    6. empty path -> '/'
    7. query string kept verbatim

All canonicalization lives in THIS module (single source of truth,
SURVEY.md section 7.2): the vectorized pandas path calls the same pure
function; native Spark column expressions are used only for host()/hash()
lookups that tests prove byte-equal (test_canon.py).
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORT = {"http": "80", "https": "443"}


def canonicalize(base: str, href: str) -> str | None:
    """Canonical absolute URL, or None if out of protocol scope (O11)."""
    href = (href or "").strip()
    if not href:
        return None
    try:
        absolute = urljoin(base, href)
        parts = urlsplit(absolute)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    try:
        # .hostname/.port are lazy properties that re-parse the authority and
        # raise ValueError on malformed input (e.g. href='//0::' -> "Port
        # could not be cast to integer"); a junk authority is O11 junk.
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return None
    if not host:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORT[scheme]:
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    """Host (netloc incl. non-default port) of an already-canonical URL."""
    return urlsplit(url).netloc


def canonicalize_many(base: str, hrefs: list[str]) -> list[str]:
    """Canonicalize a page's hrefs, dropping out-of-scope ones, order kept."""
    out = []
    for h in hrefs:
        c = canonicalize(base, h)
        if c is not None:
            out.append(c)
    return out
