"""Link + text extraction over the ``html`` binary column — SURVEY.md O7/O27.

Contract (encoded independently in tests/oracle/ref_crawler.py, which must
stay byte-identical — SURVEY.md section 5.3):

  extract_links(html): the ``href`` attribute values of ``<a ...>`` tags, in
  document order (document order feeds discovery_idx tie-breaking, O18).
  Attribute may be double-quoted, single-quoted, or bare.

  extract_text(html): decode utf-8 (errors='replace'); if the payload starts
  with ``%PDF`` return '' (binary document); else drop <script>/<style>
  blocks, replace every remaining tag with a space, collapse whitespace runs
  to single spaces, strip.

Execution is a single Arrow ``pandas_udf`` pass per batch
(``parse_pages_udf``) returning struct<links:array<string>, text:string>,
never per-row Python at the Spark level (input_hint). Inside each pandas
batch, text extraction and href scanning are vectorized ``.str`` ops; URL
canonicalization takes a vectorized fast path for absolute fragment-free
hrefs and falls back to functions.canon.canonicalize for the rest
(tests/test_canon.py proves the two paths byte-equal).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from barkingowl_spark.functions.canon import canonicalize

HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Fast-path recognizer: absolute http(s), no fragment, no userinfo, host
# already lowercase, no explicit port, non-empty path. Everything else goes
# through canon.canonicalize. Kept deliberately narrow so the fast path can
# never disagree with the slow path (proved in test_canon.py).
_FAST_ABS_RE = re.compile(r"^https?://[a-z0-9.\-]+/[^#\s]*$")


# Links per page are capped at the discovery_idx encoding width
# (ordering.DISCOVERY_IDX_SHIFT): pos < 2^20 makes
# parent_rank * SHIFT + pos injective BY CONSTRUCTION — a pathological
# >1M-anchor page truncates (documented bound) instead of silently
# colliding with the next parent's index space.
MAX_LINKS_PER_PAGE = 1 << 20


def extract_links(html: bytes | str) -> list[str]:
    """All <a href> values in document order (raw, un-canonicalized),
    capped at MAX_LINKS_PER_PAGE."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    out = []
    for m in HREF_RE.finditer(s):
        out.append(next(g for g in m.groups() if g is not None))
        if len(out) >= MAX_LINKS_PER_PAGE:
            break
    return out


def extract_text(html: bytes | str) -> str:
    """Whitespace-normalized visible text; '' for %PDF payloads."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, bytes) else html
    if s.startswith("%PDF"):
        return ""
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def canonicalize_batch(base_urls: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Vectorized canonicalization of hrefs against per-row base URLs.

    Returns canonical URLs (None for out-of-scope schemes, O11). The fast
    path (absolute, fragment-free, lowercase-host, portless http(s) hrefs —
    the overwhelming majority in web corpora) is pure pandas string ops; the
    rest fall back to the single-source-of-truth canon.canonicalize.
    """
    stripped = hrefs.fillna("").str.strip()
    fast = stripped.str.match(_FAST_ABS_RE)
    out = pd.Series([None] * len(stripped), index=stripped.index, dtype=object)
    out[fast] = stripped[fast]
    slow_idx = out.index[~fast]
    if len(slow_idx):
        out[slow_idx] = [
            canonicalize(b, h)
            for b, h in zip(base_urls[slow_idx], stripped[slow_idx])
        ]
    return out


PARSE_RESULT_TYPE = StructType(
    [
        StructField("links", ArrayType(StringType()), True),
        StructField("text", StringType(), True),
    ]
)


def _decode(html: object) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="replace")
    return str(html)


def _parse_batch(url: pd.Series, html: pd.Series) -> pd.DataFrame:
    decoded = html.map(_decode)
    is_pdf = decoded.str.startswith("%PDF")
    # text: vectorized regex chain over the whole batch
    text = (
        decoded.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
        .str.replace(_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    text[is_pdf] = ""
    # links: vectorized extractall keeps (row, match-order) multiindex =
    # document order within each row.
    matches = decoded.str.extractall(HREF_RE)
    if len(matches):
        href = matches[0].fillna(matches[1]).fillna(matches[2])
        base = url.loc[href.index.get_level_values(0)]
        base.index = href.index
        # out-of-scope hrefs stay as NULL entries so array positions keep
        # RAW document order (the oracle's pos counts junk hrefs too);
        # the caller filters nulls after posexplode (O11).
        canon = canonicalize_batch(base, href)
        grouped = canon.groupby(level=0).agg(
            lambda v: list(v)[:MAX_LINKS_PER_PAGE]
        )
    else:
        grouped = pd.Series(dtype=object)
    links = url.index.to_series().map(grouped).where(
        url.index.to_series().isin(grouped.index), None
    )
    links = links.map(lambda v: v if isinstance(v, list) else [])
    return pd.DataFrame({"links": links, "text": text})


@pandas_udf(PARSE_RESULT_TYPE)
def parse_pages_udf(
    it: Iterator[tuple[pd.Series, pd.Series]],
) -> Iterator[pd.DataFrame]:
    """Iterator-style scalar pandas UDF: (url, html) -> {links, text}.

    Iterator form amortizes per-batch setup (SURVEY.md section 4.2). Canonical
    links are returned in document order; explode with ``posexplode`` to keep
    the in-document position for discovery_idx (O18).
    """
    for url, html in it:
        yield _parse_batch(url, html)
