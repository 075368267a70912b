"""Web-corpus text operators: HTML → text extraction and URL
canonicalization/dedup — the scrape-side front of a training-data pipeline
(the reference ingests pre-parsed CSV and has no scrape analogue; these
cover the ``documents``-table gap a 100 TB web corpus adds).

Both operators are pure Column expressions (JVM whole-stage codegen, no
Python in the hot path) and are written to the RE2-compatible regex subset
— no backreferences, no lookaround — so the DuckDB oracle executes the
LITERAL same patterns and the results hash-match bit-for-bit.

Scale shape: embarrassingly parallel per-row string work; the only shuffle
anywhere is the final canonical-URL groupBy (hash-agg with map-side
partials). At 100 TB both run at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters only for &amp;, which must be LAST so literal entity text
# produced by the other unescapes is not double-decoded (&amp;lt; must end
# as &lt;, not <). The oracle mirrors the identical chain order.
_HTML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)

# RE2-safe: non-greedy block erase for containers whose CONTENT is not
# text, then a single tag-strip pass, then whitespace collapse.
_RE_SCRIPT = r"(?s)<script[^>]*>.*?</script>"
_RE_STYLE = r"(?s)<style[^>]*>.*?</style>"
_RE_TAG = r"<[^>]*>"
_RE_WS = r"\s+"


def html_to_text(col: Column) -> Column:
    """Strip an HTML document to visible text: script/style blocks erased
    wholesale (their content is code, not text), remaining tags replaced by
    a space (so ``</p><p>`` never glues words), the six core entities
    decoded, whitespace collapsed, ends trimmed. Not a browser — a
    boilerplate-tolerant extractor of the kind every web-scale text
    pipeline runs before quality scoring and dedup."""
    s = F.regexp_replace(col, _RE_SCRIPT, " ")
    s = F.regexp_replace(s, _RE_STYLE, " ")
    s = F.regexp_replace(s, _RE_TAG, " ")
    for ent, ch in _HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, _RE_WS, " "))


# URL part extractors (RE2-safe). Hosts are lowercased; schemes ditto;
# default ports stripped; the fragment never participates in identity.
_RE_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_RE_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_RE_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_RE_QUERY = r"\?([^#]*)"


def url_canonicalize(col: Column, drop_param_prefix: str = "utm_") -> Column:
    """Canonical form of an absolute http(s) URL, the equivalence key for
    URL-level dedup: scheme and host lowercased, default port stripped
    (``:80`` http / ``:443`` https), tracking parameters (``utm_*`` by
    default) dropped, surviving query parameters SORTED (param order is
    transport noise), fragment dropped, trailing slash normalized off
    non-root paths, empty path → ``/``.

    All string/array built-ins — the params pipeline is one nested
    ``array_join(array_sort(filter(split(...))))`` expression, evaluated
    once per row inside codegen."""
    scheme = F.lower(F.regexp_extract(col, _RE_SCHEME, 1))
    authority = F.lower(F.regexp_extract(col, _RE_AUTHORITY, 1))
    host = F.when(
        (scheme == "http") & authority.endswith(":80"),
        F.substring(authority, 1, F.length(authority) - F.lit(3)),
    ).when(
        (scheme == "https") & authority.endswith(":443"),
        F.substring(authority, 1, F.length(authority) - F.lit(4)),
    ).otherwise(authority)
    raw_path = F.regexp_extract(col, _RE_PATH, 1)
    path = F.when(raw_path == "", F.lit("/")).when(
        (raw_path != "/") & raw_path.endswith("/"),
        F.substring(raw_path, 1, F.length(raw_path) - F.lit(1)),
    ).otherwise(raw_path)
    params = F.array_join(
        F.array_sort(F.filter(
            F.split(F.regexp_extract(col, _RE_QUERY, 1), "&"),
            lambda p: (p != "") & ~p.startswith(drop_param_prefix),
        )),
        "&",
    )
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params)),
    )
