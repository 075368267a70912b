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


#: C4-style line-keep predicate inputs (Raffel et al. 2020 §2.2 heuristics,
#: re-expressed as Column logic): a kept line must end in terminal
#: punctuation, carry at least ``min_words`` words, and contain neither
#: curly braces (code/templating) nor the word "javascript" (enable-JS
#: boilerplate). These are the published public rules, not reference code.
_TERMINAL_PUNCT = [".", "!", "?", '"']


def c4_line_keep(line: Column, min_words: int = 3) -> Column:
    """Boolean keep-flag for one text line under the C4 cleaning rules.
    Pure codegen: substring/size/contains, no regex backtracking."""
    last = F.substring(line, -1, 1)
    words = F.size(F.filter(F.split(line, " "), lambda w: w != ""))
    return (
        last.isin(_TERMINAL_PUNCT)
        & (words >= F.lit(min_words))
        & ~line.contains("{")
        & ~line.contains("}")
        & ~F.lower(line).contains("javascript")
    )


def c4_keep_lines(lines: Column, min_words: int = 3) -> Column:
    """Filter an ``array<string>`` of lines to those passing
    :func:`c4_line_keep` — the line-level half of the C4 pipeline (the
    doc-level half is `text.quality_score` / `repetition` stats). Applied
    per row inside codegen; no explode, no shuffle."""
    return F.filter(lines, lambda l: c4_line_keep(l, min_words))


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname with ≥2 labels, the match keys for
    suffix-based domain blocklists: ``a.b.example.com`` →
    ``[a.b.example.com, b.example.com, example.com]`` (the bare TLD is
    never a match key). Expansion factor = label count − 1, bounded ~4."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: F.array_join(F.slice(labels, i, n), ".")),
    ).otherwise(F.array().cast("array<string>"))


def host_block_match(host: Column, blocklist: list[str]) -> Column:
    """First (lexicographically smallest) blocklist entry that matches the
    host by domain-suffix, or NULL if unblocked. The blocklist is a bounded
    literal set compiled into the plan — at 100 TB this is scan-speed row
    logic with zero joins; a large blocklist swaps in a broadcast join on
    the exploded suffixes with identical semantics."""
    hits = F.filter(host_suffixes(host), lambda s: s.isin(blocklist))
    return F.array_min(hits)


def registrable_domain(host: Column) -> Column:
    """Last two labels of the hostname (``blog.example7.com`` →
    ``example7.com``) — the per-site aggregation key for crawl stats.
    A public-suffix-list-aware version slots in as a broadcast join; two
    labels is the deterministic sandbox stand-in."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.when(n >= 2, F.array_join(F.slice(labels, n - 1, 2), ".")) \
        .otherwise(host)


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
