"""Web-corpus operators (functions/web.py): HTML->text extraction edge
cases and URL canonicalization invariants, against hand-computed strings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.web import html_to_text, url_canonicalize


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_html_to_text_blocks_tags_entities(spark):
    html = ('<html><head><style>p{x:1}</style></head><body>'
            '<script>if(1<2){a();}</script><h2>T</h2>'
            '<p>one</p><p>two &amp;&nbsp;three &lt;b&gt;</p></body></html>')
    got = _one(spark, html_to_text(F.lit(html)))
    # script/style content erased, tags become separators, entities decoded
    assert got == "T one two & three <b>"


def test_html_to_text_entity_order_amp_last(spark):
    # literal "&amp;lt;" must decode to "&lt;" (single unescape pass),
    # never cascade to "<"
    got = _one(spark, html_to_text(F.lit("<p>&amp;lt;</p>")))
    assert got == "&lt;"


def test_html_to_text_tag_gluing_and_whitespace(spark):
    got = _one(spark, html_to_text(F.lit("a</p><p>b\n\n  c<br/>d")))
    assert got == "a b c d"


@pytest.mark.parametrize("raw,canon", [
    # scheme+host case, default port, fragment
    ("HTTP://WWW.Ex.COM:80/p?id=1#f", "http://www.ex.com/p?id=1"),
    ("https://ex.com:443/p", "https://ex.com/p"),
    # NON-default port survives
    ("https://ex.com:8443/p", "https://ex.com:8443/p"),
    # utm dropped, params sorted, empty path -> /
    ("http://ex.com?utm_source=x&b=2&a=1", "http://ex.com/?a=1&b=2"),
    # trailing slash off non-root path; root slash kept
    ("http://ex.com/a/b/", "http://ex.com/a/b"),
    ("http://ex.com/", "http://ex.com/"),
    # all params dropped -> no '?'
    ("http://ex.com/p?utm_a=1&utm_b=2", "http://ex.com/p"),
])
def test_url_canonicalize_cases(spark, raw, canon):
    assert _one(spark, url_canonicalize(F.lit(raw))) == canon


def test_url_canonicalize_merges_transport_noise(spark):
    variants = [
        "http://Ex.com/a?b=2&a=1",
        "HTTP://ex.COM:80/a/?a=1&b=2#frag",
        "http://ex.com/a?utm_c=9&a=1&b=2",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    got = {r["c"] for r in
           df.select(url_canonicalize(F.col("url")).alias("c")).collect()}
    assert got == {"http://ex.com/a?a=1&b=2"}


def _py_canonicalize(url: str) -> str:
    """Independent Python model of url_canonicalize (test oracle)."""
    import re
    scheme = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url).group(1).lower()
    auth = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", url).group(1).lower()
    if scheme == "http" and auth.endswith(":80"):
        auth = auth[:-3]
    elif scheme == "https" and auth.endswith(":443"):
        auth = auth[:-4]
    path = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", url).group(1)
    if path == "":
        path = "/"
    elif path != "/" and path.endswith("/"):
        path = path[:-1]
    m = re.search(r"\?([^#]*)", url)
    params = sorted(p for p in (m.group(1).split("&") if m else [])
                    if p and not p.startswith("utm_"))
    return f"{scheme}://{auth}{path}" + ("?" + "&".join(params) if params else "")


def test_url_canonicalize_random_model_parity(spark):
    """300 seeded-random URLs through every variation axis at once,
    compared against the independent Python model in ONE Spark pass."""
    import random
    rng = random.Random(42)
    urls = []
    for _ in range(300):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS", "hTTps"])
        host = rng.choice(["Ex.COM", "www.ex.com", "A-b.ORG", "x.Y.z.net"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        depth = rng.randint(0, 3)
        path = "".join(f"/p{rng.randint(0, 9)}" for _ in range(depth))
        path += rng.choice(["", "/"])
        n_params = rng.randint(0, 4)
        params = [rng.choice([f"a={rng.randint(0,9)}", f"b={rng.randint(0,9)}",
                              "utm_source=x", "utm_c=1", f"z={rng.randint(0,9)}"])
                  for _ in range(n_params)]
        q = ("?" + "&".join(params)) if params else ""
        frag = rng.choice(["", "#top", "#s2"])
        urls.append(f"{scheme}://{host}{port}{path}{q}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in
           df.select(url_canonicalize(F.col("url")).alias("c")).collect()]
    assert got == [_py_canonicalize(u) for u in urls]


def test_html_to_text_random_model_parity(spark):
    """Seeded-random tag soup vs an independent Python re-based model."""
    import random
    import re as _re
    rng = random.Random(7)

    def py_model(h: str) -> str:
        s = _re.sub(r"(?s)<script[^>]*>.*?</script>", " ", h)
        s = _re.sub(r"(?s)<style[^>]*>.*?</style>", " ", s)
        s = _re.sub(r"<[^>]*>", " ", s)
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
            s = s.replace(ent, ch)
        return _re.sub(r"\s+", " ", s).strip()

    docs = []
    words = ["alpha", "beta", "&amp;", "&lt;q&gt;", "x", "42"]
    for _ in range(200):
        parts = []
        for _ in range(rng.randint(1, 8)):
            kind = rng.randint(0, 4)
            if kind == 0:
                parts.append(f"<script a='{rng.randint(0,9)}'>1<2; f();</script>")
            elif kind == 1:
                parts.append("<style>b{x:1}</style>")
            elif kind == 2:
                tag = rng.choice(["p", "div", "h1", "br/"])
                parts.append(f"<{tag}>")
            else:
                parts.append(rng.choice(words))
            parts.append(rng.choice([" ", "\n", "\t", ""]))
        docs.append("".join(parts))
    df = spark.createDataFrame([(d,) for d in docs], "html string")
    got = [r["t"] for r in
           df.select(html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [py_model(d) for d in docs]


# ---------------------------------------------------------------------
# C4 line filter + host-suffix blocklist + registrable domain
# ---------------------------------------------------------------------

from anomaly_detection_spark.functions.web import (  # noqa: E402
    c4_keep_lines, c4_line_keep, host_block_match, host_suffixes,
    registrable_domain)


@pytest.mark.parametrize("line,keep", [
    ("this line is fine.", True),
    ("short.", False),                      # < 3 words
    ("no terminal punctuation here", False),
    ("exclamations also count as terminal!", True),
    ('quoted endings count too"', True),
    ("question marks are terminal?", True),
    ("ends with a comma,", False),
    ("code block { x } stays out.", False),
    ("Please enable JavaScript to view.", False),
    ("three words suffice.", True),
])
def test_c4_line_keep_cases(spark, line, keep):
    assert _one(spark, c4_line_keep(F.lit(line))) is keep


def test_c4_keep_lines_filters_array(spark):
    lines = ["good line kept.", "bad", "also fine to keep!",
             "nope no punct", "js { }."]
    got = _one(spark, c4_keep_lines(
        F.array(*[F.lit(l) for l in lines])))
    assert got == ["good line kept.", "also fine to keep!"]


def test_c4_line_keep_min_words_parameter(spark):
    assert _one(spark, c4_line_keep(F.lit("two words."), min_words=2)) is True
    assert _one(spark, c4_line_keep(F.lit("two words."), min_words=3)) is False


@pytest.mark.parametrize("host,sfx", [
    ("a.b.example.com", ["a.b.example.com", "b.example.com", "example.com"]),
    ("example.com", ["example.com"]),
    ("localhost", []),
])
def test_host_suffixes(spark, host, sfx):
    assert _one(spark, host_suffixes(F.lit(host))) == sfx


def test_host_block_match_suffix_semantics(spark):
    bl = ["tracker.com", "ads.example.com"]
    # registrable-level rule blocks every subdomain
    assert _one(spark, host_block_match(F.lit("x.y.tracker.com"), bl)) == "tracker.com"
    assert _one(spark, host_block_match(F.lit("tracker.com"), bl)) == "tracker.com"
    # subdomain-scoped rule does NOT block siblings or the apex
    assert _one(spark, host_block_match(F.lit("ads.example.com"), bl)) == "ads.example.com"
    assert _one(spark, host_block_match(F.lit("cdn.example.com"), bl)) is None
    assert _one(spark, host_block_match(F.lit("example.com"), bl)) is None
    # no partial-label matches: nottracker.com must not match tracker.com
    assert _one(spark, host_block_match(F.lit("nottracker.com"), bl)) is None


@pytest.mark.parametrize("host,dom", [
    ("blog.example7.com", "example7.com"),
    ("example.com", "example.com"),
    ("single", "single"),
])
def test_registrable_domain(spark, host, dom):
    assert _one(spark, registrable_domain(F.lit(host))) == dom


def test_c4_random_model_parity(spark):
    """Seeded-random line arrays vs an independent Python model of the
    C4 keep rules, one Spark pass."""
    import random
    rng = random.Random(99)

    def py_keep(l: str) -> bool:
        words = [w for w in l.split(" ") if w]
        return (bool(l) and l[-1] in '.!?"' and len(words) >= 3
                and "{" not in l and "}" not in l
                and "javascript" not in l.lower())

    vocab = ["alpha", "beta", "gamma", "JavaScript", "x{y}", "q"]
    rows = []
    for _ in range(200):
        lines = []
        for _ in range(rng.randint(0, 6)):
            body = " ".join(rng.choice(vocab)
                            for _ in range(rng.randint(1, 5)))
            lines.append(body + rng.choice([".", "!", "?", '"', "", ","]))
        rows.append((lines,))
    df = spark.createDataFrame(rows, "lines array<string>")
    got = [r["k"] for r in
           df.select(c4_keep_lines(F.col("lines")).alias("k")).collect()]
    assert got == [[l for l in lines if py_keep(l)] for (lines,) in rows]
