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
