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
