"""PII detection/redaction (functions/pii.py) and context-window chunking
(curation.chunk_token_windows) — planted-example exactness plus the
structural invariants chunking must keep (coverage, overlap, order)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import curation, pii


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        Row(id=1, text="write to bob@example.com or alice.smith+x@sub.dom.org now"),
        Row(id=2, text="server 10.1.2.33 gateway 192.168.0.1 bad 256.300.1 1.2.3.4.5"),
        Row(id=3, text="call 555-123-4567 ssn 123-45-6789 card 4111-1111-1111-0003"),
        Row(id=4, text="no pii here just words and numbers 12345 67-89"),
        Row(id=5, text="mixed a@b.co at 8.8.8.8 phone 212-555-0199"),
    ]
    return spark.createDataFrame(rows)


def test_pii_counts_planted(pii_df):
    got = {
        r["id"]: r
        for r in pii_df.select("id", *pii.pii_counts("text")).collect()
    }
    assert (got[1]["n_email"], got[1]["n_ipv4"]) == (2, 0)
    # 1.2.3.4.5: leftmost-first match consumes 1.2.3.4 — 3 total on row 2
    assert (got[2]["n_ipv4"], got[2]["n_email"]) == (3, 0)
    assert (got[3]["n_phone"], got[3]["n_ssn"], got[3]["n_card"]) == (1, 1, 1)
    assert all(got[4][f"n_{k}"] == 0 for k in pii.PII_PATTERNS)
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_phone"]) == (1, 1, 1)


def test_redaction_removes_every_match(pii_df):
    red = pii_df.select("id", pii.redact("text").alias("red"))
    counts = red.select(
        "id", *[pii.pii_count("red", k).alias(f"n_{k}") for k in pii.PII_PATTERNS]
    ).collect()
    for r in counts:
        for k in pii.PII_PATTERNS:
            assert r[f"n_{k}"] == 0, (r["id"], k)
    # category tokens present where the category matched
    r3 = red.filter("id = 3").collect()[0]["red"]
    assert "[PHONE]" in r3 and "[SSN]" in r3 and "[CARD]" in r3
    # non-PII text untouched
    r4 = red.filter("id = 4").collect()[0]["red"]
    assert r4 == "no pii here just words and numbers 12345 67-89"


def test_has_pii_routing(pii_df):
    flags = {r["id"]: r["f"] for r in
             pii_df.select("id", pii.has_pii("text").alias("f")).collect()}
    assert flags == {1: True, 2: True, 3: True, 4: False, 5: True}


def test_null_text_routes_to_exactly_one_writer(spark):
    """NULL text must be False (not NULL): otherwise filter(has_pii) and
    filter(~has_pii) BOTH drop the row and it vanishes from the split."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType([StructField("id", IntegerType()),
                         StructField("text", StringType())])
    df = spark.createDataFrame(
        [(1, "mail x@y.io"), (2, None), (3, "clean")], schema)
    flag = pii.has_pii("text")
    routed = df.filter(flag).count() + df.filter(~flag).count()
    assert routed == 3
    counts = df.select(*pii.pii_counts("text")).collect()
    assert all(r[f"n_{k}"] is not None for r in counts for k in pii.PII_PATTERNS)


def test_chunk_windows_cover_and_overlap(spark):
    # 10 tokens, chunk 4, overlap 1 → step 3 → chunks at 0,3,6 cover 0..9
    # with n_chunks = 1 + ceil((10-4)/3) = 3
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(f"t{i}" for i in range(10)))])
    ch = curation.chunk_token_windows(df, chunk_tokens=4, overlap=1) \
        .orderBy("chunk_id").collect()
    assert [c["chunk_id"] for c in ch] == [0, 1, 2]
    assert [c["chunk_tokens"] for c in ch] == [4, 4, 4]
    texts = [c["chunk_text"] for c in ch]
    assert texts[0] == "t0 t1 t2 t3"
    assert texts[1] == "t3 t4 t5 t6"          # 1-token overlap
    assert texts[2] == "t6 t7 t8 t9"
    # every token appears in some chunk
    seen = {t for c in texts for t in c.split()}
    assert seen == {f"t{i}" for i in range(10)}


def test_chunk_windows_short_and_exact(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b"),                       # shorter than chunk
        Row(doc_id=2, text=" ".join("x" * 1 for _ in range(8))),  # exact = 2*4
        Row(doc_id=3, text="   "),                       # whitespace only → dropped
    ])
    ch = curation.chunk_token_windows(df, chunk_tokens=4, overlap=0)
    got = {(r["doc_id"], r["chunk_id"]): r["chunk_tokens"] for r in ch.collect()}
    assert got == {(1, 0): 2, (2, 0): 4, (2, 1): 4}


def test_chunk_windows_no_shuffle_plan(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e")])
    plan = curation.chunk_token_windows(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a")])
    with pytest.raises(ValueError):
        curation.chunk_token_windows(df, chunk_tokens=4, overlap=4)


def test_no_pii_rule_in_fused_engine_pass(spark):
    """The no_pii rule through the REAL fused engine pass: planted PII docs
    produce exactly the expected (partition, rule_id, doc_id) violations
    with per-category counts in the detail."""
    from pyspark.sql import types as T

    from anomaly_detection_spark.engine import ValidationRun
    from anomaly_detection_spark.rules import builtin as B
    from anomaly_detection_spark.rules.core import RuleSet

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(T.StructType([
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]))),
        T.StructField("partition", T.StringType()),
    ])
    mk = lambda k, t, m, o: {"kind": k, "text": t, "media_ref": m, "offset": o}  # noqa: E731
    docs = spark.createDataFrame([
        ("d0", [mk("text", "clean words here", None, 0)], "p0"),
        ("d1", [mk("text", "mail me at spy@evil.com twice a@b.io", None, 0)], "p0"),
        ("d2", [mk("text", "exfil to", None, 0),
                mk("text", "10.0.0.5 now", None, 1)], "p1"),
        ("d3", [mk("image", None, "m1", 0)], "p1"),
    ], schema)
    catalog = spark.createDataFrame([("m1",)], ["media_ref"])
    rules = RuleSet(row_rules=[B.not_null("doc_id"), B.no_pii()],
                    dataset_rules=[B.referential()])
    res = ValidationRun(spark, docs, rules, media_catalog=catalog).run(resume=False)
    v = {(r["partition"], r["rule_id"], r["doc_id"]): r["detail"]
         for r in res.violations.collect()}
    assert set(v) == {("p0", "no_pii", "d1"), ("p1", "no_pii", "d2")}
    assert v[("p0", "no_pii", "d1")] == "card=0 ssn=0 phone=0 ipv4=0 email=2"
    # d2: the text spans concatenate ('exfil to 10.0.0.5 now') — the IP is
    # detected across the span boundary join
    assert "ipv4=1" in v[("p1", "no_pii", "d2")]


def test_chunk_windows_coverage_sweep(spark):
    """For every doc length 1..300 and overlap in {0, 4, 8} (chunk=16):
    chunk starts advance by exactly step, the last chunk reaches the final
    token, every chunk is full-size except possibly the last, and total
    emitted tokens equal n + overlap*(n_chunks-1) — the exact coverage
    algebra of sliding windows. One Spark job per overlap, no per-case
    round trips."""
    docs = spark.range(1, 301).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.col("id") - 1),
                        lambda i: F.concat(F.lit("t"), i.cast("string"))),
            " ").alias("text"),
    )
    for ov in (0, 4, 8):
        step = 16 - ov
        agg = (
            curation.chunk_token_windows(docs, chunk_tokens=16, overlap=ov)
            .groupBy("doc_id", "doc_tokens")
            .agg(F.count("*").alias("nc"),
                 F.sum("chunk_tokens").alias("emitted"),
                 F.max("chunk_id").alias("last_id"),
                 F.min("chunk_tokens").alias("min_ct"),
                 F.max("chunk_tokens").alias("max_ct"))
            .collect()
        )
        assert len(agg) == 300
        for r in agg:
            n = r["doc_tokens"]
            expect_nc = 1 if n <= 16 else 1 + -(-(n - 16) // step)
            assert r["nc"] == expect_nc, (n, ov)
            assert r["last_id"] == expect_nc - 1
            # total tokens emitted = n + overlap re-emissions
            assert r["emitted"] == n + ov * (expect_nc - 1), (n, ov)
            assert r["max_ct"] <= 16
            # last chunk always reaches the final token
            last_start = (expect_nc - 1) * step
            assert r["min_ct"] >= min(16, n - last_start)
