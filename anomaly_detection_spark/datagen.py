"""Deterministic, distributed synthetic data for the validation engine.

Generates the engine-primary tables from FIXTURES.md §1:

* ``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>,
  partition string)`` — interleaved text+media documents with *planted,
  exactly-computable defects* (null/duplicate doc_id, dangling media_ref,
  null text on text spans, negative/duplicate/NULL offsets, empty spans, a
  span kind skewed to ~50% of all spans, and one partition with a drifted
  kind distribution). NULL offsets specifically exercise the Arrow
  int-with-nulls→float64-NaN path in the offsets UDF.
* ``media_catalog(media_ref string, media_kind string, size_bytes bigint)``.

Everything is built from ``spark.range`` + column expressions — no driver-side
row materialization — so the same generator scales from 1e3 test docs to
cluster-scale benchmark inputs. Determinism comes from ``xxhash64`` of the row
id (never ``rand()``, whose per-partition seeding is layout-dependent).

Reference semantics this replaces: the CERT-style CSV fixtures the reference
loads at ``/root/reference/anomaly_detection/preprocessors/data_loader.py:17-28``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Defect plant keys: doc ids where (id % DEFECT_MOD) equals one of these get
# the corresponding defect. Tests recompute expected violations from the same
# arithmetic, so the violation sets are exact.
DEFECT_MOD = 1000
NULL_DOC_ID = 17
DUP_DOC_ID = 23
DANGLING_REF = 31
NULL_TEXT = 37
NEG_OFFSET = 41
DUP_OFFSET = 43
EMPTY_SPANS = 47
NULL_OFFSET = 53
MOJIBAKE = 59

SPAN_KINDS = ["text", "image", "audio", "table"]


def _h(col: Column, salt: str) -> Column:
    """Deterministic uniform non-negative hash of a column (layout-independent)."""
    return F.abs(F.xxhash64(col.cast("string"), F.lit(salt)))


def _kind_expr(r: Column, drifted: Column) -> Column:
    """Span kind from a 0-99 draw; 'text' is deliberately skewed to ~50% of
    spans (the salting test target). The drifted partition shifts mass from
    'text' to 'image' (the PSI/KS drift test target)."""
    normal = (
        F.when(r < 50, F.lit("text"))
        .when(r < 75, F.lit("image"))
        .when(r < 90, F.lit("audio"))
        .otherwise(F.lit("table"))
    )
    shifted = (
        F.when(r < 20, F.lit("text"))
        .when(r < 70, F.lit("image"))
        .when(r < 90, F.lit("audio"))
        .otherwise(F.lit("table"))
    )
    return F.when(drifted, shifted).otherwise(normal)


def generate_documents(
    spark: SparkSession,
    n_docs: int = 2000,
    n_partitions: int = 8,
    n_media: int = 500,
    plant_defects: bool = True,
    drift_last_partition: bool = True,
    n_slices: int | None = None,
) -> DataFrame:
    """Build the interleaved documents table.

    ``partition`` is ``p0..p{n_partitions-1}``; the last one (``p{n-1}``) has
    a drifted span-kind distribution unless ``drift_last_partition=False``
    (pass False to produce the *baseline* snapshot for drift tests). Spans are
    stored in *scrambled* order for ~1/7 of docs so that offset-sorted
    sequence comparison is meaningful.
    """
    # n_slices controls physical parallelism of generation AND the file count
    # when written — a corpus written with too few slices caps downstream
    # scan-stage parallelism at the file count (local default = core count).
    base = (
        spark.range(0, n_docs, 1, n_slices) if n_slices
        else spark.range(n_docs)
    ).withColumnRenamed("id", "_id")
    part_idx = F.pmod(F.col("_id"), F.lit(n_partitions))
    drifted = (part_idx == n_partitions - 1) & F.lit(drift_last_partition)
    n_spans = (F.lit(1) + _h(F.col("_id"), "nspans") % 5).cast("int")
    if plant_defects:
        n_spans = F.when(
            F.pmod(F.col("_id"), DEFECT_MOD) == EMPTY_SPANS, F.lit(0)
        ).otherwise(n_spans)

    did = F.col("_id")
    spans = F.when(n_spans > 0, F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda idx: _span_for_index(did, idx, drifted, n_media, plant_defects),
    )).otherwise(F.array().cast(
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    ))
    # scramble storage order for ~1/7 of docs (sorting by offset must recover it)
    spans = F.when(F.pmod(did, 7) == 3, F.reverse(spans)).otherwise(spans)

    doc_id = F.concat(F.lit("d"), did.cast("string"))
    if plant_defects:
        mod = F.pmod(did, DEFECT_MOD)
        doc_id = (
            F.when(mod == NULL_DOC_ID, F.lit(None).cast("string"))
            .when(mod == DUP_DOC_ID, F.concat(F.lit("d"), (did - 1).cast("string")))
            .otherwise(doc_id)
        )

    return base.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        F.concat(F.lit("p"), part_idx.cast("string")).alias("partition"),
    )


def _span_for_index(did: Column, i: Column, drifted: Column, n_media: int,
                    plant_defects: bool) -> Column:
    span_seed = F.concat(did.cast("string"), F.lit(":"), i.cast("string"))
    r = _h(span_seed, "kind") % 100
    kind = _kind_expr(r, drifted)
    text_val = F.concat(
        F.lit("w"), (_h(span_seed, "t1") % 50).cast("string"),
        F.lit(" w"), (_h(span_seed, "t2") % 50).cast("string"),
        F.lit(" w"), (_h(span_seed, "t3") % 50).cast("string"),
    )
    media_ref = F.concat(F.lit("m"), (_h(span_seed, "ref") % n_media).cast("string"))
    offset = i.cast("int")
    if plant_defects:
        mod = F.pmod(did, DEFECT_MOD)
        text_val = F.when((mod == NULL_TEXT) & (i == 0), F.lit(None).cast("string")).otherwise(text_val)
        # mojibake plant: every text span of the doc carries one C0 control
        # char (so the doc fires text_encoding_clean whenever it has any
        # text span at all, regardless of which span indexes drew 'text')
        text_val = F.when(
            mod == MOJIBAKE, F.concat(text_val, F.lit("\x07"))
        ).otherwise(text_val)
        media_ref = F.when(
            (mod == DANGLING_REF) & (i == 0),
            F.concat(F.lit("missing_"), did.cast("string")),
        ).otherwise(media_ref)
        offset = (
            F.when((mod == NEG_OFFSET) & (i == 0), F.lit(-1))
            .when((mod == DUP_OFFSET) & (i == 1), F.lit(0))
            .when((mod == NULL_OFFSET) & (i == 0), F.lit(None))
            .otherwise(i)
            .cast("int")
        )
    return F.struct(
        kind.alias("kind"),
        F.when(kind == "text", text_val).otherwise(F.lit(None).cast("string")).alias("text"),
        F.when(kind != "text", media_ref).otherwise(F.lit(None).cast("string")).alias("media_ref"),
        offset.alias("offset"),
    )


def generate_media_catalog(spark: SparkSession, n_media: int = 500) -> DataFrame:
    """Referential dimension table (≈ the reference's LDAP org dimension,
    ``/root/reference/anomaly_detection/preprocessors/user_profile_builder.py:25``)."""
    return spark.range(n_media).select(
        F.concat(F.lit("m"), F.col("id").cast("string")).alias("media_ref"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video"), F.lit("table")),
            (F.abs(F.xxhash64(F.col("id"), F.lit("mk"))) % 4 + 1).cast("int"),
        ).alias("media_kind"),
        (F.abs(F.xxhash64(F.col("id"), F.lit("sz"))) % 1_000_000).alias("size_bytes"),
    )
