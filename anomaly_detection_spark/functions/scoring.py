"""Model-based document scoring for training-data curation: a hashed
bag-of-words linear classifier (the public fastText / GPT-3-quality-filter
formulation: logistic regression over hashed token features) and DSIR
importance weights (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling": per-document log importance = Σ over hashed
features of log(p_target(b) / p_raw(b))).

The reference pipeline scores rows only with hand-written rules; a
web-scale curation engine also needs MODEL scores — "keep what looks like
the target distribution" — which at 100 TB must run as scan-speed row
logic, not a model server. Both operators here reduce to that:

* feature hashing is ``conv(substring(md5(token),1,8),16,10) % D`` —
  deterministic, non-negative, bit-identical in DuckDB
  (``('0x' || substr(md5(t),1,8))::BIGINT % D``), no UDF;
* classifier weights are a bounded literal vector compiled into the plan
  (a trained model's weights drop into the same slot — at 64..1M buckets
  a literal array / broadcast map, never a join against the corpus);
* scoring is an in-row ``aggregate`` over the token array — zero explode,
  zero shuffle, whole-stage codegen end-to-end;
* DSIR's raw-corpus feature distribution is ONE map-side-combined
  hash-agg to D rows, broadcast back as a 1-row map (the only shuffle,
  and it is D-bounded); per-token log-ratios are floored to integer
  MICRO units before the per-doc sum, so the aggregate is an
  order-independent BIGINT sum that can never hash-flip cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import text


def token_bucket(tok: Column, n_buckets: int) -> Column:
    """Hashed feature bucket of one token: first 8 md5 hex digits as an
    integer, mod ``n_buckets`` — non-negative, so Spark ``%`` and DuckDB
    ``%`` agree."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def hashed_linear_logit_micro(
    toks: Column, weights_micro: list[int]
) -> Column:
    """Un-normalized linear score of a token array under a hashed
    bag-of-words model: Σ_tokens W[bucket(token)], with W a literal
    integer-micro weight vector (len(W) = bucket count). Pure in-row
    codegen — the per-token md5 binds to the lambda variable, so
    CollapseProject has nothing to re-inline."""
    warr = F.array(*[F.lit(int(w)) for w in weights_micro])
    d = len(weights_micro)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(warr, (token_bucket(t, d) + 1).cast("int")).cast("long"),
    )


def classify_quality(
    docs: DataFrame,
    weights_micro: list[int],
    threshold_micro_per_token: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document hashed-linear quality score and keep decision.

    ``keep`` compares the raw weight SUM against
    ``threshold × token_count`` in exact integers (equivalent to
    mean-pooled-logit ≥ threshold, with no integer division whose
    negative-operand semantics differ across engines). Output:
    ``(id, n_toks, logit_sum_micro, keep)`` with keep as 0/1 INT."""
    toks = text.tokens(F.col(text_col))
    s = hashed_linear_logit_micro(toks, weights_micro)
    n = F.size(toks).cast("long")
    return docs.select(
        F.col(id_col),
        n.alias("n_toks"),
        s.alias("logit_sum_micro"),
        (s >= F.lit(int(threshold_micro_per_token)) * n)
        .cast("int")
        .alias("keep"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target_counts: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR log importance weight per document, in integer micro units.

    ``target_counts[b]`` is the target-domain count of hashed feature
    bucket ``b`` (a bounded literal — in production the target sample is
    small by construction). The raw-corpus counts come from pass 1, a
    hash-agg to ``D = len(target_counts)`` rows broadcast back as a 1-row
    map; pass 2 scores each document in-row:

        lr_micro(b) = floor(ln( (tgt_b+1)(raw_total+D)
                                / (tgt_total+D)(raw_b+1) ) · 1e6 + ½)
        dsir_logw_micro = Σ_tokens lr_micro(bucket(token))

    Add-1 smoothing keeps every bucket finite; the integer numerator /
    denominator are built in BIGINT and divided once as doubles, so both
    engines feed ``ln`` the identical IEEE value. Documents with no
    tokens score 0."""
    d = len(target_counts)
    tgt_total = int(sum(target_counts))
    tgt_arr = F.array(*[F.lit(int(t)) for t in target_counts])

    base = docs.select(
        F.col(id_col), text.tokens(F.col(text_col)).alias("toks")
    )
    raw = (
        base.select(F.explode("toks").alias("t"))
        .select(token_bucket(F.col("t"), d).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("cnt"))
    )
    raw_row = raw.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b"), F.col("cnt")))
        ).alias("raw_map"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("raw_total"),
    )

    def lr_micro(b: Column) -> Column:
        tgt_b = F.element_at(tgt_arr, (b + 1).cast("int")).cast("long")
        raw_b = F.coalesce(
            F.element_at(F.col("raw_map"), b), F.lit(0)
        ).cast("long")
        num = (tgt_b + 1) * (F.col("raw_total") + F.lit(d))
        den = F.lit(tgt_total + d).cast("long") * (raw_b + 1)
        return F.floor(
            F.log(num.cast("double") / den.cast("double"))
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long")

    return (
        base.crossJoin(F.broadcast(raw_row))
        .select(
            F.col(id_col),
            F.size("toks").cast("long").alias("n_toks"),
            F.aggregate(
                F.col("toks"),
                F.lit(0).cast("long"),
                lambda acc, t: acc + lr_micro(token_bucket(t, d)),
            ).alias("dsir_logw_micro"),
        )
    )


def gumbel_topk_resample(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_micro_col: str = "dsir_logw_micro",
    seed: str = "gumbel",
) -> DataFrame:
    """Sample ``k`` rows without replacement with probability ∝ exp(log
    weight) — the Gumbel-top-k trick (Efraimidis–Spirtakis weighted
    reservoir, Gumbel-max form; the resampling half of DSIR): rank by
    ``log w_i + G_i`` with ``G_i = −ln(−ln(u_i))`` and take the top k.

    ``u_i`` is the md5-uniform of ``seed:id`` — deterministic, so the
    "sample" is reproducible across runs and engines (no ``rand()``).
    The selection is a global top-k, which Spark executes as
    TakeOrderedAndProject: per-partition partial top-k, k rows to the
    driver stage — no global sort, no single-partition window over the
    corpus. Ranks are assigned AFTER the limit, over k rows only.
    Output: ``(rank, id, logw_micro, gumbel_key_micro)``; ties break on
    ascending id."""
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.col(logw_micro_col).cast("double") / F.lit(1000000.0) - F.log(
        -F.log(u)
    )
    key_micro = F.floor(key * F.lit(1000000.0) + F.lit(0.5)).cast("long")

    top = (
        weighted.select(
            F.col(id_col),
            F.col(logw_micro_col),
            key_micro.alias("gumbel_key_micro"),
        )
        .orderBy(F.col("gumbel_key_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("gumbel_key_micro").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, logw_micro_col, "gumbel_key_micro"
    )
