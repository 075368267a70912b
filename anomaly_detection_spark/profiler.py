"""Column-stats profiler: one aggregation pass per table.

≈ the reference's per-user profile building
(``user_profile_builder.py:22-59``, ``time_analyzer.py:40-54``) — per-entity
histograms, means/stds, distinct sets — generalized to per-partition column
statistics computed by a SINGLE ``groupBy(partition).agg(...)`` (operators
A1–A6, A10 in SURVEY.md §2.4):

* count, null_count/null_rate per column
* min / max
* ``approx_count_distinct`` (HyperLogLog) — exact countDistinct is optional
* ``percentile_approx`` for numeric columns
* span-level stats after ``explode(spans)``: per-kind counts — the skewed
  aggregation, available in salted two-phase form (north_rule).

All metrics for all columns land in one wide row per partition, then melt to
a long (partition, column, metric, value) frame — one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    partition_col: str = "partition",
    percentiles: tuple[float, ...] = (0.5, 0.95),
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format per-partition column stats:
    ``(partition, column, metric, value double, value_str string)``."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [c for c in df.columns if c != partition_col]

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        dt = schema[c]
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls__{c}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(c).alias(f"__min__{c}"))
            aggs.append(F.max(c).alias(f"__max__{c}"))
            if exact_distinct:
                aggs.append(F.countDistinct(c).alias(f"__dist__{c}"))
            else:
                aggs.append(F.approx_count_distinct(c).alias(f"__dist__{c}"))
            for q in percentiles:
                aggs.append(
                    F.percentile_approx(c, q).alias(f"__p{int(q * 100)}__{c}")
                )
        elif isinstance(dt, (T.StringType, T.TimestampType, T.DateType, T.BooleanType)):
            aggs.append(F.min(F.col(c).cast("string")).alias(f"__mins__{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"__maxs__{c}"))
            if exact_distinct:
                aggs.append(F.countDistinct(c).alias(f"__dist__{c}"))
            else:
                aggs.append(F.approx_count_distinct(c).alias(f"__dist__{c}"))
        elif isinstance(dt, T.ArrayType):
            aggs.append(F.avg(F.size(c)).alias(f"__avglen__{c}"))
            aggs.append(F.max(F.size(c)).alias(f"__maxlen__{c}"))

    wide = df.groupBy(F.col(partition_col).alias("partition")).agg(*aggs)

    # melt: one stack expression — still a single pass over the tiny wide frame
    pairs = []
    for f in wide.schema.fields:
        if not f.name.startswith("__"):
            continue
        if f.name == "__rows":
            pairs.append(("_table_", "rows", f.name, False))
            continue
        tag, col = f.name[2:].split("__", 1)
        metric = {
            "nulls": "null_count", "min": "min", "max": "max",
            "mins": "min", "maxs": "max", "dist": "approx_distinct",
            "avglen": "avg_length", "maxlen": "max_length",
        }.get(tag, tag.replace("p", "p", 1))
        if tag.startswith("p") and tag[1:].isdigit():
            metric = f"p{tag[1:]}"
        is_str = tag in ("mins", "maxs")
        pairs.append((col, metric, f.name, is_str))

    stack_expr = ", ".join(
        f"'{col}', '{metric}', "
        + (f"CAST(NULL AS DOUBLE), CAST(`{name}` AS STRING)" if is_str
           else f"CAST(`{name}` AS DOUBLE), CAST(NULL AS STRING)")
        for col, metric, name, is_str in pairs
    )
    n = len(pairs)
    long = wide.selectExpr(
        "partition",
        f"stack({n}, {stack_expr}) as (column, metric, value, value_str)",
    )
    # null_rate derives from null_count and rows without a second scan
    rows = wide.select("partition", F.col("__rows").alias("__rows"))
    rates = (
        long.filter(F.col("metric") == "null_count")
        .join(rows, "partition")
        .select(
            "partition", "column", F.lit("null_rate").alias("metric"),
            (F.col("value") / F.col("__rows")).alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        )
    )
    return long.unionByName(rates)


def mergeable_profile(
    df: DataFrame,
    numeric_cols: list[str],
    partition_col: str = "partition",
    scale: int = 100,
) -> DataFrame:
    """Per-(partition, column) MERGEABLE statistics sketch: everything an
    incremental validation needs to combine profiles across snapshots
    WITHOUT rescanning old data. One ``groupBy(partition)`` pass emits, per
    numeric column, the exact-integer power sums

    ``(n, n_null, sum_s, sum_sq_s, min_v, max_v)``

    where ``sum_s = Σ round(x·scale)`` and ``sum_sq_s = Σ round(x·scale)²``
    as longs — associative, commutative, exact (no float accumulation
    order), so profiles of snapshot commits add like vectors. mean / var
    derive closed-form AFTER merging (SURVEY.md W8 discipline). The
    snapshot analogue of the reference's run-over-run history accumulation
    (``risk_history_tracker.py:103-161``) but for column stats: each commit
    profiles only its appended files, the table-lifetime profile is a
    metadata-sized merge.

    Long format: (partition, column, n, n_null, sum_s, sum_sq_s, min_v,
    max_v); ``scale`` quantizes doubles to exact integers (cents by
    default). sum_sq overflows long at Σx² · scale² > 9.2e18 — use
    DECIMAL(38) via ``scale=1`` plus pre-scaled inputs if a column's
    magnitude demands it."""
    aggs = []
    for c in numeric_cols:
        q = F.round(F.col(c) * scale).cast("long")
        aggs += [
            F.count(c).alias(f"__n__{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn__{c}"),
            F.coalesce(F.sum(q), F.lit(0)).alias(f"__s__{c}"),
            F.coalesce(F.sum(q * q), F.lit(0)).alias(f"__q__{c}"),
            F.min(q).alias(f"__mn__{c}"),
            F.max(q).alias(f"__mx__{c}"),
        ]
    wide = df.groupBy(F.col(partition_col).alias("partition")).agg(*aggs)
    n = len(numeric_cols)
    stack = ", ".join(
        f"'{c}', `__n__{c}`, `__nn__{c}`, `__s__{c}`, `__q__{c}`, "
        f"`__mn__{c}`, `__mx__{c}`"
        for c in numeric_cols
    )
    return wide.selectExpr(
        "partition",
        f"stack({n}, {stack}) as "
        "(column, n, n_null, sum_s, sum_sq_s, min_v, max_v)",
    )


def merge_profiles(*profiles: DataFrame) -> DataFrame:
    """Merge any number of ``mergeable_profile`` frames (one per snapshot
    commit) into the table-lifetime profile: counts and power sums add,
    min/max fold — a groupBy over METADATA-sized rows (partitions ×
    columns), no data rescan. The result is bit-identical to profiling the
    unioned data directly (pinned in tests), which is the property that
    makes appends-only incremental profiling sound."""
    allp = profiles[0]
    for p in profiles[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy("partition", "column").agg(
        F.sum("n").alias("n"),
        F.sum("n_null").alias("n_null"),
        F.sum("sum_s").alias("sum_s"),
        F.sum("sum_sq_s").alias("sum_sq_s"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def key_skew(
    df: DataFrame,
    key_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Heavy-hitter / skew diagnostic for a grouping key — the pre-flight
    check the north_rule's "salted aggregation for skewed span kinds"
    decision needs: per hot key its row count and exact integer ppm share
    of the table, plus the key-space size for context.

    Scale shape: ONE map-side-combined count agg on the key (the same
    shuffle any groupBy on that key would pay — this is the measurement of
    that shuffle's skew), a two-value global agg over the key-cardinality
    frame, then ``TakeOrderedAndProject`` for the top-k (never a global
    sort). The rank window runs over the already-limited k rows only.
    All arithmetic is int64: ``cnt * 1_000_000 DIV total`` is exact while
    cnt < 2^63/10^6 ≈ 9.2e12 rows per key — documented bound, far past any
    real key.

    Returns ``(key, cnt, share_ppm, n_keys, rank)``, rank 1 = hottest,
    ties broken by key ascending (deterministic across engines).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.expr("(cnt * 1000000) DIV _total").alias("share_ppm"),
            "n_keys",
        )
        .withColumn("rank", F.row_number().over(w))
    )


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


#: format-suggestion vocabulary, most-specific first: the first pattern
#: covering EVERY non-null value of a string column becomes a suggested
#: matches_regex contract. Conservative regex syntax (portable to RE2).
FORMAT_PATTERNS = [
    ("iso_date", "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("integer", "^-?[0-9]+$"),
    ("decimal", "^-?[0-9]+\\.[0-9]+$"),
    ("lower_alpha", "^[a-z]+$"),
    ("alnum", "^[A-Za-z0-9]+$"),
]


def suggest_rules(
    df: DataFrame,
    columns: list[str] | None = None,
    isin_max: int = 8,
) -> DataFrame:
    """Constraint suggestion (the Deequ ``ConstraintSuggestionRunner``
    surface): profile the table once, emit the rule the evidence supports
    per column — ``not_null`` when a column is fully populated (else
    ``min_completeness_ppm`` with the observed exact-integer floor),
    ``unique`` when non-null values are distinct, ``in_range [min,max]``
    for integral columns, ``isin v1|v2|...`` when the exact cardinality is
    ≤ ``isin_max``.

    Scale shape: pass 1 is ONE distributed agg (count / null-count / exact
    distinct / min-max per column, map-side combined); its single result
    row lands on the driver — O(columns), the same driver-side suggestion
    assembly Deequ does. Pass 2 collects the value sets ONLY for columns
    pass 1 proved low-cardinality (≤ isin_max), so no unbounded
    ``collect_set`` ever runs on a high-cardinality column. Exact
    ``countDistinct`` is used because the isin/unique decisions must be
    deterministic (swap in ``approx_count_distinct`` + a margin when
    suggesting over a full 100 TB snapshot is not required to be
    reproducible).

    Returns ``(column, rule, param)`` — all strings, engine-portable.
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = list(df.columns)

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}"))
        aggs.append(F.countDistinct(c).alias(f"d_{c}"))
        if isinstance(schema[c], _INTEGRAL):
            aggs.append(F.min(c).cast("long").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("long").alias(f"mx_{c}"))
        if isinstance(schema[c], T.StringType):
            for pname, rx in FORMAT_PATTERNS:
                aggs.append(F.sum(F.col(c).rlike(rx).cast("long"))
                            .alias(f"fmt_{pname}_{c}"))
    stats = df.agg(*aggs).collect()[0].asDict()
    rows = stats["__rows"]

    low_card = [
        c for c in columns if 0 < stats[f"d_{c}"] <= isin_max
    ]
    values: dict[str, str] = {}
    if low_card:
        vals = df.agg(*[
            F.array_join(F.array_sort(F.collect_set(c)), "|").alias(c)
            for c in low_card
        ]).collect()[0].asDict()
        values = {c: vals[c] for c in low_card}

    out: list[tuple[str, str, str]] = []
    for c in columns:
        nn = rows - stats[f"n_{c}"]
        if rows > 0 and stats[f"n_{c}"] == 0:
            out.append((c, "not_null", ""))
        elif rows > 0:
            out.append((c, "min_completeness_ppm",
                        str(nn * 1_000_000 // rows)))
        if nn > 0 and stats[f"d_{c}"] == nn:
            out.append((c, "unique", ""))
        if isinstance(schema[c], _INTEGRAL) and nn > 0:
            out.append((c, "in_range",
                        f"[{stats[f'mn_{c}']},{stats[f'mx_{c}']}]"))
        if c in values:
            out.append((c, "isin", values[c]))
        elif isinstance(schema[c], T.StringType) and nn > 0:
            # most-specific fully-covering format becomes a contract;
            # skipped when isin already pins the exact value set
            for pname, rx in FORMAT_PATTERNS:
                if stats[f"fmt_{pname}_{c}"] == nn:
                    out.append((c, "matches_regex", rx))
                    break

    spark = df.sparkSession
    return spark.createDataFrame(
        out, schema="column string, rule string, param string"
    )


def span_kind_counts(
    docs: DataFrame,
    partition_col: str = "partition",
    spans_col: str = "spans",
    salt_buckets: int | None = None,
) -> DataFrame:
    """Per-(partition, kind) span counts — the skewed aggregation ('text' is
    ~50% of spans in the fixture).

    ``salt_buckets=None`` → plain hash agg (Catalyst already map-side
    combines, so the skewed key ships one partial row per map task).
    ``salt_buckets=S`` → explicit two-phase salted agg per north_rule:
    pre-aggregate on (partition, kind, salt) then finalize on (partition,
    kind); provably equivalent (tested) and robust if the first phase ever
    uses non-combinable aggregates.
    """
    # explode the kind field array, not the full span structs: field access
    # (GetArrayStructFields) keeps parquet nested-schema pruning, so this
    # scan reads ONLY spans.kind — no text/media payload decode (plan-pinned)
    ex = docs.select(
        F.col(partition_col).alias("partition"),
        F.explode(F.col(f"{spans_col}.kind")).alias("kind"),
    )
    if not salt_buckets:
        return ex.groupBy("partition", "kind").agg(F.count("*").alias("span_count"))
    # monotonically_increasing_id is sequential within each task, so pmod
    # alone spreads rows across salts evenly — hashing it first is wasted
    # work (a salt only needs spread, not layout-independence)
    salted = ex.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy("partition", "kind", "_salt").agg(
        F.count("*").alias("_c")
    )
    return partial.groupBy("partition", "kind").agg(F.sum("_c").alias("span_count"))


def content_fingerprint(
    df: DataFrame,
    cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Per-column CONTENT fingerprint: a KMV (k-minimum-values) sketch of
    each column's distinct values — the k lexicographically smallest md5
    hashes, collapsed to one digest string. Two columns whose value SETS
    are equal get equal digests regardless of column name, row order, or
    physical layout, so joining two snapshots' fingerprint frames on
    ``sketch`` detects RENAMED columns (schema_match sees a drop + an add;
    this sees the move). The k surviving hashes are also the standard KMV
    distinct-count estimator if a caller wants one.

    Plan at 10^12 rows: ONE scan — ``stack`` unpivots the selected columns
    to (column, hash) rows in place — then ONE hash agg dedupes the pairs
    (repeated values collapse map-side), then each column's k smallest
    survive via the engine's skew-safe two-phase top-k
    (``engine.cap_violations`` — phase 1 ranks within (column, salt) so a
    high-cardinality column never lands in a single window task), and md5
    collapses the sorted survivors. No collect_set of unbounded distincts,
    no global sort.

    Output: ``(column, n_kept, sketch)`` — one row per input column.

    Reference analogue: the reference matches log layouts positionally and
    breaks silently on renames (data_loader.py hard-codes column lists);
    this is the content-addressed alternative."""
    from anomaly_detection_spark.engine import cap_violations

    stack_args = ", ".join(
        f"'{c}', md5(CAST(`{c}` AS STRING))" for c in cols)
    pairs = (
        df.select(F.expr(
            f"stack({len(cols)}, {stack_args}) AS (partition, doc_id)"))
        .where(F.col("doc_id").isNotNull())
        .distinct()
        .select("partition", F.lit("kmv").alias("rule_id"),
                "doc_id", F.lit("").alias("detail"))
    )
    kept = cap_violations(pairs, int(k))
    return kept.groupBy(F.col("partition").alias("column")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(F.concat_ws(",", F.array_sort(F.collect_list("doc_id"))))
        .alias("sketch"),
    )


def correlation_matrix(
    df: DataFrame,
    cols: dict[str, "F.Column"],
    partition_col: str | None = None,
) -> DataFrame:
    """All-pairs Pearson correlation over k integer-valued columns in ONE
    aggregation pass: ``(col_x, col_y, n, corr_micro)`` for each of the
    k(k-1)/2 unordered pairs (plus ``partition`` when ``partition_col``
    is given) — the numeric-relationship panel of a profiling report.

    ``cols`` maps output names to INTEGER-valued Column expressions
    (e.g. cents via ``floor(x*100+0.5)``): every power sum — k sums,
    k square-sums, k(k-1)/2 cross-sums — accumulates as decimal(38,0)
    (order-independent exact integer addition, DuckDB HUGEINT), so a
    10^12-row input still yields a bit-identical correlation. The
    closing ``num/(sqrt·sqrt)`` per pair uses only correctly-rounded
    IEEE ops; ``corr_micro = floor(r*1e6+0.5)`` is engine-portable.

    Plan shape: one hash agg (map-side combined) producing a SINGLE row
    (or one per partition) of 1+2k+k(k-1)/2 sums; the pair matrix is a
    driver-free ``stack`` over that row. The input is read ONCE for all
    pairs — k=20 columns is 190 correlations for the price of one scan,
    where the naive per-pair ``df.corr`` would scan 190 times.

    Reference analogue: ``statistical_analyzer.py`` pairwise feature
    correlation screens, made single-pass and exact.

    Factored as ``correlation_from_sums(correlation_sums(...))`` — the
    sums half is MERGEABLE (see ``merge_correlation_sums``), so
    appends-only snapshots keep a lifetime correlation panel without
    rescanning old commits.
    """
    return correlation_from_sums(
        correlation_sums(df, cols, partition_col), list(cols),
        partition_col)


def correlation_sums(
    df: DataFrame,
    cols: dict[str, "F.Column"],
    partition_col: str | None = None,
) -> DataFrame:
    """The mergeable half of ``correlation_matrix``: one hash agg of the
    exact decimal(38,0) power sums — ``_n``, ``_s_<c>``, ``_ss_<c>``,
    ``_sp_<a>__<b>`` (one row, or one per partition). Every field is an
    order-independent integer SUM, so per-commit frames fold exactly
    (``merge_correlation_sums``); products run in decimal(19) so they
    stay exactly representable in the decimal(38) accumulator
    (|x| < 1e19 → |x·y| < 1e38)."""
    names = list(cols)
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]

    def d38(c):
        return c.cast("decimal(38,0)")

    def d19(c):
        return c.cast("decimal(19,0)")

    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    for a in names:
        aggs.append(F.sum(d38(cols[a])).alias(f"_s_{a}"))
        aggs.append(F.sum(d19(cols[a]) * d19(cols[a])).alias(f"_ss_{a}"))
    for a, b in pairs:
        aggs.append(F.sum(d19(cols[a]) * d19(cols[b])).alias(f"_sp_{a}__{b}"))

    grouped = df.groupBy(partition_col) if partition_col else df.groupBy()
    return grouped.agg(*aggs)


def merge_correlation_sums(*sums: DataFrame) -> DataFrame:
    """Fold per-commit ``correlation_sums`` frames into the
    whole-snapshot sums WITHOUT rescanning data — integer sums add, so
    the merged correlation panel is bit-identical to recomputing over
    the unioned rows (pinned by test). Global (partition-less) frames
    merge via a constant key. Metadata-sized work only."""
    import functools

    unioned = functools.reduce(lambda a, b: a.unionByName(b), sums)
    keys = [c for c in unioned.columns if not c.startswith("_")]
    grouped = unioned.groupBy(*keys) if keys else unioned.groupBy()
    return grouped.agg(*[
        F.sum(c).cast("decimal(38,0)").alias(c)
        for c in unioned.columns if c.startswith("_")
    ])


def correlation_from_sums(
    wide: DataFrame,
    names: list[str],
    partition_col: str | None = None,
) -> DataFrame:
    """Close a ``correlation_sums`` frame into the
    ``(col_x, col_y, n, corr_micro)`` panel — correctly-rounded IEEE ops
    over exact integer sums, engine-portable micro units."""
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]
    n = F.col("_n")
    for a, b in pairs:
        num = (n * F.col(f"_sp_{a}__{b}")
               - F.col(f"_s_{a}") * F.col(f"_s_{b}")).cast("double")
        dx = (n * F.col(f"_ss_{a}")
              - F.col(f"_s_{a}") * F.col(f"_s_{a}")).cast("double")
        dy = (n * F.col(f"_ss_{b}")
              - F.col(f"_s_{b}") * F.col(f"_s_{b}")).cast("double")
        # a constant column has dx (or dy) = 0: correlation is undefined,
        # surfaced as NULL corr_micro instead of an ANSI DIVIDE_BY_ZERO
        # that would kill the whole profiling job.
        r = F.when((dx > 0) & (dy > 0),
                   num / (F.sqrt(dx) * F.sqrt(dy)))
        wide = wide.withColumn(
            f"_r_{a}__{b}",
            F.floor(r * F.lit(1e6) + F.lit(0.5)).cast("long"))

    stack_args = ", ".join(
        f"'{a}', '{b}', `_r_{a}__{b}`" for a, b in pairs)
    keep = ([F.col(partition_col)] if partition_col else []) + [
        F.col("_n").cast("long").alias("n")]
    return wide.select(
        *keep,
        F.expr(f"stack({len(pairs)}, {stack_args})"
               " AS (col_x, col_y, corr_micro)"),
    ).select(*(
        ([partition_col] if partition_col else [])
        + ["col_x", "col_y", "n", "corr_micro"]
    ))


def frequent_values(
    df: DataFrame,
    cols: list[str],
    k: int = 5,
    salt_buckets: int = 16,
) -> DataFrame:
    """Top-k most frequent values per column in ONE scan:
    ``(column, value, cnt, rank)`` — the heavy-hitters panel of a
    profiling report (dominant categories, default-value takeover,
    placeholder flooding). NULLs are excluded (null_rate is its own
    profile metric); values render as strings so any column type fits
    one output frame. Deterministic tie-break: count DESC, value ASC.

    Plan: stack-unpivot to (column, value) — fan-out = #cols, one
    narrow stage — then ONE map-side-combined count agg, then the
    skew-safe two-phase top-k (the ``engine.cap_violations``
    discipline): a 10^12-distinct column (doc_id-like) never lands in a
    single window task, because phase 1 ranks within (column,
    hash-salt) and phase 2 only sees ≤ salt_buckets × k survivors per
    column. Correct because every global top-k row is necessarily in
    its salt slice's top-k.

    Reference analogue: statistical_analyzer.py value_counts screens.
    """
    from pyspark.sql.window import Window

    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols)
    counts = (
        df.select(F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, value)"))
        .filter(F.col("value").isNotNull())
        .groupBy("column", "value").agg(F.count(F.lit(1)).alias("cnt"))
    )
    order = [F.desc("cnt"), F.asc("value")]
    salt = F.pmod(F.xxhash64("value"), F.lit(salt_buckets))
    w_local = Window.partitionBy("column", "_s").orderBy(*order)
    w_final = Window.partitionBy("column").orderBy(*order)
    pruned = (
        counts.withColumn("_s", salt)
        .withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= int(k))
        .drop("_s", "_r")
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= int(k))
        .select("column", "value", "cnt", "rank")
    )


def json_key_profile(
    df: DataFrame,
    json_col: str,
    partition_col: str | None = None,
) -> DataFrame:
    """Schema discovery for a semi-structured JSON-string column: one
    row per top-level key — ``(key, n, n_int, n_bool, n_null,
    n_other, vmin, vmax)`` — plus a ``__invalid__`` row counting
    non-NULL strings that don't parse as a JSON object at all. The
    ingestion question "what's actually inside props?" answered from
    ONE scan, before anyone hard-codes a schema.

    Values parse via ``from_json(map<string,string>)`` (flat view:
    nested objects/arrays land in n_other — by design, this profiles
    the top level); type classes by anchored regex on the rendered
    value, numeric envelope (vmin/vmax) over the integer-typed values
    only. Key cardinality bounds the output, not row count; one
    explode + one map-side-combined agg, no window, no UDF.

    Reference analogue: data_loader.py's hard-coded per-log column
    lists — this is the discovery pass that makes them unnecessary.
    """
    src = df.select(
        *( [F.col(partition_col).alias("partition")] if partition_col else [] ),
        F.col(json_col).alias("_raw"),
        F.from_json(F.col(json_col), "map<string,string>").alias("_m"),
    )
    keys = ["partition"] if partition_col else []
    exploded = src.select(
        *keys,
        F.isnull("_m").alias("_bad"),
        F.explode_outer("_m").alias("key", "_v"),
        F.col("_raw"),
    ).withColumn(
        "key",
        # explode_outer emits one null row for BOTH an empty map (valid
        # "{}" — drop it) and a null map (unparseable — only then is the
        # record invalid); _bad keeps the two apart
        F.when(F.col("key").isNotNull(), F.col("key"))
        .when(F.col("_bad") & F.col("_raw").isNotNull(),
              F.lit("__invalid__"))
    ).filter(F.col("key").isNotNull())
    is_int = F.col("_v").rlike("^-?[0-9]+$")
    is_bool = F.col("_v").isin("true", "false")
    is_null = F.col("_v").isNull() & (F.col("key") != "__invalid__")
    return exploded.groupBy(*keys, "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(is_int.cast("long")).alias("n_int"),
        F.sum(is_bool.cast("long")).alias("n_bool"),
        F.sum(is_null.cast("long")).alias("n_null"),
        F.sum((~(is_int | is_bool) & F.col("_v").isNotNull())
              .cast("long")).alias("n_other"),
        F.min(F.when(is_int, F.col("_v").cast("long"))).alias("vmin"),
        F.max(F.when(is_int, F.col("_v").cast("long"))).alias("vmax"),
    )


def fd_mine(df: DataFrame, columns: list[str],
            budget_ppm: int = 0) -> DataFrame:
    """Approximate functional-dependency DISCOVERY over every ordered
    pair of candidate columns — the mining counterpart of the
    ``functional_dependency`` rule (which verifies ONE given FD). For
    each pair A→B it computes the g3 violation measure: the minimum
    number of rows to delete for the FD to hold exactly, i.e.
    ``n_rows − Σ_a max_b count(a,b)``, as exact-integer ppm. Pairs with
    ``violation_ppm ≤ budget_ppm`` are marked discovered; feed them to
    ``rules/builtin.functional_dependency`` to enforce on later commits
    (profile → suggest → enforce, the learned-rule loop).

    Scale shape: ONE corpus scan — a ``stack`` projection fans each row
    into |pairs| (det_col, dep_col, det_val, dep_val) tuples, then two
    map-side-combinable hash aggs (pair-value counts → per-determinant
    max) and a |pairs|-row rollup. No join, no per-pair re-scan; shuffle
    volume is |pairs| × distinct-pair-values, not |pairs| × rows.
    NULL is a value on both sides (matching GROUP BY semantics in every
    engine). Reference analogue: the one-department-per-user org map
    (``org_analyzer.py:26-34``) silently assumes an FD this would mine.
    """
    pairs = [(a, b) for a in columns for b in columns if a != b]
    args = []
    for a, b in pairs:
        args += [F.lit(a), F.lit(b),
                 F.col(a).cast("string"), F.col(b).cast("string")]
    panel = df.select(
        F.stack(F.lit(len(pairs)), *args)
        .alias("determinant", "dependent", "det_val", "dep_val"))
    counts = panel.groupBy("determinant", "dependent",
                           "det_val", "dep_val").agg(
        F.count(F.lit(1)).alias("n"))
    per_det = counts.groupBy("determinant", "dependent", "det_val").agg(
        F.max("n").alias("best"), F.sum("n").alias("n_rows"))
    return (
        per_det.groupBy("determinant", "dependent")
        .agg(
            F.sum("n_rows").alias("_n"),
            F.sum("best").alias("_keep"),
            F.count(F.lit(1)).cast("long").alias("n_determinants"),
        )
        .select(
            "determinant", "dependent", "n_determinants",
            (F.col("_n") - F.col("_keep")).cast("long")
            .alias("violating_rows"),
            F.floor((F.col("_n") - F.col("_keep")) * F.lit(1_000_000)
                    / F.col("_n")).cast("long").alias("violation_ppm"),
            (F.floor((F.col("_n") - F.col("_keep")) * F.lit(1_000_000)
                     / F.col("_n")) <= F.lit(int(budget_ppm)))
            .alias("holds"),
        )
    )
