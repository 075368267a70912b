"""Corpus-curation operators for training-data pipelines: deterministic
splits, stratified sampling, and quality-ranked token-budget selection.

All selection decisions are pure functions of stable keys (md5 of the id,
never ``rand()``), so a 100 TB curation run is reproducible, resumable, and
oracle-checkable: re-running selects byte-identical subsets, and adding new
documents never reshuffles old ones between splits (the property hash splits
have and row-number splits don't).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 md5 hex digits of the id,
    mod buckets — engine-portable (md5 is bit-identical everywhere),
    unlike ``xxhash64``/``rand`` which are Spark-specific."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def split_column(id_col: Column | str, train_pct: int = 80,
                 val_pct: int = 10) -> Column:
    """'train' / 'val' / 'test' from the stable hash bucket — document
    membership never changes as the corpus grows."""
    b = hash_bucket(id_col, 100)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def stratified_sample(df: DataFrame, strata_col: str, rates: dict[str, int],
                      id_col: str = "doc_id",
                      default_pct: int = 0) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its stable hash
    bucket falls under the stratum's percentage. ``rates`` maps stratum
    value → percent kept (0–100). No shuffle at all — a pure filter, so it
    composes with any downstream plan and pushes into the scan's batch
    filter at 100 TB."""
    b = hash_bucket(id_col, 100)
    pct = F.lit(default_pct)
    for value, rate in sorted(rates.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(rate)).otherwise(pct)
    return df.filter(b < pct)


def group_cap_sample(df: DataFrame, group_col: str,
                     max_per_group: int, id_col: str = "doc_id",
                     salt_buckets: int = 16) -> DataFrame:
    """Anti-domination cap: keep at most ``max_per_group`` rows per group,
    chosen deterministically by md5-hash order of ``id_col`` — the
    curation op that stops one domain/source from flooding a training
    mix while every group below the cap survives untouched. Selection is
    a pure function of row identity (no ``rand()``), so reruns and
    resumed jobs pick the same rows.

    Skew-safe exact top-k (the ``engine.cap_violations`` discipline): a
    group holding half the corpus would otherwise funnel into ONE window
    task; phase 1 ranks within (group, hash-salt) and keeps ≤ cap per
    slice, phase 2 ranks the ≤ salt_buckets x cap survivors per group.
    Correct because the global smallest-k of a group is contained in the
    union of its slices' smallest-k. For caps so large that
    salt_buckets x cap strains one task, compose ``stratified_sample``
    (pure filter) as a pre-thinning pass instead.

    Reference analogue: the reference caps per-user event history before
    modeling (user_profile_builder.py windowing); this is the corpus
    form."""
    from pyspark.sql.window import Window

    h = F.md5(F.col(id_col).cast("string"))
    order = [F.asc("_h"), F.asc(id_col)]
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                  F.lit(salt_buckets))
    w_local = Window.partitionBy(group_col, "_s").orderBy(*order)
    w_final = Window.partitionBy(group_col).orderBy(*order)
    pruned = (
        df.withColumn("_h", h).withColumn("_s", salt)
        .withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= int(max_per_group))
        .drop("_s", "_r")
    )
    return (
        pruned.withColumn("_r", F.row_number().over(w_final))
        .filter(F.col("_r") <= int(max_per_group))
        .drop("_r", "_h")
    )


def domain_mixture(df: DataFrame, domain_col: str = "source",
                   token_col: str = "n_tokens",
                   budget_tokens: int = 1_000_000) -> DataFrame:
    """Temperature-based domain mixture weights (α = 0.5) + repeat factors
    under a token budget — the published multilingual/multi-domain sampling
    scheme (sample domain d with probability ∝ T_d^α, α < 1 upweights
    low-resource domains relative to their raw token share).

    Per domain: ``n_docs``, ``domain_tokens`` (exact int64 sum),
    ``weight_ppm`` (the α=0.5 mixture weight), ``epochs_micro`` (how many
    times the domain is replayed to fill its share of ``budget_tokens``,
    in millionths: weight·budget/T_d).

    Cross-engine-exact by construction: T_d^0.5 is taken as
    ``floor(sqrt(T_d))`` — an EXACT integer in both engines (IEEE sqrt is
    correctly rounded below 2^53) — so every emitted ratio is one double
    divide of two exact integers + floor, never a sum of doubles whose
    order could differ. Plan: one map-side-combined groupBy to per-domain
    totals (rows = #domains — tiny), then a windowless broadcast-size
    normalization."""
    per = df.groupBy(domain_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("long").alias("domain_tokens"),
    ).withColumn("_isq", F.floor(F.sqrt(F.col("domain_tokens"))).cast("long"))
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    norm = per.withColumn("_den", F.sum("_isq").over(w))
    ppm = F.floor(
        F.lit(1_000_000.0) * F.col("_isq") / F.col("_den") + F.lit(0.5)
    ).cast("long")
    # products in DOUBLE, not int64: isq·budget and den·domain_tokens both
    # overflow long at production magnitudes (e.g. den ~1e8 × T_d ~1e12).
    # Double multiply/divide/floor in a fixed order is IEEE-identical in
    # both engines, so the oracle states the same double expression.
    epochs = F.floor(
        F.lit(1_000_000.0)
        * (F.col("_isq").cast("double") * F.lit(float(budget_tokens)))
        / (F.col("_den").cast("double") * F.col("domain_tokens").cast("double"))
        + F.lit(0.5)
    ).cast("long")
    return norm.select(
        domain_col, "n_docs", "domain_tokens",
        ppm.alias("weight_ppm"), epochs.alias("epochs_micro"),
    )


def mixture_downsample(df: DataFrame, mixture: DataFrame,
                       domain_col: str = "source",
                       id_col: str = "doc_id") -> DataFrame:
    """APPLY a ``domain_mixture`` plan to the corpus: domains whose
    ``epochs_micro`` is under 1e6 are over-represented relative to the
    temperature mixture, so their docs are kept at exactly that rate
    (md5-bucket of the id vs the rate — deterministic membership, no
    ``rand()``); domains at or above 1e6 keep every doc (their repeats
    are an epoch-replay concern, not a filtering one).

    Contract for domains ABSENT from the plan (e.g. a plan computed on an
    earlier snapshot applied to a corpus that gained a new source): kept
    in full (rate coalesced to 1e6), never silently deleted — dropping a
    whole unseen domain because the plan predates it is the worse
    failure; recompute the plan to downsample it.

    Plan: the mixture table is #domains-sized and broadcast; the corpus
    pays one scan + a map-side hash probe + a pushed filter — no
    shuffle. The selection is a pure function of (id, mixture), so
    resumed jobs and re-runs keep identical rows."""
    rate = F.least(
        F.coalesce(F.col("epochs_micro"), F.lit(1_000_000)),
        F.lit(1_000_000))
    bucket = F.pmod(
        F.conv(F.substring(
            F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long"),
        F.lit(1_000_000),
    )
    m = mixture.select(domain_col, "epochs_micro")
    return (
        df.join(F.broadcast(m), domain_col, "left")
        .filter(bucket < rate)
        .drop("epochs_micro")
    )


def shuffle_rank(df: DataFrame, id_col: str = "doc_id",
                 buckets: int = 256) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a unique
    ``shuffle_pos`` in [0, n) following md5-hash order — the reproducible
    corpus shuffle a training run needs (same corpus ⇒ same order, on any
    cluster, with no ``rand()``).

    Never a global ``row_number`` window (single-task funnel): the rank is
    a two-phase distributed prefix sum over the md5 keyspace — rows bucket
    by their first md5 byte-pair (uniform by construction), per-bucket
    counts give exclusive bucket offsets via a window over ``buckets``
    rows only, broadcast back; global pos = bucket offset + within-bucket
    rank. Within-bucket ties broken by the full hash then id, so the order
    is total and engine-independent."""
    h = F.md5(F.col(id_col).cast("string"))
    t = df.select(F.col(id_col), h.alias("_h")).withColumn(
        "_bkt", F.conv(F.substring("_h", 1, 2), 16, 10).cast("long") % buckets
    )
    per_bucket = t.groupBy("_bkt").agg(F.count("*").alias("_bc"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bkt", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_boff")
    )
    wl = Window.partitionBy("_bkt").orderBy(F.asc("_h"), F.asc(id_col))
    return (
        t.join(F.broadcast(offsets), "_bkt")
        .select(
            id_col,
            (F.col("_boff") + F.row_number().over(wl) - 1).alias("shuffle_pos"),
        )
    )


def pack_sequences(df: DataFrame, token_col: str = "n_tokens",
                   id_col: str = "doc_id", seq_len: int = 512,
                   bucket_width: int = 4096) -> DataFrame:
    """Sequence packing (concat-and-chunk): lay documents end-to-end in
    ``id_col`` order and cut fixed ``seq_len``-token training sequences —
    the step that turns a curated corpus into packed LM batches. Emits per
    document: ``seq_start`` (first sequence index), ``offset_in_seq``
    (token offset where the doc begins), ``n_seqs_spanned`` (how many
    sequence boundaries the doc crosses + 1).

    Scale shape: the global running sum is a TWO-PHASE distributed prefix
    sum, never one giant unpartitioned window (which funnels the corpus
    through a single task): per-bucket token totals (buckets = id ranges of
    ``bucket_width``) → a window over the bucket totals only (corpus/width
    rows — tiny) → broadcast-join the bucket offsets back → per-bucket
    partitioned within-bucket running sum. offset + local prefix is exactly
    the global (id asc) exclusive prefix. All arithmetic is int64 (``div``/
    ``pmod``), exact past 2^53 where doubles would silently drift.

    Rows with ``token_col ≤ 0`` must be filtered upstream (they would pack
    zero-width and make ``n_seqs_spanned`` ill-defined).
    """
    bucket = (F.col(id_col) - F.pmod(id_col, F.lit(bucket_width))).cast("long")
    t = df.select(F.col(id_col), F.col(token_col), bucket.alias("_bkt"))
    per_bucket = t.groupBy("_bkt").agg(F.sum(token_col).alias("_bt"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_bkt", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_boff")
    )
    wl = Window.partitionBy("_bkt").orderBy(F.asc(id_col)) \
        .rowsBetween(Window.unboundedPreceding, -1)
    packed = (
        t.join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_before",
            F.col("_boff") + F.coalesce(F.sum(token_col).over(wl), F.lit(0)),
        )
    )
    return packed.withColumn(
        "_end", F.col("_before") + F.col(token_col) - 1
    ).select(
        id_col, token_col,
        F.expr(f"_before DIV {seq_len}").alias("seq_start"),
        F.pmod("_before", F.lit(seq_len)).alias("offset_in_seq"),
        (F.expr(f"_end DIV {seq_len}")
         - F.expr(f"_before DIV {seq_len}") + 1).alias("n_seqs_spanned"),
    )


def token_budget_selection(df: DataFrame, budget_tokens: int,
                           token_col: str = "n_tokens",
                           quality_col: str = "quality",
                           id_col: str = "doc_id",
                           quantize_dp: int | None = 6) -> DataFrame:
    """Select the best documents until a cumulative token budget is filled:
    rank by (quality desc, id) and keep every document whose RUNNING token
    total (inclusive) stays within the budget — the data-mixing primitive of
    LLM corpus curation.

    Scale shape: a naive global running sum would funnel the corpus through
    ONE partition. Instead the only unpartitioned window runs over the
    DISTINCT quality values (bounded): per-quality token totals → running
    offset of all strictly-better quality → join back → per-quality
    partitioned running sum over ids. offset + within-quality cumsum ≤
    budget is EXACTLY the global (quality desc, id asc) inclusive prefix —
    same rows, no global data sort.

    That guarantee holds only while the distinct-quality count is bounded.
    A raw continuous quality column (every value distinct) would silently
    degrade the offsets window to a corpus-sized single task — so quality
    is QUANTIZED internally to ``quantize_dp`` decimal places (default 6,
    scores in [0, 1] give ≤ 10^6+1 distinct window rows). Ranking then
    uses the quantized key, which changes only the tie-break set: docs
    whose qualities differ past 6 dp order by id within the rounded
    bucket. The returned rows keep the ORIGINAL quality values. Pass
    ``quantize_dp=None`` only when the column is already discrete."""
    t = F.col(token_col)
    qkey = (
        F.round(F.col(quality_col), quantize_dp) if quantize_dp is not None
        else F.col(quality_col)
    )
    keyed = df.withColumn("_qkey", qkey)
    per_q = keyed.groupBy("_qkey").agg(F.sum(t).alias("_qt"))
    wq = Window.orderBy(F.desc("_qkey")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_q.select(
        "_qkey", F.coalesce(F.sum("_qt").over(wq), F.lit(0)).alias("_off")
    )
    wp = Window.partitionBy("_qkey").orderBy(F.asc(id_col)) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        keyed.join(offsets, "_qkey")
        .withColumn("_cum", F.col("_off") + F.sum(t).over(wp))
        .filter(F.col("_cum") <= budget_tokens)
        .drop("_cum", "_off", "_qkey")
    )


def chunk_token_windows(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", chunk_tokens: int = 128,
                        overlap: int = 0) -> DataFrame:
    """Split each document into fixed-size sliding token windows — the
    context-window chunking step of an LLM training / RAG-indexing pipeline
    (each chunk ≤ ``chunk_tokens`` whitespace tokens, consecutive chunks
    sharing ``overlap`` tokens).

    Pure DataFrame ops, no UDF: tokenize → integer chunk count →
    ``posexplode(sequence(...))`` → ``slice`` per chunk. Exploding inside a
    single projection keeps this one narrow stage: no shuffle, perfectly
    parallel per input split, so it scales linearly to a 100 TB corpus.
    Chunk count uses integer arithmetic only (``1 + ceil_div(n-c, s)``), so
    the DuckDB oracle states the identical formula and the gate is exact.

    Returns one row per (doc, chunk): id, chunk_id, n_tokens in the chunk,
    and the chunk text (caller typically fingerprints or embeds it next).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - chunk_tokens + step - 1) / F.lit(step))
    ).cast("long")
    base = (
        df.filter(n > 0)
        .select(F.col(id_col), toks.alias("_toks"),
                n.alias("doc_tokens"), n_chunks.alias("_nc"))
        .select(id_col, "_toks", "doc_tokens",
                F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1))
                 .alias("chunk_id", "_i"))
    )
    start = F.col("chunk_id").cast("int") * step + 1
    chunk = F.slice(F.col("_toks"), start, chunk_tokens)
    return base.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("doc_tokens").cast("long").alias("doc_tokens"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def morton_code(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns into
    one BIGINT sort key — the multi-dimensional data-layout technique behind
    Delta/Iceberg ``ZORDER BY``: rows close in BOTH dimensions land close in
    the one-dimensional sort, so range-partitioned files can be pruned by
    min/max stats on EITHER dimension, not just the leading sort column.

    Pure closed-form bit expression (``shiftleft``/``bitwise OR`` per bit,
    unrolled at plan-build time — whole-stage codegen, no UDF). ``bits``
    low bits of each input are interleaved (a → even bit positions,
    b → odd); inputs are masked to ``bits`` first, so callers bucket/clamp
    raw values to [0, 2^bits) themselves (keeping the masking explicit and
    engine-portable).
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    av = (F.col(a) if isinstance(a, str) else a).cast("long")
    bv = (F.col(b) if isinstance(b, str) else b).cast("long")
    mask = (1 << bits) - 1
    av, bv = av.bitwiseAND(F.lit(mask)), bv.bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
        bbit = F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = out.bitwiseOR(abit).bitwiseOR(bbit)
    return out


def zorder_layout(df: DataFrame, a_col: str, b_col: str, bits: int = 16,
                  n_files: int | None = None) -> DataFrame:
    """Lay a table out in Z-order on two integer dimensions:
    ``repartitionByRange`` + in-partition sort on the Morton key, the write
    shape that gives every output file a TIGHT min/max envelope in both
    dimensions. At 100 TB this is how point/range predicates on either
    column prune most files at scan time without a second sort column."""
    if n_files is not None and n_files < 1:
        raise ValueError("n_files must be >= 1")
    key = morton_code(a_col, b_col, bits).alias("_z")
    parts = [n_files] if n_files is not None else []
    return (
        df.select("*", key)
        .repartitionByRange(*parts, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def length_batching(df: DataFrame, token_col: str = "n_tokens",
                    id_col: str = "doc_id", batch_size: int = 32,
                    bucket_width: int = 4096) -> DataFrame:
    """Padding-efficiency comparison of two training-batch layouts:
    ``arrival`` (batches of ``batch_size`` docs in id order — what a
    naive loader does) vs ``length_sorted`` (docs laid out in
    (length, id) order first — dynamic batching). Each batch pads every
    row to the batch max, so per-batch waste is ``n·max(len) − Σlen``;
    the one-row-per-strategy summary reports
    (strategy, n_batches, real_tokens, padded_slots, efficiency_ppm).

    Scale shape: both global orderings are TWO-PHASE distributed prefix
    ranks, never one unpartitioned row_number window (single-task
    funnel): rows bucket by id range — prefixed by the length value for
    the sorted layout — per-bucket counts give exclusive offsets via a
    window over the tiny bucket frame, broadcast back, within-bucket
    row_number is partitioned. Bucket fan-in is bounded by
    ``bucket_width`` per (length, range) cell, so a corpus where half
    the docs share one length still never funnels.

    Rows with ``token_col ≤ 0`` must be filtered upstream (an all-empty
    batch would make the efficiency ratio 0/0)."""
    idb = (F.col(id_col) - F.pmod(id_col, F.lit(bucket_width))).cast("long")
    t = df.select(F.col(id_col),
                  F.col(token_col).cast("long").alias("_len"),
                  idb.alias("_idb"))

    def summary(bcols: list[str], label: str) -> DataFrame:
        per = t.groupBy(*bcols).agg(F.count(F.lit(1)).alias("_bc"))
        wb = (Window.orderBy(*bcols)
              .rowsBetween(Window.unboundedPreceding, -1))
        offsets = per.select(
            *bcols, F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_boff"))
        wl = Window.partitionBy(*bcols).orderBy(F.asc(id_col))
        pos = (F.col("_boff") + F.row_number().over(wl) - 1)
        batches = (
            t.join(F.broadcast(offsets), bcols)
            .select("_len", pos.alias("_pos"))
            .groupBy(F.expr(f"_pos DIV {int(batch_size)}").alias("_batch"))
            .agg(F.count(F.lit(1)).alias("_n"), F.max("_len").alias("_mx"),
                 F.sum("_len").alias("_sm"))
        )
        return batches.agg(
            F.lit(label).alias("strategy"),
            F.count(F.lit(1)).cast("long").alias("n_batches"),
            F.sum("_sm").cast("long").alias("real_tokens"),
            (F.sum(F.col("_n") * F.col("_mx")) - F.sum("_sm"))
            .cast("long").alias("padded_slots"),
            F.floor(F.sum("_sm") * F.lit(1_000_000)
                    / F.sum(F.col("_n") * F.col("_mx")))
            .cast("long").alias("efficiency_ppm"),
        )

    return summary(["_idb"], "arrival").unionAll(
        summary(["_len", "_idb"], "length_sorted"))


def temperature_mixture(df: DataFrame, domain_col: str = "source",
                        alphas: tuple[int, ...] = (100, 50, 25),
                        ) -> DataFrame:
    """Temperature-scaled sampling weights over domains (the mC4 /
    XLM-R / UniMax α-mixture: p_i ∝ count_i^α flattens the head and
    boosts the tail as α falls). Alphas are percents restricted to
    {100, 50, 25} = {c, √c, √√c} — sqrt is IEEE-correctly-rounded in
    every engine, so unlike pow(c, 0.7) the weights are bit-identical
    cross-engine; fractional weights are micro-quantized BEFORE the
    normalizing sum so shares are exact integer division, never a
    float sum whose order matters.

    Scale shape: one hash-agg to the |domains|-row count frame; every
    later step (per-alpha weights, window sums, shares, tail-boost vs
    the natural α=100 share) runs on that metadata-sized frame.

    Returns (alpha_pct, domain, n_docs, weight, share_ppm, boost_ppm)
    where boost_ppm = share_α·1e6/share_natural — >1e6 means the
    temperature up-samples that domain."""
    allowed = {100, 50, 25}
    if not set(alphas) <= allowed:
        raise ValueError(f"alphas must be within {sorted(allowed)} "
                         "(sqrt-chain exactness)")
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"))

    def weight(alpha: int):
        c = F.col("n_docs").cast("double")
        if alpha == 100:
            return F.col("n_docs").cast("long")
        root = F.sqrt(c) if alpha == 50 else F.sqrt(F.sqrt(c))
        return F.floor(root * F.lit(1e6) + F.lit(0.5)).cast("long")

    panel = None
    for a in alphas:
        part = counts.select(
            F.lit(int(a)).alias("alpha_pct"), "domain", "n_docs",
            weight(a).alias("weight"))
        panel = part if panel is None else panel.unionAll(part)
    shared = panel.withColumn(
        "share_ppm",
        F.expr("(weight * 1000000) DIV sum(weight) OVER "
               "(PARTITION BY alpha_pct)").cast("long"))
    natural = shared.filter(F.col("alpha_pct") == 100).select(
        "domain", F.col("share_ppm").alias("_nat"))
    return (
        shared.join(F.broadcast(natural), "domain")
        .select(
            "alpha_pct", "domain", "n_docs", "weight", "share_ppm",
            F.when(F.col("_nat") > 0,
                   F.expr("(share_ppm * 1000000) DIV _nat"))
            .cast("long").alias("boost_ppm"),
        )
    )


def shard_balance(df: DataFrame, n_shards: int = 8,
                  token_col: str = "n_tokens", id_col: str = "doc_id",
                  bucket_width: int = 4096) -> DataFrame:
    """Token-balanced output-shard assignment: docs are laid out in
    (tokens DESC, id) order and dealt round-robin over ``n_shards`` —
    the classic LPT-style heuristic that keeps every output file's token
    total within one max-doc of the mean, so no trainer data-loader
    rank starves while another owns the long tail.

    Scale shape: the global ordering is the same TWO-PHASE distributed
    prefix rank as ``length_batching`` (rows bucket by (−tokens,
    id-range); per-bucket counts give exclusive offsets via a window
    over the tiny bucket frame, broadcast back; within-bucket
    row_number is partitioned) — never one unpartitioned row_number.
    The report is one ``n_shards``-row agg: per shard docs, tokens, and
    the signed deviation from the exact mean in ppm
    (``(tokens·K − total)·1e6 DIV total`` — pure integers)."""
    idb = (F.col(id_col) - F.pmod(id_col, F.lit(bucket_width))).cast("long")
    t = df.select(F.col(id_col),
                  F.col(token_col).cast("long").alias("_len"),
                  (-F.col(token_col).cast("long")).alias("_neg"),
                  idb.alias("_idb"))
    per = t.groupBy("_neg", "_idb").agg(F.count(F.lit(1)).alias("_bc"))
    wb = (Window.orderBy("_neg", "_idb")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = per.select(
        "_neg", "_idb",
        F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_boff"))
    wl = Window.partitionBy("_neg", "_idb").orderBy(F.asc(id_col))
    pos = (F.col("_boff") + F.row_number().over(wl) - 1)
    assigned = (
        t.join(F.broadcast(offsets), ["_neg", "_idb"])
        .select("_len", F.pmod(pos, F.lit(int(n_shards))).alias("shard"))
    )
    shards = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_len").cast("long").alias("tokens"))
    total = shards.agg(F.sum("tokens").alias("_tot"))
    # deviation can be negative: both Spark's DIV and DuckDB's integer //
    # truncate toward zero, so the plain quotient is cross-engine exact
    return (
        shards.crossJoin(F.broadcast(total))
        .select("shard", "n_docs", "tokens",
                F.expr(f"(tokens * {int(n_shards)} - _tot) * 1000000"
                       " DIV greatest(_tot, 1)").alias("dev_ppm"))
        .orderBy("shard")
    )
