"""Corpus-hygiene operators for LLM training pipelines: Gopher-style
repetition statistics and benchmark-contamination n-gram overlap.

Both are explode → two-level hash-aggregation pipelines: partial (map-side)
aggregation applies at every step, the only shuffles are keyed by
``(doc_id, gram)`` then ``doc_id``, and no per-document state ever leaves the
JVM — the shape that survives a 100 TB corpus. Repetition thresholds follow
the published Gopher/MassiveText quality filters (fraction of the document
made of its most-repeated n-gram, fraction of duplicated n-grams); ratios are
emitted as integer parts-per-million (``floor(1e6·x + 0.5)``) so the DuckDB
oracle matches bit-for-bit (both engines do one IEEE double divide, then
floor — no round-half ambiguity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.dedup import _shingles_of, with_shingles
from anomaly_detection_spark.functions.text import tokens


def _ppm(num, den):
    """Integer parts-per-million of num/den — cross-engine-exact (one double
    divide + floor; never round(), whose half-breaking differs per engine)."""
    return F.floor(F.lit(1_000_000.0) * num / den + F.lit(0.5)).cast("long")


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition profile over documents with ≥3 tokens:

    * ``n_tokens`` — whitespace token count;
    * ``top_token_ppm`` — occurrences of the most frequent token / n_tokens;
    * ``top_bigram_ppm`` — occurrences of the most frequent word 2-gram /
      total 2-grams;
    * ``dup_trigram_ppm`` — fraction of 3-gram occurrences that are repeats
      (``(total − distinct) / total``).

    The Gopher repetition filters, recast distributed: ONE scan binds token /
    2-gram / 3-gram arrays as columns (never re-tokenizing inside lambdas),
    a single tagged explode feeds ONE ``(doc, n, gram)`` count, and per-doc
    metrics come from a second, smaller aggregation — 2 shuffles total for
    all three gram sizes, both with map-side combine.
    """
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks")) \
        .filter(F.size("_toks") >= 3)
    bound = base.select(
        id_col, "_toks",
        _shingles_of(F.col("_toks"), 2).alias("_b2"),
        _shingles_of(F.col("_toks"), 3).alias("_b3"),
    )

    def _tag(arr: str, n: int):
        return F.transform(
            F.col(arr),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    # explode_outer, NOT explode: InferFiltersFromGenerate gives plain
    # explode a `size(arr) > 0` pre-filter that predicate pushdown inlines
    # into the scan filter with the whole gram expression expanded — and
    # filter conditions get no subexpression elimination, so the text is
    # re-tokenized per gram position (measured 7× on this op). The arrays
    # here are never empty (≥3 tokens guaranteed), so outer ≡ inner.
    ex = bound.select(
        id_col,
        F.explode_outer(F.concat(_tag("_toks", 1), _tag("_b2", 2), _tag("_b3", 3))).alias("_t"),
    ).select(id_col, F.col("_t.n").alias("_n"), F.col("_t.g").alias("_g"))
    counts = ex.groupBy(id_col, "_n", "_g").agg(F.count("*").alias("_c"))
    per_n = counts.groupBy(id_col, "_n").agg(
        F.max("_c").alias("_mx"),
        F.sum("_c").alias("_tot"),
        F.count("*").alias("_dst"),
    )
    pick = lambda n, expr: F.max(F.when(F.col("_n") == n, expr))  # noqa: E731
    return per_n.groupBy(id_col).agg(
        pick(1, F.col("_tot")).alias("n_tokens"),
        pick(1, _ppm(F.col("_mx"), F.col("_tot"))).alias("top_token_ppm"),
        pick(2, _ppm(F.col("_mx"), F.col("_tot"))).alias("top_bigram_ppm"),
        pick(3, _ppm(F.col("_tot") - F.col("_dst"), F.col("_tot"))).alias("dup_trigram_ppm"),
    )


def contamination_overlap(corpus: DataFrame, benchmark: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          n: int = 3) -> DataFrame:
    """Benchmark-contamination scan: for each corpus document sharing at
    least one distinct word n-gram with any benchmark document, emit
    ``(id, n_shingles, n_contaminated, contamination_ppm)`` — the standard
    n-gram-overlap decontamination pass run before training (as published
    for GPT-3/PaLM/Llama eval decontamination).

    Scale shape: the benchmark side (eval suites — thousands of docs, not
    billions) collapses to a DISTINCT shingle set and is **broadcast**, so
    the 100 TB corpus side is a scan + map-side semi-join + per-doc count —
    no corpus-wide shuffle keyed by shingle, which would be the naive plan's
    bottleneck (shingle frequencies are power-law-skewed).
    """
    # explode_outer + null-drop (see repetition_stats): plain explode's
    # inferred non-empty pre-filter inlines the shingle expression into the
    # scan filter, re-tokenizing per position.
    cor = with_shingles(corpus, text_col, id_col, n=n, distinct=True)
    ex = cor.select(id_col, F.explode_outer("_sh").alias("_g")) \
        .filter(F.col("_g").isNotNull())
    bench_sh = (
        with_shingles(benchmark, text_col, id_col, n=n, distinct=True)
        .select(F.explode_outer("_sh").alias("_g"))
        .filter(F.col("_g").isNotNull())
        .distinct()
    )
    totals = ex.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        ex.join(F.broadcast(bench_sh), "_g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return totals.join(hits, id_col).select(
        id_col, "n_shingles", "n_contaminated",
        _ppm(F.col("n_contaminated"), F.col("n_shingles")).alias("contamination_ppm"),
    )


def boilerplate_phrases(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        top_k: int = 20) -> DataFrame:
    """Cross-document boilerplate detection — the corpus-level twin of
    ``repetition_stats``: the word n-grams present in the most DISTINCT
    documents (site headers/footers, license blurbs, navigation text — the
    CCNet/RefinedWeb line-frequency filter recast over n-grams, since the
    interleaved corpus has no line structure).

    Scale shape: per-doc DISTINCT shingles (so the count is document
    frequency, not occurrences), ONE map-side-combined count keyed by
    shingle, then ``TakeOrderedAndProject`` for the top-k — never a global
    sort and never a broadcast or collect of the unbounded shingle
    vocabulary. Ties at the cut break by phrase ascending (deterministic
    across engines).

    Returns ``(phrase, df_docs, df_ppm)``; ``df_ppm`` is the document
    frequency over ALL corpus docs in ppm (``floor(1e6·x + 0.5)``).
    """
    sh = with_shingles(df, text_col, id_col, n=n, distinct=True)
    ex = sh.select(F.explode_outer("_sh").alias("_g")) \
        .filter(F.col("_g").isNotNull())
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    top = (
        ex.groupBy("_g").agg(F.count(F.lit(1)).alias("df_docs"))
        .orderBy(F.desc("df_docs"), F.asc("_g"))
        .limit(top_k)
    )
    return top.crossJoin(F.broadcast(n_docs)).select(
        F.col("_g").alias("phrase"),
        "df_docs",
        _ppm(F.col("df_docs"), F.col("_n_docs")).alias("df_ppm"),
    )


def boilerplate_ratio(df: DataFrame, phrases: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3) -> DataFrame:
    """Per-document boilerplate share against an already-detected, BOUNDED
    phrase set (e.g. ``boilerplate_phrases`` output — top-k by
    construction): the fraction of the doc's distinct n-grams that are
    boilerplate, the per-doc quality signal the phrase list exists for.

    The phrase frame is broadcast — membership never shuffles the corpus
    on the power-law shingle key (the same discipline as
    ``contamination_overlap``). Joining back on raw shingle frequency
    WITHOUT a bound would put every hot phrase's rows in one task; the
    bounded-set broadcast is the 100 TB-safe contract, so this function
    requires the detected set rather than a raw ``min_df`` threshold.

    Returns ``(id, n_shingles, n_boiler, boiler_ppm)`` for docs with ≥ 1
    shingle.
    """
    sh = with_shingles(df, text_col, id_col, n=n, distinct=True)
    ex = sh.select(id_col, F.explode_outer("_sh").alias("_g")) \
        .filter(F.col("_g").isNotNull())
    totals = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    pset = phrases.select(F.col(phrases.columns[0]).alias("_g")).distinct()
    hits = (
        ex.join(F.broadcast(pset), "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return totals.join(hits, id_col, "left").select(
        id_col, "n_shingles",
        F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
        _ppm(F.coalesce(F.col("n_boiler"), F.lit(0)), F.col("n_shingles"))
        .alias("boiler_ppm"),
    )


def line_dedup_stats(lines: DataFrame, id_col: str = "doc_id",
                     line_no_col: str = "line_no",
                     line_col: str = "line") -> DataFrame:
    """Corpus-global line deduplication — the C4 "three-sentence span" /
    CCNet line-frequency dedup step (Raffel et al. 2020 §2.2 deduplicate
    repeated lines across the corpus, keeping ONE occurrence): an
    occurrence of a line is kept iff it is the globally FIRST occurrence
    of that exact line text, first = minimal ``(doc, line_no)``. Every
    later occurrence — in another document, or a repeat inside the same
    document — is removed. Emits the per-document report the curation
    pipeline acts on.

    Scale shape (the ``corpus_dup_ngrams`` discipline): ONE hash-aggregate
    keyed by line text computes each line-group's occurrence count and its
    canonical keeper (``min`` of an encoded ``doc·10⁶ + line_no`` key —
    map-side combinable, so a site-wide boilerplate line appearing in
    millions of documents partially aggregates inside every scan task and
    never lands one giant posting list in a single reducer). Because every
    group keeps EXACTLY its keeper occurrence, per-doc kept counts are an
    aggregation over group keepers — there is NO join back on the
    power-law line key at all; the close is a tiny id-keyed left join onto
    the per-doc spine. Token weights ride the same aggregates, so removed
    token volume (what dedup actually saves at 100 TB) is exact.

    Input is an exploded lines frame ``(id, line_no, line)`` with
    ``line_no`` < 10⁶ (encoded-key contract; at 10¹² docs the encoded key
    still fits a long). Returns per document:
    ``(id, n_lines, n_tokens, kept_lines, removed_lines, kept_ppm,
    removed_tokens)``, one row per input document (docs losing every line
    report ``kept_lines = 0``).
    """
    ntok = F.size(F.filter(F.split(F.col(line_col), " "),
                           lambda w: w != ""))
    # the id MUST be widened to long before encoding: with an int id the
    # int×int product silently wraps (non-ANSI) at id ≥ 2148, corrupting
    # keeper attribution — the '10^12 docs fit a long' claim needs this
    occ = lines.select(
        F.col(id_col), F.col(line_col).alias("_l"),
        (F.col(id_col).cast("long") * F.lit(1_000_000)
         + F.col(line_no_col)).alias("_k"),
        ntok.alias("_t"),
    )
    groups = occ.groupBy("_l").agg(
        F.min("_k").alias("_kk"),
        F.max("_t").alias("_gt"),
    )
    # integer div, NOT a double divide: doubles lose exactness past 2^53,
    # and the encoded key reaches 10^18 at 10^12 docs
    keepers = groups.groupBy(
        F.expr("_kk div 1000000").alias(id_col)
    ).agg(
        F.count(F.lit(1)).alias("_kept"),
        F.sum("_gt").alias("_kept_tok"),
    )
    spine = occ.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("_t").alias("n_tokens"),
    )
    kept = F.coalesce(F.col("_kept"), F.lit(0))
    kept_tok = F.coalesce(F.col("_kept_tok"), F.lit(0))
    return spine.join(keepers, id_col, "left").select(
        id_col,
        "n_lines",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        kept.cast("long").alias("kept_lines"),
        (F.col("n_lines") - kept).cast("long").alias("removed_lines"),
        _ppm(kept, F.col("n_lines")).alias("kept_ppm"),
        (F.col("n_tokens") - kept_tok).cast("long").alias("removed_tokens"),
    )


def exact_substring_spans(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """Exact-substring deduplication (ExactSubstr, Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" §4.1) —
    the cross-document repeated-substring REMOVAL pass run after
    ``dup_length_spectrum`` picks the window size ``n``: every ``n``-token
    window that occurs anywhere else in the corpus (another document, or
    earlier in the same document) is removed, keeping exactly the
    globally FIRST occurrence (minimal ``(doc, pos)`` — the suffix-array
    semantics recast over fixed-width windows). Emits the per-document
    removal report the curation pipeline acts on: windows removed, and
    the exact token count their merged spans cover (overlapping removed
    windows coalesce — the number that says what ExactSubstr actually
    saves at 100 TB).

    Scale shape (the ``line_dedup_stats`` discipline, extended to
    positions): ONE hash-aggregate keyed by the gram computes each gram
    group's canonical keeper ``min(doc·10⁶ + pos)`` — map-side
    combinable, so a boilerplate gram in millions of documents partially
    aggregates inside every scan task. Because the keeper key IS the
    kept occurrence (for singleton grams it is the only occurrence),
    per-document KEPT positions come from re-grouping the group frame by
    the keeper's doc id — there is NO join back on the power-law gram
    key at all; removed positions are the in-row complement
    ``sequence(1, n_windows) \\ kept`` and span merging is pure in-row
    array arithmetic (bounded by document length). The close is a tiny
    id-keyed left join onto the per-doc spine. At 10¹² docs the gram
    shuffle key would be ``xxhash64`` instead of the raw string — same
    plan, narrower exchange.

    Contract: ``pos`` < 10⁶ per document (the encoded-key bound; ids are
    widened to long before encoding). Returns one row per input document:
    ``(id, n_tokens, n_windows, removed_windows, removed_tokens,
    removed_ppm)``; documents shorter than ``n`` tokens report zeros.
    """
    M = 1_000_000
    sh = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_toks"),
    ).select(
        id_col,
        F.size("_toks").alias("_nt"),
        _shingles_of(F.col("_toks"), n).alias("_sh"),
    )
    # posexplode_outer (see repetition_stats): plain posexplode's inferred
    # non-empty pre-filter would inline the shingle construction into the
    # scan filter and re-evaluate it per position.
    ex = sh.select(
        F.col(id_col),
        F.posexplode_outer("_sh").alias("_p0", "_g"),
    ).filter(F.col("_g").isNotNull())
    key = F.col(id_col).cast("long") * F.lit(M) + F.col("_p0") + 1
    keep = (
        ex.select("_g", key.alias("_k"))
        .groupBy("_g").agg(F.min("_k").alias("_mk"))
        .groupBy(F.expr(f"_mk div {M}").alias(id_col))
        .agg(F.sort_array(F.collect_list((F.col("_mk") % M).cast("int")))
             .alias("_kp"))
    )
    spine = sh.select(
        id_col,
        F.col("_nt").cast("long").alias("n_tokens"),
        F.size("_sh").cast("long").alias("n_windows"),
    )
    seq = F.when(
        F.col("n_windows") > 0,
        F.sequence(F.lit(1), F.col("n_windows").cast("int")),
    ).otherwise(F.array().cast("array<int>"))
    kp = F.coalesce(F.col("_kp"), F.array().cast("array<int>"))
    j = spine.join(keep, id_col, "left") \
        .withColumn("_rem", F.array_except(seq, kp))
    # merged span coverage of the sorted removed window starts: window i
    # covers [p_i, p_i + n - 1]; consecutive starts closer than n overlap,
    # so each contributes min(next - this, n), the last a full n
    covered = F.aggregate(
        F.zip_with(
            F.col("_rem"),
            F.expr("slice(_rem, 2, greatest(size(_rem) - 1, 0))"),
            lambda a, b: F.when(b.isNull(), F.lit(n))
            .otherwise(F.least(b - a, F.lit(n))),
        ),
        F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long"))
    return j.select(
        id_col, "n_tokens", "n_windows",
        F.size("_rem").cast("long").alias("removed_windows"),
        covered.alias("removed_tokens"),
        _ppm(covered, F.greatest(F.col("n_tokens"), F.lit(1)))
        .alias("removed_ppm"),
    )


def exact_substring_clean(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", n: int = 8) -> DataFrame:
    """The APPLY step of ``exact_substring_spans``: materialize each
    document's cleaned text with every duplicated window's tokens removed
    (keeping the globally first occurrence) — what the curation pipeline
    actually writes back after the report says removal is worth it.

    Same skew-safe machinery (one gram-keyed hash-agg, keeper attribution
    by doc-keyed regrouping, no join on the gram key); the close joins the
    kept-position frame onto the corpus carrying its token arrays — the
    cleaned output is corpus-sized, so this pass inherently rewrites the
    table (run it once, after the report). Token filtering is in-row:
    a token at 1-based index t survives iff no removed window start p has
    ``p ≤ t < p + n`` (membership over the doc-bounded removed array,
    formulated identically in the SQL oracle).

    Returns ``(id, n_tokens, kept_tokens, cleaned_text)``; documents
    shorter than ``n`` tokens pass through whole.
    """
    M = 1_000_000
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
    sh = base.select(
        id_col, "_toks", _shingles_of(F.col("_toks"), n).alias("_sh"))
    ex = sh.select(
        F.col(id_col),
        F.posexplode_outer("_sh").alias("_p0", "_g"),
    ).filter(F.col("_g").isNotNull())
    key = F.col(id_col).cast("long") * F.lit(M) + F.col("_p0") + 1
    keep = (
        ex.select("_g", key.alias("_k"))
        .groupBy("_g").agg(F.min("_k").alias("_mk"))
        .groupBy(F.expr(f"_mk div {M}").alias(id_col))
        .agg(F.sort_array(F.collect_list((F.col("_mk") % M).cast("int")))
             .alias("_kp"))
    )
    spine = sh.select(id_col, "_toks", F.size("_sh").alias("_nw"))
    seq_w = F.when(
        F.col("_nw") > 0,
        F.sequence(F.lit(1), F.col("_nw")),
    ).otherwise(F.array().cast("array<int>"))
    kp = F.coalesce(F.col("_kp"), F.array().cast("array<int>"))
    j = spine.join(keep, id_col, "left") \
        .withColumn("_rem", F.array_except(seq_w, kp))
    nt = F.size("_toks")
    seq_t = F.when(nt > 0, F.sequence(F.lit(1), nt)) \
        .otherwise(F.array().cast("array<int>"))
    kept_idx = F.filter(
        seq_t,
        lambda t: ~F.exists("_rem",
                            lambda p: (p <= t) & (t < p + F.lit(n))))
    kept_toks = F.transform(kept_idx, lambda t: F.element_at("_toks", t))
    return j.select(
        id_col,
        nt.cast("long").alias("n_tokens"),
        F.size(kept_idx).cast("long").alias("kept_tokens"),
        F.array_join(kept_toks, " ").alias("cleaned_text"),
    )


def corpus_dup_ngrams(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 5,
                      min_docs: int = 2) -> DataFrame:
    """Cross-document repeated n-gram profile — the ExactSubstr family
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): for each document, what fraction of its distinct word
    ``n``-grams also appears in at least ``min_docs − 1`` OTHER documents?
    High ``dup_ppm`` with no exact/MinHash duplicate marks partial copies
    and heavy quotation — the memorization-risk tail that document-level
    dedup misses.

    Shape: per-doc gram totals are in-row (``size`` of the distinct gram
    array — no shuffle); duplication comes from ONE hash-aggregate on the
    gram key (map-side combine, so hot grams — stock phrases appearing in
    millions of docs — partially aggregate inside each scan task and
    never pile into one reducer). A gram with doc-count 1 attributes its
    doc directly (``min(id)`` of a singleton IS the doc), so per-doc
    unique-gram counts need no join back on the skewed gram key at all:
    ``dup_grams = n_grams − uniq_grams``, closed by a tiny id-keyed left
    join. This deliberately replaces the naive gram-keyed join-back,
    whose hottest gram would land its entire posting list in a single
    task. Docs too short for any n-gram return zeros.

    Note ``min_docs`` > 2 would need the doc-count distribution per doc
    and hence the join-back; this function fixes the published
    ``min_docs=2`` semantics ("appears anywhere else") for the skew-safe
    plan.

    Returns ``(id, n_grams, dup_grams, dup_ppm)`` for every input row.
    """
    if min_docs != 2:
        raise ValueError("corpus_dup_ngrams fixes min_docs=2 (see docstring)")
    sh = with_shingles(df, text_col, id_col, n=n, distinct=True)
    sh = sh.select(id_col, "_sh", F.size("_sh").alias("_ng"))
    ex = sh.select(F.col(id_col), F.explode("_sh").alias("_g"))
    uniq = (
        ex.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_c"), F.min(id_col).alias("_d"))
        .filter(F.col("_c") == 1)
        .groupBy(F.col("_d").alias(id_col))
        .agg(F.count(F.lit(1)).alias("_uniq"))
    )
    spine = sh.select(id_col, "_ng")  # drop the gram arrays pre-shuffle
    return spine.join(uniq, id_col, "left").select(
        id_col,
        F.col("_ng").cast("long").alias("n_grams"),
        (F.col("_ng") - F.coalesce(F.col("_uniq"), F.lit(0))).cast("long")
        .alias("dup_grams"),
        _ppm(F.col("_ng") - F.coalesce(F.col("_uniq"), F.lit(0)),
             F.greatest(F.col("_ng"), F.lit(1))).alias("dup_ppm"),
    )
