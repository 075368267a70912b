"""N-gram language-model quality scoring for training-data curation — the
CCNet / Wenzek et al. 2020 filter family: train a small LM on a trusted
reference slice, score every document by its per-token negative
log-likelihood, and keep the low-perplexity head.

At 100 TB the LM cannot be a model server; it has to be scan-speed row
logic, like the hashed classifier in :mod:`scoring`. The shape here:

* **train pass** runs only over a deterministic ~1/``ref_mod`` reference
  slice (md5 of the doc id — no ``rand()``, reproducible cross-engine).
  Its tokens explode straight into map-side-combined hash-aggregations
  (unigram then bigram counts), so the shuffled rows are vocabulary-sized,
  never corpus-sized;
* the **vocabulary** is a bounded top-``vocab_k`` (count desc, token asc —
  total tie-break) that executes as TakeOrderedAndProject, and the bigram
  count table is capped at ``(vocab_k+1)²`` keys by mapping out-of-vocab
  tokens to ``<unk>`` BEFORE counting;
* the **score pass** never shuffles the corpus at all: the three count
  tables collapse to 1-row maps (``map_from_entries(collect_list(...))``,
  the DSIR pattern) broadcast onto the scan, and each document's bigram
  NLL is an in-row ``zip_with`` over adjacent tokens + integer sum —
  whole-stage codegen, zero explode, zero doc-keyed exchange.

Cross-engine exactness (the DuckDB oracle must hash-match): per-bigram
probabilities are add-1 smoothed ``(c12+1)/(c1+V+1)`` with both operands
built in BIGINT and divided ONCE as doubles before ``ln`` — both engines
feed libm the identical IEEE value — and each pair's NLL is floored to
integer micro units BEFORE the per-document sum, so the aggregate is an
order-independent BIGINT sum that cannot hash-flip.

Reference analogue: the reference scores rows only with hand-written
rules (``data_normalizer.py:398-499`` keyword scoring); a model-likelihood
filter is the published web-scale counterpart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import text

UNK = "<unk>"


def ref_slice_flag(id_col: Column, ref_mod: int, salt: str = "lmref") -> Column:
    """1 when the row belongs to the deterministic reference slice
    (md5-uniform of the id, ≈1/ref_mod of the corpus), else 0."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (h % F.lit(ref_mod) == 0).cast("int")


def bigram_lm_scores(
    docs: DataFrame,
    vocab_k: int = 24,
    ref_mod: int = 4,
    keep_nll_micro_per_bigram: int = 3_100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood, integer micros.

    Output: ``(id, n_bigrams, nll_sum_micro, keep)`` where ``keep`` is 1
    iff ``nll_sum_micro ≤ keep_nll_micro_per_bigram · n_bigrams`` — the
    mean-NLL threshold compared in exact integers (documents with no
    bigram are kept: nothing to hold against them). Smoothing:
    ``p(w2|w1) = (c12+1)/(c1+V+1)`` with ``V+1 = vocab_k+1`` symbols
    (vocab ∪ <unk>) and ``c1 = Σ_w2 c12(w1,·)`` so the conditional is
    self-consistent with the bigram table.
    """
    n_sym = vocab_k + 1  # vocab ∪ <unk>
    # NULL text folds to zero tokens here (not at the consumers): slices,
    # zip_with and the aggregate all propagate NULL, so one coalesce at the
    # source keeps every downstream column non-NULL for NULL-text docs.
    toks = F.coalesce(
        text.tokens(F.lower(F.col(text_col))),
        F.array().cast("array<string>"),
    )
    base = docs.select(F.col(id_col).alias("_id"), toks.alias("toks"))
    ref = base.where(ref_slice_flag(F.col("_id"), ref_mod) == 1)

    # -- train pass (reference slice only) --------------------------------
    vocab = (
        ref.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok").asc())
        .limit(vocab_k)
    )
    # token -> integer symbol id (0..vocab_k-1 by count desc, token asc;
    # <unk> = vocab_k). Integer ids make every downstream lookup O(1)
    # ARRAY indexing: the previous string-keyed bigram map was a Spark
    # MapData — element_at on it is a LINEAR scan, and ~650k bigram pairs
    # x ~625 string-equality probes each measured ~12 s of pure map
    # scanning in the score pass at sf0.1.
    from pyspark.sql.window import Window as _W

    vid = vocab.select(
        "tok",
        (F.row_number().over(
            _W.orderBy(F.col("cnt").desc(), F.col("tok").asc())) - 1)
        .alias("id"),
    )
    vocab_row = vid.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("id")))
        ).alias("vmap")
    )

    def to_id(t: Column) -> Column:
        # 25-entry map probe per token (unavoidable: tokens are strings);
        # everything after this runs on ints
        return F.coalesce(F.element_at(F.col("vmap"), t),
                          F.lit(vocab_k)).cast("int")

    # Bigrams of the reference slice, OOV folded to <unk> FIRST so the
    # count table is bounded by (vocab_k+1)^2 integer keys.
    mapped_ref = ref.crossJoin(F.broadcast(vocab_row)).select(
        F.transform(F.col("toks"), to_id).alias("ms")
    )
    n = F.size("ms")
    bigrams = mapped_ref.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("ms"), 1, F.greatest(n - 1, F.lit(0))),
                F.slice(F.col("ms"), 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: a * F.lit(n_sym) + b,
            )
        ).alias("bg")
    )
    bg_counts = bigrams.groupBy("bg").agg(F.count("*").alias("c12"))
    first_counts = bg_counts.select(
        F.expr(f"bg div {n_sym}").alias("w1"), "c12"
    ).groupBy("w1").agg(F.sum("c12").alias("c1"))

    # Dense count ARRAYS in the 1-row model frame (construction cost is
    # one pass over <= n_sym^2 map entries, once): barr[a*n_sym+b+1] =
    # c12, uarr[a+1] = c1 — O(1) ordinal element_at in the score pass.
    def _dense(map_col: str, size: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(size - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col(map_col), i.cast("int")), F.lit(0)
            ).cast("long"),
        )

    model_row = (
        bg_counts.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bg").cast("int"),
                                        F.col("c12")))
            ).alias("_bmap")
        )
        .crossJoin(
            first_counts.agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("w1").cast("int"),
                                            F.col("c1")))
                ).alias("_umap")
            )
        )
        .select(_dense("_bmap", n_sym * n_sym).alias("barr"),
                _dense("_umap", n_sym).alias("uarr"))
        .crossJoin(vocab_row)
    )

    # -- score pass (whole corpus, in-row) --------------------------------
    def pair_nll_micro(a: Column, b: Column) -> Column:
        c12 = F.element_at(F.col("barr"), a * F.lit(n_sym) + b + 1)
        c1 = F.element_at(F.col("uarr"), a + 1)
        den = (c1 + F.lit(n_sym)).cast("double")
        num = (c12 + F.lit(1)).cast("double")
        return F.floor(F.log(den / num) * F.lit(1000000.0) + F.lit(0.5)).cast(
            "long"
        )

    scored = base.crossJoin(F.broadcast(model_row))

    # The mapped-symbol array and the NLL aggregate are bound through a
    # single-element-array transform + inline_outer (the _shingles_of /
    # c4_line_filter discipline): referenced bare, CollapseProject inlines
    # the `transform(toks, to_sym)` mapping into BOTH zip_with slices and
    # the whole aggregate into both the nll column and the keep
    # comparison — four map-lookup passes per row instead of one.
    def nll_of(msb: Column) -> Column:
        k = F.greatest(F.size(msb) - 1, F.lit(0))
        return F.aggregate(
            F.zip_with(F.slice(msb, 1, k), F.slice(msb, 2, k),
                       pair_nll_micro),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    res = F.element_at(
        F.transform(
            F.array(F.transform(F.col("toks"), to_id)),
            lambda msb: F.element_at(
                F.transform(
                    F.array(nll_of(msb)),
                    lambda nll: F.struct(
                        F.greatest(F.size(msb) - 1, F.lit(0)).cast("long")
                        .alias("n_bigrams"),
                        nll.alias("nll_sum_micro"),
                        (nll
                         <= F.lit(int(keep_nll_micro_per_bigram))
                         * F.greatest(F.size(msb) - 1, F.lit(0)).cast("long"))
                        .cast("int").alias("keep"),
                    ),
                ), 1),
        ), 1)
    return scored.select(
        F.col("_id").alias(id_col), F.inline_outer(F.array(res)))
