"""Distributed BPE-tokenizer training statistics (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
corpus-wide adjacent-symbol pair counts that drive each BPE merge step.

The published algorithm's first (and every) iteration is "count all
adjacent symbol pairs, weighted by word frequency; merge the most
frequent". At 100 TB the load-bearing trick is the classic **vocabulary
compression**: aggregate the corpus to ``(word, count)`` FIRST — one
map-side-combined hash-agg whose output is vocabulary-sized, not
corpus-sized — and only then expand each distinct word once into its
symbol pairs. The pair expansion and the final pair hash-agg therefore
run over the vocabulary (·small constant), never over the corpus, and
the pair key space is bounded by charset² (+ end-of-word marker). No
driver-side loops, no Python in the hot path: symbols come from an
in-row ``transform(sequence(...), substring)`` and pairs from
``zip_with`` — whole-stage codegen end-to-end.

Words carry the standard ``</w>`` end-of-word marker as a trailing
symbol so "t h" inside a word and "t h" across a word boundary never
conflate; single-char symbols contain no whitespace (whitespace
tokenization), so ``' '`` joins a pair collision-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import text

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(word, wcnt)`` — lowercased
    whitespace tokens, one hash-agg with map-side combine."""
    toks = text.tokens(F.lower(F.col(text_col)))
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcnt"))
    )


def bpe_pair_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent-symbol pair counts over the corpus: ``(pair, cnt)``,
    ``cnt = Σ_words wcnt(word) · occurrences(pair, word)`` — exactly the
    table a BPE trainer scans to pick the next merge. Initial symbol
    state: one symbol per character plus the ``</w>`` marker, so a word
    of length L contributes L pairs."""
    wc = word_counts(docs, text_col)
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )
    m = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, F.greatest(m - 1, F.lit(0))),
        F.slice(syms, 2, F.greatest(m - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        wc.select(F.explode(pairs).alias("pair"), F.col("wcnt"))
        .groupBy("pair")
        .agg(F.sum("wcnt").cast("long").alias("cnt"))
    )


def top_merge_candidates(docs: DataFrame, top_n: int = 20,
                         text_col: str = "text") -> DataFrame:
    """The ``top_n`` most frequent symbol pairs — the next ``top_n`` BPE
    merge candidates — with a total order (count desc, pair asc) so the
    result is deterministic cross-engine. Executes as
    TakeOrderedAndProject over the pair hash-agg: per-partition partial
    top-n, no global sort."""
    from pyspark.sql.window import Window

    top = (
        bpe_pair_counts(docs, text_col)
        .orderBy(F.col("cnt").desc(), F.col("pair").asc())
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).select("rank", "pair", "cnt")
