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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions import text

EOW = "</w>"

#: Unit separator joining symbols inside the merge fold's string
#: accumulator — never occurs in whitespace-split alnum tokens or the
#: ``</w>`` marker, so symbol boundaries are collision-free.
SEP = "\x1f"


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


def char_syms(word: Column) -> Column:
    """Initial BPE symbol state for one word: one symbol per character
    plus the trailing ``</w>`` marker — in-row, codegen."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(EOW)),
    )


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of ONE BPE merge ``(a, b)`` to a
    symbol array — the exact published semantics (overlapping
    occurrences resolve leftmost-first, e.g. ``a a a`` under merge
    ``(a, a)`` → ``aa a``, not ``a aa``).

    Implemented as a single in-row fold (``F.aggregate``) over a
    SEP-joined string accumulator: a step merges iff the accumulator's
    LAST symbol is exactly ``a`` (suffix check through the separator,
    so symbol ``xa`` never false-matches) and the next symbol is ``b``;
    merging appends ``b`` without a separator, turning the last symbol
    into ``a||b``. The merged symbol can never re-match as ``a`` within
    the same pass (``a||b`` = ``a`` would need an empty ``b``), which is
    precisely why one fold IS the greedy semantics. Whole-stage codegen,
    zero Python in the hot path; the DuckDB oracle runs the literally
    identical fold via ``list_reduce``."""
    sfx = SEP + a
    return F.split(
        F.aggregate(
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.element_at(syms, 1),
            lambda acc, x: F.when(
                ((acc == F.lit(a)) | F.endswith(acc, F.lit(sfx)))
                & (x == F.lit(b)),
                F.concat(acc, F.lit(b)),
            ).otherwise(F.concat(acc, F.lit(SEP), x)),
        ),
        F.lit(SEP),
    )


def learn_merges(docs: DataFrame, n_merges: int = 6,
                 text_col: str = "text",
                 ) -> tuple[DataFrame, list[tuple[str, str, int]], DataFrame]:
    """Full iterative BPE training for ``n_merges`` rounds (Sennrich
    et al. 2016, Algorithm 1): returns ``(merge-table DataFrame
    (step, pair, cnt), learned merges list, final vocab state
    (word, wcnt, syms))``.

    Scale shape: the corpus is scanned ONCE into the vocabulary-sized
    ``(word, wcnt)`` table; every training round then runs entirely over
    that table — pair hash-agg (map-side combined, key space bounded by
    the evolving symbol set²) → top-1 via TakeOrdered (cnt desc, pair
    asc total order) → one in-row ``apply_merge`` pass. Per round the
    driver collects exactly ONE row (the winning pair); the word table
    is localCheckpoint-ed each round — load-bearing, not hygiene:
    CollapseProject would otherwise inline every fold into the next
    round's expression, and with ~4 references to ``syms`` per merge
    the interpreted HOF tree re-evaluates the lower chain ~4^r times
    (the r3 shingle-inlining trap). At 10^12 docs the word table is
    ~10^8 rows — n_merges · (one vocab-agg + one vocab-map), zero
    corpus rescans."""
    wc = word_counts(docs, text_col).withColumn(
        "syms", char_syms(F.col("word"))
    ).select("word", "wcnt", "syms").localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    cur = wc
    for _ in range(n_merges):
        m = F.size(F.col("syms"))
        pairs = F.zip_with(
            F.slice("syms", 1, F.greatest(m - 1, F.lit(0))),
            F.slice("syms", 2, F.greatest(m - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
        top = (
            cur.select(F.explode(pairs).alias("pair"), "wcnt")
            .groupBy("pair")
            .agg(F.sum("wcnt").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        a, b = pair.split(" ", 1)
        merges.append((a, b, cnt))
        nxt = cur.select(
            "word", "wcnt",
            apply_merge(F.col("syms"), a, b).alias("syms"),
        )
        cur = nxt.localCheckpoint(eager=True)

    spark = docs.sparkSession
    table = spark.createDataFrame(
        [(i + 1, f"{a} {b}", c) for i, (a, b, c) in enumerate(merges)],
        "step int, pair string, cnt long",
    ).orderBy("step")
    return table, merges, cur


def encode_piece_counts(docs: DataFrame,
                        merges: list[tuple[str, str, int]] | None = None,
                        id_col: str = "doc_id", text_col: str = "text",
                        vocab: DataFrame | None = None) -> DataFrame:
    """Per-document BPE segmentation statistics under a learned merge
    list: ``(doc_id, n_words, n_pieces)`` where ``n_pieces`` is the
    total symbol count after applying every merge, in order, to every
    word.

    Scale shape: merges are applied VOCAB-side, never corpus-side — the
    fold runs once per unique word (bounded ~10^8 at web scale), not
    once per occurrence (10^12), with a localCheckpoint per round so
    CollapseProject can't inline the fold chain into a ~4^r-times
    re-evaluated expression tree (measured 150s → 3s at sf0.01). Piece
    counts then join back to the exploded corpus on ``word`` — left
    un-hinted so AQE broadcasts the vocab when it fits and skew-splits
    the Zipf-headed key when it doesn't. Pass ``vocab`` (the final
    state ``learn_merges`` returns) to skip re-applying the merges."""
    if vocab is None:
        if merges is None:
            raise ValueError("need merges or a precomputed vocab")
        cur = word_counts(docs, text_col).select(
            "word", char_syms(F.col("word")).alias("syms")
        ).localCheckpoint(eager=True)
        for a, b, *_ in merges:
            cur = cur.select(
                "word", apply_merge(F.col("syms"), a, b).alias("syms")
            ).localCheckpoint(eager=True)
        vocab = cur
    enc = vocab.select(
        "word", F.size("syms").cast("long").alias("_npieces"))

    toks = F.coalesce(
        text.tokens(F.lower(F.col(text_col))),
        F.array().cast("array<string>"),
    )
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    per_doc = (
        base.select(F.col(id_col), F.explode("_toks").alias("word"))
        .join(enc, "word")
        .groupBy(id_col)
        .agg(F.sum("_npieces").alias("_sum_pieces"))
    )
    return (
        base.select(F.col(id_col),
                    F.size("_toks").cast("long").alias("n_words"))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col), "n_words",
            F.coalesce("_sum_pieces", F.lit(0).cast("long"))
            .alias("n_pieces"),
        )
    )
