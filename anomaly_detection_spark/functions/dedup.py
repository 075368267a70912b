"""Deduplication operators for web-scale corpora.

Exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
SimHash, and n-gram Jaccard — each expressed with JVM-side Column functions
so dedup of 10^12 docs is shuffle-bound, not Python-bound.

Design notes for 100 TB:
* exact dedup is one hash-agg on md5(text) — map-side partial agg collapses
  most of the shuffle;
* MinHash signatures are computed per-row without any shuffle; the only
  shuffle is the band-bucket groupBy, whose fan-in is bounded by bucket
  sizes (salt-able if a bucket explodes);
* candidate pairs never materialize the O(n²) cross product — pairs come
  from within-bucket joins only.

Hashing uses md5 hex strings (lexicographic min of uniformly-distributed hex
is a valid min-hash) because md5 is bit-identical across Spark, DuckDB and
every SQL engine — which makes every operator here oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from anomaly_detection_spark.functions.text import tokens


# ------------------------------------------------------------------ exact

def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """(text_hash, dup_count, canonical_id) for every text appearing >1 time.
    canonical = min id (the row a dedup pass would keep)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("dup_count"), F.min(id_col).alias("canonical_id"))
        .filter(F.col("dup_count") > 1)
    )


# ---------------------------------------------------------------- minhash

def shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as strings ('w1 w2 w3'); empty array if < n tokens."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    return F.when(k >= 1, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )).otherwise(F.array().cast("array<string>"))


def minhash_col(col: Column | str, seed: int, n: int = 3) -> Column:
    """One MinHash value: lexicographic min of md5('<seed>:' || shingle).
    md5 output is uniform ⇒ min over hex strings is a proper min-hash."""
    sh = shingles(col, n)
    return F.array_min(
        F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 8, n: int = 3) -> DataFrame:
    """(id, mh0..mh{k-1}) signature frame — computed in one narrow projection."""
    return df.select(
        F.col(id_col),
        *[minhash_col(F.col(text_col), seed=i, n=n).alias(f"mh{i}") for i in range(k)],
    )


def lsh_candidate_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 8, bands: int = 2, n: int = 3) -> DataFrame:
    """MinHash-LSH: band the k-row signature into ``bands`` buckets; docs
    sharing any band bucket become candidate pairs (id_a < id_b, distinct).

    The join is per-bucket, so complexity is Σ|bucket|² not n² — the LSH
    scale path. Returns (id_a, id_b)."""
    rows_per_band = k // bands
    sig = minhash_signature(df, text_col, id_col, k=k, n=n)
    buckets = None
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + j}" for j in range(rows_per_band)]
        band = sig.select(
            F.col(id_col),
            F.md5(F.concat_ws("|", F.lit(str(b)), *cols)).alias("bucket"),
        ).filter(F.col(cols[0]).isNotNull())
        buckets = band if buckets is None else buckets.unionByName(band)
    a = buckets.select(F.col(id_col).alias("id_a"), "bucket")
    b_ = buckets.select(F.col(id_col).alias("id_b"), "bucket")
    return (
        a.join(b_, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# ---------------------------------------------------------------- simhash

def simhash_hex16(col: Column | str, n: int = 1) -> Column:
    """16-bit SimHash as a bit string, one bit per hex position of each
    token's md5: bit_i = majority over tokens of (hexdigit_i >= 8).

    A compact locality-sensitive fingerprint: near-identical token multisets
    yield identical or near-identical fingerprints. Expressed entirely with
    string ops so the DuckDB oracle can reproduce it bit-for-bit."""
    sh = shingles(col, n) if n > 1 else tokens(col)
    hashes = F.transform(sh, lambda s: F.md5(s))
    bits = []
    for i in range(1, 17):
        ones = F.size(F.filter(
            hashes,
            lambda h: F.instr(F.lit("89abcdef"), F.substring(h, i, 1)) > 0,
        ))
        bits.append(F.when(ones * 2 >= F.size(hashes), F.lit("1")).otherwise(F.lit("0")))
    return F.when(F.size(hashes) > 0, F.concat(*bits)).otherwise(F.lit(None))


# ----------------------------------------------------------- n-gram jaccard

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Jaccard similarity of n-gram shingle sets for candidate pairs.

    ``candidates`` (id_a, id_b) bounds the join — feed LSH output here; when
    None, a conservative blocking key (same token-count bucket) is used so
    the pair space stays near-linear."""
    sets = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), n)).alias("_sh"),
        (F.size(tokens(F.col(text_col))) / 10).cast("long").alias("_blk"),
    )
    if candidates is None:
        a = sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "_blk")
        b = sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "_blk")
        pairs = a.join(b, "_blk").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = (
            candidates
            .join(sets.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a")), "id_a")
            .join(sets.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b")), "id_b")
        )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return pairs.select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
