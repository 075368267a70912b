"""Distributed Bloom-filter membership — the approximate-membership
companion to the profiler's HyperLogLog distinct (A2).

Why it exists at 10^12 documents: the referential rule's broadcast anti-join
(rules/builtin.referential, reference J2) assumes the media catalog fits in
every executor. When the catalog itself is billions of rows, the exact check
becomes a shuffle anti-join — and a Bloom prefilter built FROM the catalog
lets every ref that misses the filter be flagged dangling map-side, with
zero join, while only the "maybe present" rows (true members + the small
false-positive tail) pay the shuffle. No false negatives, so the split is
exact: miss ⇒ definitely dangling.

Engine-portable by construction: hash positions derive from ``md5`` (bit
identical in every engine — never ``xxhash64``, which is Spark-private), and
the bitset packs 32 bits per int64 word so ``1 << bit`` never touches the
sign bit; the whole filter is reproducible from the data alone and
oracle-checkable in SQL.

The bitset is a (word_idx, word) DataFrame of ``m_bits/32`` rows — for the
default 64Ki bits that is 2048 rows ≈ 16 KiB, broadcast to every probe task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k Bloom positions in [0, m_bits): md5 of "seed:key", first 15 hex
    digits (< 2^60, sign-safe in int64), mod m. md5 keeps the filter
    bit-identical across engines and runs."""
    return [
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.lit(i), key.cast("string"))), 1, 15),
                16, 10,
            ).cast("long"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def bloom_bitset(df: DataFrame, key_col: str, m_bits: int = 65536,
                 k: int = 3) -> DataFrame:
    """Build the Bloom bitset from ``df[key_col]``: one explode of the k
    positions per key, then ``bit_or`` of 32-bit lamps grouped by word —
    a two-level hash aggregation (map-side partial ``bit_or``), never a
    driver-side loop. Returns (word_idx: long, word: long), omitting
    all-zero words (probes treat absent words as 0)."""
    assert m_bits % 32 == 0
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("_p")
    return (
        df.select(pos)
        .select(
            (F.col("_p") / 32).cast("long").alias("word_idx"),
            # expr: the python shiftleft() wrapper only takes literal bit
            # counts, the SQL function takes a column
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p, 32) AS INT))").alias("_lamp"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_lamp").alias("word"))
    )


def bloom_maybe_contains(df: DataFrame, key_col: str, bitset: DataFrame,
                         m_bits: int = 65536, k: int = 3) -> DataFrame:
    """Annotate each row with ``maybe_present``: true iff ALL k Bloom bits
    are set. Physical shape: k successive broadcast-hash left joins of the
    tiny bitset (one per hash function) AND'd map-side — ZERO shuffles on
    the probe side, so key skew is irrelevant and the pass fuses into
    whatever scan feeds it."""
    out = df
    cond = F.lit(True)
    for i, p in enumerate(_positions(F.col(key_col), m_bits, k)):
        w, word = f"_w{i}", f"_word{i}"
        out = out.withColumn(w, (p / 32).cast("long")) \
                 .withColumn(f"_b{i}", (p % 32).cast("int"))
        out = out.join(
            F.broadcast(
                bitset.select(F.col("word_idx").alias(w), F.col("word").alias(word))
            ),
            w, "left",
        )
        cond = cond & F.coalesce(
            F.expr(f"(shiftright({word}, _b{i}) & 1) = 1"), F.lit(False)
        )
    return out.select(*df.columns, cond.alias("maybe_present"))
