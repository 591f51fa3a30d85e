"""Distributed Bloom filter as a tiny DataFrame of int64 bitmask words.

Spark's internal ``BloomFilterAggregate`` powers runtime join filters but is
not SQL-registered, so this is the portable equivalent built from public
DataFrame ops only: k bit positions per key via Kirsch–Mitzenmacher double
hashing (h1 + i·h2 mod m — two xxhash64 calls give all k functions), packed
into ``m/64`` rows of ``(word_idx, word)`` with a ``bit_or`` hash-agg.

Why this matters at 100 TB: an exact contamination blocklist of 10^9
shingles is ~40 GB — not broadcastable — but its 10-bits-per-key Bloom image
is ~1.2 GB and drops ~99% of probe rows MAP-SIDE before the exact
(shuffled) confirm join. No false negatives, so prefilter + exact join is
byte-identical to the exact join alone; the filter only buys the plan, not
a semantics change. The probe is k chained broadcast joins on word_idx with
progressive filtering — zero exchange on the probe side (plan-pinned in
tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 20
DEFAULT_HASHES = 4


def _positions(key_col: str, n_bits: int, n_hashes: int):
    """k bit positions for a key: pmod(h1 + i*h2, m). h2 == 0 degrades k
    positions to one (more false positives, never a false negative)."""
    # reduce mod m BEFORE combining: raw xxhash64 values sit at the int64
    # edges and h1 + i*h2 overflows under ANSI (the sum(xxhash64) gotcha)
    h1 = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(F.col(key_col), F.lit("bloom-h2")), F.lit(n_bits))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]


def _bit(pos):
    """int64 single-bit mask for a position's low 6 bits (call_function
    because the PySpark shiftleft wrapper only takes a literal count)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Build the filter: ``(word_idx, word)`` rows, at most ``n_bits/64`` of
    them (words with no bits set are absent — the probe treats a missing
    word as zero). One explode (k rows per key) + one hash-agg; partial
    aggregation makes the shuffle k·n_distinct_words rows at most."""
    pos = F.explode(F.array(*_positions(key_col, n_bits, n_hashes))).alias("__pos")
    bits = keys.select(pos).select(
        (F.col("__pos") / 64).cast("long").alias("word_idx"),
        _bit(F.col("__pos")).alias("__mask"),
    )
    return bits.groupBy("word_idx").agg(F.bit_or("__mask").alias("word"))


def bloom_prefilter(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    n_bits: int = DEFAULT_BITS,
    n_hashes: int = DEFAULT_HASHES,
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the filter's key set (false
    positives possible, false negatives impossible — always follow with an
    exact confirm join when exactness matters).

    The probe is k broadcast joins against the (tiny) word table, each
    followed immediately by a bit-test filter, so rows short-circuit out
    at their first cleared bit and the probe side never shuffles. The
    same broadcast is reused across the k joins (one exchange total).
    """
    out = df
    positions = _positions(key_col, n_bits, n_hashes)
    for i, pos in enumerate(positions):
        w, b, m = f"__w{i}", f"__word{i}", f"__mask{i}"
        out = (
            out.withColumn(w, (pos / 64).cast("long"))
            .withColumn(m, _bit(pos))
            .join(
                F.broadcast(
                    bloom.select(
                        F.col("word_idx").alias(w), F.col("word").alias(b)
                    )
                ),
                w,
                "left",
            )
            .filter(F.coalesce(F.col(b), F.lit(0)).bitwiseAND(F.col(m)) != 0)
            .drop(w, b, m)
        )
    return out
