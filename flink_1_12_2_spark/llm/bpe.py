"""BPE merge-rule training: vocabulary-grain rounds, 1-row merge collects.

Byte-pair-encoding training (Sennrich et al. 2016; the tokenizer-training
step of every LLM data pipeline): start from characters (+ an end-of-word
marker), repeatedly merge the most frequent adjacent symbol pair. Each
round here is an unrolled DataFrame stage — pair counts are exact
integers over the DISTINCT-WORD grain weighted by word frequency, the
winning pair is a deterministic (count DESC, left, right) top-1, and the
merge applies via literal string ``replace`` on a space-separated symbol
string (left-to-right non-overlapping — exactly BPE's greedy-left
application; verified identical in Spark and DuckDB).

Scale (100 TB): the corpus-sized work is ONE map-combinable word-count
aggregation; every merge round then operates on the distinct-word table
(vocabulary-sized — millions of rows regardless of corpus size) with a
single tiny all-to-one aggregate whose 1-row winner is collected (merge
rules ARE the trained tokenizer — index metadata, the IVF-centroid
policy). Round k's vocabulary cache is materialized by round k+1's
aggregate BEFORE round k-1's cache is dropped, so the corpus is scanned
exactly once.

Cross-engine determinism: counts are exact ints; ties break
lexicographically; the symbol-string replace is literal (no regex, no
floats anywhere).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BPE_ROUNDS = 8


def spaced_symbols(word) -> F.Column:
    """'hello' -> ' h e l l o </w> ' (single-space separated, padded)."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(word, "(.)", "$1 ")),
        F.lit(" </w> "),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = F.split(F.trim(F.col("sp")), " ")
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda x, y: F.struct(x.alias("l"), y.alias("r")),
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("pair_cnt"))
    )


def bpe_train(docs: DataFrame, text_col: str, rounds: int = BPE_ROUNDS) -> DataFrame:
    """Train ``rounds`` BPE merges; returns (rank, lhs, rhs, pair_cnt).

    Each round aggregates pair counts over the cached vocabulary table
    and collects exactly ONE row — the winning merge rule; training ends
    early if the pair stream runs dry. The previous round's cache is
    dropped only AFTER the current aggregate has materialized its
    successor, so no round ever recomputes back to the corpus."""
    from flink_1_12_2_spark.llm.text import tokens

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(spaced_symbols(F.col("w")).alias("sp"), "cnt")
        .persist()
    )
    merges: list[tuple[int, str, str, int]] = []
    prev: DataFrame | None = None
    for k in range(1, rounds + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("pair_cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        # the collect just materialized `words`' cache, so its parent's
        # cache is no longer needed by anything downstream
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:  # vocabulary ran out of adjacent pairs
            break
        best = top[0]
        merges.append((k, best["l"], best["r"], best["pair_cnt"]))
        nxt = words.select(
            F.replace(
                F.col("sp"),
                F.lit(f" {best['l']} {best['r']} "),
                F.lit(f" {best['l']}{best['r']} "),
            ).alias("sp"),
            "cnt",
        ).persist()
        prev = words
        words = nxt
    words.unpersist()
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_cnt bigint"
    )
