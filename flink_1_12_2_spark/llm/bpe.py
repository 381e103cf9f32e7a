"""BPE merge-rule training as ONE Catalyst plan (no driver loop).

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
single tiny all-to-one aggregate for the argmax and a broadcast of the
1-row winner. Each round's word table persists (vocabulary-sized cache)
so round k is not recomputed by rounds k+1..n.

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

    Each round aggregates pair counts over the cached vocabulary table and
    collects exactly ONE row — the winning merge rule. Merge rules are
    index metadata (they ARE the trained tokenizer), so the per-round
    1-row collect is the same policy as IVF centroid collection; the
    merge application stays a distributed literal replace. This keeps
    every round a single small job instead of a deepening plan that the
    final union would re-execute once per round."""
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
    for k in range(1, rounds + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_cnt"), "l", "r")
            .limit(1)
            .collect()[0]
        )
        merges.append((k, best["l"], best["r"], best["pair_cnt"]))
        nxt = words.select(
            F.replace(
                F.col("sp"),
                F.lit(f" {best['l']} {best['r']} "),
                F.lit(f" {best['l']}{best['r']} "),
            ).alias("sp"),
            "cnt",
        ).persist()
        words.unpersist()
        words = nxt
    words.unpersist()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_cnt bigint"
    )
