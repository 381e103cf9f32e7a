"""Deterministic sampling for training-data curation: stratified fractions,
exact per-stratum quotas, and weighted mixture composition.

Real pipelines downsample/mix corpora by source, language, or quality band
("data mixing"); doing it with ``rand()`` makes runs irreproducible and
oracle-unverifiable. Every operator here derives its randomness from the
md5 of a stable row key (:mod:`flink_1_12_2_spark.llm.hashing`), so:

- the same row always gets the same draw (re-runs, retries, and different
  cluster sizes produce identical samples — content-addressed sampling);
- a DuckDB oracle reproduces the exact output rows, not just counts;
- adding rows never flips the decision of existing rows (fraction mode).

Scale: fraction sampling is a pure per-row filter (no shuffle, pushes into
the scan stage); exact-quota sampling is a salted two-phase top-k (local
top-k per (stratum, bucket), exact rank over ≤ k·buckets survivors) so no
single task ever sorts a whole stratum.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from flink_1_12_2_spark.llm.hashing import md5int60

# md5int60 yields a uniform integer in [0, 2^60); dividing maps to [0, 1).
_DENOM = float(1 << 60)


def uniform_draw(key: Column, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1) from a row key (+ salt so
    independent sampling stages decorrelate)."""
    return md5int60(F.concat(key.cast("string"), F.lit(salt))) / F.lit(_DENOM)


def stratified_sample_fraction(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row of stratum ``s`` iff its deterministic draw <
    ``fractions[s]`` (unlisted strata use ``default_fraction``).

    Pure column filter — no shuffle, no state; the expected kept count per
    stratum is fraction × |stratum| with binomial concentration."""
    frac = F.lit(default_fraction)
    for s, f in fractions.items():
        frac = F.when(F.col(strata_col) == s, F.lit(float(f))).otherwise(frac)
    return df.filter(uniform_draw(F.col(key_col), salt) < frac)


def stratified_sample_exact(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    salt: str = "",
    num_buckets: int = 64,
) -> DataFrame:
    """EXACTLY ``quotas[s]`` rows per stratum (fewer when the stratum is
    smaller): rank rows inside each stratum by their deterministic draw and
    keep the first k — a content-addressed reservoir whose result is
    independent of partitioning and row order.

    Scale: a single ``Window.partitionBy(strata_col)`` would funnel each
    whole stratum through ONE task's sort (5 strata over 100 TB → 5 tasks
    sorting ~20 TB each). Instead, a salted two-phase top-k:

    1. bucket each row into ``(stratum, draw % num_buckets)`` and keep the
       local top-``k`` per bucket — ``num_buckets×`` parallel windows, each
       a streamed rank counter;
    2. exact global rank over the survivors — per stratum at most
       ``k·num_buckets`` rows reach the final window, so its single-task
       sort is bounded by the quota, not the stratum size.

    Exact because the global top-k by any total order is a subset of the
    union of per-bucket top-k for ANY partition of the rows into buckets.
    Ordering (draw, key) is identical to the one-phase form, so results are
    byte-identical and oracle-stable."""
    quota = F.lit(default_quota)
    for s, k in quotas.items():
        quota = F.when(F.col(strata_col) == s, F.lit(int(k))).otherwise(quota)
    draw = md5int60(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    w_local = Window.partitionBy(strata_col, "__bkt").orderBy(
        "__draw", F.col(key_col)
    )
    survivors = (
        df.withColumn("__draw", draw)
        .withColumn("__bkt", (F.col("__draw") % F.lit(int(num_buckets))))
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= quota)
    )
    w_global = Window.partitionBy(strata_col).orderBy("__draw", F.col(key_col))
    return (
        survivors.withColumn("__rn", F.row_number().over(w_global))
        .filter(F.col("__rn") <= quota)
        .drop("__draw", "__bkt", "__lrn", "__rn")
    )


def weighted_mixture(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Data mixing: compose a corpus from (DataFrame, keep_fraction) pairs —
    each source downsampled deterministically, then unioned. The fractions
    are per-source keep rates (the mixture weights after normalizing by
    source sizes); sampling stays a scan-stage filter per source."""
    out = None
    for i, (df, f) in enumerate(sources):
        part = df.filter(
            uniform_draw(F.col(key_col), f"{salt}|src{i}") < F.lit(float(f))
        )
        out = part if out is None else out.unionByName(part)
    return out


def dsir_logweight(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed bag-of-words
    features, unigram multinomial LMs for the target and raw corpora with
    Laplace smoothing, and the per-document importance log-weight

        log w(x) = sum_b c_x[b] * (log p_target[b] - log p_raw[b]).

    Cross-engine determinism: the per-bucket log-ratio is quantized to
    integer MICRONATS (``round(1e6 * ln ratio)``) before the per-document
    summation, so the doc weight is an exact BIGINT sum — immune to
    floating-point addition order across partitions (the one place the
    naive double formulation diverges run-to-run and engine-to-engine).

    Scale: the token→bucket explode combines map-side into <= n_buckets
    stats rows; the quantized stats broadcast back onto the exploded
    stream; the per-doc weight is an exact-integer partial aggregate that
    CARRIES the requested doc attributes through the groupBy (constant
    per doc) instead of joining back against the corpus — no second
    fact-sized join, no window, no driver collect; both shuffles are
    map-combinable and the stats side stays O(n_buckets) regardless of
    corpus size. Returns one row per document with >= 1 token:
    (id, carry..., n_feat, logweight_micro).
    """
    from flink_1_12_2_spark.llm.text import tokens

    carry = [F.col(c) for c in carry_cols]
    ex = docs.select(
        F.col(id_col),
        *carry,
        is_target.alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).select(
        id_col,
        *carry_cols,
        "__tgt",
        (md5int60(F.col("__tok")) % n_buckets).alias("__b"),
    )
    stats = ex.groupBy("__b").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.sum(F.when(F.col("__tgt"), 1).otherwise(0)).alias("tgt_c"),
    )
    tot = stats.agg(
        F.sum("raw_c").alias("__R"), F.sum("tgt_c").alias("__T")
    )
    terms = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "term_micro",
            F.round(
                F.lit(1e6)
                * (
                    F.log((F.col("tgt_c") + 1) / (F.col("__T") + n_buckets))
                    - F.log((F.col("raw_c") + 1) / (F.col("__R") + n_buckets))
                )
            ).cast("bigint"),
        )
        .select("__b", "term_micro")
    )
    return (
        ex.join(F.broadcast(terms), "__b")
        .groupBy(id_col, *carry_cols)
        .agg(
            F.count(F.lit(1)).alias("n_feat"),
            F.sum("term_micro").alias("logweight_micro"),
        )
    )
