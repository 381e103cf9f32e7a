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
