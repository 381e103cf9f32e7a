

"""LLM-pipeline operator unit tests on crafted fixtures (algorithm
arithmetic that the corpus-level DuckDB oracles can't pin one case at a
time)."""

from __future__ import annotations


def test_exact_substring_extension_math(spark):
    """Two docs sharing an exact 20-token run (and nothing else aligned):
    with window=15 the run yields 6 consecutive shared spans on one
    diagonal -> match_tokens = 6 + 15 - 1 = 20. A third doc with no
    15-token overlap never pairs."""
    from flink_1_12_2_spark.llm.dedup import exact_substring_pairs

    run = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, "alpha beta " + run + " gamma"),
        (2, run + " delta epsilon"),
        (3, " ".join(f"x{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        tuple(r)
        for r in exact_substring_pairs(df, window=15).orderBy("id_1").collect()
    ]
    assert got == [(1, 2, 6, 20)]


def test_exact_substring_boilerplate_cap(spark):
    """A window shared by MORE than max_bucket docs is excluded before the
    self-join (the quadratic-bucket guard), so viral boilerplate produces
    zero pairs."""
    from flink_1_12_2_spark.llm.dedup import exact_substring_pairs

    run = " ".join(f"b{i}" for i in range(15))
    df = spark.createDataFrame(
        [(i, run) for i in range(5)], "doc_id long, text string"
    )
    assert exact_substring_pairs(df, window=15, max_bucket=3).count() == 0
    assert exact_substring_pairs(df, window=15, max_bucket=10).count() == 10
