"""Hot-key guards and candidate-pruning semantics of the dedup family:
the df-cap drops hot keys from CANDIDATE GENERATION only, verification of
surviving candidates stays exact, and the capped paths are supersets at
test scale (cap = 1000 never triggers on the synthetic corpora)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_12_2_spark.llm import dedup as D


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap here at all"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_cap_inert_when_high(spark):
    d = _docs(spark)
    pairs = D.ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.3).collect()
    assert {(r.id_1, r.id_2) for r in pairs} == {(1, 2)}
    # jaccard is exact: docs 1/2 share 6 of 8 distinct 3-gram shingles
    assert abs(pairs[0].jaccard - 6 / 8) < 1e-12


def test_ngram_cap_drops_hot_shingles_from_candidates(spark):
    # cap=1: every SHARED shingle has df >= 2 > cap, so no candidates can
    # form — the pair disappears (recall trade), no wrong jaccard is emitted
    d = _docs(spark)
    out = D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.3, shingle_df_cap=1
    ).collect()
    assert out == []


def test_ngram_hot_verify_path_is_exact(spark):
    # a genuinely hot shingle (df=4 > cap=2) forces the full hot-verify
    # plan (the r13 empty-hot probe must NOT take the pruned fast path):
    # docs 1/2 pair up via their cold shingles and, as hot carriers, get
    # the exact array-verified jaccard over FULL shingle sets — hot one
    # included. Docs 3/4 overlap doc 1 only through the hot shingle, so
    # those pairs are dropped (the documented pure-boilerplate recall
    # trade).
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "alpha beta gamma xxx yyy zzz"),
        (4, "alpha beta gamma ppp qqq rrr"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = D.ngram_jaccard_pairs(
        d, "doc_id", "text", threshold=0.5, shingle_df_cap=2
    ).collect()
    assert {(r.id_1, r.id_2) for r in pairs} == {(1, 2)}
    # doc1/doc2: 4 shingles each, 3 shared (incl. the hot one) -> 3/5
    assert abs(pairs[0].jaccard - 3 / 5) < 1e-12


def test_lsh_band_cap_prunes_candidates(spark):
    d = _docs(spark)
    sigs = D.minhash_signatures(d, "doc_id", "text")
    with_cap = D.lsh_candidate_pairs(sigs, "doc_id", band_df_cap=1).collect()
    without = D.lsh_candidate_pairs(sigs, "doc_id").collect()
    assert with_cap == []  # shared bands have df 2 > 1
    assert {(r.id_1, r.id_2) for r in without} >= {(1, 2)}


def test_cosine_banded_is_subset_of_exact(spark):
    rows = [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(20)
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.id_1, r.id_2)
        for r in D.cosine_pairs(e, "vec_id", "embedding", 0.35, exact=True).collect()
    }
    banded = {
        (r.id_1, r.id_2)
        for r in D.cosine_pairs(e, "vec_id", "embedding", 0.35, exact=False).collect()
    }
    assert banded <= exact
    assert banded  # deterministic vectors: identical rows always collide


def test_cosine_auto_mode_is_exact_below_cutoff(spark):
    # exact=None (default) brute-forces small corpora: result == exact set
    rows = [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(8)]) for i in range(20)
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    auto = {
        (r.id_1, r.id_2)
        for r in D.cosine_pairs(e, "vec_id", "embedding", 0.35).collect()
    }
    exact = {
        (r.id_1, r.id_2)
        for r in D.cosine_pairs(e, "vec_id", "embedding", 0.35, exact=True).collect()
    }
    assert auto == exact


def test_simhash_hot_band_refined_not_dropped(spark):
    """With band_df_cap=1 EVERY band bucket holding a qualifying pair is hot;
    the sub-band refinement must still recover the full brute-force pair set
    (the r3 ADVICE divergence: dropping hot bands silently lost true pairs
    while the oracle brute-forced all pairs)."""
    rows = [
        (i, f"token{i % 4} alpha beta gamma delta epsilon zeta eta theta")
        for i in range(12)
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = {
        (r.id_1, r.id_2, r.hamming)
        for r in D.simhash_pairs(
            d, "doc_id", "text", max_distance=3, band_df_cap=10**9
        ).collect()
    }
    capped = {
        (r.id_1, r.id_2, r.hamming)
        for r in D.simhash_pairs(
            d, "doc_id", "text", max_distance=3, band_df_cap=1
        ).collect()
    }
    assert uncapped  # docs sharing 8 of 9 tokens: near-identical simhashes
    assert capped == uncapped


# ---- deterministic sampling invariants (llm/sampling.py) ------------------


def test_fraction_sampling_is_partitioning_invariant(spark):
    from flink_1_12_2_spark.llm.sampling import stratified_sample_fraction

    rows = [(i, "a" if i % 2 else "b") for i in range(500)]
    d1 = spark.createDataFrame(rows, ["doc_id", "lang"])
    d2 = spark.createDataFrame(rows, ["doc_id", "lang"]).repartition(13)
    pick = lambda d: sorted(
        r.doc_id
        for r in stratified_sample_fraction(
            d, "doc_id", "lang", {"a": 0.3, "b": 0.7}
        ).collect()
    )
    s1 = pick(d1)
    assert s1 == pick(d2)  # content-addressed: layout cannot change the set
    assert 0 < len(s1) < 500


def test_exact_quota_is_exact_and_order_invariant(spark):
    from flink_1_12_2_spark.llm.sampling import stratified_sample_exact

    rows = [(i, f"s{i % 4}") for i in range(200)]
    d = spark.createDataFrame(rows, ["doc_id", "src"])
    out = stratified_sample_exact(
        d, "doc_id", "src", {f"s{k}": 7 for k in range(4)}
    )
    per = {
        r.src: r.n
        for r in out.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per == {f"s{k}": 7 for k in range(4)}
    shuffled = stratified_sample_exact(
        d.repartition(17), "doc_id", "src", {f"s{k}": 7 for k in range(4)}
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_salt_decorrelates_draws(spark):
    from flink_1_12_2_spark.llm.sampling import stratified_sample_fraction

    rows = [(i, "x") for i in range(400)]
    d = spark.createDataFrame(rows, ["doc_id", "lang"])
    a = {
        r.doc_id
        for r in stratified_sample_fraction(
            d, "doc_id", "lang", {"x": 0.5}, salt="s1"
        ).collect()
    }
    b = {
        r.doc_id
        for r in stratified_sample_fraction(
            d, "doc_id", "lang", {"x": 0.5}, salt="s2"
        ).collect()
    }
    assert a != b  # different salts → different (deterministic) samples


def test_two_phase_quota_equals_single_window_reference(spark):
    """The salted two-phase top-k (r5 scale fix) must be byte-identical to
    the naive single Window.partitionBy(stratum) reference — global top-k
    is a subset of the union of per-bucket top-k for any bucketing."""
    from pyspark.sql import Window

    from flink_1_12_2_spark.llm.hashing import md5int60
    from flink_1_12_2_spark.llm.sampling import stratified_sample_exact

    rows = [(i, f"s{i % 3}") for i in range(500)]
    d = spark.createDataFrame(rows, ["doc_id", "src"])
    quotas = {"s0": 11, "s1": 1, "s2": 40}
    two_phase = stratified_sample_exact(d, "doc_id", "src", quotas)

    # naive reference: one window per stratum (the r4 implementation)
    quota = F.lit(0)
    for s, k in quotas.items():
        quota = F.when(F.col("src") == s, F.lit(k)).otherwise(quota)
    w = Window.partitionBy("src").orderBy(
        md5int60(F.concat(F.col("doc_id").cast("string"), F.lit(""))),
        F.col("doc_id"),
    )
    ref = (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
    )
    assert sorted(map(tuple, two_phase.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # tiny bucket count stresses the phase-2 exactness (buckets << quota)
    tp2 = stratified_sample_exact(d, "doc_id", "src", quotas, num_buckets=2)
    assert sorted(map(tuple, tp2.collect())) == sorted(map(tuple, ref.collect()))


def test_incremental_exact_dedup_filters_both_ways(spark):
    """Cross-snapshot dedup must drop batch rows whose content exists in
    the snapshot AND collapse duplicates within the batch (keep-first),
    while genuinely-new content survives with its copy count."""
    from flink_1_12_2_spark.llm.dedup import incremental_exact_dedup

    existing = spark.createDataFrame(
        [(1, "old news"), (2, "evergreen page")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [
            (10, "old news"),        # re-crawl -> filtered by the index
            (11, "fresh story"),     # new, twice in the batch
            (12, "fresh story"),
            (13, "another new one"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["keeper_id"]: r["n_copies"]
        for r in incremental_exact_dedup(existing, incoming).collect()
    }
    assert out == {11: 2, 13: 1}
