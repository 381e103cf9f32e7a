

def test_dsir_weight_exactness_and_signal(spark, sf_dir):
    """DSIR: per-doc logweight equals a Python recomputation of the exact
    integer-micronat formula (bit-for-bit), and the length-normalized
    ranking enriches the target language above its base rate."""
    import hashlib
    import math
    from collections import Counter, defaultdict

    from flink_1_12_2_spark.llm.sampling import dsir_logweight
    from flink_1_12_2_spark.registry import load

    import pyspark.sql.functions as F

    d = load(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["n_feat"], r["logweight_micro"])
        for r in dsir_logweight(
            d, is_target=F.col("lang") == "en", carry_cols=("lang",)
        ).collect()
    }

    B = 1024
    docs = d.select("doc_id", "lang", "text").collect()
    raw_c: Counter = Counter()
    tgt_c: Counter = Counter()
    doc_buckets: dict[int, list[int]] = defaultdict(list)
    for r in docs:
        toks = [t for t in r["text"].split() if t]
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
            raw_c[b] += 1
            if r["lang"] == "en":
                tgt_c[b] += 1
            doc_buckets[r["doc_id"]].append(b)
    R, T = sum(raw_c.values()), sum(tgt_c.values())
    # mirror of llm/sampling.dsir_term_stages: the engine-portable ln (no
    # libm) + half-away-from-zero rounding on the EXACT binary double —
    # bit-identical to both Spark and DuckDB by construction
    from decimal import ROUND_HALF_UP, Decimal

    from flink_1_12_2_spark.llm.sampling import portable_ln_py

    def _round_half_away(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    term = {
        b: _round_half_away(
            1000000.0
            * (
                (portable_ln_py(tgt_c[b] + 1) - portable_ln_py(T + B))
                - (portable_ln_py(raw_c[b] + 1) - portable_ln_py(R + B))
            )
        )
        for b in raw_c
    }
    # the portable ln stays within 1e-9 of libm ln on every input seen here
    for n in set(
        [T + B, R + B]
        + [c + 1 for c in raw_c.values()]
        + [c + 1 for c in tgt_c.values()]
    ):
        assert abs(portable_ln_py(n) - math.log(n)) < 1e-9, n
    for doc_id, bs in doc_buckets.items():
        n, lw = got[doc_id]
        assert n == len(bs)
        assert lw == sum(term[b] for b in bs), doc_id

    # signal: mean per-token weight of target-language docs exceeds rest
    by_lang: dict[str, list[float]] = defaultdict(list)
    for r in docs:
        n, lw = got[r["doc_id"]]
        by_lang[r["lang"]].append(lw / n)
    en = sum(by_lang["en"]) / len(by_lang["en"])
    rest = [v for k, vs in by_lang.items() if k != "en" for v in vs]
    assert en > sum(rest) / len(rest)


def _ln_sweep_inputs() -> list[int]:
    """210 integers spanning the portable-ln domain: small counts, values
    around every power of two (range-reduction boundaries), and the 2^52
    ceiling. The r7 staged SQL failed BIT-equality on 204 of these (Spark
    typed the Horner coefficients DECIMAL(8,6))."""
    ns = set(range(1, 171))
    for k in (10, 20, 30, 40, 50, 52):
        ns.update({(1 << k) - 1, 1 << k, (1 << k) + 1})
    ns.update({999983, 10**9 + 7, 10**12 + 39, (1 << 52) - 12345})
    return sorted(n for n in ns if 1 <= n <= (1 << 52))[:210]


def test_portable_ln_bit_sweep_spark_vs_python(spark):
    """Regression for the r7 driver-red: the staged SQL ln evaluated BY
    SPARK must be bit-identical (struct.pack) to portable_ln_py on every
    sweep input — not merely close. Fails on the pre-r8 emission where
    bare decimal literals parsed as DECIMAL, not DOUBLE."""
    import struct

    import pyspark.sql.functions as F

    from flink_1_12_2_spark.llm.sampling import (
        portable_ln_py,
        portable_ln_stages,
    )

    ns = _ln_sweep_inputs()
    df = spark.createDataFrame([(n,) for n in ns], "n BIGINT")
    for col, expr in portable_ln_stages("p", "n"):
        df = df.withColumn(col, F.expr(expr))
    got = {r["n"]: r["p_ln"] for r in df.select("n", "p_ln").collect()}
    bad = [
        n
        for n in ns
        if struct.pack("<d", got[n])
        != struct.pack("<d", portable_ln_py(n))
    ]
    assert not bad, f"{len(bad)} bit mismatches, first: {bad[:5]}"


def test_portable_ln_bit_sweep_duckdb_vs_python():
    """The oracle engine half of the same sweep: DuckDB's evaluation of
    the staged SQL must bit-match portable_ln_py (this is what makes the
    driver-side DSIR term table unconditionally oracle-consistent)."""
    import struct

    import duckdb

    from flink_1_12_2_spark.llm.sampling import (
        portable_ln_py,
        portable_ln_stages,
        staged_select_sql,
    )

    ns = _ln_sweep_inputs()
    stages = portable_ln_stages("p", "n")
    vals = ", ".join(f"({n})" for n in ns)
    sql = (
        f"WITH src AS (SELECT CAST(n AS BIGINT) AS n FROM (VALUES {vals}) "
        f"t(n)),\n    {staged_select_sql('src', stages, 's')}\n"
        f"SELECT n, p_ln FROM s{len(stages) - 1}"
    )
    got = dict(duckdb.sql(sql).fetchall())
    bad = [
        n
        for n in ns
        if struct.pack("<d", got[n])
        != struct.pack("<d", portable_ln_py(n))
    ]
    assert not bad, f"{len(bad)} bit mismatches, first: {bad[:5]}"


def test_portable_ln_domain_guard(spark):
    """Inputs beyond 2^52 fail LOUDLY: ValueError in the Python mirror,
    NULL (not a plausible-wrong double) in the staged SQL."""
    import pytest as _pytest

    import pyspark.sql.functions as F

    from flink_1_12_2_spark.llm.sampling import (
        PORTABLE_LN_MAX,
        portable_ln_py,
        portable_ln_stages,
    )

    with _pytest.raises(ValueError):
        portable_ln_py(PORTABLE_LN_MAX + 1)
    with _pytest.raises(ValueError):
        portable_ln_py(0)
    df = spark.createDataFrame(
        [(PORTABLE_LN_MAX + 1,), (PORTABLE_LN_MAX,)], "n BIGINT"
    )
    for col, expr in portable_ln_stages("p", "n"):
        df = df.withColumn(col, F.expr(expr))
    rows = {r["n"]: r["p_ln"] for r in df.collect()}
    assert rows[PORTABLE_LN_MAX + 1] is None
    assert rows[PORTABLE_LN_MAX] is not None


def test_dsir_term_table_matches_duckdb_staged():
    """The driver-computed micronat term table (dsir_term_micro_py — what
    the engine now broadcasts) must equal DuckDB's evaluation of the
    staged dsir_term_stages SQL (what the oracle runs) on a grid of
    synthetic exact-integer stats, including counts adversarially near
    .5-micronat rounding boundaries."""
    import duckdb

    from flink_1_12_2_spark.llm.sampling import (
        dsir_term_micro_py,
        dsir_term_stages,
        staged_select_sql,
    )

    B = 1024
    cases = []
    t_tot, r_tot = 987654, 3456789
    for tgt_c in (0, 1, 2, 3, 17, 100, 999, 5000, 65536):
        for raw_c in (tgt_c, tgt_c + 1, tgt_c * 3 + 7, 10**6):
            cases.append((tgt_c, raw_c))
    vals = ", ".join(
        f"({t}, {r}, {t_tot}, {r_tot})" for t, r in cases
    )
    stages = dsir_term_stages(B)
    sql = (
        "WITH src AS (SELECT * FROM (VALUES "
        f"{vals}) t(tgt_c, raw_c, t_tot, r_tot)),\n    "
        + staged_select_sql("src", stages, "s")
        + f"\nSELECT tgt_c, raw_c, term_micro FROM s{len(stages) - 1}"
    )
    got = {(t, r): m for t, r, m in duckdb.sql(sql).fetchall()}
    for t, r in cases:
        assert got[(t, r)] == dsir_term_micro_py(t, r, t_tot, r_tot, B), (
            t,
            r,
        )


def test_bpe_train_matches_bruteforce(spark, sf_dir):
    """The one-plan BPE trainer equals a straightforward Python BPE
    (Sennrich alg.) on the same word counts: identical pairs, counts,
    and order for every round."""
    from collections import Counter

    from flink_1_12_2_spark.llm.bpe import bpe_train
    from flink_1_12_2_spark.registry import load

    got = [
        (r["rank"], r["lhs"], r["rhs"], r["pair_cnt"])
        for r in bpe_train(
            load(spark, sf_dir, "documents"), "text", rounds=6
        ).collect()
    ]

    docs = load(spark, sf_dir, "documents").select("text").collect()
    words: Counter = Counter()
    for r in docs:
        for w in r["text"].split():
            words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    expect = []
    for k in range(1, 7):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((k, l, r, c))
        merged = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + cnt
        vocab = merged
    assert got == expect


def _bruteforce_bpe(words, rounds):
    """Sennrich greedy-left reference BPE over a word Counter."""
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in words.items()}
    expect = []
    for k in range(1, rounds + 1):
        from collections import Counter

        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((k, l, r, c))
        merged = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            merged[tuple(out)] = merged.get(tuple(out), 0) + cnt
        vocab = merged
    return expect


def test_bpe_adjacent_repeats_greedy_left(spark):
    """The r6 advisor finding: a single-space replace consumes the shared
    delimiter, so in 'a a a a' only alternating occurrences merge. The
    space-doubling apply must match reference greedy-left BPE exactly on
    repeated-pair runs ('aaaa' -> [aa, aa], 'aaaaa' -> [aa, aa, a]) and on
    alternating patterns."""
    from collections import Counter

    from flink_1_12_2_spark.llm.bpe import bpe_train

    texts = [
        "aaaa aaaa aaaa",
        "aaaaa aaaaa",
        "ababab ababab ababab",
        "aaa bbb aaa",
        "banana bandana banana",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    words: Counter = Counter()
    for t in texts:
        for w in t.split():
            words[w] += 1
    expect = _bruteforce_bpe(words, 10)
    # three engine strategies, same output: driver-local indexed trainer
    # (default, vocab below _LOCAL_VOCAB_MAX), distributed recount, and
    # distributed delta (local path disabled via local_vocab_max=0)
    for inc, vmax in ((False, None), (False, 0), (True, 0)):
        kw = {} if vmax is None else {"local_vocab_max": vmax}
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["pair_cnt"])
            for r in bpe_train(
                docs, "text", rounds=10, incremental=inc, **kw
            ).collect()
        ]
        assert got == expect, f"incremental={inc} vmax={vmax}"


def test_bpe_train_64_merges(spark, sf_dir):
    """Real-vocabulary-scale round count (VERDICT r6 task): 64 incremental
    merge rounds equal brute-force Python BPE merge-for-merge."""
    from collections import Counter

    from flink_1_12_2_spark.llm.bpe import bpe_train
    from flink_1_12_2_spark.registry import load

    d = load(spark, sf_dir, "documents")
    words: Counter = Counter()
    for r in d.select("text").collect():
        for w in r["text"].split():
            words[w] += 1
    expect = _bruteforce_bpe(words, 64)
    # local trainer + both distributed strategies (which cross the ckpt
    # boundary); all three merge-for-merge equal to brute force
    for inc, vmax in ((False, None), (False, 0), (True, 0)):
        kw = {} if vmax is None else {"local_vocab_max": vmax}
        got = [
            (r["rank"], r["lhs"], r["rhs"], r["pair_cnt"])
            for r in bpe_train(
                d, "text", rounds=64, incremental=inc, **kw
            ).collect()
        ]
        assert got == expect, f"incremental={inc} vmax={vmax}"


def test_perplexity_filter_semantics(spark, sf_dir):
    """The perplexity filter: (1) the driver-computed lp table is monotone
    in the bucket count (more reference mass → higher log-prob) and covers
    all 1024 buckets; (2) every kept row satisfies the exact integer keep
    inequality; (3) ordering is by per-token perplexity."""
    from flink_1_12_2_spark.llm.sampling import (
        unigram_lp_micro_py,
        unigram_lp_table_py,
    )
    from flink_1_12_2_spark.registry import QUERIES, load_all_query_modules

    assert unigram_lp_micro_py(10, 1000, 1024) > unigram_lp_micro_py(
        1, 1000, 1024
    )
    table = unigram_lp_table_py([{"__b": 3, "ref_c": 7}], 1024)
    assert len(table) == 1024
    floor_lp = unigram_lp_micro_py(0, 7, 1024)
    assert dict(table)[3] > floor_lp
    assert all(lp == floor_lp for b, lp in table if b != 3)

    load_all_query_modules()
    rows = QUERIES["text_perplexity_filter"].fn(spark, sf_dir).collect()
    assert rows, "filter kept nothing"
    for r in rows:
        assert r["logprob_micro"] >= -3484000 * r["n_tok"]
        assert r["ppl_micro_per_tok"] <= 3484000
    per_tok = [r["ppl_micro_per_tok"] for r in rows]
    assert per_tok == sorted(per_tok)


def test_bpe_encode_matches_bruteforce_apply(spark):
    """bpe_encode's transform+flatten replace chain equals applying the
    merge rules word-by-word with the Sennrich greedy-left reference —
    including the adjacent-repeat case ('aaaa') the space-doubling trick
    exists for, and multi-word order preservation."""
    from flink_1_12_2_spark.llm.bpe import bpe_encode

    merges = [("a", "a"), ("l", "o"), ("aa", "aa"), ("h e", None)]
    merges = [m for m in merges if m[1]]  # drop the sentinel row

    def ref_encode(word):
        syms = list(word) + ["</w>"]
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    docs = spark.createDataFrame(
        [(1, "aaaa lol aaa"), (2, "aaaaa"), (3, "banana aa")],
        "doc_id INT, text STRING",
    )
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    for doc_id, text in [(1, "aaaa lol aaa"), (2, "aaaaa"), (3, "banana aa")]:
        expect = [t for w in text.split() for t in ref_encode(w)]
        assert got[doc_id] == expect, (doc_id, got[doc_id], expect)


def test_split_corpus_disjoint_exhaustive_stable(spark, sf_dir):
    """split_corpus: every row gets exactly one label, fractions land near
    their targets, and labels are stable under corpus growth (the half
    corpus's labels are a prefix-restriction of the full corpus's)."""
    import pyspark.sql.functions as F

    from flink_1_12_2_spark.llm.sampling import split_corpus
    from flink_1_12_2_spark.registry import load

    d = load(spark, sf_dir, "documents")
    out = split_corpus(
        d, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], salt="tv"
    )
    counts = dict(
        (r["split"], r["n"])
        for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    total = sum(counts.values())
    assert total == d.count()
    assert 0.7 < counts.get("train", 0) / total < 0.9
    half = d.filter(F.col("doc_id") % 2 == 0)
    half_labels = {
        r["doc_id"]: r["split"]
        for r in split_corpus(
            half, "doc_id",
            [("train", 0.8), ("val", 0.1), ("test", 0.1)], salt="tv",
        ).collect()
    }
    full_labels = {r["doc_id"]: r["split"] for r in out.collect()}
    assert all(full_labels[k] == v for k, v in half_labels.items())


def test_floor_div_sql_both_engines_match_python():
    """The r9 portable integer floor-division (floor_div_sql /
    floor_div_sql_duck) must equal Python's // (true floor) in BOTH
    engines for every sign/magnitude mix — including the negative
    quotients that broke three rounds of DSIR gate runs when FLOOR was
    applied to a float quotient, and magnitudes beyond 2^53 where a
    double round-trip would corrupt the quotient."""
    import random

    import duckdb

    from flink_1_12_2_spark.llm.sampling import (
        floor_div_sql,
        floor_div_sql_duck,
    )
    from flink_1_12_2_spark.session import get_spark

    rng = random.Random(20260815)
    cases = [(-7, 2), (7, 2), (-6, 2), (-6, 3), (0, 5), (-1, 1024),
             (-(2**61), 3), (2**61 + 1, 7), (-(2**53) - 1, 2),
             (9007199254740993, 2)]
    cases += [
        (rng.randint(-(2**62), 2**62), rng.randint(1, 10**9))
        for _ in range(200)
    ]
    vals = ", ".join(f"(CAST({a} AS BIGINT), CAST({b} AS BIGINT))"
                     for a, b in cases)
    duck = duckdb.sql(
        f"SELECT a, b, {floor_div_sql_duck('a', 'b')} AS q "
        f"FROM (VALUES {vals}) t(a, b)"
    ).fetchall()
    assert all(q == a // b for a, b, q in duck), [
        (a, b, q, a // b) for a, b, q in duck if q != a // b
    ][:3]

    spark = get_spark(shuffle_partitions=2)
    sdf = spark.createDataFrame(cases, "a long, b long").selectExpr(
        "a", "b", f"{floor_div_sql('a', 'b')} AS q"
    )
    srows = sdf.collect()
    assert all(r["q"] == r["a"] // r["b"] for r in srows), [
        (r["a"], r["b"], r["q"]) for r in srows if r["q"] != r["a"] // r["b"]
    ][:3]


def test_round_half_away_sql_both_engines_match_python():
    """_round_half_away_sql (the r9 version-proof micronat quantizer) must
    be bit-identical to _round_half_away_py in BOTH engines — including
    exact .5 ties of both signs (where ROUND(double) implementations
    disagree across DuckDB releases) and the 0.49999999999999994 edge
    (where floor(v+0.5) is wrong in every engine)."""
    import struct as _s

    import duckdb

    from flink_1_12_2_spark.llm.sampling import (
        _round_half_away_py,
        _round_half_away_sql,
    )
    from flink_1_12_2_spark.session import get_spark

    vals = [0.0, 0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 2.4999999999999996,
            0.49999999999999994, -0.49999999999999994, 1e15 + 0.5,
            -(1e15 + 0.5), 123456.499999999, -7.999999999999999,
            3.5000000000000004, -1048576.5]
    expected = {_s.pack("<d", v): _round_half_away_py(v) for v in vals}

    dvals = ", ".join(f"({v!r}E0)" if "e" not in repr(v) else f"({v!r})"
                      for v in vals)
    duck = duckdb.sql(
        f"SELECT v, {_round_half_away_sql('v')} AS r "
        f"FROM (VALUES {dvals}) t(v)"
    ).fetchall()
    for v, r in duck:
        assert r == expected[_s.pack('<d', v)], (v, r)

    spark = get_spark(shuffle_partitions=2)
    sdf = spark.createDataFrame([(v,) for v in vals], "v double").selectExpr(
        "v", f"{_round_half_away_sql('v')} AS r"
    )
    for row in sdf.collect():
        assert row["r"] == expected[_s.pack('<d', row["v"])], (
            row["v"], row["r"],
        )


def test_cross_doc_chunk_dedup_first_occurrence_semantics(spark):
    """CCNet paragraph dedup: the first corpus-wide occurrence (min
    (doc_id, pos)) survives, later copies drop, reassembly preserves
    chunk order, and fully-duplicated documents vanish."""
    from flink_1_12_2_spark.llm.text import cross_doc_chunk_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),        # chunks: "a b c d", "e f g h"
            (2, "e f g h x y z w"),        # first chunk dups doc1's 2nd
            (3, "a b c d e f g h"),        # both chunks dup -> vanishes
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["new_text"])
        for r in cross_doc_chunk_dedup(docs, chunk_words=4).collect()
    }
    assert out[1] == (2, 2, "a b c d e f g h")
    assert out[2] == (2, 1, "x y z w")
    assert 3 not in out


def test_cross_doc_chunk_dedup_expression_totals_edges(spark):
    """The r13 restructure computes n_chunks as a scan-stage expression
    (ceil(word_count / chunk_words)) instead of counting exploded rows —
    pin the edge cases where the two could diverge: empty text (split
    yields [""] -> one empty-string chunk), word counts not divisible by
    chunk_words, and a single word."""
    from flink_1_12_2_spark.llm.text import cross_doc_chunk_dedup

    docs = spark.createDataFrame(
        [
            (1, ""),                # [""] -> 1 chunk (the empty chunk)
            (2, "a"),               # 1 word -> 1 chunk
            (3, "a b c d e"),       # 5 words -> 2 chunks ("a b c d", "e")
            (4, "p q r s t u v"),   # 7 words -> 2 chunks
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"])
        for r in cross_doc_chunk_dedup(docs, chunk_words=4).collect()
    }
    # every chunk here is globally unique except none — all docs survive
    # with n_kept == n_chunks, and n_chunks equals the exploded row count
    assert out[1] == (1, 1)
    assert out[2] == (1, 1)
    assert out[3] == (2, 2)
    assert out[4] == (2, 2)
