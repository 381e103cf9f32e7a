

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
    term = {
        b: round(
            1e6
            * (
                math.log((tgt_c[b] + 1) / (T + B))
                - math.log((raw_c[b] + 1) / (R + B))
            )
        )
        for b in raw_c
    }
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
