"""BPE merge-rule training: vocabulary-grain rounds, incremental pair
counts, 1-row merge collects.

Byte-pair-encoding training (Sennrich et al. 2016; the tokenizer-training
step of every LLM data pipeline): start from characters (+ an end-of-word
marker), repeatedly merge the most frequent adjacent symbol pair. Pair
counts are exact integers over the DISTINCT-WORD grain weighted by word
frequency, and the winning pair is a deterministic
(count DESC, left, right) top-1.

Merge application is EXACT greedy-left (Sennrich's ``learn_bpe``): a naive
single-space ``replace(' l r ', ' lr ')`` consumes the shared delimiter,
so in ``a a a a`` only alternating occurrences merge — the r6 advisor
finding. The fix keeps plain literal ``replace`` (portable to any SQL
engine, no regex, no floats) via space doubling:

    s2 = replace(sp, ' ', '  ')          -- every boundary holds 2 spaces
    s3 = replace(s2, ' l  r ', ' lr ')   -- consumes ONE space per side,
                                         -- leaving one for the neighbor,
                                         -- so adjacent matches all fire
                                         -- in a single left-to-right pass
    sp' = replace(s3, '  ', ' ')         -- every boundary is back to
                                         -- exactly 2 spaces pre-collapse,
                                         -- so the collapse is exact

which is left-to-right non-overlapping with non-consuming boundaries —
precisely greedy-left (``a a a a`` -> ``aa aa``; property-tested against a
brute-force Python BPE in tests/test_llm_text.py).

Scale (100 TB, 30k merges): the corpus-sized work is ONE map-combinable
word-count aggregation; every round after that runs at VOCABULARY grain.
When the vocabulary fits the driver-metadata rule (≤ ``_LOCAL_VOCAB_MAX``
distinct words — the common case even for crawl-scale corpora, and the
design of reference trainers like ``learn_bpe.py``), the merge loop runs
driver-side on the collected word counts with an inverted pair→word
index, eliminating one scheduler round-trip per merge. Above that, two
distributed round strategies (identical output; see :func:`bpe_train`): the
default recounts all pairs from the cached vocabulary (a single 2-stage
job — round latency is stage count, not data volume, so this wins up to
large vocabularies), and ``incremental=True`` folds a sign-tagged delta
over only the words containing the merged pair into a cached pair table —
the right trade once late-round pairs touch a tiny fraction of a
many-million-word vocabulary. The 1-row argmax collect per round is the
irreducible sequential dependency of BPE (merge k+1's counts depend on
merge k); lineage is cut by a persist-rotate of generation caches plus a
localCheckpoint every ``_CKPT_EVERY`` rounds so round k's plan never
re-derives round k-1 (measured budget: 64 merges in 15.6 s warm at sf0.1
on local[32], batch-recount — pinned in SCALE.md "Round-8 pinned
headliner budgets").

Cross-engine determinism: counts are exact ints; ties break
lexicographically; the symbol-string replace is literal (no regex, no
floats anywhere).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

BPE_ROUNDS = 8
_CKPT_EVERY = 8  # truncate plan lineage (localCheckpoint) every k rounds
#: Vocabulary size (distinct words) up to which the merge loop runs
#: driver-side on the collected word counts. The corpus-scale work —
#: the one explode + map-combinable word-count groupBy — is always
#: distributed; the VOCABULARY is bounded by the language, not the
#: corpus (a 100-TB crawl still has ~10^7 distinct whitespace tokens),
#: and at ≤2^20 entries it is driver metadata on the same rule as
#: KMeans/IVF centroids, PQ codebooks, and the merge table itself
#: (~60 MB collected, indexed Sennrich trainer ≈ seconds). Above the
#: threshold the distributed round loop takes over unchanged.
_LOCAL_VOCAB_MAX = 1 << 20


def spaced_symbols(word) -> Column:
    """'hello' -> ' h e l l o </w> ' (single-space separated, padded)."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(word, "(.)", "$1 ")),
        F.lit(" </w> "),
    )


def merge_pair_expr(sp: Column, lhs: str, rhs: str) -> Column:
    """Apply one BPE merge to a spaced symbol string with exact greedy-left
    semantics via the space-doubling trick (module docstring)."""
    doubled = F.replace(sp, F.lit(" "), F.lit("  "))
    merged = F.replace(
        doubled, F.lit(f" {lhs}  {rhs} "), F.lit(f" {lhs}{rhs} ")
    )
    return F.replace(merged, F.lit("  "), F.lit(" "))


def merge_pair_sql(sp: str, lhs_sql: str, rhs_sql: str) -> str:
    """The same greedy-left merge as SQL text (DuckDB oracle rendering);
    ``lhs_sql``/``rhs_sql`` are SQL string expressions for the pair."""
    return (
        f"replace(replace(replace({sp}, ' ', '  '), "
        f"' ' || {lhs_sql} || '  ' || {rhs_sql} || ' ', "
        f"' ' || {lhs_sql} || {rhs_sql} || ' '), '  ', ' ')"
    )


def _pair_counts(words: DataFrame, sign: int = 1) -> DataFrame:
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
        .agg((F.lit(sign) * F.sum("cnt")).alias("pair_cnt"))
    )


def _train_local(
    spaced_counts: list[tuple[str, int]], rounds: int
) -> list[tuple[int, str, str, int]]:
    """Indexed Sennrich merge loop over collected (spaced form, count)
    rows — the exact algorithm of the reference ``learn_bpe.py``: a pair
    → word inverted index so each round rewrites only the words that
    contain the winning pair, with delta updates to the pair counts.
    Tie-break is (count DESC, left ASC, right ASC), identical to the
    distributed argmax: Python's code-point string order equals Spark's
    UTF8String byte order because UTF-8 sorts bytewise in code-point
    order. Stale inverted-index entries (a word rewritten since it was
    indexed under a pair) are tolerated and skipped by an adjacency
    re-check, never double-counted."""
    vocab: dict[tuple[str, ...], int] = {}
    for sp, cnt in spaced_counts:
        syms = tuple(sp.strip().split(" "))
        vocab[syms] = vocab.get(syms, 0) + cnt
    words = list(vocab.items())
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            where.setdefault(p, set()).add(i)
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, rounds + 1):
        if not pair_counts:
            break
        (l, r), c = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if c <= 0:
            break
        merges.append((k, l, r, c))
        for i in sorted(where.pop((l, r), ())):
            syms, cnt = words[i]
            if not any(
                a == l and b == r for a, b in zip(syms, syms[1:])
            ):
                continue  # stale index entry: word already rewritten
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new = tuple(out)
            for p in zip(syms, syms[1:]):
                left = pair_counts[p] - cnt
                if left:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
            words[i] = (new, cnt)
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + cnt
                where.setdefault(p, set()).add(i)
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str,
    rounds: int = BPE_ROUNDS,
    incremental: bool = False,
    local_vocab_max: int = _LOCAL_VOCAB_MAX,
) -> DataFrame:
    """Train ``rounds`` BPE merges; returns (rank, lhs, rhs, pair_cnt).

    Each round collects exactly ONE row — the winning merge rule; training
    ends early if the pair stream runs dry. Two engine strategies with
    identical output (equivalence-tested against brute-force Python BPE):

    - ``incremental=False`` (default): recount all pairs from the cached
      vocabulary each round — a single 2-stage job (explode + map-side
      combinable groupBy + 1-row top). The pair alphabet starts at
      |chars|^2 and the vocabulary table is cached, so the recount is a
      short fixed pipeline; measured at sf0.1 this is ~3x faster per round
      than the delta variant because ROUND LATENCY here is stage count,
      not data volume.
    - ``incremental=True``: maintain the pair table by folding in a
      sign-tagged recount of only the words CONTAINING the merged pair.
      More stages per round (delta union + re-aggregate), but the work per
      round is proportional to the pair's footprint — the right trade once
      the vocabulary is tens of millions of words and late-round pairs
      touch a tiny fraction of it.

    Either way the replace-chain/pair-table plan lineage is truncated with
    an eager ``localCheckpoint`` every ``_CKPT_EVERY`` rounds: with plain
    ``persist()`` the logical plan still nests across rounds (O(k) deep
    for the vocabulary, O(k^2) total for the incremental pair table) and
    at 64 rounds optimizer re-analysis alone exhausts the driver heap.
    Caches rotate: round k's caches drop only after round k+1's collect
    has materialized their successors, so no round recomputes back to the
    corpus. The 1-row argmax collect per round is the irreducible
    sequential dependency of BPE (merge k+1's counts depend on merge k)."""
    from collections import deque

    from flink_1_12_2_spark.llm.text import tokens
    from flink_1_12_2_spark.session import rebalance_scan

    spark = docs.sparkSession
    words = (
        rebalance_scan(docs)
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(spaced_symbols(F.col("w")).alias("sp"), "cnt")
        .persist()
    )
    n_vocab = words.count()  # materializes the cache either way
    if n_vocab <= local_vocab_max:
        # Vocabulary fits the driver-metadata rule: collect the word
        # counts (the ONLY corpus-scale job already ran above) and run
        # the indexed Sennrich loop locally — identical output to the
        # distributed rounds (equivalence-tested both ways in
        # tests/test_llm_text.py), without one scheduler round-trip
        # per merge.
        rows = [(r["sp"], r["cnt"]) for r in words.collect()]
        words.unpersist()
        return spark.createDataFrame(
            _train_local(rows, rounds),
            "rank int, lhs string, rhs string, pair_cnt bigint",
        )
    pairs = _pair_counts(words).persist() if incremental else None
    merges: list[tuple[int, str, str, int]] = []
    # generation queue: the 1-row argmax collect at round k materializes
    # generation g's frames, which pulls generation g-1's caches — so
    # generations retire two collects after creation (at most 3
    # vocabulary-grain generations cached at any time) and each non-ckpt
    # round runs EXACTLY ONE engine job
    live: deque[tuple[DataFrame, ...]] = deque(
        [(words, pairs) if incremental else (words,)]
    )
    # DataFrame.unpersist() does NOT free localCheckpoint RDD blocks (only
    # the CacheManager entry); left to the lazy ContextCleaner they pile up
    # across a 30k-merge run. Track checkpointed frames and explicitly
    # rdd.unpersist() a checkpoint GENERATION once the next one has
    # materialized — only then do no live cached frames root their lineage
    # at the old checkpoint, so dropping its blocks can never strand a
    # cache-evicted recompute.
    ckpt_prev: list[DataFrame] = []
    ckpt_cur: list[DataFrame] = []
    for k in range(1, rounds + 1):
        words = live[-1][0]
        cur_pairs = live[-1][1] if incremental else _pair_counts(words)
        top = (
            cur_pairs.orderBy(F.desc("pair_cnt"), "l", "r").limit(1).collect()
        )
        while len(live) > 2:
            for df in live.popleft():
                df.unpersist()
        if not top or top[0]["pair_cnt"] <= 0:
            break
        best = top[0]
        merges.append((k, best["l"], best["r"], best["pair_cnt"]))
        new_words = words.select(
            merge_pair_expr(F.col("sp"), best["l"], best["r"]).alias("sp"),
            "cnt",
        )
        gen: tuple[DataFrame, ...]
        if incremental:
            # merging (l, r) only changes words whose symbol string holds
            # the pair — recount just those (sign-tagged) and fold the
            # delta into the cached pair table
            pat = f" {best['l']} {best['r']} "  # single-space adjacency
            affected = words.filter(F.col("sp").contains(pat))
            merged_affected = affected.select(
                merge_pair_expr(F.col("sp"), best["l"], best["r"]).alias(
                    "sp"
                ),
                "cnt",
            )
            delta = _pair_counts(affected, sign=-1).unionByName(
                _pair_counts(merged_affected, sign=1)
            )
            new_pairs = (
                cur_pairs.unionByName(delta)
                .groupBy("l", "r")
                .agg(F.sum("pair_cnt").alias("pair_cnt"))
                .filter(F.col("pair_cnt") > 0)
            )
            if k % _CKPT_EVERY == 0:
                gen = (
                    new_words.localCheckpoint(eager=True),
                    new_pairs.localCheckpoint(eager=True),
                )
            else:
                gen = (new_words.persist(), new_pairs.persist())
        else:
            gen = (
                (new_words.localCheckpoint(eager=True),)
                if k % _CKPT_EVERY == 0
                else (new_words.persist(),)
            )
        if k % _CKPT_EVERY == 0:
            # the new checkpoint generation is materialized (eager=True):
            # free the generation-before-last's blocks, rotate
            for df in ckpt_prev:
                df.rdd.unpersist()
            ckpt_prev, ckpt_cur = ckpt_cur, list(gen)
        live.append(gen)
    for g in live:
        for df in g:
            df.unpersist()
    for df in ckpt_prev + ckpt_cur:
        df.rdd.unpersist()
    return spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_cnt bigint"
    )


def bpe_encode_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Encode one word with an ordered merge-rule list: the spaced-symbol
    form threaded through each merge's greedy-left replace, split back to
    the final subword array (last element is the ``</w>`` end marker)."""
    sp = spaced_symbols(word)
    for lhs, rhs in merges:
        sp = merge_pair_expr(sp, lhs, rhs)
    return F.split(F.trim(sp), " ")


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply a trained BPE merge table to a corpus — the scan-stage half
    of the tokenizer (train once, encode petabytes). The merge rules are
    driver-side literals (the trainer's output is O(vocab) rows), so the
    whole encode is ONE whole-stage-codegen projection per document:
    ``transform`` maps each word through the replace chain and ``flatten``
    concatenates — no explode, no shuffle, no Python. Document token
    order is preserved by construction (array semantics, not groupBy
    reassembly). Returns (id, carry..., n_words, n_tokens, tokens).

    Scale: encode cost is linear in corpus bytes and embarrassingly
    parallel; with a real 30k-merge vocabulary the replace chain should
    be compiled per-word via a broadcast trie in a pandas UDF instead —
    this column form is exact and JVM-side, and is what the oracle can
    mirror. A word-DEDUP pre-pass (encode distinct words, broadcast-join
    back) trades the per-occurrence chain for a join; on natural-language
    skew (Zipf) that wins once merges number in the thousands."""
    from flink_1_12_2_spark.llm.text import tokens
    from flink_1_12_2_spark.session import rebalance_scan

    toks = tokens(F.col(text_col))
    enc = F.flatten(
        F.transform(toks, lambda w: bpe_encode_expr(w, merges))
    )
    # the replace chain is the row-cost-heavy stage — widen a one-split
    # local scan so it runs on every core (no-op on real multi-split input)
    return rebalance_scan(docs).select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        F.size(toks).alias("n_words"),
        F.size(enc).alias("n_tokens"),
        enc.alias("tokens"),
    )
