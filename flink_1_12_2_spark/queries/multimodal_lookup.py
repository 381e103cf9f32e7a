"""Multimodal binary-column plumbing + lookup-join queries.

The multimodal decode path is *stubbed at the codec* (no image libs in this
container) but everything Spark-side — binary columns, Arrow batching through
``mapInPandas``, metadata-based pruning — is real, and the fake format is
deterministic enough that DuckDB reproduces the full pipeline (header fields
and payload md5) for a strong oracle.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_12_2_spark.llm.dedup import fan_out
from flink_1_12_2_spark.llm.multimodal import (
    attach_fake_images,
    decode_images,
    resize_images,
)
from flink_1_12_2_spark.operators.lookup import (
    lookup_join_dataframe,
    lookup_join_mapinpandas,
)
from flink_1_12_2_spark.registry import load, query


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 64 + 16 AS INT) AS width,
           CAST(doc_id % 48 + 16 AS INT) AS height,
           3 AS channels,
           16 AS payload_len,
           md5(md5(CAST(doc_id AS VARCHAR))) AS payload_md5
    FROM documents ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary image column → decode/feature-extract via Arrow-batched
    mapInPandas (codec stubbed; header+payload fully verified)."""
    d = attach_fake_images(fan_out(load(spark, sf_dir, "documents")), "doc_id")
    out = decode_images(d, "doc_id")
    return out.withColumn("channels", F.col("channels").cast("int")).orderBy(
        "doc_id"
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             CAST(doc_id % 64 + 16 AS INT) AS w,
             CAST(doc_id % 48 + 16 AS INT) AS h
      FROM documents)
    SELECT doc_id,
           CAST(FLOOR(w * (32.0 / GREATEST(w, h)) + 0.5) AS INT) AS out_width,
           CAST(FLOOR(h * (32.0 / GREATEST(w, h)) + 0.5) AS INT) AS out_height,
           32.0 / GREATEST(w, h) AS scale
    FROM g ORDER BY doc_id
    """,
    tags=("llm", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize geometry over mapInPandas (codec stubbed)."""
    d = attach_fake_images(fan_out(load(spark, sf_dir, "documents")), "doc_id")
    return resize_images(d, target=32, id_col="doc_id").orderBy("doc_id")


@query(
    "multimodal_filter_before_decode",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS decoded,
           CAST(SUM(doc_id % 64 + 16) AS BIGINT) AS width_sum
    FROM documents WHERE doc_id % 64 + 16 >= 48
    """,
    tags=("llm", "multimodal", "pruning"),
)
def multimodal_filter_before_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata pruning: the width filter applies to the metadata column
    BEFORE the decode UDF runs — only qualifying binaries cross into Python."""
    d = attach_fake_images(fan_out(load(spark, sf_dir, "documents")), "doc_id")
    pruned = d.filter(F.col("meta_width") >= 48)
    out = decode_images(pruned, "doc_id")
    return out.agg(
        F.count(F.lit(1)).alias("decoded"),
        F.sum("width").alias("width_sum"),
    )


@query(
    "lookup_join_static",
    oracle="""
    SELECT n.n_name AS nation_name, CAST(COUNT(*) AS BIGINT) AS customers,
           CAST(SUM(c.c_acctbal) AS DOUBLE) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    tags=("batch", "join", "lookup"),
)
def lookup_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join tier 1: dimension readable as DataFrame → broadcast
    stream-static join (LookupJoinRunner.java:34 parity, Catalyst-native)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    j = lookup_join_dataframe(c, n, "c_nationkey", "n_nationkey", how="inner")
    return (
        j.groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("customers"),
            F.sum("c_acctbal").alias("total_bal"),
        )
        .orderBy("nation_name")
    )


@query(
    "lookup_join_external",
    oracle="""
    SELECT n.n_name AS nation_name, CAST(COUNT(*) AS BIGINT) AS suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
    tags=("batch", "join", "lookup", "external"),
)
def lookup_join_external(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lookup join tier 2: per-partition client + per-Arrow-batch batched
    lookups via mapInPandas (AsyncLookupJoinRunner parity). The 'external
    store' is simulated by a client that loads the nation table inside the
    partition — exercising the real batching/pooling path."""
    s = load(spark, sf_dir, "supplier")
    nation_path = os.path.join(sf_dir, "nation.parquet")

    def client_factory():
        import pyarrow.parquet as pq

        tbl = pq.read_table(nation_path).to_pydict()
        store = {
            int(k): {"nation_name": v}
            for k, v in zip(tbl["n_nationkey"], tbl["n_name"])
        }

        def lookup(keys: list) -> dict:
            return {k: store.get(int(k)) for k in keys}

        return lookup

    enriched = lookup_join_mapinpandas(
        s.select("s_suppkey", "s_nationkey"),
        "s_nationkey",
        client_factory,
        "s_suppkey bigint, s_nationkey int, nation_name string",
        ["nation_name"],
    )
    return (
        enriched.groupBy("nation_name")
        .agg(F.count(F.lit(1)).alias("suppliers"))
        .orderBy("nation_name")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, CAST(doc_id % 20 + 5 AS INT) AS n FROM documents),
    s AS (SELECT doc_id, unnest(generate_series(0, n - 1, 3)) AS frame_idx
          FROM f)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           md5(substr(md5(CAST(doc_id AS VARCHAR) || ':'
                          || CAST(frame_idx AS VARCHAR)), 1, 16)) AS frame_md5
    FROM s ORDER BY doc_id, frame_idx
    """,
    tags=("llm", "multimodal", "video"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 3rd frame) over Arrow-batched
    mapInPandas: container header parsed, sampled frames sliced from the
    binary payload, per-frame content checksum emitted -- the oracle
    recomputes the exact frame bytes, so sampled CONTENT is verified, not
    just indices (codec stubbed: fake container, real batch plumbing)."""
    from flink_1_12_2_spark.llm.multimodal import attach_fake_videos, sample_frames

    d = attach_fake_videos(fan_out(load(spark, sf_dir, "documents")), "doc_id")
    return sample_frames(d, every=3, id_col="doc_id").orderBy(
        "doc_id", "frame_idx"
    )


@query(
    "multimodal_audio_features",
    oracle="""
    WITH f AS (
      SELECT doc_id, CAST(doc_id % 240 + 120 AS INT) AS n FROM documents),
    s AS (
      SELECT doc_id, idx,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                             || CAST(idx AS VARCHAR)), 1, 2))::INT AS v
      FROM (SELECT doc_id, unnest(generate_series(0, n - 1)) AS idx FROM f)),
    p AS (
      SELECT doc_id, idx, v,
             LEAD(v) OVER (PARTITION BY doc_id ORDER BY idx) AS nv,
             CAST(idx // 40 AS INT) AS win_idx, idx % 40 AS pos
      FROM s)
    SELECT doc_id, win_idx, CAST(COUNT(*) AS INT) AS n_samples,
           SUM(v * v) AS energy,
           CAST(SUM(CASE WHEN pos < 39 AND nv IS NOT NULL
                          AND (v - 127.5) * (nv - 127.5) < 0
                     THEN 1 ELSE 0 END) AS INT) AS zero_crossings
    FROM p GROUP BY doc_id, win_idx
    ORDER BY doc_id, win_idx
    """,
    tags=("llm", "multimodal", "audio"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio feature extraction (energy + zero-crossings per
    40-sample window) over Arrow-batched mapInPandas: the PCM container
    header is parsed and the byte samples framed in Python — real audio
    plumbing with a stubbed codec (the fake container's samples are
    md5-derived, so the oracle recomputes the exact sample values and
    verifies the decoded CONTENT, the same design as the video
    frame-sample op). Both features are exact integers. The zero-crossing
    pair straddling a window boundary belongs to neither window (pos<39),
    matching the Python framing."""
    from flink_1_12_2_spark.llm.multimodal import (
        attach_fake_audio,
        audio_window_features,
    )

    d = attach_fake_audio(fan_out(load(spark, sf_dir, "documents")), "doc_id")
    return audio_window_features(d, window=40).orderBy("doc_id", "win_idx")


_BMP_T = 16  # aspect-preserving target box


@query(
    "multimodal_bmp_resize",
    oracle=f"""
    -- recompute the RESIZED PIXEL SUMS from the generator formula
    -- pixel(ch, x, y, id) = (x*7 + y*13 + id + 97*ch) % 256 and the EXACT
    -- integer nearest-neighbor mapping sx = (2j+1)*w // (2*ow) — the same
    -- integer arithmetic the numpy path uses, so sums match bit-for-bit
    WITH g AS (
      SELECT doc_id,
             doc_id % 16 + 8 AS w, doc_id % 12 + 8 AS h,
             GREATEST(doc_id % 16 + 8, doc_id % 12 + 8) AS mx
      FROM documents),
    dims AS (
      SELECT doc_id, w, h,
             (2 * w * {_BMP_T} + mx) // (2 * mx) AS ow,
             (2 * h * {_BMP_T} + mx) // (2 * mx) AS oh
      FROM g),
    px AS (
      SELECT d.doc_id, d.ow, d.oh,
             LEAST((2 * xi.i + 1) * d.w // (2 * d.ow), d.w - 1) AS sx,
             LEAST((2 * yi.i + 1) * d.h // (2 * d.oh), d.h - 1) AS sy
      FROM dims d,
           UNNEST(generate_series(0, d.ow - 1)) AS xi(i),
           UNNEST(generate_series(0, d.oh - 1)) AS yi(i))
    SELECT doc_id,
           CAST(MAX(ow) AS INT) AS out_width, CAST(MAX(oh) AS INT) AS out_height,
           SUM((sx * 7 + sy * 13 + doc_id) % 256)       AS sum_r,
           SUM((sx * 7 + sy * 13 + doc_id + 97) % 256)  AS sum_g,
           SUM((sx * 7 + sy * 13 + doc_id + 194) % 256) AS sum_b
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm", "multimodal", "bmp", "real-codec"),
)
def multimodal_bmp_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel transform, un-stubbed codec: 24-bit BMP bytes decoded in
    pure numpy, nearest-neighbor resized to an aspect-preserving 16-box,
    per-channel integer pixel sums emitted. The oracle recomputes the
    resized sums from the pixel-generator formula and the same
    exact-integer index mapping — verifying decoded CONTENT end to end,
    not just geometry. JPEG/PNG stay behind the capability gate."""
    from flink_1_12_2_spark.llm.multimodal import (
        attach_fake_bmps,
        bmp_resize_stats,
    )

    d = attach_fake_bmps(
        fan_out(load(spark, sf_dir, "documents").select("doc_id")), "doc_id"
    )
    return bmp_resize_stats(d, target=_BMP_T, id_col="doc_id").orderBy("doc_id")


@query(
    "stream_lookup_jdbc",
    oracle="""
    SELECT e.user_id, n.n_name AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS events
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    WHERE e.user_id <= 200
    GROUP BY e.user_id, n.n_name ORDER BY e.user_id
    """,
    tags=("streaming", "join", "lookup", "jdbc"),
)
def stream_lookup_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING lookup join against a live jdbc dimension — Flink's
    `stream JOIN dim FOR SYSTEM_TIME AS OF proctime` on a jdbc connector
    (JdbcRowDataLookupFunction + the lookup.cache contract): each
    micro-batch resolves the dimension through the TTL-cached snapshot
    (operators/lookup.jdbc_lookup_snapshot), so a 4-batch run pays ONE
    remote read, not four — the cache's whole point. foreachBatch is the
    per-batch re-resolution hook (a plan-time stream-static join could
    never re-read the store mid-query)."""
    import tempfile

    import pyspark.sql.functions as F

    from flink_1_12_2_spark.operators.lookup import lookup_join_jdbc
    from flink_1_12_2_spark.sources.jdbc import derby_url, jdbc_write
    from flink_1_12_2_spark.streaming.core import stream_events_multibatch

    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    url = derby_url(tempfile.mkdtemp(prefix="derby_slk_") + "/db")
    jdbc_write(n, url, "nation_lk")
    ev = stream_events_multibatch(spark, sf_dir, n_files=4).filter(
        F.col("user_id") <= 200
    ).withColumn("__k", (F.col("user_id") % 25).cast("bigint"))
    out_dir = tempfile.mkdtemp(prefix="slk_out_")
    ckpt = tempfile.mkdtemp(prefix="slk_ckpt_")
    opts = {"lookup.cache.max-rows": "100", "lookup.cache.ttl": "10min"}

    def fb(bdf: DataFrame, bid: int) -> None:
        lookup_join_jdbc(
            bdf, url, "nation_lk", "__k", "n_nationkey",
            options=opts, how="inner",
        ).select("user_id", "n_name").write.mode("append").parquet(out_dir)

    q = (
        ev.writeStream.foreachBatch(fb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id", F.col("n_name").alias("nation_name"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select("user_id", "nation_name", "events")
        .orderBy("user_id")
    )
