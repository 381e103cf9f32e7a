from flink_1_12_2_spark.sql.rewriter import rewrite  # noqa: F401
