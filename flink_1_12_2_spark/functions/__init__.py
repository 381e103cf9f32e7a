from flink_1_12_2_spark.functions.registry import (  # noqa: F401
    FLINK_FUNCTIONS,
    flink_call,
    register_flink_sql_functions,
)
