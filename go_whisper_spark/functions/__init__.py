from go_whisper_spark.functions.bucketing import (  # noqa: F401
    align_interval,
    fetch_bounds,
    agg_expr,
    xff_gated_agg,
    lww_latest,
)
