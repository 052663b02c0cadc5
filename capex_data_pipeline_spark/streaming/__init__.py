from capex_data_pipeline_spark.streaming.windows import (  # noqa: F401
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
